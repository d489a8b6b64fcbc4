"""SURVEY §5(3) golden-ranking quality anchor: the committed ranked-id file
(tests/golden/recall_rankings.json, regenerated only via
scripts/make_golden_rankings.py) pins the end-to-end hybrid recall ranking
on the deterministic fixture corpus. Any recall-semantics regression flips
the exact-match assertion; the NDCG@10 gate (reference recall-quality lab,
scripts/lab/lab_metrics.py:11-58) grades how far a ranking drifted and
exercises the ir_metrics twins — both pure-Python and the one-job
DataFrame aggregate."""

import json
import os

import pytest
from pyspark.sql import functions as F

from automem_spark.functions.ir_metrics import ir_metrics_df, mrr, ndcg_at_k, recall_at_k
from automem_spark.functions.vector import placeholder_embedding, placeholder_embedding_udf
from automem_spark.operators.recall import RecallRequest, recall

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "recall_rankings.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def rankings(spark, golden):
    """Run every golden query once; reuse across assertions."""
    from automem_spark.sources.tables import memories_view

    mem = memories_view(spark, golden["sf_dir"]).withColumn(
        "embedding", placeholder_embedding_udf(golden["dim"])(F.col("content"))
    )
    out = {}
    for q in golden["rankings"]:
        qvec = placeholder_embedding(q, golden["dim"])
        rows = recall(
            mem, RecallRequest(query=q, limit=golden["k"]), query_vector=qvec
        ).collect()
        out[q] = rows
    return out


def test_exact_golden_ranking(golden, rankings):
    for q, pinned in golden["rankings"].items():
        got = [int(r.id) for r in rankings[q]]
        assert got == pinned["ids"], f"ranking drifted for {q!r}"
        assert [r.match_type for r in rankings[q]] == pinned["match_types"], q
        got_scores = [round(float(r.final_score), 6) for r in rankings[q]]
        assert got_scores == pytest.approx(pinned["final_scores"], abs=1e-6), q


def test_ndcg_gate_pure_python(golden, rankings):
    k = golden["k"]
    for q, pinned in golden["rankings"].items():
        got = [int(r.id) for r in rankings[q]]
        assert ndcg_at_k(got, pinned["ids"], k) >= golden["min_ndcg"], q
        assert recall_at_k(got, pinned["ids"], k) >= golden["min_ndcg"], q
        assert mrr(got, pinned["ids"]) == 1.0, q


def test_ndcg_gate_dataframe_aggregate(spark, golden, rankings):
    """The same gate through the one-job DataFrame evaluator — scores all
    queries in one pass, the shape a large eval suite would use."""
    res_rows = [
        (q, int(r.id), i + 1)
        for q, rows in rankings.items()
        for i, r in enumerate(rows)
    ]
    results = spark.createDataFrame(res_rows, "query_id string, id long, rank long")
    exp_rows = [(q, pinned["ids"]) for q, pinned in golden["rankings"].items()]
    expectations = spark.createDataFrame(exp_rows, "query_id string, expected_ids array<long>")
    got = {
        r.query_id: r
        for r in ir_metrics_df(results, expectations, k=golden["k"]).collect()
    }
    assert set(got) == set(golden["rankings"])
    eps = 1e-9  # float-sum DCG/IDCG roundoff
    for q, m in got.items():
        assert m.ndcg_at_k >= golden["min_ndcg"] - eps, q
        assert m.recall_at_k >= golden["min_ndcg"] - eps, q
        assert m.mrr == 1.0, q


def test_distractor_guardrail(spark, golden, rankings):
    """lab_metrics.py:40-56 distractor rate: archived and MetaPattern rows
    are labelled never-relevant (every search path must drop them) — a
    nonzero distractor@k means pool filtering regressed."""
    from automem_spark.functions.ir_metrics import distractor_rate_at_k
    from automem_spark.sources.tables import memories_view

    distractors = {
        r.id
        for r in memories_view(spark, golden["sf_dir"])
        .filter(F.col("archived") | (F.col("type") == "MetaPattern"))
        .select("id")
        .collect()
    }
    assert distractors  # fixture plants them
    for q, rows in rankings.items():
        got = [int(r.id) for r in rows]
        assert distractor_rate_at_k(got, distractors, golden["k"]) == 0.0, q
