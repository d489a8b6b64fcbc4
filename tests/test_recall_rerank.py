"""Adaptive floor (F10) + recency re-rank (W5) vs a direct port of the
reference's Python loops (recall.py:2315-2375)."""

import pytest
from pyspark.sql import functions as F

from automem_spark.operators.recall import adaptive_score_floor, recency_rerank


def ref_adaptive_floor(scores: list[float]) -> list[float]:
    """Direct port of recall.py:2355-2375 over a bare score list."""
    results = list(scores)
    if len(results) <= 3:
        return results
    s = sorted(results, reverse=True)
    max_gap, gap_idx = 0.0, -1
    halfway = max(3, len(s) // 2)
    for i in range(1, halfway):
        gap = s[i - 1] - s[i]
        if gap > max_gap:
            max_gap, gap_idx = gap, i
    if max_gap > 0.25 * s[0] and gap_idx > 0:
        floor = s[gap_idx]
        filtered = [x for x in results if x >= floor]
        if len(filtered) >= (len(results) + 1) // 2:
            return filtered
    return results


CASES = [
    [1.0, 0.95, 0.9, 0.3, 0.28, 0.25],          # big gap at idx 3 -> cut
    [1.0, 0.9, 0.8, 0.7, 0.6, 0.5],             # smooth -> no cut
    [1.0, 0.2, 0.19, 0.18],                      # gap at idx 1 but too few survive
    [0.5, 0.5, 0.5, 0.5, 0.5],                   # ties -> no gap
    [1.0, 0.95],                                 # n <= 3 -> untouched
    [1.0, 0.7, 0.69, 0.68, 0.67, 0.2, 0.1, 0.05],
    [0.9, 0.6, 0.55, 0.54, 0.53, 0.52],          # gap at idx 1, survivors >= half
]


@pytest.mark.parametrize("scores", CASES)
def test_adaptive_floor_matches_reference(spark, scores):
    df = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(scores)], "id int, final_score double"
    )
    got = sorted(r.final_score for r in adaptive_score_floor(df).collect())
    expected = sorted(ref_adaptive_floor(scores))
    assert got == pytest.approx(expected)


def test_recency_rerank_minmax(spark):
    rows = [
        (1, 0.5, "2026-01-01 00:00:00"),
        (2, 0.5, "2026-01-11 00:00:00"),
        (3, 0.5, "2026-01-21 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "id int, final_score double, ts string").withColumn(
        "timestamp", F.col("ts").cast("timestamp")
    )
    got = {r.id: r.final_score for r in recency_rerank(df).collect()}
    assert got[1] == pytest.approx(0.5)       # oldest -> +0
    assert got[2] == pytest.approx(0.55)      # middle -> +0.05
    assert got[3] == pytest.approx(0.6)       # newest -> +0.1


def test_recency_rerank_single_row_no_div_zero(spark):
    df = spark.createDataFrame(
        [(1, 0.4, "2026-01-01 00:00:00")], "id int, final_score double, ts string"
    ).withColumn("timestamp", F.col("ts").cast("timestamp"))
    got = recency_rerank(df).collect()
    assert got[0].final_score == pytest.approx(0.4)


def test_recall_many_hybrid_equals_n_single_recalls(spark, sf_dir):
    """R10/R11 contract: the one-pass multi-query fan-out must return, per
    query, exactly what N independent single-query recall() calls return
    (same ids, channels, scores at 5dp) — the LoCoMo harness shape."""
    import __spark_entry__ as entry
    from automem_spark.operators.recall import RecallRequest, recall

    multi = {
        (r.query_id, r.id): (r.match_type, r.match_score, r.final_score)
        for r in entry.q_multi_recall_hybrid(spark, sf_dir).collect()
    }
    mem = entry.memories_view(spark, sf_dir)
    emb = entry._t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), "embedding"
    )
    corpus = mem.join(emb.hint("merge"), "id")
    for qid, text in entry.MULTI_HYBRID_QUERIES:
        vid = entry.MULTI_HYBRID_VECTOR_IDS.get(qid)
        qv = entry._query_embedding(spark, sf_dir, vid) if vid is not None else None
        single = recall(
            corpus,
            RecallRequest(query=text, limit=entry.MULTI_HYBRID_LIMIT),
            query_vector=qv,
            now=entry.NOW,
        ).select("id", "match_type", "match_score", "final_score").collect()
        got = {(q, i) for (q, i) in multi if q == qid}
        want = {(qid, r.id) for r in single}
        assert got == want, f"{qid}: id sets differ: {got ^ want}"
        for r in single:
            mt, ms, fs = multi[(qid, r.id)]
            assert mt == r.match_type, (qid, r.id, mt, r.match_type)
            assert ms == pytest.approx(round(r.match_score, 5), abs=2e-5)
            assert fs == pytest.approx(round(r.final_score, 5), abs=2e-5)


def test_context_tag_separator_cross_match(spark):
    """Reference #97 bug C (tests/test_context_tag_separator.py): the
    context-tag boost must treat 'project:foo' and 'project/foo' as the
    same tag — both the stored tag and the priority tag canonicalize
    [:/] -> ':' before matching, in either direction."""
    from pyspark.sql import functions as F

    from automem_spark.functions.scoring import context_bonus_expr

    df = spark.createDataFrame(
        [(1, ["project/foo"]), (2, ["project:foo"]), (3, ["project:bar"])],
        "id bigint, tags array<string>",
    )

    def bonus(priority):
        return {
            r.id: r.b
            for r in df.select(
                "id",
                context_bonus_expr(
                    tags=F.col("tags"),
                    mem_type=F.lit(None).cast("string"),
                    mem_id=F.col("id"),
                    priority_tags=[priority],
                ).alias("b"),
            ).collect()
        }

    colon = bonus("project:foo")
    slash = bonus("project/foo")
    assert colon[1] > 0 and colon[2] > 0  # slash-stored matches colon priority
    assert slash[1] > 0 and slash[2] > 0  # and vice versa
    assert colon[3] == 0.0 and slash[3] == 0.0
