"""Single-scan keyword+metadata channel (r11): the fused path must be
bit-identical to keyword_channel ∪ metadata_channel for every query shape,
dispatch to the composed shape at local fixture sizes, and actually deliver
the one-scan plan it exists for (reference semantics: the R3 keyword search
runtime_recall_helpers.py:595-724 plus the R5 metadata sidecar
recall.py:2015-2040, executed as one corpus pass)."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from automem_spark.operators.metadata_search import metadata_channel
from automem_spark.operators.recall import (
    RECALL_FUSE_SCAN_MIN_ROWS,
    RecallRequest,
    _keyword_metadata_fused,
    base_filter,
    keyword_channel,
    recall,
)

META_FIELDS = ("source", "repo", "project", "tool", "provider", "model")

QUERIES = [
    "spark window merge fast",   # flagship: keywords + phrase, both channels hit
    "spark",                     # single token, metadata tool field hits
    "alpha duckdb en",           # project/tool/lang value tokens
    "zz qq absent tokens",       # keywords present, zero matches
]


def _pool(spark, sf_dir):
    return base_filter(E.memories_view(spark, sf_dir), RecallRequest())


def _fields(pool):
    return {f: F.col(f) for f in META_FIELDS if f in pool.columns}


@pytest.mark.parametrize("query", QUERIES)
def test_fused_bit_identical_to_composed_channels(spark, sf_dir, query):
    pool = _pool(spark, sf_dir)
    fields = _fields(pool)
    fused = _keyword_metadata_fused(pool, query, 10, fields)
    assert fused is not None
    composed = keyword_channel(pool, query, 10).unionByName(
        metadata_channel(pool, query, 10, fields)
    )
    cols = sorted(composed.columns)
    assert sorted(fused.columns) == cols
    a = sorted(map(tuple, composed.select(*cols).collect()))
    b = sorted(map(tuple, fused.select(*cols).collect()))
    assert a == b


def test_fused_end_to_end_recall_identical(spark, sf_dir):
    mem = E.memories_view(spark, sf_dir)
    req = RecallRequest(query=E.RECALL_QUERY, limit=10)
    out_cols = ["id", "match_type", "match_score", "final_score"]
    a = recall(mem, req, now=E.NOW, fuse_channels=False).select(*out_cols).collect()
    b = recall(mem, req, now=E.NOW, fuse_channels=True).select(*out_cols).collect()
    assert a == b and len(a) > 0


def test_fused_plan_is_one_scan_composed_is_two(spark, sf_dir):
    mem = E.memories_view(spark, sf_dir)
    req = RecallRequest(query=E.RECALL_QUERY, limit=10)
    one = recall(mem, req, now=E.NOW, fuse_channels=True)
    two = recall(mem, req, now=E.NOW, fuse_channels=False)
    assert one._jdf.queryExecution().executedPlan().toString().count("Scan parquet") == 1
    assert two._jdf.queryExecution().executedPlan().toString().count("Scan parquet") == 2


def test_dispatch_defaults_to_composed_below_crossover(spark, sf_dir):
    # local fixtures are orders of magnitude under the crossover: the
    # default dispatch must pick the two-scan shape (page-cache regime)
    mem = E.memories_view(spark, sf_dir)
    req = RecallRequest(query=E.RECALL_QUERY, limit=10)
    out = recall(mem, req, now=E.NOW)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 2
    assert RECALL_FUSE_SCAN_MIN_ROWS >= 1_000_000


def test_fused_degenerate_queries_fall_back(spark, sf_dir):
    pool = _pool(spark, sf_dir)
    fields = _fields(pool)
    # no keywords and no phrase (len < 3 after strip)
    assert _keyword_metadata_fused(pool, "xy", 10, fields) is None
    # arbitrary Column field values must use the tree-builder path
    weird = dict(fields)
    weird["source"] = F.upper(F.col("source"))
    assert _keyword_metadata_fused(pool, E.RECALL_QUERY, 10, weird) is None


def test_fused_rejects_colliding_staging_columns(spark, sf_dir):
    # a pool carrying a staging-column name falls back to the composed
    # two-scan path (None) instead of clobbering the user column — and the
    # user column survives recall() even when fusion is forced
    pool = _pool(spark, sf_dir).withColumn("_kw_raw", F.lit(1))
    assert _keyword_metadata_fused(pool, E.RECALL_QUERY, 10, _fields(pool)) is None
    mem = E.memories_view(spark, sf_dir).withColumn("_meta_sc", F.lit(7))
    out = recall(mem, RecallRequest(query=E.RECALL_QUERY, limit=10),
                 now=E.NOW, fuse_channels=True)
    rows = out.select("_meta_sc").collect()
    assert rows and all(r["_meta_sc"] == 7 for r in rows)


def test_fused_respects_metadata_slot_cap(spark, sf_dir):
    # metadata slots = min(limit, 10): with limit 25 the metadata channel
    # may contribute at most 10 rows; keyword up to 25
    pool = _pool(spark, sf_dir)
    fields = _fields(pool)
    fused = _keyword_metadata_fused(pool, "spark", 25, fields)
    assert fused is not None
    counts = {
        r["match_type"]: r["count"]
        for r in fused.groupBy("match_type").agg(F.count("*").alias("count")).collect()
    }
    assert counts.get("metadata", 0) <= 10
    assert counts.get("keyword", 0) <= 25


def test_driver_row_executes_the_fused_plan(spark):
    # the hybrid_recall_fused registry row exists to put the fused plan
    # under the driver oracle — but fused and composed are bit-identical,
    # so the oracle alone cannot notice a regression that silently flips
    # the row back to the two-scan shape. Pin the plan: one parquet scan,
    # per-channel WindowGroupLimit, both channels in the top-10.
    import __spark_entry__ as E

    df = E.q_hybrid_recall_fused(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "WindowGroupLimit" in plan
    types = {r["match_type"] for r in df.collect()}
    assert types == {"keyword", "metadata"}
