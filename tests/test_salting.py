"""Salted two-phase aggregation (plans/salting.py): result-identity with
the plain aggregation for any salt count, plan shape (two aggregations,
salted first), and the avg decomposition."""

import pytest
from pyspark.sql import functions as F

from automem_spark.plans.salting import salted_agg


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    # 5 event types over the whole stream: the canonical hot-key shape
    return spark.read.parquet(f"{sf_dir}/events.parquet")


SPECS = [
    ("event_id", "count", "n"),
    ("value", "sum", "total"),
    ("value", "min", "lo"),
    ("value", "max", "hi"),
]


def _collect(df):
    return {
        r["event_type"]: (r["n"], round(r["total"], 6), r["lo"], r["hi"])
        for r in df.collect()
    }


def test_salted_equals_plain(events):
    plain = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("total"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    salted = salted_agg(events, ["event_type"], SPECS, n_salts=32,
                        salt_on="event_id")
    a, b = _collect(plain), _collect(salted)
    assert a.keys() == b.keys()
    for k in a:
        na, ta, la, ha = a[k]
        nb, tb, lb, hb = b[k]
        assert na == nb and la == lb and ha == hb
        assert abs(ta - tb) < 1e-6  # float sum: same values, other order


def test_salt_count_does_not_change_result(events):
    r4 = _collect(salted_agg(events, ["event_type"], SPECS, n_salts=4,
                             salt_on="event_id"))
    r64 = _collect(salted_agg(events, ["event_type"], SPECS, n_salts=64,
                              salt_on="event_id"))
    assert r4.keys() == r64.keys()
    for k in r4:
        assert r4[k][0] == r64[k][0]
        assert abs(r4[k][1] - r64[k][1]) < 1e-6
        assert r4[k][2:] == r64[k][2:]


def test_partition_salt_fallback(events):
    """Without a salt column the partition id salts; result identical."""
    plain = {r["event_type"]: r["n"] for r in events.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r["event_type"]: r["n"] for r in
              salted_agg(events, ["event_type"],
                         [("event_id", "count", "n")], n_salts=8).collect()}
    assert plain == salted


def test_count_skips_nulls_count_rows_does_not(spark):
    """'count' matches SQL count(col) (null-skipping, like the avg
    decomposition); 'count_rows' is count(*) — r6 advice pinned."""
    rows = [("a", 1.0), ("a", None), ("a", 2.0), ("b", None)]
    df = spark.createDataFrame(rows, "k string, v double").withColumn(
        "rid", F.monotonically_increasing_id()
    )
    out = {
        r["k"]: (r["nv"], r["nr"])
        for r in salted_agg(
            df, ["k"], [("v", "count", "nv"), ("v", "count_rows", "nr")],
            n_salts=3, salt_on="rid",
        ).collect()
    }
    assert out == {"a": (2, 3), "b": (0, 1)}


def test_avg_decomposes_row_weighted(spark):
    """avg must be sum/count over ROWS, not an average of salt-bucket
    averages (buckets have unequal sizes)."""
    rows = [(("hot", float(i)) if i < 90 else ("cold", float(i)))
            for i in range(100)]
    df = spark.createDataFrame(rows, "k string, v double").withColumn(
        "rid", F.monotonically_increasing_id()
    )
    out = {r["k"]: r["m"] for r in
           salted_agg(df, ["k"], [("v", "avg", "m")], n_salts=7,
                      salt_on="rid").collect()}
    expect = {r["k"]: r["m"] for r in
              df.groupBy("k").agg(F.avg("v").alias("m")).collect()}
    for k in expect:
        assert abs(out[k] - expect[k]) < 1e-9


def test_plan_is_two_phase(events):
    plan = (
        salted_agg(events, ["event_type"], SPECS, n_salts=32,
                   salt_on="event_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    # first aggregation keyed on (event_type, salt-expression), second on
    # event_type alone (the salt alias is rewritten to _groupingexpression
    # in the physical plan — match the structure, not the name)
    assert "pmod(xxhash64" in plan
    assert re.search(
        r"hashpartitioning\(event_type#\d+, _groupingexpression", plan
    ), plan
    assert plan.count("HashAggregate") >= 4  # partial+final per phase


def test_aqe_splits_skewed_join(spark):
    """Salting covers skewed AGGREGATIONS; skewed JOINS are delegated to
    AQE (session.py enables spark.sql.adaptive.skewJoin). Prove the
    delegation actually engages: a join with one hot key must show
    SortMergeJoin(skew=true) in the FINAL adaptive plan (read from the
    same executed QueryExecution — a separate count() plans a different
    query and never finalizes this one)."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        big = spark.range(0, 200_000).select(
            F.when(F.col("id") < 190_000, F.lit(0))
            .otherwise(F.col("id") % 100 + 1).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 101).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = big.join(right, "k").select(F.sum("v").alias("s"))
        [row] = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        # and the answer survives the split
        expect = big.join(right, "k").groupBy().sum("v").collect()[0][0]
        assert row["s"] == expect
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
