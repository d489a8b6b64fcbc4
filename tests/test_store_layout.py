"""Physical store layouts: bucketed co-located joins and time-partitioned
event scans (automem_spark/sources/store_layout.py).

These are PLAN-SHAPE tests in the test_plan_scale.py tradition: the claim
is not that the query returns the right rows (it does — asserted too) but
that the layout changes the physical plan the way the 100 TB argument
says: bucketed join -> no exchange on either side; time filter on the
partitioned layout -> partition pruning at planning time."""

import pytest
from pyspark.sql import functions as F

from automem_spark.sources.store_layout import (
    read_table,
    read_time_partitioned,
    write_bucketed,
    write_time_partitioned,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def mem_edges(spark, sf_dir):
    mem = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("id"), "text", "source"
    )
    edges = mem.select(
        F.col("id").alias("src"),
        ((F.col("id") * 7 + 3) % 500).alias("dst"),
    )
    return mem, edges


def test_bucketed_join_elides_both_exchanges(spark, mem_edges):
    mem, edges = mem_edges
    write_bucketed(mem, "t_mem_b", "id", n_buckets=8)
    write_bucketed(
        edges.select(F.col("dst").alias("id"), "src"), "t_edges_b", "id",
        n_buckets=8,
    )
    # at corpus scale neither side broadcasts — disable the broadcast path
    # so the plan claim under test is the SortMergeJoin-over-buckets one
    # (with broadcast on, the planner rightly broadcasts this small fixture
    # and disables bucketing entirely)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, "t_mem_b").join(
            read_table(spark, "t_edges_b").withColumnRenamed("src", "edge_src"),
            "id",
        )
        plan = _plan(joined)
        # co-located: the bucket files ARE the shuffle output — no exchange
        # at query time on either side
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        # and the answer is still the join's answer
        expect = mem.join(
            edges.select(F.col("dst").alias("id"), F.col("src").alias("edge_src")),
            "id",
        )
        assert joined.count() == expect.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_same_join_shuffles(spark, mem_edges):
    """Control: the identical join over plain frames needs exchanges (with
    broadcast disabled, as at corpus scale where neither side fits)."""
    mem, edges = mem_edges
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = mem.join(
            edges.select(F.col("dst").alias("id"), F.col("src").alias("edge_src")),
            "id",
        )
        assert "Exchange" in _plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_time_partitioned_scan_prunes(spark, sf_dir, tmp_path_factory):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    # pick the filter date FROM the fixture so the row-truth comparison is
    # over a non-empty partition (a hardcoded out-of-range date made both
    # sides 0 and the check vacuous — r6 advice)
    probe_date = str(events.select(F.to_date("ts").alias("d")).groupBy("d")
                     .count().orderBy(F.desc("count")).first()["d"])
    path = str(tmp_path_factory.mktemp("events_layout") / "by_day")
    write_time_partitioned(events, path, ts_col="ts", granularity="day")
    back = read_time_partitioned(spark, path)
    one_day = back.filter(F.col("p_date") == probe_date)
    plan = _plan(one_day)
    # the p_date predicate must be a PartitionFilter (directory pruning),
    # never a post-scan Filter over row data
    assert "PartitionFilters" in plan
    assert "p_date" in plan.split("PartitionFilters")[1].split("]")[0]
    # row-level truth preserved, and the partition actually holds rows
    expect = events.filter(F.to_date("ts") == probe_date).count()
    assert expect > 0
    assert one_day.count() == expect
    # full-table row conservation through the layout
    assert back.count() == events.count()


def test_month_granularity_roundtrip(spark, sf_dir, tmp_path_factory):
    events = spark.read.parquet(f"{sf_dir}/events.parquet").limit(500)
    first = events.select(F.year("ts").alias("y"), F.month("ts").alias("m")).first()
    probe_year, probe_month = first["y"], first["m"]
    path = str(tmp_path_factory.mktemp("events_layout") / "by_month")
    write_time_partitioned(events, path, ts_col="ts", granularity="month")
    back = read_time_partitioned(spark, path)
    assert back.count() == 500
    got = back.filter(
        (F.col("p_year") == probe_year) & (F.col("p_month") == probe_month)
    ).count()
    expect = events.filter(
        (F.year("ts") == probe_year) & (F.month("ts") == probe_month)
    ).count()
    assert expect > 0
    assert got == expect


def test_external_path_bucketed_join_also_colocated(spark, mem_edges,
                                                    tmp_path_factory):
    """The external-table variant (explicit path, no warehouse dependency —
    what the driver row uses) must keep the same co-located plan."""
    mem, edges = mem_edges
    base = tmp_path_factory.mktemp("bucketed_ext")
    write_bucketed(mem, "t_mem_ext", "id", n_buckets=8,
                   path=str(base / "mem"))
    write_bucketed(
        edges.select(F.col("dst").alias("id"), "src"), "t_edges_ext", "id",
        n_buckets=8, path=str(base / "edges"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, "t_mem_ext").join(
            read_table(spark, "t_edges_ext").withColumnRenamed("src", "e"),
            "id",
        )
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
