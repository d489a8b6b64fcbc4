"""Physical store layouts for the 100 TB path: bucketed tables that
co-locate join keys (hydration joins without shuffling the corpus) and
time-partitioned event layout (scans prune to the queried window at
planning time).

The reference's store is a row store reached over HTTP (automem/stores/
falkordb_store.py; api/memory.py store paths) — physical layout is the
database's problem. On Spark the layout IS the engine's join/scan
strategy, so this module makes the two layouts the reference's access
patterns imply first-class:

- Hydration/expansion joins (J1/J2/J8: memories x edges on id) shuffle
  BOTH sides on every query when the store is plain parquet. Writing both
  tables bucketed by the join key (same bucket count) lets SortMergeJoin
  read co-located buckets with NO exchange on either side — at 100 TB the
  difference between a per-query corpus shuffle and none.
- Event/browse scans (S11/F5: time-window filters) read every file under
  plain layout. Writing events partitioned by day turns the window filter
  into directory pruning (PartitionFilters), resolved before any row IO.

Bucketing uses the session catalog's managed tables (spark-warehouse/ —
Spark cannot express bucket metadata on bare parquet paths); partitioned
layout is plain directory-partitioned parquet, readable by any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    path: str | None = None,
) -> str:
    """Persist `df` as a managed table bucketed AND sorted by `bucket_col`.

    Joins between two tables bucketed on the same column with the same
    bucket count skip the exchange on both sides (the bucket files are the
    shuffle output, paid once at write time); the sortBy lets the
    SortMergeJoin skip its per-task sort too. Plan shape pinned in
    tests/test_store_layout.py.

    Idempotent: drops the catalog entry AND any orphaned table directory a
    previous session left behind (the in-memory catalog dies with the
    session, the directory does not — Spark refuses to recreate over it
    with LOCATION_ALREADY_EXISTS).

    `path` makes it an EXTERNAL bucketed table at that location instead of
    a managed table under spark.sql.warehouse.dir — use when the session's
    warehouse (defaults to ./spark-warehouse) may not be writable.
    """
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if path is not None:
        shutil.rmtree(path, ignore_errors=True)
    else:
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        if wh:
            shutil.rmtree(f"{wh}/{table.lower()}", ignore_errors=True)
    writer = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return table


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    granularity: str = "day",
) -> str:
    """Persist `df` as parquet partitioned by the date of `ts_col`
    (day granularity) or by (year, month). A time-window filter on the
    read side prunes partitions at planning time — the hypertable layout
    for the events stream, in plain parquet any engine can read."""
    if granularity == "day":
        out = df.withColumn("p_date", F.to_date(F.col(ts_col)))
        cols = ["p_date"]
    elif granularity == "month":
        out = (
            df.withColumn("p_year", F.year(ts_col))
            .withColumn("p_month", F.month(ts_col))
        )
        cols = ["p_year", "p_month"]
    else:
        raise ValueError(f"unknown granularity: {granularity}")
    out.write.mode("overwrite").partitionBy(*cols).parquet(path)
    return path


def read_time_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
