"""Sessionization (operators/sessionize.py): gap semantics, determinism,
batch/streaming equivalence, and the one-shuffle plan claim."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from automem_spark.operators.sessionize import (
    session_stats,
    sessionize,
    streaming_session_stats,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_gap_semantics_hand_fixture(spark):
    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        # user 1: two sessions split by a 45-min gap
        (1, 1, base),
        (2, 1, base + dt.timedelta(minutes=10)),
        (3, 1, base + dt.timedelta(minutes=55)),
        (4, 1, base + dt.timedelta(minutes=60)),
        # user 2: one session, events exactly at the 30-min boundary stay
        (5, 2, base),
        (6, 2, base + dt.timedelta(minutes=30)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {r["event_id"]: r["session_idx"]
           for r in sessionize(df, gap_minutes=30).collect()}
    assert out[1] == 0 and out[2] == 0
    assert out[3] == 1 and out[4] == 1  # 45 min > gap -> new session
    assert out[5] == 0 and out[6] == 0  # exactly gap is NOT a break (>)


def test_session_invariants_on_corpus(events):
    """Within a session consecutive gaps are <= gap; across consecutive
    sessions the boundary gap is > gap; indexes are dense from 0."""
    gap = 30
    rows = (
        sessionize(events.limit(5000), gap_minutes=gap)
        .select("user_id", "event_id",
                F.col("ts").cast("timestamp").cast("long").alias("t"),
                "session_idx")
        .collect()
    )
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user_rows in by_user.values():
        user_rows.sort(key=lambda r: (r["t"], r["event_id"]))
        prev = None
        for r in user_rows:
            if prev is not None:
                if r["session_idx"] == prev["session_idx"]:
                    assert r["t"] - prev["t"] <= gap * 60
                else:
                    assert r["session_idx"] == prev["session_idx"] + 1
                    assert r["t"] - prev["t"] > gap * 60
            else:
                assert r["session_idx"] == 0
            prev = r


def test_stats_consistent_with_assignment(events):
    sub = events.limit(2000)
    stats = session_stats(sub, gap_minutes=30)
    total = stats.agg(F.sum("n_events")).collect()[0][0]
    assert total == sub.count()
    bad = stats.filter(
        (F.col("duration_sec") < 0)
        | (F.col("end_epoch") < F.col("start_epoch"))
        | (F.col("n_events") <= 0)
    ).count()
    assert bad == 0


def test_streaming_matches_batch_boundaries(spark, sf_dir, tmp_path):
    """With all data present (availableNow, no late arrivals) the native
    session_window must find exactly the batch construction's sessions:
    same (user, start, end, n_events) set."""
    src = str(tmp_path / "ev")
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("user_id") < 20)
    )
    batch.select("event_id", "user_id", "ts", "event_type").write.parquet(src)

    stream = spark.readStream.schema(
        "event_id bigint, user_id bigint, ts timestamp, event_type string"
    ).parquet(src)
    out = []
    q = (
        streaming_session_stats(stream, gap_minutes=30)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: out.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {(r["user_id"], r["start_epoch"], r["end_epoch"], r["n_events"])
           for r in out}
    expect = {
        (r["user_id"], r["start_epoch"], r["end_epoch"], r["n_events"])
        for r in session_stats(batch, gap_minutes=30).collect()
    }
    # append mode only emits CLOSED sessions: the final watermark sits
    # 1 hour behind the max event time, so sessions still inside that
    # horizon (end + gap > watermark) are correctly withheld. Equality
    # holds on the closed subset; the stream must never invent a session.
    assert got <= expect
    max_ts = max(e[2] for e in expect)
    horizon = max_ts - 3600 - 30 * 60
    closed = {e for e in expect if e[2] <= horizon}
    assert closed <= got
    assert len(expect - got) <= len(expect) - len(closed)


def test_single_shuffle_plan(events):
    plan = (
        sessionize(events, gap_minutes=30)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # lag + running sum share partitioning and ordering: ONE exchange
    assert plan.count("Exchange") == 1, plan
