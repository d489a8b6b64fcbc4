"""Plan-shape assertions: scale anti-pattern guards.

The correctness gate proves the VALUES right at small SF; these tests pin
the PLAN shapes that keep the same code alive at 100 TB:

- no BroadcastExchange whose subtree scans a corpus parquet file directly
  (a corpus-wide broadcast exceeds the broadcast limit on a real cluster);
  a corpus scan under a broadcast is only legal when a LeftSemi join against
  a bounded id set sits between the scan and the exchange (the broadcast
  then carries only the bounded semi-join output).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from automem_spark.operators.recall import RecallRequest, recall_full
from automem_spark.operators.state import current_state_filter
from automem_spark.sources.graph_fixture import edges_view
from automem_spark.sources.tables import memories_view


def _physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _broadcast_subtrees(plan: str) -> list[str]:
    """Split the indented physical-plan text into the subtree under each
    BroadcastExchange node (tree glyphs +- : | define depth)."""
    lines = plan.splitlines()

    def depth(line: str) -> int:
        m = re.match(r"^[\s:+|-]*", line)
        return len(m.group(0)) if m else 0

    out = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        d = depth(line)
        sub = [line]
        for nxt in lines[i + 1 :]:
            if not nxt.strip() or depth(nxt) <= d:
                break
            sub.append(nxt)
        out.append("\n".join(sub))
    return out


def assert_no_corpus_broadcast(df: DataFrame) -> None:
    plan = _physical_plan(df)
    subtrees = _broadcast_subtrees(plan)
    assert subtrees, "expected at least one broadcast in the plan"
    for sub in subtrees:
        if "Scan parquet" in sub or "FileScan" in sub:
            # a corpus scan may sit under a broadcast only when something
            # bounds it first: a LeftSemi id-pushdown or an explicit limit
            assert "LeftSemi" in sub or "Limit" in sub, (
                "BroadcastExchange over a raw corpus parquet scan "
                "(no LeftSemi/Limit bound):\n" + sub
            )


def test_recall_full_no_corpus_broadcast(spark, sf_dir):
    mem = memories_view(spark, sf_dir)
    edges = edges_view(spark, sf_dir)
    req = RecallRequest(query="database performance tuning", limit=20)
    out = recall_full(mem, edges, req, priority_tags=["lang:en"])
    assert_no_corpus_broadcast(out)


def test_current_state_filter_no_corpus_broadcast(spark, sf_dir):
    mem = memories_view(spark, sf_dir)
    edges = edges_view(spark, sf_dir)
    results = mem.limit(40).select(
        "id",
        F.lit("keyword").alias("match_type"),
        F.lit(0.5).alias("final_score"),
    )
    out = current_state_filter(results, mem, edges, now="2026-06-01 00:00:00")
    assert_no_corpus_broadcast(out)
