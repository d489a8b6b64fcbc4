"""Deterministic LoCoMo-mini analog: SURVEY §5's end-to-end QA-accuracy
benchmark layer (reference: tests/benchmarks/test_locomo.py — ingest
conversation sessions, answer each question via recall, score the answer by
word overlap, pin a committed per-question baseline like
benchmarks/baselines/locomo-mini_baseline.json).

Differences from the reference harness, by design:
- fully offline + deterministic: a hand-built conversation corpus with
  planted facts, distractors, a supersession chain, and an unanswerable
  question — no LLM judge (the reference's category-5 judge is opt-in too);
- scoring is exact token containment over the top-k contents (the
  deterministic core of the reference's word-overlap scorer) instead of
  fuzzy F1 — every verdict is reproducible bit-for-bit;
- answers come from `recall_full`, the complete §3.1 composition (keyword
  channel → hybrid score → dedup → expansions → current-state filter +
  supersession head injection → recency re-rank → adaptive floor), so the
  harness grades the composed read path, not a single channel.

Question categories mirror the reference's taxonomy: single-hop fact,
preference, temporal fact, decision, multi-session current-state (the
supersession case — answering from the OLD memory is wrong), and
adversarial-unanswerable (correct answer = empty result set).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automem_spark.operators.enrichment import classify_memory_expr
from automem_spark.operators.recall import RecallRequest, recall_full

NOW = "2026-06-01 00:00:00"
TOP_K = 3

# (id, content, tags, timestamp, importance, confidence)
MEMORIES: list[tuple] = [
    # -- Alice: city supersession chain (1 -> 3 via EVOLVED_INTO) ----------
    (1, "Alice mentioned she moved to Berlin for the new platform role.",
     ["entity:people:alice", "context:work"], dt.datetime(2025, 3, 5), 0.7, 0.9),
    (2, "Alice said the Berlin museum district is her favorite weekend spot.",
     ["entity:people:alice", "context:leisure"], dt.datetime(2025, 4, 12), 0.5, 0.8),
    (3, "Alice announced she relocated to Munich after the reorg.",
     ["entity:people:alice", "context:work"], dt.datetime(2026, 5, 2), 0.8, 0.9),
    # -- Bob: preferences ---------------------------------------------------
    (4, "Bob prefers tea over coffee in the mornings.",
     ["entity:people:bob"], dt.datetime(2025, 6, 1), 0.6, 0.9),
    (5, "Bob's favorite editor is vim and he maps caps lock to escape.",
     ["entity:people:bob", "context:tools"], dt.datetime(2025, 7, 9), 0.6, 0.9),
    # -- Atlas project ------------------------------------------------------
    (6, "The Atlas project deadline is June 15, 2026 per the steering call.",
     ["entity:project:atlas", "context:planning"], dt.datetime(2026, 2, 20), 0.9, 0.9),
    (7, "Atlas project kickoff happened back in January with the full team.",
     ["entity:project:atlas"], dt.datetime(2026, 1, 8), 0.5, 0.8),
    (8, "We decided to use PostgreSQL for the Atlas backend storage layer.",
     ["entity:project:atlas", "context:architecture"], dt.datetime(2026, 3, 1), 0.9, 0.95),
    # -- Carol --------------------------------------------------------------
    (9, "Carol's dog is named Biscuit and steals socks.",
     ["entity:people:carol"], dt.datetime(2025, 9, 14), 0.4, 0.9),
    # -- Operational habits -------------------------------------------------
    (10, "Deployment to staging runs every Friday at noon.",
     ["context:ops"], dt.datetime(2025, 11, 3), 0.6, 0.9),
    # -- Distractor noise (shared vocabulary, wrong answers) ----------------
    (11, "The coffee machine on floor two is broken again.",
     ["context:office"], dt.datetime(2026, 4, 2), 0.3, 0.7),
    (12, "Berlin trip photos were shared in the team channel.",
     ["context:leisure"], dt.datetime(2025, 5, 20), 0.3, 0.7),
    (13, "The museum exhibit about databases was surprisingly popular.",
     ["context:leisure"], dt.datetime(2025, 8, 2), 0.3, 0.7),
    (14, "Editor wars aside, the linter config is finally stable.",
     ["context:tools"], dt.datetime(2026, 1, 25), 0.4, 0.8),
    (15, "Friday retro moved to the big meeting room.",
     ["context:ops"], dt.datetime(2026, 2, 5), 0.4, 0.8),
    (16, "A stray dog followed Carol home from the park once.",
     ["entity:people:carol"], dt.datetime(2025, 10, 1), 0.3, 0.7),
]

# (src, dst, rel_type, updated_at_epoch) — old memory EVOLVED_INTO new one
EDGES: list[tuple] = [
    (1, 3, "EVOLVED_INTO", 1_775_000_000),
]

# Question set. `expect_tokens`: every token must appear in the concatenated
# top-k contents (lowercased). `forbid_top_id`: answering FROM that memory
# id in position 1 is wrong (supersession). `expect_empty`: the correct
# answer is no results (adversarial/unanswerable).
QUESTIONS: list[dict] = [
    {"qid": "bob_editor", "category": "single_hop",
     "query": "what is bob's favorite editor", "expect_tokens": ["vim"]},
    {"qid": "carol_dog", "category": "single_hop",
     "query": "what is carol's dog named", "expect_tokens": ["biscuit"]},
    {"qid": "bob_morning", "category": "preference",
     "query": "does bob prefer tea or coffee in the mornings",
     "expect_tokens": ["tea"]},
    {"qid": "atlas_deadline", "category": "temporal",
     "query": "when is the atlas project deadline",
     "expect_tokens": ["june", "15"]},
    {"qid": "atlas_db", "category": "decision",
     "query": "which database did we decide to use for atlas",
     "expect_tokens": ["postgresql"]},
    {"qid": "alice_city", "category": "current_state",
     "query": "where does alice live",
     "expect_tokens": ["munich"], "forbid_top_id": 1},
    {"qid": "deploy_cadence", "category": "habit",
     "query": "when does the staging deployment run",
     "expect_tokens": ["friday", "noon"]},
    {"qid": "wifi", "category": "adversarial",
     "query": "what is the wifi password", "expect_empty": True},
    # LongMemEval-style temporal scoping: the same fact universe, but the
    # question narrows to a session window (F5 pushes into the scan)
    {"qid": "bob_2025", "category": "temporal_scoped",
     "query": "bob tea mornings",
     "start": "2025-01-01 00:00:00", "end": "2025-12-31 00:00:00",
     "expect_tokens": ["tea"]},
    # knowledge-update at the other end: scoped to 2026, Alice's city answer
    # must be Munich (the only in-window city memory IS the head)
    {"qid": "alice_2026", "category": "temporal_scoped",
     "query": "where does alice live",
     "start": "2026-01-01 00:00:00", "end": "2026-12-31 00:00:00",
     "expect_tokens": ["munich"], "forbid_top_id": 1},
    # time-browse: no relevance signal + a window -> implicit time_desc
    # chronology (W3); the newest in-window memory leads
    {"qid": "browse_early_2026", "category": "time_browse",
     "query": "",
     "start": "2026-01-01 00:00:00", "end": "2026-03-01 00:00:00",
     "expect_tokens": ["deadline"]},
    # multi-entity question through the R8-R11 auto-decompose path: the
    # composite query fans into entity/topic sub-queries run as one
    # multi-recall job; the union must surface facts about BOTH entities
    {"qid": "alice_and_atlas", "category": "multi_query", "mode": "decompose",
     "query": "tell me about Alice and the Atlas project",
     "expect_tokens": ["munich", "deadline", "postgresql"]},
]


def build_corpus(spark: SparkSession) -> DataFrame:
    """Conversation rows → memory schema: the type column is DERIVED by the
    tier-1 classifier (U3) rather than hand-labeled, so the harness also
    exercises enrichment on the read path's input."""
    df = spark.createDataFrame(
        MEMORIES,
        "id bigint, content string, tags array<string>, timestamp timestamp,"
        " importance double, confidence double",
    )
    return df.select(
        "*",
        classify_memory_expr(F.col("content"))["type"].alias("type"),
        F.lit(False).alias("archived"),
        F.lit(None).cast("timestamp").alias("t_valid"),
        F.lit(None).cast("timestamp").alias("t_invalid"),
        F.lit("{}").alias("metadata"),
    )


def build_edges(spark: SparkSession) -> DataFrame:
    df = spark.createDataFrame(
        EDGES, "src bigint, dst bigint, rel_type string, updated_at_epoch bigint"
    )
    return df.select(
        "src", "dst", "rel_type",
        F.lit(None).cast("double").alias("strength"),
        F.lit(None).cast("double").alias("score"),
        F.lit(None).cast("double").alias("confidence"),
        F.lit(None).cast("double").alias("similarity"),
        F.lit(None).cast("bigint").alias("cnt"),
        F.lit(None).cast("string").alias("kind"),
        F.lit(None).cast("string").alias("origin"),
        "updated_at_epoch",
    )


def answer(memories: DataFrame, edges: DataFrame, question: dict) -> list:
    req = RecallRequest(
        query=question["query"],
        limit=TOP_K,
        start=question.get("start"),
        end=question.get("end"),
    )
    out = recall_full(memories, edges, req, now=NOW)
    return [int(r.id) for r in out.orderBy("position").collect()]


def score(question: dict, top_ids: list[int]) -> dict:
    """Deterministic word-overlap verdict + the evidence for the baseline."""
    if question.get("expect_empty"):
        return {"correct": len(top_ids) == 0, "top_ids": top_ids}
    content_by_id = {m[0]: m[1] for m in MEMORIES}
    text = " ".join(content_by_id.get(i, "").lower() for i in top_ids)
    ok = all(tok in text for tok in question["expect_tokens"])
    if "forbid_top_id" in question and top_ids and top_ids[0] == question["forbid_top_id"]:
        ok = False
    return {"correct": ok, "top_ids": top_ids}


def answer_decomposed(memories: DataFrame, question: dict) -> list[int]:
    """R8-R11 path: auto-decompose the question into entity/topic
    sub-queries and run them as ONE multi-recall job (the reference's
    auto_decompose + queries_to_run loop, recall.py:2151-2223). Evidence =
    per-sub-query top ids, deduplicated in (query, rank) order."""
    from automem_spark.operators.decompose import decompose_query
    from automem_spark.operators.recall import recall_many

    subs = decompose_query(question["query"])
    pairs = [(f"q{i:02d}", s) for i, s in enumerate(subs)]
    rows = (
        recall_many(memories, pairs, limit=TOP_K, now=NOW)
        .orderBy("query_id", "rank")
        .collect()
    )
    seen: list[int] = []
    for r in rows:
        if int(r.id) not in seen:
            seen.append(int(r.id))
    return seen


def run_all(spark: SparkSession) -> dict:
    memories = build_corpus(spark)
    edges = build_edges(spark)
    per_q = {}
    for q in QUESTIONS:
        if q.get("mode") == "decompose":
            ids = answer_decomposed(memories, q)
        else:
            ids = answer(memories, edges, q)
        per_q[q["qid"]] = {"category": q["category"], **score(q, ids)}
    n = len(per_q)
    acc = sum(1 for v in per_q.values() if v["correct"]) / n
    return {"accuracy": round(acc, 6), "n_questions": n, "per_question": per_q}
