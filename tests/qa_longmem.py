"""Deterministic LongMemEval-mini analog: the reference's SECOND QA harness
(tests/benchmarks/longmemeval/test_longmemeval.py + evaluator.py — ~40
conversation sessions, question categories single-session-user /
single-session-assistant / single-session-preference / multi-session /
knowledge-update / temporal-reasoning, plus `_abs` abstention questions,
and session-level retrieval metrics: answer_session_ids vs
retrieved_session_ids).

This mini version keeps the harness properties that matter and drops the
network/LLM parts, like tests/qa_harness.py does for LoCoMo:

- 15 dated conversation sessions, one memory per salient turn, each tagged
  `session:sNN` with the speaker in a `speaker:` tag and a session_id in
  the metadata sidecar (the reference's per-turn storage strategy,
  test_longmemeval.py:345-412);
- 31 questions across the reference's six categories plus abstention and
  session-SCOPED retrieval (the category the 12-question LoCoMo set
  couldn't exercise: the same fact universe must answer differently under
  a session tag filter);
- two knowledge-update chains (phone, bank) wired through EVOLVED_INTO
  edges so the current-state filter — not ranking luck — must suppress the
  outdated fact;
- scoring is exact token containment over top-k contents plus a
  session-recall check (every answer session must appear among the top-k
  result sessions — the reference's retrieved_session_ids metric made
  deterministic).

Verdicts are pinned per-question in tests/golden/longmem_baseline.json
(regenerate only via scripts/make_longmem_baseline.py).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automem_spark.operators.enrichment import classify_memory_expr
from automem_spark.operators.recall import RecallRequest, recall_full

NOW = "2026-06-01 00:00:00"
TOP_K = 3

# (id, session, speaker, content, extra_tags, timestamp, importance, confidence)
TURNS: list[tuple] = [
    # -- s01 2025-01-10: work + tooling -------------------------------------
    (101, "s01", "user", "I work as a data engineer at Meridian Labs.",
     ["context:work"], dt.datetime(2025, 1, 10), 0.8, 0.9),
    (102, "s01", "user", "My favorite programming language is Rust.",
     ["context:tools"], dt.datetime(2025, 1, 10), 0.7, 0.9),
    (103, "s01", "assistant", "Suggested the Polars library for the user's dataframe work.",
     ["context:tools"], dt.datetime(2025, 1, 10), 0.6, 0.85),
    # -- s02 2025-02-03: pets ------------------------------------------------
    (104, "s02", "user", "I adopted a cat named Clementine last weekend.",
     ["context:personal"], dt.datetime(2025, 2, 3), 0.7, 0.9),
    (105, "s02", "assistant", "Mentioned that citrus smells tend to keep cats away from plants.",
     ["context:personal"], dt.datetime(2025, 2, 3), 0.3, 0.7),
    # -- s03 2025-02-18: running ---------------------------------------------
    (106, "s03", "user", "I'm training for the Lisbon half marathon happening in October.",
     ["context:fitness"], dt.datetime(2025, 2, 18), 0.8, 0.9),
    (107, "s03", "assistant", "Recommended doing interval training on Tuesdays for the marathon prep.",
     ["context:fitness"], dt.datetime(2025, 2, 18), 0.6, 0.85),
    # -- s04 2025-03-07: travel preference (implicit) ------------------------
    (108, "s04", "user", "I always pick window seats on flights and I hate red-eyes.",
     ["context:travel"], dt.datetime(2025, 3, 7), 0.6, 0.9),
    (109, "s04", "user", "Booked the flight to the data conference for April.",
     ["context:travel"], dt.datetime(2025, 3, 7), 0.4, 0.8),
    # -- s05 2025-03-29: coffee ----------------------------------------------
    (110, "s05", "user", "My home espresso machine is a Gaggia Classic.",
     ["context:coffee"], dt.datetime(2025, 3, 29), 0.6, 0.9),
    (111, "s05", "assistant", "Suggested pulling espresso shots at a one to two brew ratio on the Gaggia.",
     ["context:coffee"], dt.datetime(2025, 3, 29), 0.5, 0.85),
    # -- s06 2025-04-15: ergonomics ------------------------------------------
    (112, "s06", "user", "I type on a Kinesis split keyboard since my wrist injury.",
     ["context:tools"], dt.datetime(2025, 4, 15), 0.6, 0.9),
    # -- s07 2025-05-12: phone v1 (knowledge-update chain A) -----------------
    (113, "s07", "user", "My phone is a Pixel 7.",
     ["context:devices"], dt.datetime(2025, 5, 12), 0.6, 0.9),
    # -- s08 2025-06-20: family + reading anchor -----------------------------
    (114, "s08", "user", "My sister Nora lives in Porto.",
     ["context:family"], dt.datetime(2025, 6, 20), 0.7, 0.9),
    (115, "s08", "user", "Started reading a long book about tidal energy systems.",
     ["context:reading"], dt.datetime(2025, 6, 20), 0.5, 0.85),
    # -- s09 2025-08-02: reading continuation (multi-session with s08) -------
    (116, "s09", "user", "Finished the tidal energy book and started building a small turbine model from it.",
     ["context:reading"], dt.datetime(2025, 8, 2), 0.6, 0.85),
    # -- s10 2025-09-17: bank v1 (knowledge-update chain B) ------------------
    (117, "s10", "user", "I bank with First Harbor Credit Union.",
     ["context:finance"], dt.datetime(2025, 9, 17), 0.6, 0.9),
    (118, "s10", "assistant", "Walked through setting up alerts for card transactions.",
     ["context:finance"], dt.datetime(2025, 9, 17), 0.4, 0.8),
    # -- s11 2025-11-05: phone v2 (supersedes 113) ---------------------------
    (119, "s11", "user", "Upgraded my phone to a Pixel 9 Pro this week.",
     ["context:devices"], dt.datetime(2025, 11, 5), 0.7, 0.9),
    # -- s12 2026-01-22: apartment -------------------------------------------
    (120, "s12", "user", "Signed the apartment lease on January 20, 2026 and I move in on February 1.",
     ["context:housing"], dt.datetime(2026, 1, 22), 0.9, 0.95),
    # -- s13 2026-03-09: bank v2 (supersedes 117) ----------------------------
    (121, "s13", "user", "Switched banks to Juniper Savings after the fee hike.",
     ["context:finance"], dt.datetime(2026, 3, 9), 0.8, 0.9),
    # -- s14 2026-04-28: standup preference ----------------------------------
    (122, "s14", "user", "I switched my standup to async updates in the team channel.",
     ["context:work"], dt.datetime(2026, 4, 28), 0.6, 0.9),
    (123, "s14", "assistant", "Noted the user prefers async standups over morning meetings.",
     ["context:work"], dt.datetime(2026, 4, 28), 0.5, 0.85),
    # -- s15 2026-05-15: recent distractors ----------------------------------
    (124, "s15", "user", "The office espresso machine broke again this morning.",
     ["context:office"], dt.datetime(2026, 5, 15), 0.3, 0.7),
    (125, "s15", "user", "Marathon coverage was on every screen in the lobby.",
     ["context:office"], dt.datetime(2026, 5, 15), 0.3, 0.7),
    (126, "s15", "user", "Someone left a keyboard catalog in the kitchen.",
     ["context:office"], dt.datetime(2026, 5, 15), 0.3, 0.7),
]

# (src, dst, rel_type, updated_at_epoch) — outdated fact EVOLVED_INTO update
EDGES: list[tuple] = [
    (113, 119, "EVOLVED_INTO", 1_762_300_000),  # phone: Pixel 7 -> Pixel 9 Pro
    (117, 121, "EVOLVED_INTO", 1_772_950_000),  # bank: First Harbor -> Juniper
]

SESSION_BY_ID = {t[0]: t[1] for t in TURNS}
CONTENT_BY_ID = {t[0]: t[3] for t in TURNS}

# Question fields: `expect_tokens` (all must appear in concatenated top-k
# contents, lowercased), `expect_empty` (abstention: correct = no results),
# `forbid_top_id` (knowledge-update: answering FROM the outdated memory at
# rank 1 is wrong), `answer_sessions` (session-recall: each must appear in
# the top-k results' sessions), `scope_tags` (session-scoped retrieval:
# passed as the RecallRequest tag filter), `start`/`end` (temporal scope).
QUESTIONS: list[dict] = [
    # -- single-session-user (6) --------------------------------------------
    {"qid": "employer", "category": "single_session_user",
     "query": "where does the user work", "expect_tokens": ["meridian"],
     "answer_sessions": ["s01"]},
    {"qid": "cat_name", "category": "single_session_user",
     "query": "what is the cat named", "expect_tokens": ["clementine"],
     "answer_sessions": ["s02"]},
    {"qid": "espresso_machine", "category": "single_session_user",
     "query": "which espresso machine does the user own at home",
     "expect_tokens": ["gaggia"], "answer_sessions": ["s05"]},
    {"qid": "keyboard", "category": "single_session_user",
     "query": "what keyboard does the user type on",
     "expect_tokens": ["kinesis"], "answer_sessions": ["s06"]},
    {"qid": "sister_city", "category": "single_session_user",
     "query": "where does the user's sister Nora live",
     "expect_tokens": ["porto"], "answer_sessions": ["s08"]},
    {"qid": "marathon_city", "category": "single_session_user",
     "query": "which half marathon is the user training for",
     "expect_tokens": ["lisbon"], "answer_sessions": ["s03"]},
    # -- single-session-assistant (4) ---------------------------------------
    {"qid": "dataframe_library", "category": "single_session_assistant",
     "query": "which library was suggested for dataframe work",
     "expect_tokens": ["polars"], "answer_sessions": ["s01"]},
    {"qid": "interval_day", "category": "single_session_assistant",
     "query": "which day was recommended for interval training",
     "expect_tokens": ["tuesdays"], "answer_sessions": ["s03"]},
    {"qid": "brew_ratio", "category": "single_session_assistant",
     "query": "what brew ratio was suggested for espresso shots",
     "expect_tokens": ["one", "two", "ratio"], "answer_sessions": ["s05"]},
    {"qid": "transaction_alerts", "category": "single_session_assistant",
     "query": "what was set up for card transactions",
     "expect_tokens": ["alerts"], "answer_sessions": ["s10"]},
    # -- single-session-preference (3) --------------------------------------
    {"qid": "seat_pref", "category": "single_session_preference",
     "query": "which seat does the user pick on flights",
     "expect_tokens": ["window"], "answer_sessions": ["s04"]},
    {"qid": "redeye_pref", "category": "single_session_preference",
     "query": "how does the user feel about red-eye flights",
     "expect_tokens": ["hate", "red-eyes"], "answer_sessions": ["s04"]},
    {"qid": "standup_pref", "category": "single_session_preference",
     "query": "what standup format does the user prefer",
     "expect_tokens": ["async"], "answer_sessions": ["s14"]},
    # -- multi-session (3): evidence spans sessions -------------------------
    {"qid": "tidal_arc", "category": "multi_session",
     "query": "what happened with the tidal energy book",
     "expect_tokens": ["book", "turbine"], "answer_sessions": ["s08", "s09"]},
    {"qid": "family_housing", "category": "multi_session",
     "query": "where do the user's sister live and when was the apartment lease signed",
     "expect_tokens": ["porto", "lease"], "answer_sessions": ["s08", "s12"]},
    {"qid": "hobby_sweep", "category": "multi_session",
     "query": "what is the user training for and building",
     "expect_tokens": ["marathon", "turbine"], "answer_sessions": ["s03", "s09"]},
    # -- knowledge-update (4): the EVOLVED_INTO chains ----------------------
    {"qid": "phone_current", "category": "knowledge_update",
     "query": "what phone does the user have",
     "expect_tokens": ["pixel", "9"], "forbid_top_id": 113,
     "answer_sessions": ["s11"]},
    {"qid": "bank_current", "category": "knowledge_update",
     "query": "which bank does the user use",
     "expect_tokens": ["juniper"], "forbid_top_id": 117,
     "answer_sessions": ["s13"]},
    {"qid": "phone_2026_window", "category": "knowledge_update",
     "query": "current phone model",
     "start": "2025-10-01 00:00:00", "end": "2026-06-01 00:00:00",
     "expect_tokens": ["pixel", "9"], "forbid_top_id": 113,
     "answer_sessions": ["s11"]},
    {"qid": "bank_2026_window", "category": "knowledge_update",
     "query": "which bank",
     "start": "2026-01-01 00:00:00", "end": "2026-06-01 00:00:00",
     "expect_tokens": ["juniper"], "forbid_top_id": 117,
     "answer_sessions": ["s13"]},
    # -- temporal-reasoning (5) ---------------------------------------------
    {"qid": "lease_date", "category": "temporal_reasoning",
     "query": "when did the user sign the apartment lease",
     "expect_tokens": ["january", "20"], "answer_sessions": ["s12"]},
    {"qid": "marathon_month", "category": "temporal_reasoning",
     "query": "when is the half marathon happening",
     "expect_tokens": ["october"], "answer_sessions": ["s03"]},
    {"qid": "browse_jan_2026", "category": "temporal_reasoning",
     "query": "", "start": "2026-01-01 00:00:00", "end": "2026-02-01 00:00:00",
     "expect_tokens": ["lease"], "answer_sessions": ["s12"]},
    {"qid": "cat_h1_2025", "category": "temporal_reasoning",
     "query": "cat adoption",
     "start": "2025-01-01 00:00:00", "end": "2025-07-01 00:00:00",
     "expect_tokens": ["clementine"], "answer_sessions": ["s02"]},
    {"qid": "espresso_recent", "category": "temporal_reasoning",
     "query": "espresso machine",
     "start": "2026-04-01 00:00:00", "end": "2026-06-01 00:00:00",
     "expect_tokens": ["broke"], "answer_sessions": ["s15"]},
    # -- session-scoped retrieval (3): same universe, narrowed to a session -
    {"qid": "scoped_language", "category": "session_scoped",
     "query": "what language does the user prefer",
     "scope_tags": ["session:s01"], "expect_tokens": ["rust"],
     "answer_sessions": ["s01"], "require_purity": "s01"},
    {"qid": "scoped_espresso", "category": "session_scoped",
     "query": "espresso advice",
     "scope_tags": ["session:s05"], "expect_tokens": ["ratio"],
     "answer_sessions": ["s05"], "require_purity": "s05"},
    {"qid": "scoped_miss", "category": "session_scoped",
     "query": "marathon training",
     "scope_tags": ["session:s02"], "expect_empty": True},
    # -- abstention (3) ------------------------------------------------------
    {"qid": "blood_type_abs", "category": "abstention",
     "query": "what is the rhesus blood group", "expect_empty": True},
    {"qid": "car_plate_abs", "category": "abstention",
     "query": "vehicle registration plate number", "expect_empty": True},
    {"qid": "cricket_abs", "category": "abstention",
     "query": "who won the cricket final", "expect_empty": True},
]


def build_corpus(spark: SparkSession) -> DataFrame:
    """Session turns -> memory schema. Tags carry the session scope
    (`session:sNN`) and speaker; metadata carries session_id as the sidecar
    JSON (the reference stores session_id/session_date in metadata,
    test_longmemeval.py:374-376). The type column is derived by the tier-1
    classifier, as on the real store path."""
    rows = [
        (
            mid,
            content,
            [f"session:{sess}", f"speaker:{speaker}", *extra],
            ts,
            imp,
            conf,
            f'{{"session_id": "{sess}", "speaker": "{speaker}"}}',
        )
        for (mid, sess, speaker, content, extra, ts, imp, conf) in TURNS
    ]
    df = spark.createDataFrame(
        rows,
        "id bigint, content string, tags array<string>, timestamp timestamp,"
        " importance double, confidence double, metadata string",
    )
    return df.select(
        "id", "content", "tags", "timestamp", "importance", "confidence",
        classify_memory_expr(F.col("content"))["type"].alias("type"),
        F.lit(False).alias("archived"),
        F.lit(None).cast("timestamp").alias("t_valid"),
        F.lit(None).cast("timestamp").alias("t_invalid"),
        "metadata",
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


def answer(
    memories: DataFrame, edges: DataFrame, question: dict,
    overrides: dict | None = None,
) -> list[int]:
    req = RecallRequest(
        query=question["query"],
        limit=TOP_K,
        tags=question.get("scope_tags", []),
        start=question.get("start"),
        end=question.get("end"),
        **(overrides or {}),
    )
    out = recall_full(memories, edges, req, now=NOW)
    return [int(r.id) for r in out.orderBy("position").collect()]


def score(question: dict, top_ids: list[int]) -> dict:
    """Token-containment verdict + session-recall evidence."""
    sessions = [SESSION_BY_ID.get(i) for i in top_ids]
    base = {"top_ids": top_ids, "sessions": sessions}
    if question.get("expect_empty"):
        return {"correct": len(top_ids) == 0, "session_hit": None, **base}
    text = " ".join(CONTENT_BY_ID.get(i, "").lower() for i in top_ids)
    ok = all(tok in text for tok in question["expect_tokens"])
    if "forbid_top_id" in question and top_ids and top_ids[0] == question["forbid_top_id"]:
        ok = False
    if question.get("require_purity"):
        ok = ok and all(s == question["require_purity"] for s in sessions)
    hit = None
    if "answer_sessions" in question:
        hit = all(s in sessions for s in question["answer_sessions"])
        ok = ok and hit
    return {"correct": ok, "session_hit": hit, **base}


def run_all(spark: SparkSession) -> dict:
    memories = build_corpus(spark)
    edges = build_edges(spark)
    per_q = {}
    for q in QUESTIONS:
        ids = answer(memories, edges, q)
        per_q[q["qid"]] = {"category": q["category"], **score(q, ids)}
    n = len(per_q)
    acc = sum(1 for v in per_q.values() if v["correct"]) / n
    by_cat: dict[str, list[bool]] = {}
    for v in per_q.values():
        by_cat.setdefault(v["category"], []).append(v["correct"])
    cat_acc = {
        c: round(sum(vs) / len(vs), 6) for c, vs in sorted(by_cat.items())
    }
    hits = [v["session_hit"] for v in per_q.values() if v["session_hit"] is not None]
    return {
        "accuracy": round(acc, 6),
        "n_questions": n,
        "category_accuracy": cat_acc,
        "session_recall": round(sum(hits) / len(hits), 6) if hits else None,
        "per_question": per_q,
    }


# ---------------------------------------------------------------------------
# Standing pick_winner gate (reference docs/RECALL_QUALITY_LAB.md), the
# LongMemEval-mini counterpart of tests/qa_harness.py's scorecard: the
# shipped recall config must BE the lab decision rule's choice. Candidate
# configs, the NDCG-vs-token-gold quality series, and the thread-pooled
# runner are shared with the LoCoMo harness (qa_harness.lab_scorecard).
# ---------------------------------------------------------------------------


def _candidate_configs() -> dict[str, dict]:
    import qa_harness

    return qa_harness.CANDIDATE_CONFIGS


CANDIDATE_CONFIGS = _candidate_configs()


def scorecard(spark: SparkSession) -> list[dict]:
    """One lab scorecard per candidate config over the full 31-question
    set. Gold ids = turns containing every expected token; the precision
    guardrail here is the ABSTENTION-violation rate (fraction of
    expect_empty questions that returned anything — this harness plants
    in-corpus distractor turns only in s15, so hallucinated recall is its
    sharper precision signal)."""
    import qa_harness

    memories = build_corpus(spark)
    edges = build_edges(spark)

    def gold(q: dict) -> list[int]:
        return [
            t[0]
            for t in TURNS
            if all(tok in t[3].lower() for tok in q.get("expect_tokens", []))
        ]

    def distractor(q: dict, ids: list[int]):
        if not q.get("expect_empty"):
            return None
        return 1.0 if ids else 0.0

    return qa_harness.lab_scorecard(
        QUESTIONS,
        lambda q, ov: answer(memories, edges, q, overrides=ov),
        gold,
        distractor,
        qa_harness.CANDIDATE_CONFIGS,
    )
