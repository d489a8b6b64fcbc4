"""Tests for classifier tier 1, pattern detection, consolidation passes,
and multi-query recall."""

from pyspark.sql import functions as F

from automem_spark.operators.consolidation import creative_pairs, forget_classify
from automem_spark.operators.enrichment import classify_memory_expr, detect_patterns_batch
from automem_spark.operators.recall import RecallRequest, recall, recall_many
from automem_spark.sources.graph_fixture import edges_view
from automem_spark.sources.tables import load_table, memories_view

NOW = "2026-06-01 00:00:00"


def test_classifier_tier1_semantics(spark):
    rows = [
        (1, "we decided to use spark"),          # Decision, 1 match -> 0.6
        (2, "decided to go, opted for parquet"), # Decision, 2 matches -> 0.8
        (3, "i usually often tend to batch"),    # Pattern, 3 matches -> 0.9
        (4, "nothing to see here"),              # fallback Memory 0.3
        (5, "always use tabs"),                  # Preference ("always use"), not Habit (lookahead)
        (6, "always late"),                      # Habit (\balways\b not followed by use)
    ]
    df = spark.createDataFrame(rows, ["id", "content"])
    cls = classify_memory_expr(F.col("content"))
    got = {
        r.id: (r.t, round(r.c, 6))
        for r in df.select("id", cls["type"].alias("t"), cls["confidence"].alias("c")).collect()
    }
    assert got[1] == ("Decision", 0.6)
    assert got[2] == ("Decision", 0.8)
    assert got[3] == ("Pattern", 0.9)
    assert got[4] == ("Memory", 0.3)
    assert got[5] == ("Preference", 0.6)
    assert got[6] == ("Habit", 0.6)


def test_pattern_detection_counts_multiplicity(spark):
    rows = [
        ("Decision", 0.9, "alpha alpha beta gamma"),
        ("Decision", 0.8, "alpha beta"),
        ("Decision", 0.7, "alpha delta"),
        ("Decision", 0.6, "epsilon"),
        ("Insight", 0.9, "zeta"),  # only 1 member -> excluded
    ]
    df = spark.createDataFrame(rows, ["type", "confidence", "content"])
    got = detect_patterns_batch(df, min_members=4).collect()
    terms = {(r.type, r.term): r.term_count for r in got}
    assert terms[("Decision", "alpha")] == 4  # multiplicity counted
    assert all(r.type == "Decision" for r in got)


def test_forget_classify_actions(spark, sf_dir):
    mem = memories_view(spark, sf_dir)
    edges = edges_view(spark, sf_dir)
    rel_counts = edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("rel_count"))
    got = forget_classify(mem, rel_counts, now=NOW, delete_threshold=0.25, archive_threshold=0.35)
    actions = {r["action"] for r in got.select("action").distinct().collect()}
    assert actions <= {"preserved", "delete", "archive", "update"}
    # protected types never deleted/archived
    joined = got.join(mem.select("id", "type", "importance"), "id")
    bad = joined.filter(
        F.col("type").isin("Decision", "Insight") & F.col("action").isin("delete", "archive")
    ).count()
    assert bad == 0


def test_creative_pairs_rules(spark, sf_dir):
    mem = memories_view(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    edges = edges_view(spark, sf_dir)
    got = creative_pairs(mem, emb, edges, max_id=100).collect()
    assert got
    for r in got:
        assert (r.rel_type, r.kind) in {
            ("CONTRADICTS", None),
            ("DISCOVERED", "explains"),
            ("DISCOVERED", "shares_theme"),
            ("DISCOVERED", "parallel_context"),
        }


def test_recall_many_matches_single(spark, sf_dir):
    """Multi-query fan-out must reproduce single-query keyword recall."""
    mem = memories_view(spark, sf_dir)
    q = "spark window merge fast"
    single = recall(mem, RecallRequest(query=q, limit=5), now=NOW).collect()
    many = recall_many(mem, [("q0", q)], limit=5, now=NOW).collect()
    assert {r.id for r in single} == {r.id for r in many}
    s_scores = {r.id: round(r.final_score, 9) for r in single}
    m_scores = {r.id: round(r.final_score, 9) for r in many}
    assert s_scores == m_scores
