"""Entity dedup / merge / lookup tests against the fixture topology."""

from pyspark.sql import functions as F

from automem_spark.operators.entities import (
    apply_entity_merges,
    entity_identity_lookup,
    entity_merge_candidates,
    entity_ref_counts,
)
from automem_spark.sources.entity_fixture import entities_view, entity_refs_view


def test_dedup_buckets(spark):
    got = entity_merge_candidates(entities_view(spark), entity_refs_view(spark))
    by_pair = {(r.entity_a, r.entity_b): r for r in got.collect()}
    # alice ⊂ alice-smith, full overlap -> auto, canonical = longer slug
    r = by_pair[(0, 1)]
    assert r.bucket == "auto" and r.canonical_id == 1
    # postgres/postgresql -> review (conf < 0.8)
    assert by_pair[(2, 3)].bucket == "review"
    # spark/apache-spark: substring + overlap .8 but conf < 0.8 -> review
    assert by_pair[(4, 5)].bucket == "review"
    # bob/bob-jones: would be auto but 'bob' is ambiguous-generic -> review
    assert by_pair[(6, 7)].bucket == "review"
    # pipeline ⊂ data-pipeline full overlap -> auto
    assert by_pair[(13, 14)].bucket == "auto" and by_pair[(13, 14)].canonical_id == 13
    # merged-away entity (flink, id 10) never appears
    assert all(10 not in pair for pair in by_pair)


def test_merge_apply_moves_refs(spark):
    entities = entities_view(spark)
    refs = entity_refs_view(spark)
    cands = entity_merge_candidates(entities, refs)
    merges = cands.filter(F.col("bucket") == "auto").select(
        "canonical_id",
        F.when(F.col("canonical_id") == F.col("entity_a"), F.col("entity_b"))
        .otherwise(F.col("entity_a"))
        .alias("alias_id"),
    )
    rewritten = apply_entity_merges(refs, merges)
    counts = {r.entity_id: r.n_refs for r in rewritten.groupBy("entity_id").count().withColumnRenamed("count", "n_refs").collect()}
    # alice's refs moved into alice-smith (all shared -> count unchanged at 7)
    assert 0 not in counts and counts[1] == 7
    # pipeline's refs moved into data-pipeline (identical sets -> 3)
    assert 14 not in counts and counts[13] == 3


def test_identity_lookup_alias_and_merged(spark):
    got = entity_identity_lookup(
        entities_view(spark), ["alice", "apache-kafka", "flink", "nonexistent"]
    )
    ids = {r.id for r in got.collect()}
    assert ids == {0, 9}  # alice by slug, kafka by alias; flink merged away


def test_ref_counts(spark):
    got = {r.id: r.n_refs for r in entity_ref_counts(entities_view(spark), entity_refs_view(spark)).collect()}
    assert got[1] == 7 and got[8] == 2 and got[9] == 2
    assert 10 not in got
