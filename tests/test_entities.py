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


def test_identity_synthesis_modes_skip_and_limit(spark):
    """U5 scaffolding (identity_synthesis.py:18-313): change-detection skip,
    every-5th-version full re-synthesis, suppression of memories with an
    active EVOLVED_INTO/INVALIDATED_BY replacement, and the prompt slice
    (source count unlimited, prompt memories capped)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from automem_spark.operators.identity import identity_synthesis_plan

    now = "2026-06-01 00:00:00"
    ts = dt.datetime(2026, 1, 10)
    entities = spark.createDataFrame(
        [
            (0, "alice", "people", [], None),
            (1, "bob", "people", [], None),
            (2, "carol", "people", [], None),
            (3, "merged-away", "people", [], 0),
        ],
        "id bigint, slug string, category string, aliases array<string>, merged_into bigint",
    )
    # alice: 4 current refs (one suppressed, one archived of 6 total)
    # bob: 1 current ref; carol: 2 current refs
    refs = spark.createDataFrame(
        [(0, m) for m in (10, 11, 12, 13, 14, 15)]
        + [(1, 20)]
        + [(2, 30), (2, 31)],
        "entity_id bigint, memory_id bigint",
    )
    mems = spark.createDataFrame(
        [
            (10, "top memory about alice", 0.9, ts, False, None, None),
            (11, "second memory", 0.8, ts, False, None, None),
            (12, "third memory", 0.7, ts, False, None, None),
            (13, "fourth memory", 0.6, ts, False, None, None),
            (14, "archived memory", 0.95, ts, True, None, None),   # state reason
            (15, "superseded memory", 0.99, ts, False, None, None),  # suppressed
            (16, "active replacement", 0.5, ts, False, None, None),
            (20, "bob memory", 0.5, ts, False, None, None),
            (30, "carol one", 0.5, ts, False, None, None),
            (31, "carol two", 0.4, ts, False, None, None),
        ],
        "id bigint, content string, importance double, timestamp timestamp,"
        " archived boolean, t_valid timestamp, t_invalid timestamp",
    )
    edges = spark.createDataFrame(
        [(15, 16, "EVOLVED_INTO")], "src bigint, dst bigint, rel_type string"
    )
    state = spark.createDataFrame(
        [
            (1, "bob identity", 5, 7),   # v5 + stale count -> full re-synthesis
            (2, "carol identity", 2, 2),  # count matches -> skipped
        ],
        "entity_id bigint, identity string, identity_version bigint,"
        " identity_source_count bigint",
    )

    out = {
        r.entity_id: r
        for r in identity_synthesis_plan(
            entities, refs, mems, edges, now=now,
            memory_limit=2, identity_state=state,
        ).collect()
    }
    assert set(out) == {0, 1}  # carol skipped, merged-away excluded
    a = out[0]
    # archived (14) and suppressed (15) drop out: 4 current sources
    assert a.identity_source_count == 4
    assert a.n_prompt_memories == 2  # memory_limit slice
    assert a.synthesis_mode == "initial" and a.identity_version == 1
    assert a.identity.startswith("alice (people): synthesized from 4")
    assert "top memory about alice" in a.identity
    b = out[1]
    assert b.synthesis_mode == "full_resynthesis" and b.identity_version == 6
    assert b.identity.endswith("[full re-synthesis]")

    # an INACTIVE replacement does not suppress: archive the target
    edges2 = spark.createDataFrame(
        [(15, 14, "EVOLVED_INTO")], "src bigint, dst bigint, rel_type string"
    )
    out2 = {
        r.entity_id: r
        for r in identity_synthesis_plan(
            entities, refs, mems, edges2, now=now,
            memory_limit=2, identity_state=state,
        ).collect()
    }
    assert out2[0].identity_source_count == 5  # 15 survives now
    # refine mode on the next synthesis of a non-multiple-of-5 version
    state3 = spark.createDataFrame(
        [(0, "alice identity", 2, 1)],
        "entity_id bigint, identity string, identity_version bigint,"
        " identity_source_count bigint",
    )
    out3 = {
        r.entity_id: r
        for r in identity_synthesis_plan(
            entities, refs, mems, edges, now=now,
            memory_limit=2, identity_state=state3,
        ).collect()
    }
    assert out3[0].synthesis_mode == "refine"
    assert out3[0].identity.endswith("[refines v2]") and out3[0].identity_version == 3


def test_identity_synthesis_null_timestamp_and_null_source_count(spark):
    """Reference edge cases (identity_synthesis.py:173-182, :388): a null
    memory timestamp renders as 'unknown' (must not null the prompt line —
    concat is null-propagating and array_join would null the whole block),
    and a stored identity with NULL identity_source_count compares as 0
    (`int(row[1] or 0)`), so a non-zero ref count stays eligible."""
    from automem_spark.operators.identity import identity_synthesis_plan

    now = "2026-06-01 00:00:00"
    entities = spark.createDataFrame(
        [(0, "alice", "people", [], None)],
        "id bigint, slug string, category string, aliases array<string>, merged_into bigint",
    )
    refs = spark.createDataFrame(
        [(0, 10), (0, 11)], "entity_id bigint, memory_id bigint"
    )
    mems = spark.createDataFrame(
        [
            (10, "memory without a timestamp", 0.9, None, False, None, None),
            (11, "dated memory", 0.8, __import__("datetime").datetime(2026, 1, 10), False, None, None),
        ],
        "id bigint, content string, importance double, timestamp timestamp,"
        " archived boolean, t_valid timestamp, t_invalid timestamp",
    )
    edges = spark.createDataFrame([], "src bigint, dst bigint, rel_type string")
    state = spark.createDataFrame(
        [(0, "alice identity", 1, None)],
        "entity_id bigint, identity string, identity_version bigint,"
        " identity_source_count bigint",
    )
    out = identity_synthesis_plan(
        entities, refs, mems, edges, now=now, identity_state=state
    ).collect()
    assert len(out) == 1  # null source count == 0 != 2 -> eligible
    r = out[0]
    assert r.n_prompt_memories == 2  # the null-ts line survived
    assert "[unknown] memory without a timestamp" in r.identity or r.prompt_chars > 0
    # the block is intact: both lines counted into prompt_chars
    assert r.prompt_chars > len("1. [unknown] memory without a timestamp")
