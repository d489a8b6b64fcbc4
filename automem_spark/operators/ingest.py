"""Write-path operators: the reference's store/update/delete endpoints as
batch dataflows (SURVEY.md §2.1).

- S1/S2 store: normalization + classification + tag-prefix materialization
  (the batch endpoint IS the Spark ingest job; single-store is a degenerate
  batch — memory.py:1123-1386)
- S4 update / upsert: Delta-MERGE semantics as latest-per-id window
  (memory.py:789-940)
- S5/S7 delete by id / by tag: anti-joins incl. edge cleanup
  (memory.py:942-962, :976-1008)

On Delta these become `MERGE INTO`/`DELETE`; on plain parquet the same
logical ops are expressed as window-dedup and anti-join rewrites — the 100 TB
shape is identical (one shuffle on id / one broadcast of the delete set).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from automem_spark.functions.tags import tag_filter_expr, tag_prefixes_expr
from automem_spark.functions.text import first_sentence_summary_expr


def coerce_unit_interval(col: Column, default: float = 0.5) -> Column:
    """X19 importance/strength coercion to [0,1] with default
    (automem/embedding/runtime_helpers.py:18-27)."""
    v = col.cast("double")
    return F.when(v.isNull(), F.lit(default)).otherwise(
        F.least(F.lit(1.0), F.greatest(F.lit(0.0), v))
    )


def content_size_policy_expr(
    content: Column, soft_limit: int = 500, hard_limit: int = 2000
) -> Column:
    """Content size governance tri-state 'ok'/'summarize'/'reject'
    (automem/utils/text.py:191-213; limits automem/config.py:170-180).
    Empty/null content is 'ok' (the required-field check is upstream).
    Measured on STRIPPED content — the reference strips before
    should_summarize_content (memory.py:484-490), so whitespace padding at
    the limit boundaries must not flip the classification."""
    c = F.trim(F.coalesce(content, F.lit("")))
    return (
        F.when(c == "", F.lit("ok"))
        .when(F.length(c) > hard_limit, F.lit("reject"))
        .when(F.length(c) > soft_limit, F.lit("summarize"))
        .otherwise(F.lit("ok"))
    )


def apply_content_governance(
    df: DataFrame,
    content_col: str = "content",
    soft_limit: int = 500,
    hard_limit: int = 2000,
) -> DataFrame:
    """The store path's content governance (automem/api/memory.py:484-525):
    rows over the hard limit are tagged rejected (the batch analog of the
    400 abort — callers route them to a rejects sink), rows over the soft
    limit have content replaced by the summarizer with the original kept in
    `original_content` (the reference's LLM summarizer is behind the same
    offline seam as U4 — the X18 extractive summary stands in).

    Output adds: content_action, original_content; `content` is rewritten
    for summarize rows. Pure column expressions, no shuffle.
    """
    from automem_spark.functions.text import first_sentence_summary_expr

    c = F.col(content_col)
    action = content_size_policy_expr(c, soft_limit, hard_limit)
    summarized = action == "summarize"
    return (
        df.withColumn("content_action", action)
        .withColumn(
            "original_content", F.when(summarized, c).otherwise(F.lit(None).cast("string"))
        )
        .withColumn(
            content_col,
            F.when(summarized, first_sentence_summary_expr(c)).otherwise(c),
        )
    )


def normalize_memories(raw: DataFrame) -> DataFrame:
    """S1/S2 ingest normalization: trimmed/lowercased tags, materialized
    tag_prefixes (X12), tier-1 classification when type is missing (U3),
    importance coercion (X19), extractive summary (X18)."""
    tags = F.filter(
        F.transform(F.coalesce(F.col("tags"), F.array()), lambda t: F.trim(t)),
        lambda t: t != "",
    )
    from automem_spark.operators.enrichment import classify_memory_fast

    staged = classify_memory_fast(raw, F.col("content"), "_cls")
    cls = F.col("_cls")
    return staged.select(
        *raw.columns,
        tag_prefixes_expr(tags).alias("tag_prefixes"),
        F.coalesce(F.col("type") if "type" in raw.columns else F.lit(None), cls["type"]).alias(
            "norm_type"
        ),
        cls["confidence"].alias("cls_confidence"),
        first_sentence_summary_expr(F.col("content")).alias("summary"),
    ).withColumn("importance", coerce_unit_interval(F.col("importance")))


def upsert_memories(
    current: DataFrame, incoming: DataFrame, *, version_col: str = "updated_at_epoch"
) -> DataFrame:
    """S4 upsert: MERGE WHEN MATCHED semantics — keep the newest version per
    id (version tiebreak: incoming wins). One shuffle on id."""
    tagged_cur = current.withColumn("_src_rank", F.lit(0))
    tagged_inc = incoming.withColumn("_src_rank", F.lit(1))
    unioned = tagged_cur.unionByName(tagged_inc)
    w = Window.partitionBy("id").orderBy(F.desc(version_col), F.desc("_src_rank"))
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src_rank")
    )


def delete_by_ids(
    memories: DataFrame, ids: DataFrame, edges: DataFrame | None = None
) -> tuple[DataFrame, DataFrame | None]:
    """S5 DETACH DELETE: drop rows and (optionally) any edge touching them."""
    remaining = memories.join(ids, "id", "left_anti")
    new_edges = None
    if edges is not None:
        new_edges = (
            edges.join(ids.withColumnRenamed("id", "src"), "src", "left_anti")
            .join(ids.withColumnRenamed("id", "dst"), "dst", "left_anti")
        )
    return remaining, new_edges


def delete_by_tag(
    memories: DataFrame, tags: list[str], *, match: str = "exact", mode: str = "any"
) -> DataFrame:
    """S7 bulk delete-by-tag: the reference loops pages of 200
    (memory.py:976-1008); here it is one anti-filter over the scan."""
    return memories.filter(
        ~tag_filter_expr(F.col("tags"), tags, mode=mode, match=match)
    )


# X21: canonical memory types + the ~20-alias normalization map
# (automem/config.py:183, :187-218, :221-241). Required semantic data.
CANONICAL_MEMORY_TYPES = (
    "Decision", "Pattern", "Preference", "Style", "Habit", "Insight", "Context",
)
TYPE_ALIASES: dict[str, str] = {
    "decision": "Decision",
    "pattern": "Pattern",
    "preference": "Preference",
    "style": "Style",
    "habit": "Habit",
    "insight": "Insight",
    "context": "Context",
    "memory": "Context",
    "milestone": "Context",
    "analysis": "Insight",
    "observation": "Insight",
    "document": "Context",
    "meeting_notes": "Context",
    "template": "Pattern",
    "project": "Context",
    "issue": "Insight",
    "timeline": "Context",
    "organization": "Context",
    "person": "Context",
    "interests": "Preference",
    "personality": "Preference",
    "emotional_patterns": "Preference",
    "relationship_dynamics": "Preference",
    "personal_situation": "Context",
    "health_habits": "Habit",
    "practical_info": "Context",
    "communication": "Preference",
    "legal_analysis": "Insight",
}


def normalize_memory_type_expr(raw: Column) -> Column:
    """X21 (automem/config.py:221-241): struct(normalized, was_modified).

    NULL/empty -> ('Context', true); canonical -> unchanged; alias ->
    mapped; unknown -> ('', true) — the empty string is the rejection
    marker, exactly as the reference signals it.
    """
    is_canonical = raw.isin(*CANONICAL_MEMORY_TYPES)
    alias_map = F.create_map(
        *[x for kv in TYPE_ALIASES.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    )
    aliased = F.element_at(alias_map, raw)
    normalized = (
        F.when(raw.isNull() | (raw == ""), F.lit("Context"))
        .when(is_canonical, raw)
        .when(aliased.isNotNull(), aliased)
        .otherwise(F.lit(""))
    )
    return F.struct(
        normalized.alias("normalized"),
        (~F.coalesce(is_canonical, F.lit(False))).alias("was_modified"),
    )


# F12: server-generated ids are UUIDv4 strings (automem/api/memory.py:532);
# the API rejects malformed ids before any store round-trip.
_UUID_RE = (
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
    "-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
)


def valid_uuid_expr(col: Column) -> Column:
    """F12: canonical-form UUID validation as a column predicate."""
    return F.coalesce(col.rlike(_UUID_RE), F.lit(False))


def backup_export(
    tables: dict[str, DataFrame], base_path: str, spark: SparkSession | None = None
) -> DataFrame:
    """S10 backup export (the reference dumps full graph + vector state;
    here each logical table lands as parquet under `base_path`). Returns a
    manifest DataFrame (table, n_rows) for verification — the write itself
    is the sink, parallel per partition, no driver collect.

    Manifest counts come from the written files' parquet footers (a
    metadata-only read — row-group counts, no data pages), so the manifest
    genuinely verifies what landed on disk without a second full scan."""
    if spark is None:
        for df in tables.values():
            spark = df.sparkSession
            break
    if spark is None:
        raise ValueError("backup_export needs a SparkSession when tables is empty")
    manifest = []
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(f"{base_path}/{name}")
        # count() over a bare parquet scan plans a footer-metadata read
        # (no column materialization); cheap relative to the export write.
        n = spark.read.parquet(f"{base_path}/{name}").count()
        manifest.append((name, n))
    return spark.createDataFrame(manifest, "table string, n_rows long")


def touch_last_accessed(
    memories: DataFrame, accessed_ids: DataFrame, now: str
) -> DataFrame:
    """ST7 last_accessed write-back (automem/api/recall.py:2601-2609): after
    a recall, direct (seed) results get last_accessed = now. The reference
    fires one UPDATE per id; the batch form is a broadcast semi-annotated
    projection — on Delta, a MERGE keyed on the bounded accessed-id set.
    `accessed_ids` must have column `id`."""
    hit = F.coalesce(F.col("_touched"), F.lit(False))
    out = memories.join(
        F.broadcast(accessed_ids.select("id").withColumn("_touched", F.lit(True))),
        "id",
        "left",
    )
    cols = [c for c in memories.columns if c != "last_accessed"]
    return out.select(
        *cols,
        F.when(hit, F.lit(now).cast("timestamp"))
        .otherwise(F.col("last_accessed") if "last_accessed" in memories.columns else F.lit(None).cast("timestamp"))
        .alias("last_accessed"),
    )


def sync_repair_plan(memories: DataFrame, vector_ids: DataFrame) -> DataFrame:
    """ST6 sync repair (automem/sync/runtime_worker.py:54-104): active
    non-excluded memories missing from the vector store get queued for
    re-embedding. The reference loops ids against the graph one query each;
    the batch form is one anti-join producing the repair queue.
    Output: (id, action='reembed', content)."""
    active = memories.filter(
        (F.coalesce(F.col("archived"), F.lit(False)) == F.lit(False))
        & (~F.coalesce(F.col("type"), F.lit("")).isin("MetaPattern"))
    )
    missing = active.join(vector_ids.select(F.col("vec_id").alias("id")), "id", "left_anti")
    return missing.select("id", F.lit("reembed").alias("action"), "content")


# S8: the authorable relation taxonomy + per-type property whitelists
# (automem/config.py:273-397). Required semantic data. Base props
# (strength, updated_at) are always set; payload props are kept only when
# whitelisted for the type and not already a base prop
# (automem/api/memory.py:62-75).
AUTHORABLE_RELATION_PROPS: dict[str, tuple[str, ...]] = {
    "RELATES_TO": (),
    "LEADS_TO": (),
    "OCCURRED_BEFORE": (),
    "PREFERS_OVER": ("context", "strength", "reason"),
    "EXEMPLIFIES": ("pattern_type", "confidence"),
    "CONTRADICTS": ("resolution", "reason"),
    "REINFORCES": ("strength", "observations"),
    "INVALIDATED_BY": ("reason", "timestamp"),
    "EVOLVED_INTO": ("confidence", "reason"),
    "DERIVED_FROM": ("transformation", "confidence"),
    "PART_OF": ("role", "context"),
}
_BASE_ASSOC_PROPS = ("strength", "updated_at")


def create_associations(
    requests: DataFrame, memories: DataFrame, *, now: str
) -> DataFrame:
    """S8 association create, batch form (automem/api/memory.py:1042-1122,
    :62-126). `requests` columns: (idx, memory1_id, memory2_id, rel_type,
    strength, props map<string,string>).

    Validation mirrors the endpoint: missing id -> rejected; self-loop ->
    rejected; non-authorable type (after default RELATES_TO + uppercase) ->
    rejected; either endpoint absent from the corpus -> rejected; else
    created with strength coerced to [0,1] (X19) and payload props filtered
    to the type's whitelist minus base props.

    Output: (idx, status, rel_type, strength, kept_props) where kept_props
    is the sorted '|'-joined kept payload-prop keys. Scale: both id checks
    are joins against the corpus keyed on id; everything else is row-local.
    """
    rel_type = F.upper(
        F.when(
            F.coalesce(F.trim(F.col("rel_type")), F.lit("")) == "", F.lit("RELATES_TO")
        ).otherwise(F.trim(F.col("rel_type")))
    )
    allowed = None
    for t, props in AUTHORABLE_RELATION_PROPS.items():
        payload_props = [p for p in props if p not in _BASE_ASSOC_PROPS]
        arr = F.array(*[F.lit(p) for p in payload_props])
        allowed = F.when(rel_type == t, arr) if allowed is None else allowed.when(rel_type == t, arr)
    allowed = allowed.otherwise(F.lit(None).cast("array<string>"))

    base = requests.select(
        "idx",
        F.trim(F.coalesce(F.col("memory1_id").cast("string"), F.lit(""))).alias("id1"),
        F.trim(F.coalesce(F.col("memory2_id").cast("string"), F.lit(""))).alias("id2"),
        rel_type.alias("rel_type"),
        coerce_unit_interval(F.col("strength")).alias("strength"),
        allowed.alias("_allowed"),
        F.col("props"),
    )
    mem_ids = memories.select(F.col("id").cast("string").alias("_mid"))
    base = (
        base.join(
            mem_ids.withColumnRenamed("_mid", "id1").withColumn("_m1", F.lit(True)),
            "id1", "left",
        )
        .join(
            mem_ids.withColumnRenamed("_mid", "id2").withColumn("_m2", F.lit(True)),
            "id2", "left",
        )
    )
    kept_keys = F.array_sort(
        F.filter(
            F.map_keys(F.coalesce(F.col("props"), F.create_map())),
            lambda k: F.array_contains(F.coalesce(F.col("_allowed"), F.array()), k),
        )
    )
    status = (
        F.when((F.col("id1") == "") | (F.col("id2") == ""), F.lit("rejected_missing_id"))
        .when(F.col("id1") == F.col("id2"), F.lit("rejected_self"))
        .when(F.col("_allowed").isNull(), F.lit("rejected_type"))
        .when(
            F.coalesce(F.col("_m1"), F.lit(False)) == False,  # noqa: E712
            F.lit("rejected_not_found"),
        )
        .when(
            F.coalesce(F.col("_m2"), F.lit(False)) == False,  # noqa: E712
            F.lit("rejected_not_found"),
        )
        .otherwise(F.lit("created"))
    )
    return base.select(
        "idx",
        status.alias("status"),
        F.col("rel_type"),
        F.round("strength", 6).alias("strength"),
        F.when(status == "created", F.array_join(kept_keys, "|"))
        .otherwise(F.lit("")).alias("kept_props"),
    )
