"""U5: entity identity synthesis — the deterministic scaffolding.

Reference: automem/consolidation/identity_synthesis.py:18-313. The reference
gathers the memories referencing an entity, filters them to "current" state,
builds a numbered prompt block, and asks an LLM for a 2-5 sentence identity;
the result is stored with a version counter, with a full re-synthesis (ignore
the previous identity) every 5th version, and `identity_source_count`
bookkeeping so an entity is only re-synthesized when its current-reference
count changes (run_identity_consolidation:377-404).

Everything around the LLM call is a deterministic DataFrame program and is
implemented here; the model call itself is a seam (`synthesizer`) whose
default is a template that derives the identity text from the same inputs the
prompt would carry — offline-exact, DuckDB-reproducible, and swappable for a
Pandas-UDF-backed LLM client in a connected deployment.

Scale shape: one shuffle joins refs to the current-memory projection (keyed
on memory id), one per-entity top-k (two-stage window via top_k_per_group —
reference gathers <= 50 per entity, so the group payload is bounded), one
groupBy(entity) builds the prompt block. The suppression set (memories with
an active INVALIDATED_BY/EVOLVED_INTO replacement,
identity_synthesis.py:69-103) is a semi-join of the suppressing edges
against the current-state projection — no corpus broadcast, no collect.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from automem_spark.operators.state import state_reason_expr
from automem_spark.operators.topk import partial_top_k_per_group

# identity_synthesis.py:38 — relations whose ACTIVE target suppresses the
# source memory from identity gathering.
STATE_SUPPRESSING_RELATIONS = ("EVOLVED_INTO", "INVALIDATED_BY")


def current_entity_memories(
    entity_refs: DataFrame,
    memories: DataFrame,
    edges: DataFrame,
    *,
    now: str,
) -> DataFrame:
    """Per-entity current memories (identity_synthesis.py:106-166).

    A memory is current when it carries no state reason
    (archived / not-yet-valid / expired, F8 semantics) AND no
    state-suppressing edge to a target that is itself state-reason-free —
    the same one-hop activity check as `_active_suppressed_memory_ids`
    (identity_synthesis.py:69-103; deliberately NOT the recursive J4 chain
    walk: the reference checks only the direct replacement's state).

    Output: (entity_id, id, content, importance, timestamp).
    """
    now_col = F.lit(now).cast("timestamp")
    annotated = memories.select(
        "id",
        "content",
        "importance",
        "timestamp",
        state_reason_expr(
            F.col("archived"), F.col("t_valid"), F.col("t_invalid"), now_col
        ).alias("_reason"),
    )
    current = annotated.filter(F.col("_reason").isNull()).drop("_reason")
    suppressed = (
        edges.filter(F.col("rel_type").isin(*STATE_SUPPRESSING_RELATIONS))
        .select("src", "dst")
        .join(current.select(F.col("id").alias("dst")), "dst", "left_semi")
        .select(F.col("src").alias("id"))
        .distinct()
    )
    live = current.join(suppressed, "id", "left_anti")
    return entity_refs.select(
        "entity_id", F.col("memory_id").alias("id")
    ).join(live, "id")


def template_synthesizer(
    slug: Column,
    category: Column,
    block: Column,
    mode: Column,
    version: Column,
    n_sources: Column,
) -> Column:
    """The offline stand-in for the LLM call (identity_synthesis.py:186-283):
    a deterministic template over the same inputs the prompt carries —
    entity name + category (template :19-36), the gathered-memory evidence
    (here: the block's top line, i.e. the highest-importance memory), and
    the previous-identity mode (refine / full re-synthesis,
    `_build_previous_section` :40-52). Cross-engine exact so the whole
    scaffold is oracle-checkable; a connected deployment swaps this seam
    for a Pandas-UDF model client and nothing upstream changes."""
    head = F.concat(
        slug,
        F.lit(" ("),
        category,
        F.lit("): synthesized from "),
        n_sources.cast("string"),
        F.lit(" current memories; chief evidence: "),
        F.substring(F.split_part(block, F.lit("\n"), F.lit(1)), 1, 120),
    )
    suffix = (
        F.when(
            mode == "refine",
            F.concat(F.lit(" [refines v"), version.cast("string"), F.lit("]")),
        )
        .when(mode == "full_resynthesis", F.lit(" [full re-synthesis]"))
        .otherwise(F.lit(""))
    )
    return F.concat(head, suffix)


def identity_synthesis_plan(
    entities: DataFrame,
    entity_refs: DataFrame,
    memories: DataFrame,
    edges: DataFrame,
    *,
    now: str,
    memory_limit: int = 50,
    min_references: int = 1,
    identity_state: DataFrame | None = None,
    synthesizer: Callable[..., Column] = template_synthesizer,
) -> DataFrame:
    """U5 batch synthesis pass (run_identity_consolidation:313-418, step 2).

    Per active (non-merged) entity:
    - actual_ref_count = count of ALL current memories referencing it
      (no limit — identity_synthesis.py:225-231);
    - eligible when actual_ref_count >= min_references AND (no stored
      identity OR actual_ref_count != identity_source_count) — the
      change-detection bookkeeping (:395-399);
    - the prompt block numbers the top `memory_limit` memories by
      importance DESC (:120-126; the reference's tie order is graph
      insertion order — pinned here to id ASC for determinism), each line
      "i. [date] content(stripped)[:300]" with empty-content lines skipped
      AFTER numbering (`_format_memories_for_prompt` :173-182);
    - synthesis mode: 'initial' (no previous identity),
      'full_resynthesis' (version > 0 and version % 5 == 0 — checked on
      the version BEFORE increment, :40-52), else 'refine';
    - new identity_version = stored version + 1 (:283-300).

    `identity_state`: (entity_id, identity, identity_version,
    identity_source_count) — the stored per-entity synthesis bookkeeping;
    None means no entity has been synthesized yet.

    Output: (entity_id, slug, category, synthesis_mode, identity,
    identity_version, identity_source_count, n_prompt_memories,
    prompt_chars).
    """
    active = entities.filter(F.col("merged_into").isNull()).select(
        F.col("id").alias("entity_id"), "slug", "category"
    )
    if identity_state is None:
        state = active.select(
            "entity_id",
            F.lit(None).cast("string").alias("identity"),
            F.lit(0).cast("long").alias("identity_version"),
            F.lit(0).cast("long").alias("identity_source_count"),
        )
    else:
        state = identity_state.select(
            "entity_id", "identity", "identity_version", "identity_source_count"
        )

    gathered = current_entity_memories(entity_refs, memories, edges, now=now)
    counts = gathered.groupBy("entity_id").agg(F.count("*").alias("_actual"))

    eligible = (
        active.join(state, "entity_id", "left")
        .join(counts, "entity_id")  # inner: zero current refs -> ineligible
        .withColumn("_ver", F.coalesce(F.col("identity_version"), F.lit(0)))
        .filter(
            (F.col("_actual") >= min_references)
            & (
                F.col("identity").isNull()
                # ref :388: int(row[1] or 0) — a stored identity with a null
                # source count compares as 0, not as three-valued NULL
                | (F.col("_actual") != F.coalesce(F.col("identity_source_count"), F.lit(0)))
            )
        )
    )

    # two-stage top-k: a hub entity referenced by millions of memories would
    # otherwise sort its whole gather through one reducer
    ranked = partial_top_k_per_group(
        gathered,
        ["entity_id"],
        [F.desc(F.coalesce(F.col("importance"), F.lit(0.0))), F.asc("id")],
        memory_limit,
        rank_col="rn",
        keep_rank=True,
    )
    lines = ranked.filter(F.trim(F.col("content")) != "").select(
        "entity_id",
        "rn",
        F.concat(
            F.col("rn").cast("string"),
            F.lit(". ["),
            # ref :173-182: `ts = mem.get("timestamp") or "unknown"` — a null
            # timestamp must not null the line (concat is null-propagating,
            # and array_join would then null the whole block)
            F.coalesce(F.date_format("timestamp", "yyyy-MM-dd"), F.lit("unknown")),
            F.lit("] "),
            F.substring(F.trim(F.col("content")), 1, 300),
        ).alias("line"),
    )
    blocks = lines.groupBy("entity_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("rn"), F.col("line")))
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("_block"),
        F.count("*").alias("n_prompt_memories"),
    )

    mode = (
        F.when(F.col("identity").isNull(), F.lit("initial"))
        .when((F.col("_ver") > 0) & (F.col("_ver") % 5 == 0), F.lit("full_resynthesis"))
        .otherwise(F.lit("refine"))
    )
    out = (
        eligible.join(blocks, "entity_id")
        .withColumn("synthesis_mode", mode)
        .withColumn(
            "_identity_new",
            synthesizer(
                F.col("slug"),
                F.col("category"),
                F.col("_block"),
                F.col("synthesis_mode"),
                F.col("_ver"),
                F.col("_actual"),
            ),
        )
    )
    return out.select(
        "entity_id",
        "slug",
        "category",
        "synthesis_mode",
        F.col("_identity_new").alias("identity"),
        (F.col("_ver") + 1).cast("long").alias("identity_version"),
        F.col("_actual").cast("long").alias("identity_source_count"),
        F.col("n_prompt_memories").cast("long").alias("n_prompt_memories"),
        F.length("_block").cast("long").alias("prompt_chars"),
    )
