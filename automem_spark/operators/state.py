"""Bitemporal "current state" layer.

Reference counterparts (SURVEY.md §2.2 F8, §2.4 J4/J5):
- F8 payload state reason: archived / t_valid>now (not_yet_valid) /
  t_invalid<=now (expired)                        automem/api/recall.py:437-449
- J5 current-state filter + replacement injection automem/api/recall.py:596-723
  (replacement = supersession chain head from J4, injected as
  match_type='state_replacement' carrying the suppressed row's score,
  deduped against ids already in the result set, and required to be active)

Scale notes: `results` is a bounded candidate set (<= limit + expansions),
so every corpus touch below is keyed off it — the candidate id set is
broadcast INTO the memories scan (left-semi), and only the resulting
bounded projections are broadcast back into the result-side joins. No
corpus-derived frame is ever broadcast, and no shuffle lands on the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from automem_spark.plans.checkpoint import maybe_checkpoint


def state_reason_expr(
    archived: Column,
    t_valid: Column,
    t_invalid: Column,
    now: Column,
) -> Column:
    """F8 (recall.py:437-449) — evaluation order matters: archived wins,
    then not-yet-valid, then expired; NULL means active."""
    return (
        F.when(F.coalesce(archived, F.lit(False)), F.lit("archived"))
        .when(t_valid.isNotNull() & (t_valid > now), F.lit("not_yet_valid"))
        .when(t_invalid.isNotNull() & (t_invalid <= now), F.lit("expired"))
    )


def current_state_filter(
    results: DataFrame,
    memories: DataFrame,
    edges: DataFrame,
    *,
    now: str,
    score_col: str = "final_score",
    keep_order_cols: bool = False,
) -> DataFrame:
    """J5 (recall.py:596-723): suppress rows whose memory has a state reason
    or an active supersession replacement; inject the chain head as
    match_type='state_replacement' carrying the suppressed row's score.

    The supersession walk is activity-gated PER HOP, mirroring
    _query_state_replacements (recall.py:452-520): at each hop the
    newest-first edge scan skips targets that are themselves
    archived/expired/not-yet-valid, so an inactive newest replacement falls
    back to the next-newest edge and the walk stops at the last active node.
    A source whose every replacement candidate is inactive has NO
    replacement — it is not marked superseded (it may still be suppressed by
    its own state reason, with nothing injected).

    results: (id, match_type, match_score, final_score, ...)
    memories: must carry (id, archived, t_valid, t_invalid, importance, timestamp)
    edges: graph edges with (src, dst, rel_type, updated_at_epoch)

    Output: (id, match_type, state_replaces, final_score, position).
    """
    from automem_spark.operators.graph import resolve_supersession

    now_col = F.lit(now).cast("timestamp")
    # Corpus-wide (id, state_reason) stays un-broadcast: it feeds the
    # supersession walk's per-hop activity gate, which must see every node
    # on a chain (heads can lie outside the candidate set).
    state = memories.select(
        "id",
        state_reason_expr(
            F.col("archived"), F.col("t_valid"), F.col("t_invalid"), now_col
        ).alias("state_reason"),
    )

    cand_ids = results.select("id").distinct()

    # per-hop activity gating means every returned head is active by
    # construction — no post-hoc head filter needed
    heads = resolve_supersession(edges, node_state=state)
    heads_cand = (
        heads.select(F.col("start").alias("id"), F.col("head"))
        .join(F.broadcast(cand_ids), "id", "left_semi")
    )

    # every memory row we will ever need: the candidates themselves plus
    # their (bounded) replacement heads — semi-join pushes the broadcast
    # candidate set into the corpus scan, so only bounded rows come back
    needed_ids = cand_ids.unionByName(
        heads_cand.select(F.col("head").alias("id"))
    ).distinct()
    mem_info = (
        memories.select(
            "id",
            state_reason_expr(
                F.col("archived"), F.col("t_valid"), F.col("t_invalid"), now_col
            ).alias("state_reason"),
            F.col("importance").alias("_imp"),
            F.col("timestamp").alias("_ts"),
        )
        .join(F.broadcast(needed_ids), "id", "left_semi")
    )
    mem_info = maybe_checkpoint(mem_info)

    annotated = (
        results.join(F.broadcast(mem_info.select("id", "state_reason")), "id", "left")
        .join(F.broadcast(heads_cand), "id", "left")
        .withColumn(
            "_reason",
            F.coalesce(
                F.col("state_reason"),
                F.when(F.col("head").isNotNull(), F.lit("superseded")),
            ),
        )
    )

    kept = annotated.filter(F.col("_reason").isNull()).select(
        "id",
        "match_type",
        F.lit(None).cast(annotated.schema["id"].dataType).alias("state_replaces"),
        F.col(score_col),
    )

    seen = results.select(F.col("id").alias("head"))
    injected = (
        annotated.filter(F.col("_reason").isNotNull() & F.col("head").isNotNull())
        .join(F.broadcast(seen), "head", "left_anti")
        .select(
            F.col("head").alias("id"),
            F.lit("state_replacement").alias("match_type"),
            F.col("id").alias("state_replaces"),
            F.col(score_col),
        )
    )
    # a head may replace several suppressed rows: keep the highest carried
    # score (first-wins in the reference's insertion order = score order)
    w_head = Window.partitionBy("id").orderBy(F.desc(score_col), F.asc("state_replaces"))
    injected = (
        injected.withColumn("_rn", F.row_number().over(w_head))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    out = kept.unionByName(injected)
    w = Window.partitionBy(F.lit(1)).orderBy(
        F.desc(score_col), F.desc("_imp"), F.desc("_ts"), F.asc("id")
    )
    ranked = (
        out.join(F.broadcast(mem_info.select("id", "_imp", "_ts")), "id", "left")
        .withColumn("position", F.row_number().over(w))
    )
    if keep_order_cols:
        # callers (recall_full) reuse these for downstream re-ranks instead
        # of re-hydrating from the corpus
        return ranked.withColumnRenamed("_imp", "importance").withColumnRenamed(
            "_ts", "timestamp"
        )
    return ranked.drop("_imp", "_ts")
