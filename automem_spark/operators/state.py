"""Bitemporal "current state" layer.

Reference counterparts (SURVEY.md §2.2 F8, §2.4 J4/J5):
- F8 payload state reason: archived / t_valid>now (not_yet_valid) /
  t_invalid<=now (expired)                        automem/api/recall.py:437-449
- J5 current-state filter + replacement injection automem/api/recall.py:596-723
  (replacement = supersession chain head from J4, injected as
  match_type='state_replacement' carrying the suppressed row's score,
  deduped against ids already in the result set, and required to be active)

Scale notes: the supersession `heads` map is tiny relative to the corpus
(only nodes with outgoing INVALIDATED_BY/EVOLVED_INTO edges), so both joins
below broadcast; no extra shuffle lands on the result set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


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
    state = memories.select(
        "id",
        state_reason_expr(
            F.col("archived"), F.col("t_valid"), F.col("t_invalid"), now_col
        ).alias("state_reason"),
        F.col("importance").alias("_m_importance"),
        F.col("timestamp").alias("_m_timestamp"),
    )

    # per-hop activity gating means every returned head is active by
    # construction — no post-hoc head filter needed
    heads = resolve_supersession(edges, node_state=state.select("id", "state_reason"))
    active_heads = heads.select(F.col("start").alias("id"), F.col("head"))

    annotated = (
        results.join(F.broadcast(state.select("id", "state_reason")), "id", "left")
        .join(F.broadcast(active_heads), "id", "left")
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
        .join(seen, "head", "left_anti")
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
    mem_order = memories.select(
        "id",
        F.col("importance").alias("_imp"),
        F.col("timestamp").alias("_ts"),
    )
    w = Window.partitionBy(F.lit(1)).orderBy(
        F.desc(score_col), F.desc("_imp"), F.desc("_ts"), F.asc("id")
    )
    return (
        out.join(F.broadcast(mem_order), "id", "left")
        .withColumn("position", F.row_number().over(w))
        .drop("_imp", "_ts")
    )
