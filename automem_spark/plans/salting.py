"""Salted two-phase aggregation for skewed group keys.

AQE's skew handling splits oversized SHUFFLE JOIN partitions
(session.py: spark.sql.adaptive.skewJoin.enabled), but a skewed
aggregation — a handful of hot keys receiving most of the rows, e.g.
event_type over an event stream, language over a web corpus — still
funnels each hot key through one reducer. The classic fix is salting:
aggregate on (key, salt) first so each hot key spreads over `n_salts`
reducers doing map-side-combined partial work, then collapse the salted
partials in a second, tiny aggregation keyed on the real key.

Only decomposable aggregates can split this way; the helper supports the
standard algebra (count/sum/min/max, and avg via sum+count). The result
is bit-identical to the unsalted aggregation for any salt count — pinned
by test and by the driver's DuckDB oracle (which knows nothing of salt).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# spec: (source_col, op, alias); op in {count,count_rows,sum,min,max,avg}.
# 'count' is SQL count(col) — null-skipping, like the avg decomposition;
# 'count_rows' is count(*) and ignores its source column.
Spec = tuple[str, str, str]

_PARTIAL = {
    "count": F.count,
    "count_rows": lambda c: F.count(F.lit(1)),
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}
_FINAL = {
    "count": F.sum,  # counts add up across salts
    "count_rows": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salt_expr(keys: list[str], n_salts: int, salt_on: str | None = None) -> Column:
    """Per-row salt in [0, n_salts): hash of a high-cardinality column when
    one is available (uniform regardless of partition layout), else the
    input partition id (rows of a hot key spread exactly as the scan laid
    them out — no shuffle either way)."""
    if salt_on is not None:
        return F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salts))
    return F.spark_partition_id() % n_salts


def salted_agg(
    df: DataFrame,
    keys: list[str],
    specs: list[Spec],
    *,
    n_salts: int = 32,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase skew-proof aggregation: groupBy(keys + salt) partials,
    then groupBy(keys) to collapse. One extra (small) shuffle of
    |keys| x n_salts rows buys hot-key parallelism of n_salts.

    avg decomposes into sum + count internally (never avg-of-avgs — that
    would weight salt buckets, not rows).
    """
    partial_cols: list[Column] = []
    for src, op, alias in specs:
        if op == "avg":
            partial_cols.append(F.sum(src).alias(f"_s_{alias}"))
            partial_cols.append(F.count(src).alias(f"_c_{alias}"))
        elif op in _PARTIAL:
            fn = _PARTIAL[op]
            partial_cols.append(fn(src).alias(f"_p_{alias}"))
        else:
            raise ValueError(f"non-decomposable aggregate: {op}")
    partial = df.groupBy(
        *keys, salt_expr(keys, n_salts, salt_on).alias("_salt")
    ).agg(*partial_cols)

    final_cols: list[Column] = []
    for src, op, alias in specs:
        if op == "avg":
            final_cols.append(
                (F.sum(f"_s_{alias}") / F.sum(f"_c_{alias}")).alias(alias)
            )
        else:
            final_cols.append(_FINAL[op](f"_p_{alias}").alias(alias))
    return partial.groupBy(*keys).agg(*final_cols)
