"""Engine-deterministic aggregate math — the repo's standing determinism
discipline (r7 sf1 sweep), factored out of the entry registry so operators
can use it too.

Why these exist (each class was caught as a REAL cross-engine divergence at
sf1, see the sweep notes in __spark_entry__.py):

- float SUM/AVG are partial-aggregation-order dependent: the last digit of
  ``round(avg(double))`` flips between engines/scales. Fix: quantize per
  row to exact integer micro-units, sum integers (order-independent),
  divide once.
- ``round()`` of the SAME double diverges between engines at half
  boundaries (Spark rounds the shortest decimal expansion via BigDecimal
  HALF_UP; DuckDB rounds after an FP multiply). Fix: floor(x*10^k + 0.5),
  a pure FP formula both engines evaluate identically (positive inputs).

``scripts/det_lint.py`` mechanically forbids the raw patterns; these are
the sanctioned replacements. SQL twins mirror each function for DuckDB
oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def us(col: Column) -> Column:
    """Per-row micro-units: round(x * 1e6) as BIGINT. Exact for inputs with
    <= 6 decimal digits; for arbitrary doubles it quantizes at 1e-6, which
    both engines do identically — the point is the SUM of these integers is
    order-independent where a float sum is not."""
    return F.round(col * 1e6, 0).cast("long")


def det_round(col: Column, k: int) -> Column:
    """Engine-deterministic half-up rounding: floor(x*10^k + 0.5)/10^k.
    Positive inputs only. SQL twin: :func:`dr_sql`."""
    f = float(10**k)
    return F.floor(col * f + F.lit(0.5)) / F.lit(f)


def us_mean(col: Column, k: int = 6) -> Column:
    """Order-independent mean of a double column, rounded to k places:
    sum(micro-units) / 1e6 / count(non-null), the sanctioned replacement
    for round(avg(x), k). SQL twin: :func:`us_mean_sql`."""
    return det_round(F.sum(us(col)) / 1e6 / F.count(col), k)


def us_sum_sql(expr: str) -> str:
    """DuckDB twin of sum(us(expr))."""
    return f"sum(CAST(round(({expr}) * 1e6, 0) AS BIGINT))"


def dr_sql(expr: str, k: int) -> str:
    """DuckDB twin of :func:`det_round`."""
    f = float(10**k)
    return f"floor(({expr}) * {f} + 0.5) / {f}"


def us_mean_sql(expr: str, count_expr: str = "count(*)", k: int = 6) -> str:
    """DuckDB twin of :func:`us_mean`. Pass ``count_expr`` counting the
    same non-null rows the Spark side's F.count(col) sees."""
    return dr_sql(f"{us_sum_sql(expr)} / 1e6 / {count_expr}", k)
