"""Mechanical enforcement of the determinism discipline (r7 sf1 sweep):
the lint in scripts/det_lint.py must (1) pass on the live registry and
(2) stay RED on deliberately bad sentinel rows for both failure classes —
round(avg(double)) partial-order drift and uncast windowed integer SUM
HUGEINT dtype drift (the r6 user_sessions red row). No Spark session
needed; this is pure source/string analysis."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.det_lint import lint_oracle_sql, lint_registry, lint_spark_source


def test_registry_is_lint_clean():
    problems = lint_registry()
    assert problems == [], "\n".join(problems)


def test_sentinel_round_avg_is_red():
    bad = "SELECT g, round(avg(x), 6) AS mean_x FROM t GROUP BY g"
    hits = lint_oracle_sql("sentinel", bad)
    assert len(hits) == 1 and "round(avg" in hits[0]


def test_sentinel_uncast_windowed_sum_is_red():
    # the exact r6 user_sessions shape: windowed integer SUM aliased
    # directly to an output column, no CAST -> DuckDB HUGEINT -> pandas
    # float64 -> driver hash mismatch
    bad = (
        "SELECT user_id, sum(n) OVER (PARTITION BY user_id ORDER BY ts) "
        "AS total_events FROM events"
    )
    hits = lint_oracle_sql("sentinel", bad)
    assert len(hits) == 1 and "windowed SUM" in hits[0]


def test_cast_windowed_sum_is_green():
    good = (
        "SELECT user_id, CAST(sum(n) OVER (PARTITION BY user_id ORDER BY ts)"
        " AS BIGINT) AS total_events FROM events"
    )
    assert lint_oracle_sql("ok", good) == []


def test_cte_internal_windowed_sum_is_green():
    # HUGEINT inside a CTE feeds further arithmetic and never reaches the
    # driver's canonicalizer — must NOT false-positive (recall_full /
    # adaptive_floor keep this shape)
    ok = (
        "WITH rt AS (SELECT id, sum(CASE WHEN x THEN 1 ELSE 0 END) OVER () "
        "AS retained FROM t) "
        "SELECT id FROM rt WHERE retained > 3"
    )
    assert lint_oracle_sql("ok", ok) == []


def test_sentinel_uncast_plain_sum_is_red():
    # r8 advisor extension: a PLAIN integer SUM directly aliased in the
    # final projection also reaches the driver as HUGEINT (and a double
    # SUM here would be partial-order-dependent) — must be red uncast
    bad = "SELECT g, sum(n) AS total_n FROM t GROUP BY g"
    hits = lint_oracle_sql("sentinel", bad)
    assert len(hits) == 1 and "plain SUM" in hits[0]


def test_cte_internal_plain_sum_is_green():
    # r9 advisor flagged sums aliased inside CTEs/subqueries whose FINAL
    # projection casts them as a plain-SUM false-positive class — pin that
    # the final-projection span restriction already excludes both shapes
    cte = (
        "WITH o AS (SELECT k, sum(v) AS n FROM t GROUP BY k) "
        "SELECT k, CAST(n AS BIGINT) AS n FROM o"
    )
    assert lint_oracle_sql("ok", cte) == []
    sub = (
        "SELECT k, CAST(n AS BIGINT) AS n "
        "FROM (SELECT k, sum(v) AS n FROM t GROUP BY k)"
    )
    assert lint_oracle_sql("ok", sub) == []


def test_cast_with_space_is_green():
    # r8 advisor: 'CAST( sum(...)' with whitespace used to false-positive
    # under the endswith("cast(") check
    good = "SELECT g, CAST( sum(n) AS BIGINT) AS total_n FROM t GROUP BY g"
    assert lint_oracle_sql("ok", good) == []


def test_spark_source_sentinel_is_red():
    bad = 'df.agg(F.round(F.avg("score"), 6).alias("mean_score"))'
    hits = lint_spark_source(bad)
    assert len(hits) == 1 and "us_mean" in hits[0]
