"""Deterministic entities / entity_refs fixtures.

Mirrors FIXTURES.md Tables 3-4: near-duplicate slug pairs spanning every
branch of the dedup heuristics (auto-merge, review-by-confidence,
review-by-ambiguous-generic, dropped), a merged_into row that must be
excluded from scans, and aliases for the identity-lookup join.

Single source of truth is the Python lists; `entities_view` builds the Spark
DataFrame and `entities_oracle_cte` renders the same rows as DuckDB VALUES
(array syntax differs between engines, so no shared-SQL here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# (id, slug, category, aliases, merged_into)
ENTITIES: list[tuple[int, str, str, list[str], int | None]] = [
    (0, "alice", "people", [], None),
    (1, "alice-smith", "people", ["alice-m-smith"], None),
    (2, "postgres", "tools", [], None),
    (3, "postgresql", "tools", ["pg"], None),
    (4, "spark", "tools", [], None),
    (5, "apache-spark", "tools", [], None),
    (6, "bob", "people", [], None),
    (7, "bob-jones", "people", [], None),
    (8, "bob-marley", "people", [], None),
    (9, "kafka", "tools", ["apache-kafka"], None),
    (10, "flink", "tools", [], 9),  # already merged -> excluded from scans
    (11, "alpha", "projects", [], None),
    (12, "alphabet", "projects", [], None),
    (13, "data-pipeline", "projects", [], None),
    (14, "pipeline", "projects", [], None),
]

# (entity_id, memory_id) — overlap structure drives the dedup buckets:
#   alice ⊂ alice-smith            -> overlap 1.0 -> auto-merge
#   postgres/postgresql            -> overlap 0.4 -> review
#   spark/apache-spark             -> overlap 0.8 but conf<0.8 -> review
#   bob/bob-jones overlap 1.0      -> ambiguous generic ('bob' extends to
#                                     bob-jones AND bob-marley) -> review
#   pipeline ⊂ data-pipeline       -> overlap 1.0 -> auto-merge
ENTITY_REFS: list[tuple[int, int]] = (
    [(0, m) for m in (0, 3, 6, 9, 12)]
    + [(1, m) for m in (0, 3, 6, 9, 12, 100, 101)]
    + [(2, m) for m in (20, 21, 22, 23, 24)]
    + [(3, m) for m in (20, 21, 200, 201, 202, 203)]
    + [(4, m) for m in (30, 31, 32, 33, 34)]
    + [(5, m) for m in (30, 31, 32, 33, 300)]
    + [(6, m) for m in (40, 41, 42)]
    + [(7, m) for m in (40, 41, 42, 43)]
    + [(8, m) for m in (60, 61)]
    + [(9, m) for m in (70, 71)]
    + [(11, m) for m in (80, 81)]
    + [(12, m) for m in (90, 91)]
    + [(13, m) for m in (95, 96, 97)]
    + [(14, m) for m in (95, 96, 97)]
)


def entities_view(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        ENTITIES,
        "id bigint, slug string, category string, aliases array<string>, merged_into bigint",
    )


def entity_refs_view(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ENTITY_REFS, "entity_id bigint, memory_id bigint")


def entities_oracle_cte() -> str:
    rows = []
    for eid, slug, cat, aliases, merged in ENTITIES:
        alias_sql = "[" + ", ".join(f"'{a}'" for a in aliases) + "]"
        merged_sql = "CAST(NULL AS BIGINT)" if merged is None else str(merged)
        rows.append(f"({eid}, '{slug}', '{cat}', {alias_sql}::STRING[], {merged_sql})")
    return (
        "entities AS (SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ") e(id, slug, category, aliases, merged_into))"
    )


def entity_refs_oracle_cte() -> str:
    rows = ", ".join(f"({e}, {m})" for e, m in ENTITY_REFS)
    return f"entity_refs AS (SELECT * FROM (VALUES {rows}) r(entity_id, memory_id))"
