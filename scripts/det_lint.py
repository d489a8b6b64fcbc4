"""Mechanical determinism lint over the registry's oracle SQL and the
entry's Spark expressions.

The r7 sf1 sweep caught two scale-only divergence classes and fixed them
class-wide; this lint keeps them fixed MECHANICALLY, so a new registry row
cannot silently regress the discipline:

1. ``round(avg(double))`` (either engine): the average of doubles is
   partial-aggregation-order dependent, so the rounded last digit flips
   between engines/scales. Required shape: integer micro-unit sums
   (``_us`` / ``_US_SUM_SQL``) divided after aggregation, rounded with
   ``_det_round`` / ``_DR_SQL``.
2. ``sum(...) OVER (...) AS col`` without a ``CAST(... AS BIGINT)``
   wrapper in DuckDB SQL: DuckDB emits HUGEINT for integer sums, pandas
   coerces it to float64, and the driver's dtype-sensitive frame hash
   diverges from Spark's int64 even when every value agrees (the r6
   ``user_sessions`` red row).

Both rules are deliberately narrow (directly-aliased output columns only)
so intermediate CTE arithmetic — where HUGEINT never reaches the driver's
canonicalizer — does not false-positive.

Usage: imported by tests/test_determinism_lint.py; also runnable:
    python scripts/det_lint.py   # lints the live registry, exits 1 on hits
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _matching_paren(s: str, i: int) -> int:
    """Index of the ')' closing the '(' at s[i], or -1."""
    depth = 0
    for j in range(i, len(s)):
        if s[j] == "(":
            depth += 1
        elif s[j] == ")":
            depth -= 1
            if depth == 0:
                return j
    return -1


def _final_projection_span(low: str) -> tuple[int, int]:
    """(start, end) char span of the OUTERMOST final SELECT's projection —
    the last paren-depth-0 ``select`` through its matching depth-0 ``from``.
    Only expressions inside this span can reach the driver's pandas
    canonicalizer directly; windowed sums inside CTEs feed further
    arithmetic and their HUGEINT never leaves DuckDB."""
    depth = 0
    sel_start = -1
    for m in re.finditer(r"[()]|\bselect\b|\bfrom\b", low):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif tok == "select" and depth == 0:
            sel_start = m.end()
    if sel_start < 0:
        return (0, len(low))
    depth = 0
    for m in re.finditer(r"[()]|\bfrom\b", low[sel_start:]):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            return (sel_start, sel_start + m.start())
    return (sel_start, len(low))


def lint_oracle_sql(name: str, sql: str) -> list[str]:
    problems: list[str] = []
    low = sql.lower()
    for m in re.finditer(r"round\s*\(\s*avg\s*\(", low):
        problems.append(
            f"{name}: round(avg(...)) — partial-aggregation order flips the "
            "last digit; use _US_MEAN_SQL / _US_SUM_SQL + _DR_SQL instead"
        )
    proj_start, proj_end = _final_projection_span(low)
    for m in re.finditer(r"\bsum\s*\(", low):
        if not (proj_start <= m.start() < proj_end):
            continue
        open_i = low.index("(", m.start())
        close_i = _matching_paren(low, open_i)
        if close_i < 0:
            continue
        over = re.match(r"\s*over\s*\(", low[close_i + 1 :])
        if over:
            over_close = _matching_paren(low[close_i + 1 :], over.end() - 1)
            if over_close < 0:
                continue
            tail = low[close_i + 1 + over_close + 1 :]
            kind = "windowed SUM"
        else:
            tail = low[close_i + 1 :]
            kind = "plain SUM"
        # only a sum aliased DIRECTLY to an output column reaches the
        # driver's pandas canonicalizer (integer sums as HUGEINT; double
        # sums are partial-order-dependent and belong in _US_SUM form)
        if re.match(r"\s*as\s+\w", tail):
            # whitespace-tolerant CAST( prefix match (r8 advisor: the old
            # endswith("cast(") missed 'CAST( sum(...)' with a space)
            before = low[: m.start()]
            if not re.search(r"\bcast\(\s*$", before):
                problems.append(
                    f"{name}: {kind} aliased directly to an output column "
                    "without CAST(... AS BIGINT) — DuckDB HUGEINT becomes "
                    "pandas float64 and the driver hash diverges (and a "
                    "double SUM here is partial-order-dependent; use "
                    "_US_SUM_SQL)"
                )
    return problems


def lint_spark_source(src: str, where: str = "entry source") -> list[str]:
    problems: list[str] = []
    for m in re.finditer(r"F\.round\s*\(\s*F\.avg\s*\(", src):
        line = src.count("\n", 0, m.start()) + 1
        problems.append(
            f"{where} line {line}: F.round(F.avg(...)) — "
            "partial-order-dependent; use detmath.us_mean"
        )
    return problems


def lint_registry() -> list[str]:
    import glob

    import __spark_entry__ as entrymod

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    problems: list[str] = []
    for name, sql in entrymod.oracle_sql().items():
        problems.extend(lint_oracle_sql(name, sql))
    sources = [entrymod.__file__] + sorted(
        glob.glob(os.path.join(repo, "automem_spark", "**", "*.py"), recursive=True)
    )
    for path in sources:
        with open(path) as f:
            problems.extend(
                lint_spark_source(f.read(), where=os.path.relpath(path, repo))
            )
    return problems


if __name__ == "__main__":
    hits = lint_registry()
    for p in hits:
        print("LINT", p)
    print(f"{len(hits)} problems")
    sys.exit(1 if hits else 0)
