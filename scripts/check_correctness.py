"""Local emulation of the driver's t2 correctness gate: run every
queries() entry in Spark and its oracle_sql() twin in DuckDB at sf0.01,
compare row count, column names, and a DRIVER-FAITHFUL pandas value hash.

Round-7 rewrite: both r6 driver failures (user_sessions HUGEINT->float64
dtype drift, embedding_coerce LIST-column canonicalizer crash) passed the
old Python-value comparison here, so the local gate no longer predicted
the driver gate. The driver fetches BOTH engines to pandas, sorts on all
columns, and hashes dtype-sensitively; this script now does the same:

  * Spark side via toPandas(), DuckDB side via fetchdf() — dtypes visible.
  * Canonicalize = select sorted(columns), sort_values on ALL columns,
    reset_index, then pd.util.hash_pandas_object (dtype-sensitive: int64 1
    and float64 1.0 hash differently, exactly like the driver).
  * Any exception during canonicalization (e.g. unhashable list columns in
    sort_values) is a FAIL, exactly like the driver's harness crash.
  * On hash mismatch we additionally diff values the old way so the report
    says whether it is a dtype-only drift (the HUGEINT class) or a real
    value divergence.

`--selftest` runs two sentinel rows that MUST fail — a raw LIST column on
both engines, and a deliberately uncast DuckDB windowed integer SUM vs a
Spark int64 — proving this gate catches both r6 failure classes.

Usage: python scripts/check_correctness.py [sf_dir] [only_query ...]
       python scripts/check_correctness.py --selftest
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def canon_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonicalization: sorted column order, full-row sort,
    fresh index. Raises (like the driver) on unsortable/unhashable cells."""
    pdf = pdf[sorted(pdf.columns)].copy()
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def frame_hash(pdf: pd.DataFrame) -> int:
    """Dtype-sensitive content hash (pandas hashes raw dtype bytes, so an
    int64 column and a float64 column of equal values hash differently)."""
    if not len(pdf):
        return 0
    return int(pd.util.hash_pandas_object(pdf, index=False).sum())


def value_diffs(spdf: pd.DataFrame, opdf: pd.DataFrame, limit: int = 3):
    """Old-style value-level diff for diagnostics: rounds floats, ignores
    dtypes. Empty result + hash mismatch == dtype-only drift."""
    def key(pdf):
        out = []
        for row in pdf.itertuples(index=False):
            t = []
            for v in row:
                # numbers (int OR float) normalize through the same float
                # path, so an int64-vs-float64 drift with equal values
                # yields an EMPTY diff and gets reported as DTYPE-ONLY —
                # the r6 HUGEINT class — rather than a phantom value bug
                if isinstance(v, (int, float, np.integer, np.floating)) and not isinstance(v, bool):
                    t.append("nan" if pd.isna(v) else repr(round(float(v), 9)))
                elif pd.isna(v) if np.isscalar(v) or v is None else False:
                    t.append("nan")
                else:
                    t.append(v)
            out.append(tuple(t))
        return sorted(out, key=repr)

    sk, ok = key(spdf), key(opdf)
    return [(a, b) for a, b in zip(sk, ok) if a != b][:limit]


def compare(name: str, spdf: pd.DataFrame, opdf: pd.DataFrame) -> list[str]:
    """Compare two pandas frames the driver's way; return problem strings."""
    problems = []
    if sorted(spdf.columns) != sorted(opdf.columns):
        return [f"columns {sorted(spdf.columns)} vs {sorted(opdf.columns)}"]
    if len(spdf) != len(opdf):
        return [f"rowcount {len(spdf)} vs {len(opdf)}"]
    try:
        sc = canon_frame(spdf)
    except Exception as e:
        return [f"spark frame not canonicalizable (driver would crash): {e!r}"]
    try:
        oc = canon_frame(opdf)
    except Exception as e:
        return [f"oracle frame not canonicalizable (driver would crash): {e!r}"]
    try:
        sh, oh = frame_hash(sc), frame_hash(oc)
    except Exception as e:
        return [f"unhashable frame (driver would crash): {e!r}"]
    if sh != oh:
        dt = {
            c: (str(sc[c].dtype), str(oc[c].dtype))
            for c in sc.columns
            if str(sc[c].dtype) != str(oc[c].dtype)
        }
        diffs = value_diffs(sc, oc)
        if dt and not diffs:
            problems.append(f"DTYPE-ONLY hash drift (values agree): {dt}")
        else:
            problems.append(f"hash mismatch; dtype drifts={dt}; first value diffs: {diffs}")
    return problems


def selftest() -> None:
    """Two sentinels reproducing the r6 driver-failure classes; both MUST
    fail under this gate (they passed the old value-level gate)."""
    con = duckdb.connect()

    # Sentinel 1: raw LIST/array column on both engines. Values identical;
    # the driver's sort_values dies on unhashable lists.
    s1_spark = pd.DataFrame({"id": [2, 1], "emb": [[1.0, 2.0], [3.0, 4.0]]})
    s1_oracle = con.execute(
        "SELECT * FROM (VALUES (2, [1.0, 2.0]), (1, [3.0, 4.0])) t(id, emb)"
    ).fetchdf()
    p1 = compare("sentinel_list_column", s1_spark, s1_oracle)
    assert p1, "sentinel 1 (LIST column) should FAIL but passed"
    print(f"selftest 1 (LIST column) correctly fails: {p1[0][:90]}")

    # Sentinel 2: uncast DuckDB windowed integer SUM (HUGEINT -> float64 in
    # pandas) vs Spark's int64. Same values, different dtypes.
    s2_spark = pd.DataFrame({"k": [1, 2], "s": np.array([1, 3], dtype="int64")})
    s2_oracle = con.execute(
        """SELECT k, SUM(v) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS s
           FROM (VALUES (1, 1), (2, 2)) t(k, v)"""
    ).fetchdf()
    assert str(s2_oracle["s"].dtype) != "int64", (
        f"expected DuckDB HUGEINT to land as non-int64, got {s2_oracle['s'].dtype}"
    )
    p2 = compare("sentinel_hugeint_sum", s2_spark, s2_oracle)
    assert p2, "sentinel 2 (HUGEINT windowed SUM) should FAIL but passed"
    assert "DTYPE-ONLY" in p2[0], (
        f"HUGEINT drift must classify as dtype-only, not a value bug: {p2[0]}"
    )
    print(f"selftest 2 (HUGEINT windowed SUM) correctly fails: {p2[0][:90]}")

    # Control: identical frames pass.
    c = pd.DataFrame({"a": [1, 2], "b": [0.5, 1.5]})
    assert not compare("control", c.copy(), c.iloc[::-1].reset_index(drop=True))
    print("selftest control (identical frames, reordered rows) passes")
    print("selftest OK — local gate catches both r6 driver-failure classes")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        selftest()
        return

    import __spark_entry__ as entrymod
    from automem_spark.session import get_spark
    from automem_spark.sources.tables import TABLES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    # in-memory DuckDB cannot spill without a temp dir — at large sf_dirs a
    # heavy oracle would OOM instead of going out-of-core (see sf_sweep.py)
    con.execute("SET temp_directory='/tmp/check_correctness_duckdb.tmp'")
    con.execute("SET max_temp_directory_size='50GB'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("correctness-check", shuffle_partitions=8)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(
                f"rows  {name}: {len(spdf)} rows (no oracle)  [{time.time()-t0:.1f}s]"
            )
            continue
        try:
            opdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = compare(name, spdf, opdf)
        if problems:
            failures.append(name)
            for p in problems:
                print(f"FAIL  {name}: {p}")
        else:
            print(f"OK    {name}: {len(spdf)} rows  [{time.time()-t0:.1f}s]")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
