"""Local emulation of the driver's t2 correctness gate: run every
queries() entry in Spark and its oracle_sql() twin in DuckDB at sf0.01,
compare row count, column names, and order-insensitive values.

Usage: python scripts/check_correctness.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from automem_spark.session import get_spark
from automem_spark.sources.tables import TABLES


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # collapse -0.0 and fold near-int floats deterministically
        return repr(round(v, 9))
    return v


def rows_key(rows, cols):
    out = []
    for r in rows:
        d = dict(zip(cols, r)) if not isinstance(r, dict) else r
        out.append(tuple(canon(d[c]) for c in sorted(cols)))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
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
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle)  [{time.time()-t0:.1f}s]")
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns {sorted(scols)} vs {sorted(ocols)}")
            ok = False
        elif len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(orows)}")
            ok = False
        else:
            sk = rows_key(srows, scols)
            okk = rows_key(orows, ocols)
            if sk != okk:
                diffs = [(a, b) for a, b in zip(sk, okk) if a != b][:3]
                print(f"FAIL  {name}: value mismatch, first diffs: {diffs}")
                ok = False
        if ok:
            print(f"OK    {name}: {len(srows)} rows  [{time.time()-t0:.1f}s]")
        else:
            failures.append(name)

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
