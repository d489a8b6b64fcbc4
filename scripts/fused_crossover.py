"""Cold-cache A/B for the fused single-scan recall channel (r11 verdict #5).

The r11 dispatch constant RECALL_FUSE_SCAN_MIN_ROWS (~4M estimated / ~2M
actual rows) was measured on ONE side only: a 500k-row cold point where
fused already wins. This script pins the constant empirically on BOTH
sides of the threshold:

- ABOVE: a documents-only sf40-class pool (default 400 replicas of the
  sf0.1 table = 2,000,000 rows) — the regime dispatch ships the fused
  shape for.
- BELOW: the sf1 pool (50k rows) where the composed two-scan shape is
  expected to win warm and be ~a wash cold.

Protocol (matches the r11 measurement in docs/SINGLE_QUERY_LATENCY.md):
per shape, one JVM; 3 timed runs of the full recall (plan build +
execution to count()), the OS page cache dropped before every run so
each scan pays full IO — the permanent regime of cluster executors
reading object storage. min-of-3 reported; all runs printed.

    python scripts/fused_crossover.py            # generate + measure both
    python scripts/fused_crossover.py 400 .sfcross

Output: one JSON line per (pool, shape) plus a verdict line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
SRC = "/root/testdata/sf0.1"
REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 400
OUT = os.path.join(ROOT, sys.argv[2] if len(sys.argv) > 2 else ".sfcross")
CHUNK = 40  # replicas per COPY (a 400-part UNION ALL strains the planner)


def generate() -> None:
    import duckdb

    path = os.path.join(OUT, "documents.parquet")
    if os.path.exists(path):
        return
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    base = con.sql(f"SELECT max(doc_id) FROM '{SRC}/documents.parquet'").fetchone()[0] + 1
    cols = [r[0] for r in con.sql(
        f"DESCRIBE SELECT * FROM '{SRC}/documents.parquet'"
    ).fetchall()]
    tmp = os.path.join(OUT, "_parts")
    os.makedirs(tmp, exist_ok=True)
    for start in range(0, REPLICAS, CHUNK):
        parts = []
        for k in range(start, min(start + CHUNK, REPLICAS)):
            sel = []
            for c in cols:
                if c == "doc_id":
                    sel.append(f"doc_id + {k * base} AS doc_id")
                elif c == "text" and k > 0:
                    # same replica-distinctness trick as make_sf1.py
                    sel.append(
                        "array_to_string(list_transform(string_split(text, ' '),"
                        f" (w, i) -> CASE WHEN i % 2 = 0 THEN w || '_r{k}'"
                        " ELSE w END), ' ') AS text"
                    )
                else:
                    sel.append(c)
            parts.append(f"SELECT {', '.join(sel)} FROM '{SRC}/documents.parquet'")
        con.sql(
            f"COPY ({' UNION ALL '.join(parts)})"
            f" TO '{tmp}/part_{start:04d}.parquet' (FORMAT PARQUET)"
        )
    con.sql(
        f"COPY (SELECT * FROM '{tmp}/part_*.parquet')"
        f" TO '{path}' (FORMAT PARQUET)"
    )
    n = con.sql(f"SELECT count(*) FROM '{path}'").fetchone()[0]
    import shutil

    shutil.rmtree(tmp)
    print(f"generated {path}: {n} rows", flush=True)


_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
from automem_spark.session import get_spark
import __spark_entry__ as E
from automem_spark.operators.recall import RecallRequest, recall

sf_dir, fused = sys.argv[1], sys.argv[2] == "fused"
spark = get_spark("fused-crossover", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
times = []
for trial in range(3):
    os.system("sync; echo 3 > /proc/sys/vm/drop_caches")
    t0 = time.time()
    mem = E.memories_view(spark, sf_dir)
    out = recall(mem, RecallRequest(query=E.RECALL_FUSED_QUERY, limit=10),
                 now=E.NOW, fuse_channels=fused)
    n = out.count()
    times.append(round(time.time() - t0, 3))
print(json.dumps({{"sf_dir": sf_dir, "shape": sys.argv[2], "rows_out": n,
                   "runs": times, "min": min(times)}}))
"""


def measure(sf_dir: str, shape: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _RUNNER.format(root=ROOT), sf_dir, shape],
        capture_output=True, text=True, cwd=ROOT, timeout=900,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    generate()
    results = []
    for sf_dir in (OUT, os.path.join(ROOT, ".sf1")):
        for shape in ("composed", "fused"):
            r = measure(sf_dir, shape)
            results.append(r)
            print(json.dumps(r), flush=True)
    by = {(os.path.basename(r["sf_dir"]), r["shape"]): r["min"] for r in results}
    verdict = {
        "above_threshold_fused_wins": by[(os.path.basename(OUT), "fused")]
        < by[(os.path.basename(OUT), "composed")],
        "below_threshold_margin": round(
            by[(".sf1", "fused")] - by[(".sf1", "composed")], 3
        ),
    }
    print(json.dumps({"verdict": verdict}))


if __name__ == "__main__":
    main()
