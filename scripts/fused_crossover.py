"""Cold-cache A/B + bisection for the fused single-scan recall channel.

r11 measured the dispatch constant RECALL_FUSE_SCAN_MIN_ROWS on one side
only; r12 measured both sides (fused −21% at 2M actual rows, composed
−21% at 50k) which brackets the true crossover inside (50k, 2M). This
script measures ANY set of pool sizes so the constant can be set from the
bisected curve (r12 verdict ask #1):

    python scripts/fused_crossover.py              # the r12 pair: 2M + 50k
    python scripts/fused_crossover.py 50 100 200   # 250k / 500k / 1M pools

Each positional arg is a replica count of the sf0.1 documents table
(5,000 rows each -> 50 replicas = 250k rows), generated into
`.sfcross_{n}` (the legacy 400-replica pool stays at `.sfcross`). The
50k-row `.sf1` pool is always measured as the composed-wins floor.

Protocol (matches docs/SINGLE_QUERY_LATENCY.md): per (pool, shape) one
JVM; 3 timed runs of the full recall (plan build + execution to count()),
the OS page cache dropped before every run so each scan pays full IO —
the permanent regime of cluster executors reading object storage.
min-of-3 reported; all runs printed.

Cache-drop integrity (r12 ADVICE): the drop is a direct write to
/proc/sys/vm/drop_caches with the result checked — if it fails (non-root
container) the run is flagged `"cold": false` in its JSON line and the
verdict refuses to label it a cold measurement, instead of silently
reporting warm numbers as cold.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
SRC = "/root/testdata/sf0.1"
CHUNK = 40  # replicas per COPY (a 400-part UNION ALL strains the planner)


def pool_dir(replicas: int) -> str:
    # the r12 2M-row pool predates multi-size support; keep its path stable
    return os.path.join(ROOT, ".sfcross" if replicas == 400 else f".sfcross_{replicas}")


def generate(replicas: int) -> str:
    import duckdb

    out = pool_dir(replicas)
    path = os.path.join(out, "documents.parquet")
    if os.path.exists(path):
        return out
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    base = con.sql(f"SELECT max(doc_id) FROM '{SRC}/documents.parquet'").fetchone()[0] + 1
    cols = [r[0] for r in con.sql(
        f"DESCRIBE SELECT * FROM '{SRC}/documents.parquet'"
    ).fetchall()]
    tmp = os.path.join(out, "_parts")
    os.makedirs(tmp, exist_ok=True)
    for start in range(0, replicas, CHUNK):
        parts = []
        for k in range(start, min(start + CHUNK, replicas)):
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
    return out


_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
from automem_spark.session import get_spark
import __spark_entry__ as E
from automem_spark.operators.recall import RecallRequest, recall

def drop_caches() -> bool:
    # direct /proc write, result CHECKED (r12 ADVICE: the old
    # os.system form silently no-opped without root, turning "cold"
    # numbers warm with no trace)
    try:
        os.sync()
        with open("/proc/sys/vm/drop_caches", "w") as fh:
            fh.write("3")
        return True
    except OSError:
        return False

sf_dir, fused = sys.argv[1], sys.argv[2] == "fused"
spark = get_spark("fused-crossover", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
times, cold = [], True
for trial in range(3):
    cold = drop_caches() and cold
    t0 = time.time()
    mem = E.memories_view(spark, sf_dir)
    out = recall(mem, RecallRequest(query=E.RECALL_FUSED_QUERY, limit=10),
                 now=E.NOW, fuse_channels=fused)
    n = out.count()
    times.append(round(time.time() - t0, 3))
print(json.dumps({{"sf_dir": sf_dir, "shape": sys.argv[2], "rows_out": n,
                   "runs": times, "min": min(times), "cold": cold}}))
"""


def measure(sf_dir: str, shape: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _RUNNER.format(root=ROOT), sf_dir, shape],
        capture_output=True, text=True, cwd=ROOT, timeout=900,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        # surface the subprocess failure instead of a bare IndexError
        # with stderr discarded (r12 ADVICE)
        raise RuntimeError(
            f"runner failed for ({sf_dir}, {shape}): rc={out.returncode}\n"
            f"--- stderr (tail) ---\n{out.stderr[-2000:]}"
        )
    return json.loads(lines[-1])


def main() -> None:
    replica_sets = [int(a) for a in sys.argv[1:]] or [400]
    pools = [generate(r) for r in replica_sets] + [os.path.join(ROOT, ".sf1")]
    results = []
    for sf_dir in pools:
        for shape in ("composed", "fused"):
            r = measure(sf_dir, shape)
            results.append(r)
            print(json.dumps(r), flush=True)
    by = {(os.path.basename(r["sf_dir"]), r["shape"]): r for r in results}
    verdict = {"all_cold": all(r["cold"] for r in results)}
    for pool in {os.path.basename(r["sf_dir"]) for r in results}:
        c, f = by[(pool, "composed")]["min"], by[(pool, "fused")]["min"]
        verdict[pool] = {
            "composed_min": c,
            "fused_min": f,
            "fused_wins": f < c,
            "margin_pct": round(100.0 * (f - c) / c, 1),
        }
    if not verdict["all_cold"]:
        verdict["warning"] = (
            "cache drop FAILED on at least one run — these are WARM numbers, "
            "do not record them as the cold-cache crossover"
        )
    print(json.dumps({"verdict": verdict}))


if __name__ == "__main__":
    main()
