"""Scale check for BOTH connected-components strategies above the bench
fixtures (r13): the driver rows exercise only tiny thresholded candidate
graphs (the single-task union-find side of the CC_LOCAL_MAX_EDGES
dispatch), so this script proves the OTHER side — the distributed
pointer-jumping loop — still converges and stays cheap on a graph far
above the dispatch bound, and that the two strategies agree there.

Graph: configurable random multigraph (default 2M directed edge rows over
3M nodes — above the 1M dispatch bound, with long chains mixed in so the
loop needs real rounds). Both paths run on the SAME frame; agreement is
checked distributively (join + count of label mismatches — no driver
collect of the label sets).

    python scripts/cc_scale_check.py [n_edges] [n_nodes]

Prints one JSON line: wall seconds per path, number of distinct
components (must match), and mismatching label count (must be 0).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from automem_spark.operators.graph import connected_components
from automem_spark.session import get_spark

N_EDGES = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
N_NODES = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000_000


def main() -> None:
    spark = get_spark("cc-scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    # Knuth-hash random pairs plus an embedded chain (ids 0..9999 linked
    # sequentially) so convergence needs pointer jumping, not one round.
    rand = spark.range(N_EDGES - 10_000).selectExpr(
        f"cast(id % {N_NODES} as long) AS src",
        f"cast((id * 2654435761) % {N_NODES} AS long) AS dst",
    )
    chain = spark.range(10_000).selectExpr(
        "cast(id as long) AS src", "cast(id + 1 as long) AS dst"
    )
    edges = rand.unionByName(chain)
    nodes = spark.range(N_NODES).select(F.col("id"))

    out: dict = {"n_edges": N_EDGES, "n_nodes": N_NODES}
    frames = {}
    for path, bound in (("loop", 0), ("local", 10**12)):
        t0 = time.time()
        labels = connected_components(edges, nodes, local_max_edges=bound)
        labels = labels.localCheckpoint(eager=True)  # time the full compute
        out[f"{path}_secs"] = round(time.time() - t0, 1)
        out[f"{path}_components"] = labels.select("component").distinct().count()
        frames[path] = labels

    mism = (
        frames["loop"].withColumnRenamed("component", "c1")
        .join(frames["local"].withColumnRenamed("component", "c2"), "id")
        .filter(F.col("c1") != F.col("c2"))
        .count()
    )
    out["label_mismatches"] = mism
    out["agree"] = mism == 0 and out["loop_components"] == out["local_components"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
