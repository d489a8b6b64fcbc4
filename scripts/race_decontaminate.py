"""Race the three semantic-decontamination implementations at scale.

Paths (operators/trainprep.py):
  expr   — crossJoin + higher-order-function cosine per (train, eval) pair
           + groupBy max: the original exact path and the SQL oracle's
           structural twin. Allocation-bound at ~30us/pair.
  matmul — broadcast eval matrix + one BLAS block per Arrow batch, row max
           in-batch: exact, zero shuffle, one scan (r9 twin).
  ivf    — coarse-quantized candidate pruning (n_centroids=8, nprobe=4 —
           the property-tested flag-equality config): approximate lower
           bound, prunes pairs to ~nprobe/n_centroids.

Protocol: full-evaluation noop sink, warmup + min-of-2 warm, idle
local[32] — the repetition-filter race protocol. The expr path is raced
only at the small-eval config (its pair count makes larger configs
~20 min/run; the small-config ratio already tells the story).

Usage: python scripts/race_decontaminate.py [sf_dir eval_mod]...
Default grid: (.sf1, 97) (.sf1, 10) (.sf3, 29) (.sf10, 97) — eval sizes
~206 / 2,000 / ~2,069 / ~2,062 with train sides 20k / 20k / 60k / 200k.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

DEFAULT_GRID = [(".sf1", 97), (".sf1", 10), (".sf3", 29), (".sf10", 97)]


def main() -> None:
    from automem_spark.operators.trainprep import (
        semantic_decontaminate,
        semantic_decontaminate_ivf,
        semantic_decontaminate_matmul,
    )
    from automem_spark.session import get_spark

    args = sys.argv[1:]
    grid = (
        [(args[i], int(args[i + 1])) for i in range(0, len(args), 2)]
        if args
        else DEFAULT_GRID
    )
    spark = get_spark("race-decontaminate")
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for sf_dir, mod in grid:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        is_eval = F.col("vec_id") % mod == 0
        train, ev = emb.filter(~is_eval), emb.filter(is_eval)
        n_train, n_eval = train.count(), ev.count()
        paths = {
            "matmul": lambda: semantic_decontaminate_matmul(train, ev, 0.35),
            "ivf": lambda: semantic_decontaminate_ivf(
                train, ev, 0.35, n_centroids=8, nprobe=4
            ),
        }
        if mod == 97 and sf_dir == ".sf1":
            paths["expr"] = lambda: semantic_decontaminate(train, ev, 0.35)
        row = {"sf_dir": sf_dir, "n_train": n_train, "n_eval": n_eval}
        for name, build in paths.items():
            times = []
            for i in range(3):
                t0 = time.time()
                build().write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                if i > 0:
                    times.append(dt)
                print(
                    f"  {sf_dir} eval={n_eval} {name} run{i}: {dt:.2f}s",
                    file=sys.stderr,
                    flush=True,
                )
            row[name] = round(min(times), 3)
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"race": results}))


if __name__ == "__main__":
    main()
