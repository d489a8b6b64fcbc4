"""A/B the edge-frame materialization of connected_components (r15,
VERDICT r14 ask #1). Modes:

  eager   - current: eager localCheckpoint with the density probe fused
            as an Observation riding the checkpoint job
  none    - AUTOMEM_SPARK_DISABLE_CHECKPOINT semantics: no
            materialization; probe is an explicit agg; the final action
            recomputes the edge build
  persist - lazy MEMORY_AND_DISK persist; probe is an explicit agg (which
            materializes the cache); final action reads the cache

spark.catalog.clearCache() runs before every sample so persist-mode cache
entries can never serve a later run (the cross-run reuse trap measured in
race_checkpoint.py).

Usage: python scripts/race_cc_checkpoint.py [sf_dir] [cycles]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel

import __spark_entry__ as entrymod
from automem_spark.operators import graph as graph_mod
from automem_spark.session import get_spark

ORIG_CKPT = graph_mod.maybe_checkpoint
ORIG_ENABLED = graph_mod.checkpointing_enabled


def set_mode(mode: str) -> None:
    if mode == "eager":
        graph_mod.maybe_checkpoint = ORIG_CKPT
        graph_mod.checkpointing_enabled = ORIG_ENABLED
    elif mode == "none":
        graph_mod.maybe_checkpoint = lambda df, eager=True: df
        graph_mod.checkpointing_enabled = lambda: False
    elif mode == "persist":
        graph_mod.maybe_checkpoint = lambda df, eager=True: df.persist(
            StorageLevel.MEMORY_AND_DISK
        )
        graph_mod.checkpointing_enabled = lambda: False


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("race-cc-checkpoint")
    spark.sparkContext.setLogLevel("ERROR")

    modes = ["eager", "none", "persist"]
    results: dict[str, list[float]] = {m: [] for m in modes}

    def run(mode: str) -> float:
        spark.catalog.clearCache()
        set_mode(mode)
        spark.sparkContext.setJobDescription(f"connected_components ckpt={mode}")
        t0 = time.time()
        df = entrymod.q_connected_components(spark, sf_dir)
        df.count()
        return time.time() - t0

    for m in modes:
        run(m)
    for c in range(cycles):
        for m in modes:
            results[m].append(round(run(m), 3))
    set_mode("eager")
    for m in modes:
        print(f"connected_components {m:8s} min={min(results[m]):.3f} all={results[m]}")


if __name__ == "__main__":
    main()
