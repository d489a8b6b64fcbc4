"""A/B the materialization strategy behind maybe_checkpoint on the
checkpoint-gated bench rows (r15, VERDICT r14 ask #1).

The r14 driver bench showed the eager-localCheckpoint jobs ARE the timed
cost of minhash_lsh (build 1.353 s of 1.523) and connected_components
(0.648 of 0.901). This script races materialization modes for the
minhash_lsh row end-to-end (count sink, the bench protocol), interleaved
round-robin so host drift cancels:

  eager    - localCheckpoint(eager=True)     [current: one job per frame]
  lazy     - localCheckpoint(eager=False)    [materializes inside the first
                                              consuming job; plan truncated]
  persist  - persist(MEMORY_AND_DISK), lazy  [materializes inside the first
                                              consuming job; lineage kept]
  none     - no materialization              [r13 negative result: AQE does
                                              not reliably share the subtree]

Usage: python scripts/race_checkpoint.py [sf_dir] [cycles]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel

import __spark_entry__ as entrymod
from automem_spark import operators
from automem_spark.session import get_spark


def make_mode(mode: str):
    calls = {"n": 0}

    def patched(df, eager: bool = True):
        calls["n"] += 1
        if mode == "mixed":
            # first checkpoint (cand) eager, second (docs) lazy: the docs
            # frame then materializes inside the final action's job —
            # one fewer blocking job per query
            if calls["n"] % 2 == 1:
                return df.localCheckpoint(eager=True)
            return df.localCheckpoint(eager=False)
        if mode == "eager":
            return df.localCheckpoint(eager=True)
        if mode == "lazy":
            return df.localCheckpoint(eager=False)
        if mode == "persist":
            return df.persist(StorageLevel.MEMORY_AND_DISK)
        return df

    return patched


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("race-checkpoint")
    spark.sparkContext.setLogLevel("ERROR")
    dedup_mod = operators.dedup

    modes = ["eager", "lazy", "persist", "none", "mixed"]
    results: dict[str, list[float]] = {m: [] for m in modes}

    def run(mode: str) -> float:
        # clear the SQL cache so a persist-mode entry can never serve a
        # later run's canonically-identical plan (cross-run result caching
        # would fake the comparison — the same class the bench rules ban)
        spark.catalog.clearCache()
        dedup_mod.maybe_checkpoint = make_mode(mode)
        spark.sparkContext.setJobDescription(f"minhash_lsh ckpt={mode}")
        t0 = time.time()
        df = entrymod.q_minhash_lsh(spark, sf_dir)
        df.count()
        return time.time() - t0

    # warmup every mode once (codegen, file listing)
    for m in modes:
        run(m)
    for c in range(cycles):
        for m in modes:
            results[m].append(round(run(m), 3))
    for m in modes:
        print(f"minhash_lsh {m:8s} min={min(results[m]):.3f} all={results[m]}")


if __name__ == "__main__":
    main()
