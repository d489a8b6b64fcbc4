"""Race the two MinHash signature implementations at scale (r13 verdict #1).

"map" (minhash_banded_map, the r14 Arrow kernel: one string hash per
shingle + 64 hashInt chains, no explode, no signature shuffle) vs "sql"
(the SQL-text expression path, the oracle anchor). Bit-identity is pinned
in tests/test_operators.py + tests/test_properties.py; this measures which
one is the right default, at the driver row's exact shape
(threshold 0.4, n=3, 64 hashes, 32 bands, verify=True).

Timing = build + full-evaluation noop sink, matching bench.py's total
protocol (the pipeline's eager candidate checkpoint executes during
build, so timing the action alone would hide most of the work).
Warmup + min-of-2 warm per (sf_dir, impl), idle machine.

Usage: python scripts/race_minhash.py [sf_dir ...]
       python scripts/race_minhash.py /root/testdata/sf0.1 .sf1 .sf3
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from automem_spark.operators.dedup import minhash_lsh_pairs
    from automem_spark.session import get_spark

    spark = get_spark("race-minhash")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1", ".sf1", ".sf3"]
    for sf_dir in sf_dirs:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        for label in ("sql", "map"):
            def run() -> float:
                t0 = time.time()
                pairs = minhash_lsh_pairs(
                    docs, 0.4, n=3, num_hashes=64, bands=32, signature_impl=label
                )
                pairs.write.format("noop").mode("overwrite").save()
                return time.time() - t0

            run()  # warmup
            best = min(run() for _ in range(2))
            print(f"{sf_dir:24s} {label:4s} {best:7.2f}s", flush=True)


if __name__ == "__main__":
    main()
