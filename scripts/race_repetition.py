"""Race the two repetition-filter implementations at scale.

The expression path (posexplode + lead() windows + tagged-gram counts)
shuffles the token stream ~3x; the mapInPandas path computes the same
per-document stats in one scan with zero shuffle. Both are bit-identical
(tests/test_corpus_hygiene.py); this measures which one is the right
100 TB default, full-evaluation noop sink, min-of-2 warm.

Usage: python scripts/race_repetition.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def planted(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    return docs.select(
        "doc_id",
        F.when(d % 7 == 0, F.concat(F.col("text"), F.repeat(F.lit(" spark graft"), 30)))
        .when(d % 7 == 1, F.concat_ws(" ", F.col("text"), F.col("text"), F.col("text")))
        .otherwise(F.col("text"))
        .alias("text"),
    )


def noop_time(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    from automem_spark.operators.textquality import (
        repetition_filter,
        repetition_filter_map,
    )
    from automem_spark.session import get_spark

    spark = get_spark("race-repetition")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dirs = sys.argv[1:] or [".sf1", ".sf3"]
    for sf_dir in sf_dirs:
        for label, fn in (("expr", repetition_filter), ("map", repetition_filter_map)):
            df = fn(planted(spark, sf_dir))
            noop_time(df)  # warmup
            best = min(noop_time(df) for _ in range(2))
            print(f"{sf_dir:8s} {label:5s} {best:7.2f}s", flush=True)


if __name__ == "__main__":
    main()
