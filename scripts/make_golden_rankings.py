"""Regenerate tests/golden/recall_rankings.json — the pinned golden-ranking
quality anchor (SURVEY §5(3); reference recall-quality lab,
scripts/lab/lab_metrics.py:11-58 + FIXTURES.md Table 1).

The corpus is fully deterministic (memories_view over the sf0.001 documents
fixture + the placeholder-embedding rule), so the end-to-end hybrid recall
ranking is bit-reproducible; the committed file pins it. Re-run ONLY when a
deliberate semantic change to recall is made — the diff then documents the
ranking impact for review.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from automem_spark.functions.vector import placeholder_embedding, placeholder_embedding_udf
from automem_spark.operators.recall import RecallRequest, recall
from automem_spark.session import get_spark
from automem_spark.sources.tables import memories_view

SF_DIR = "/root/testdata/sf0.001"
DIM = 32
K = 10
QUERIES = [
    "spark window merge fast",
    "join customer order",
    "scan filter value table",
    "stream batch data",
    "alice decided about kafka",
]
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "recall_rankings.json")


def main() -> None:
    spark = get_spark("golden-rankings", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    mem = memories_view(spark, SF_DIR).withColumn(
        "embedding", placeholder_embedding_udf(DIM)(F.col("content"))
    )
    golden = {"sf_dir": SF_DIR, "dim": DIM, "k": K, "min_ndcg": 1.0, "rankings": {}}
    for q in QUERIES:
        qvec = placeholder_embedding(q, DIM)
        rows = recall(mem, RecallRequest(query=q, limit=K), query_vector=qvec).collect()
        golden["rankings"][q] = {
            "ids": [int(r.id) for r in rows],
            "match_types": [r.match_type for r in rows],
            "final_scores": [round(float(r.final_score), 6) for r in rows],
        }
    with open(os.path.abspath(OUT), "w") as f:
        json.dump(golden, f, indent=2, sort_keys=True)
    print(f"wrote {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
