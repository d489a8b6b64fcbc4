"""Generate a local sf1.0 dataset (10x sf0.1) for the scale probe.

The driver supplies sf0.001-0.1 (read-only); every scale argument above
that was plan-shape reasoning. This builds sf1 by deterministic 10x
replication of sf0.1 with key offsetting, so join fan-outs and value
distributions per replica match the driver fixture while data volume and
key cardinality scale the way TPC-H does (region/nation fixed, facts and
the customer/supplier/part dims linear):

- TPC-H tables: each replica k offsets every key family (custkey,
  orderkey, suppkey, partkey) by k * max_key; foreign keys are offset
  together so the join graph is preserved exactly.
- documents: doc_id offset; for k > 0 the text has every second word
  replica-suffixed, so replicas are genuinely distinct documents (bare
  copies would collapse dedup into exact-duplicate groups of 10 and blow
  LSH pair counts quadratically — a skew test, not a scale test).
- embeddings: vec_id offset; first component perturbed by k * 1e-3 so
  vector top-k has no cross-replica ties.
- events: event_id/user_id offset, ts shifted by k seconds.

Output: PARQUET files under .sf1/ in the repo root (untracked — data is
regenerable, only this script is committed). ~10 s wall, ~200 MB disk.

    python scripts/make_sf1.py           # writes .sf1/*.parquet (10x)
    python scripts/make_sf1.py 30 .sf3   # sf3.0: 30 replicas -> .sf3/
    SPARK_GRAFT_SF_DIR=$PWD/.sf1 python bench.py
"""

from __future__ import annotations

import os
import sys

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = os.path.join(ROOT, sys.argv[2] if len(sys.argv) > 2 else ".sf1")

# table -> columns to offset by k * (1 + max over the column's base table)
KEY_OFFSETS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
    "documents": ["doc_id"],
}
# key family -> (table, column) that defines its cardinality
KEY_BASE = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "vec_id": ("embeddings", "vec_id"),
    "doc_id": ("documents", "doc_id"),
}
COPY_AS_IS = ["region", "nation"]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    maxes: dict[str, int] = {}
    for key, (tbl, col) in KEY_BASE.items():
        maxes[key] = con.sql(
            f"SELECT max({col}) FROM '{SRC}/{tbl}.parquet'"
        ).fetchone()[0] + 1

    for tbl in COPY_AS_IS:
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{tbl}.parquet')"
            f" TO '{OUT}/{tbl}.parquet' (FORMAT PARQUET)"
        )
        print(f"{tbl}: copied")

    for tbl, keys in KEY_OFFSETS.items():
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM '{SRC}/{tbl}.parquet'"
        ).fetchall()]
        parts = []
        for k in range(REPLICAS):
            sel = []
            for c in cols:
                if c in keys:
                    sel.append(f"{c} + {k * maxes[c]} AS {c}")
                elif tbl == "documents" and c == "text" and k > 0:
                    # suffix every 2nd word: replicas share ~no 3-gram
                    # shingles with the base, so dedup sees 10x genuinely
                    # distinct docs, not 10 copies
                    sel.append(
                        "array_to_string(list_transform(string_split(text, ' '),"
                        f" (w, i) -> CASE WHEN i % 2 = 0 THEN w || '_r{k}'"
                        " ELSE w END), ' ') AS text"
                    )
                elif tbl == "embeddings" and c == "embedding" and k > 0:
                    sel.append(
                        "list_prepend(embedding[1] + "
                        f"{k * 1e-3}::FLOAT, embedding[2:]) AS embedding"
                    )
                elif tbl == "events" and c == "ts" and k > 0:
                    sel.append(f"ts + INTERVAL {k} SECOND AS ts")
                else:
                    sel.append(c)
            parts.append(
                f"SELECT {', '.join(sel)} FROM '{SRC}/{tbl}.parquet'"
            )
        union = " UNION ALL ".join(parts)
        con.sql(
            f"COPY ({union}) TO '{OUT}/{tbl}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{OUT}/{tbl}.parquet'").fetchone()[0]
        print(f"{tbl}: {n} rows")


if __name__ == "__main__":
    main()
