"""IVF ANN quality lab: the nprobe -> recall@10 / NDCG@10 tradeoff curve,
measured with the reference lab's own metrics and decision rule.

The reference chooses recall knobs by scorecard + paired noise band
(docs/RECALL_QUALITY_LAB.md:112-127, scripts/lab/lab_metrics.py); our IVF
tier had flag-equality and lower-bound property tests but no measured
quality curve — "what recall do I lose at nprobe=4?" was unanswered. This
lab answers it with the PRODUCTION components: `kmeans_centroids` fits the
real coarse quantizer, `assign_cells` (the vectorized-argmax kernel that
ships in the 100 TB path) assigns every corpus vector ONCE in Spark, and
`_probe_cells` picks each query's probe set — then the per-query curve is
pure NumPy over the collected (cell, embedding) table, because quality is
a property of (centroids, assignment, probe order), all of which came from
the shipped kernels. In-cell search is exact cosine in both.

Scorecard fields follow functions/ir_metrics.py's lab contract:
  - ndcg_10      vs the exact top-10 (binary relevance) — the lab metric
  - distractor_rate_10 = fraction of retrieved items NOT in the exact
    top-10 (for same-size sets this is 1 - recall@10)
  - complexity   = nprobe (the knob count / cost order)
  - latency_ms   = mean rows scanned per query (the 100 TB cost driver is
    scan volume, not wall ms on a 2k-vector fixture; documented proxy,
    used by pick_winner only as the final tie-break after complexity)
  - qualities    = per-query NDCG@10 series for the paired noise band

Usage:
    python scripts/ivf_quality_lab.py          # sf0.1, writes golden JSON
    python scripts/ivf_quality_lab.py /path/sf # other scale, prints only
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "tests", "golden", "ivf_quality.json")


def ivf_quality_curve(
    spark,
    sf_dir: str,
    *,
    n_centroids: int = 16,
    nprobes: tuple[int, ...] = (1, 2, 4, 8, 16),
    n_queries: int = 25,
    k: int = 10,
) -> list[dict]:
    """One scorecard per nprobe config, per the lab contract above."""
    from automem_spark.functions.ir_metrics import ndcg_at_k, recall_at_k
    from automem_spark.operators.similarity import (
        _probe_cells,
        assign_cells,
        kmeans_centroids,
    )
    from automem_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = kmeans_centroids(emb, n_centroids)
    assigned = assign_cells(emb, centroids).select("vec_id", "cell", "embedding")
    rows = assigned.orderBy("vec_id").collect()

    ids = np.asarray([r["vec_id"] for r in rows], dtype=np.int64)
    cells = np.asarray([r["cell"] for r in rows], dtype=np.int64)
    mat = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0

    # deterministic query sample: every len//n_queries-th corpus vector
    stride = max(1, len(ids) // n_queries)
    q_idx = list(range(0, len(ids), stride))[:n_queries]

    def topk(order_sims: np.ndarray, cand_ids: np.ndarray) -> list[int]:
        # (-sim, vec_id) — the exact tie order the Spark path sorts by
        order = np.lexsort((cand_ids, -order_sims))[:k]
        return [int(x) for x in cand_ids[order]]

    exact: list[list[int]] = []
    sims_all = []
    for qi in q_idx:
        q = mat[qi]
        qn = np.linalg.norm(q) or 1.0
        sims = (mat @ q) / norms / qn
        sims_all.append(sims)
        exact.append(topk(sims, ids))

    cards = []
    for nprobe in nprobes:
        np_eff = min(nprobe, n_centroids)
        recalls, ndcgs, scanned = [], [], []
        for (qi, sims, truth) in zip(q_idx, sims_all, exact):
            probed = _probe_cells([float(x) for x in mat[qi]], centroids, np_eff)
            mask = np.isin(cells, probed)
            got = topk(sims[mask], ids[mask])
            recalls.append(recall_at_k(got, truth, k))
            ndcgs.append(ndcg_at_k(got, truth, k))
            scanned.append(int(mask.sum()))
        got_n = min(k, min(scanned)) if scanned else k
        cards.append(
            {
                "name": f"nprobe={nprobe}",
                "nprobe": nprobe,
                "recall_10": round(float(np.mean(recalls)), 4),
                "ndcg_10": round(float(np.mean(ndcgs)), 4),
                # same-size sets: distractors are exactly the missed items
                "distractor_rate_10": round(1.0 - float(np.mean(recalls)), 4),
                "complexity": nprobe,
                "latency_ms": round(float(np.mean(scanned)), 1),
                "scan_frac": round(float(np.mean(scanned)) / len(ids), 4),
                "qualities": [round(float(x), 6) for x in ndcgs],
                "_min_candidates": got_n,
            }
        )
    return cards


def main() -> None:
    from automem_spark.functions.ir_metrics import lab_decision
    from automem_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ivf-quality-lab")
    spark.sparkContext.setLogLevel("ERROR")
    cards = ivf_quality_curve(spark, sf_dir)
    decision = lab_decision(cards, baseline_name="nprobe=2")

    print(f"\nIVF quality curve ({sf_dir}, 16 centroids, 25 queries, k=10):")
    print("| nprobe | recall@10 | NDCG@10 | scan frac |")
    print("|---|---|---|---|")
    for c in cards:
        print(
            f"| {c['nprobe']} | {c['recall_10']:.4f} | {c['ndcg_10']:.4f} "
            f"| {c['scan_frac']:.3f} |"
        )
    print(f"\nlab_decision (baseline nprobe=2): {decision['name']}")
    print(f"reason: {decision['reason']}")
    if "paired_vs_baseline" in decision:
        print(f"paired: {decision['paired_vs_baseline']}")

    if sf_dir.rstrip("/").endswith("sf0.1"):
        payload = {
            "sf_dir": sf_dir,
            "n_centroids": 16,
            "n_queries": 25,
            "k": 10,
            "cards": cards,
            "decision_name": decision["name"],
            "decision_reason": decision["reason"],
        }
        with open(GOLDEN, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        print(f"\nwrote {GOLDEN}")


if __name__ == "__main__":
    main()
