"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query runs once for warmup (JVM/codegen costs a long-lived cluster
would amortize), then three times timed; the MIN of the timed runs is
reported. Rationale: rounds 3-4 showed ±30-50% swings on sub-second
queries from a single warm sample (JIT tiering, GC timing); round 8
measured whole-run host-noise days where even untouched TPC-H rows
drifted +25-35% under min-of-2. MIN over identical deterministic work is
the standard least-noise estimator. Estimator-transition caveat (r8->r9
advisor): min-of-3 is stochastically <= min-of-2, so a min-of-3 number
compared against a min-of-2 BASELINE from an earlier round carries a
small downward bias — within-protocol comparisons (r8 onward vs r8
onward) are unbiased, but any speedup claimed across the r7/r8 boundary
must exceed the estimator gap. Empirically the gap is small: r8's first
min-of-3 run was +4.7% SLOWER than r7's min-of-2, so no cross-boundary
speedup was ever claimed on the estimator's back.

Known caveat (kept for round-over-round comparability, documented r7):
count() lets Catalyst prune the FINAL projection, so projection-shaped
rows under-report the expression tail. Measured at sf0.1 with a
full-evaluation noop sink (df.write.format("noop")): text_stats 0.42s ->
0.96s, pii_redact 0.25s -> 0.64s, classify 0.67s -> 0.87s; aggregate- and
join-shaped rows (the bulk of the headline) are unaffected. BENCH_SF1.md
uses the noop sink for the projection-shaped scale rows.

Since r8 the JSON line carries BOTH protocols: "queries" (count(), the
round-over-round comparable headline; "value" still sums only these) and
"queries_noop" (noop-sink timings for the projection-shaped rows listed
in NOOP_ROWS — the honest full-evaluation number for those rows).

r10 protocol notes (verdict asks #1/#7):
- "value_noop_adjusted" dual-reports the headline TOTAL under the
  noop-substituted protocol (each HEADLINE row that is also a NOOP_ROWS
  row contributes its noop timing instead of its count() timing). One
  transition round of both totals side-by-side lets r11 switch the
  headline metric without manufacturing a fake speedup/regression;
  "value" remains the round-over-round comparable number.
- "canary_sec" is a host-noise timeline: after each headline row, the
  harness times one fixed tiny reference job (count over the region
  parquet — constant work, no code under test). The r9 drift episode —
  four CONSECUTIVE rows (decay_relevance, forget_classify,
  relations_fetch, supersession_heads; bench positions 9-12) up +27-32%
  in lockstep while rows on either side stayed flat — is the signature
  of a time-local host event, not of the edges fixture those rows were
  first attributed to (decay_relevance touches no edges). The canary
  timeline makes that call mechanical next time: a drifted row with an
  elevated canary neighbor is host noise; with a flat canary it's a
  real regression. Cost: ~21 x ~40ms.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from automem_spark.session import get_spark

# Headline set: one per operator family (scan-agg, join-agg, window,
# anti-join, range join, recall, dedup exact/minhash, vector, text).
HEADLINE = [
    "pricing_summary",
    "nation_revenue",
    "top_orders_per_customer",
    "customers_without_orders",
    "preceded_by_events",
    "keyword_search",
    "hybrid_recall",
    "multi_recall",
    "decay_relevance",
    "forget_classify",
    "relations_fetch",
    "supersession_heads",
    "connected_components",
    "dedup_exact",
    "minhash_lsh",
    "vector_topk",
    "vector_topk_scale",
    "vector_pairs",
    "text_stats",
    "classify",
]


# Projection-shaped rows whose expression tail count() would prune away —
# these get an additional noop-sink measurement (full evaluation of every
# output column, no driver-side materialization). r9 (verdict ask #7):
# widened from the original 4 to every zero-shuffle projection-shaped row
# in the registry's headline orbit — lang_id / doc_fingerprint /
# doc_chunks are scan-speed expression rows, tag_prefix_scan's tag
# expansion and gated_recall's scoring tail are equally prunable under
# count().
NOOP_ROWS = [
    "text_stats",
    "classify",
    "pii_redact",
    "repetition_filter",
    "lang_id",
    "doc_fingerprint",
    "doc_chunks",
    "tag_prefix_scan",
    "gated_recall",
]


def run_once(fn, spark, sf_dir, sink: str = "count") -> float:
    t0 = time.time()
    df = fn(spark, sf_dir)
    if sink == "noop":
        # evaluates the FULL projection (count() lets Catalyst prune it)
        df.write.format("noop").mode("overwrite").save()
    else:
        # count() forces execution without driver-side result materialization
        df.count()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("automem-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    # optional subset for scale probes (e.g. the sf3 scaling line); the
    # driver's per-round run sets no subset and benches the full headline
    only = [q for q in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if q]

    # fixed constant-work reference job for the host-noise timeline (see
    # module docstring): a count over the smallest table, warmed once
    canary_df = spark.read.parquet(f"{sf_dir}/region.parquet")
    canary_df.count()

    def canary() -> float:
        t0 = time.time()
        canary_df.count()
        return round(time.time() - t0, 3)

    timings: dict[str, float] = {}
    canary_sec: list[float] = [canary()]
    for name in only or HEADLINE:
        fn = qs[name]
        run_once(fn, spark, sf_dir)  # warmup: codegen + file listing
        timings[name] = round(
            min(run_once(fn, spark, sf_dir) for _ in range(3)), 3
        )
        canary_sec.append(canary())

    noop_timings: dict[str, float] = {}
    if not only:
        for name in NOOP_ROWS:
            fn = qs[name]
            run_once(fn, spark, sf_dir, sink="noop")  # warmup
            noop_timings[name] = round(
                min(run_once(fn, spark, sf_dir, sink="noop") for _ in range(3)),
                3,
            )

    total = round(sum(timings.values()), 3)
    # dual headline (r10 transition round): same rows, noop timing
    # substituted where one exists — see module docstring
    total_noop_adj = round(
        sum(noop_timings.get(name, t) for name, t in timings.items()), 3
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_warm",
                "value": total,
                "value_noop_adjusted": total_noop_adj if not only else None,
                "unit": "sec",
                "queries": timings,
                "queries_noop": noop_timings,
                "canary_sec": canary_sec,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
