"""Resumable full-registry oracle sweep at an arbitrary scale factor.

Runs every queries() row against its DuckDB oracle at the given sf_dir
(default the local sf1 replica), using the SAME driver-faithful pandas
comparison as scripts/check_correctness.py, and records per-row status +
wall seconds incrementally to a JSON ledger. Re-invoking resumes: rows
already recorded are skipped, so a killed run (or a deliberately chunked
one) loses nothing. `--redo name...` forces specific rows to re-run.

Usage:
    python scripts/sf_sweep.py [sf_dir] [ledger.json] [--redo name ...]

Recovery note (r12): a mid-sweep engine death poisons every later row in
the SAME process — a DuckDB OutOfMemory leaves the allocator failing tiny
allocations, and a Spark JVM crash turns into ConnectionRefused for every
subsequent py4j call — so trailing ERROR rows after one fatal row are
usually cascade victims, not real failures. Re-invoke in a FRESH process
with `--redo <every ERROR row>`; the r12 sf10 sweep recovered 13+22 such
rows to green this way with zero rows lost.

The point: the per-round driver gate proves correctness at sf0.01; this
proves the SAME 118-row surface at 100x that, turning "the plan shape
should hold at scale" into a recorded, reproducible result.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    redo: list[str] = []
    if "--redo" in sys.argv:
        redo = sys.argv[sys.argv.index("--redo") + 1 :]
    sf_dir = args[0] if args else os.path.join(REPO, ".sf1")
    ledger_path = args[1] if len(args) > 1 else os.path.join(REPO, ".sf1_sweep.json")

    ledger: dict = {}
    if os.path.exists(ledger_path):
        with open(ledger_path) as f:
            ledger = json.load(f)
    for name in redo:
        ledger.pop(name, None)

    import __spark_entry__ as entrymod
    from automem_spark.session import get_spark
    from automem_spark.sources.tables import TABLES
    from scripts.check_correctness import compare

    con = duckdb.connect()
    # An in-memory DuckDB has NO temp directory, so it cannot spill —
    # any oracle whose intermediates exceed the memory budget dies with
    # OutOfMemory instead of going out-of-core, and one OOM poisons the
    # allocator for every later row in the process (the r12 cascade).
    # Observed at sf30: training_pipeline parts OOM'd at ~83k-doc slices
    # that run fine with spilling enabled. Point temp at disk.
    con.execute("SET temp_directory='/tmp/sf_sweep_duckdb.tmp'")
    con.execute("SET max_temp_directory_size='50GB'")
    # DuckDB's default memory_limit is 80% of PHYSICAL RAM, but this host
    # runs swapless with vm.overcommit_ratio=50: the kernel's CommitLimit
    # is ~half of RAM, so a query that grows toward DuckDB's 100G budget
    # exhausts the OS commit budget first — allocations then fail
    # process-wide with bad_alloc (observed: Committed_AS 68G > CommitLimit
    # 66G while 98G sat "free", every post-part-0 oracle part dying on
    # kilobyte blocks). Cap DuckDB under the COMMIT budget, not the RAM
    # size, and let the temp dir absorb the difference out-of-core.
    con.execute("SET memory_limit='32GB'")
    # fewer threads = fewer concurrently-live operator blocks = fewer
    # anonymous mappings; the same VMA-budget motivation as above
    threads = os.environ.get("AUTOMEM_SWEEP_DUCKDB_THREADS")
    if threads:
        con.execute(f"SET threads={int(threads)}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    spark = get_spark("sf-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # cheap rows first so an interrupted run banks the most coverage
    order = sorted(qs, key=lambda n: ledger.get(n, {}).get("secs", 0))

    def save() -> None:
        with open(ledger_path, "w") as f:
            json.dump(ledger, f, indent=1, sort_keys=True)

    # rows too expensive for one chunk run as n resumable sub-checks
    # (entry SWEEP_PARTS / sweep_part); a partially-swept row re-enters the
    # loop and continues from its first unrecorded part
    parts_reg: dict[str, int] = dict(getattr(entrymod, "SWEEP_PARTS", {}))
    # AUTOMEM_SWEEP_PARTS="training_pipeline=18,semantic_decontaminate=16"
    # raises a row's sub-check count beyond the registry default — the
    # registry sizes parts for sf3; a 10x-larger scale can need finer
    # slices to keep ONE part inside the DuckDB memory budget. sweep_part
    # is mod-based over (k, n), so any n is valid; mixing ledger entries
    # recorded under a DIFFERENT n is not (use --redo when changing n).
    for spec in os.environ.get("AUTOMEM_SWEEP_PARTS", "").split(","):
        if "=" in spec:
            row, _, n_str = spec.partition("=")
            parts_reg[row.strip()] = int(n_str)

    # AUTOMEM_SWEEP_MAX_PARTS_PER_RUN=1 exits (code 75) after recording
    # that many NEW parts. Exists because both jemalloc instances in the
    # process (pyarrow's memory pool and DuckDB's allocator) RETAIN
    # virtual mappings across queries: at sf30 one heavy oracle part
    # checkerboards the address space to vm.max_map_count (65530 VMAs
    # observed), and every later part in the SAME process dies with
    # bad_alloc at kilobyte sizes while RAM sits free. A fresh process
    # per part resets the VMA budget; the ledger's resume semantics make
    # the outer re-invocation loop trivial:
    #   while sf_sweep ...; [ $? -eq 75 ] || break; done
    budget = int(os.environ.get("AUTOMEM_SWEEP_MAX_PARTS_PER_RUN", "0"))
    done_this_run = [0]

    def run_parts(name: str) -> None:
        n = parts_reg[name]
        entry = ledger.get(name)
        if not entry or "parts" not in entry:
            # fresh, or superseding a pre-parts "rows-only" deferral entry
            entry = {"status": "partial", "parts": {}, "rows": 0, "secs": 0.0}
        for k in range(n):
            key = str(k)
            if key in entry["parts"]:
                continue
            if budget and done_this_run[0] >= budget:
                sys.exit(75)
            t0 = time.time()
            try:
                fn, sql = entrymod.sweep_part(name, k, n)
                spdf = fn(spark, sf_dir).toPandas()
                opdf = con.execute(sql).fetchdf()
                problems = compare(f"{name}#{k}/{n}", spdf, opdf)
                part = {
                    "status": "ok" if not problems else "FAIL",
                    "rows": int(len(spdf)),
                    "problems": problems,
                }
            except Exception as e:  # noqa: BLE001
                part = {"status": "ERROR", "problems": [repr(e)[:300]]}
            part["secs"] = round(time.time() - t0, 1)
            entry["parts"][key] = part
            entry["rows"] += part.get("rows", 0)
            entry["secs"] = round(entry["secs"] + part["secs"], 1)
            statuses = {p["status"] for p in entry["parts"].values()}
            if len(entry["parts"]) == n:
                entry["status"] = "ok" if statuses == {"ok"} else "FAIL"
            else:
                entry["status"] = (
                    "partial" if statuses == {"ok"} else "FAIL"
                )
            ledger[name] = entry
            save()
            done_this_run[0] += 1
            print(
                f"{part['status']:9s} {name}#{k}/{n}: "
                f"{part.get('rows', '-')} rows [{part['secs']}s]",
                flush=True,
            )

    for name in order:
        recorded = ledger.get(name)
        if name in parts_reg:
            # Re-enter whenever any part is unrecorded, regardless of status:
            # a FAIL/ERROR part must not strand the remaining parts unrecorded
            # (the ledger would read as a completed FAIL with partial coverage).
            n_done = len((recorded or {}).get("parts", {}))
            if recorded is None or recorded.get("status") in (
                "partial",
                "rows-only",
            ) or n_done < parts_reg[name]:
                run_parts(name)
            continue
        if recorded is not None:
            continue
        t0 = time.time()
        entry: dict = {}
        try:
            spdf = qs[name](spark, sf_dir).toPandas()
            if name in oracles:
                opdf = con.execute(oracles[name]).fetchdf()
                problems = compare(name, spdf, opdf)
                entry = {
                    "status": "ok" if not problems else "FAIL",
                    "rows": int(len(spdf)),
                    "problems": problems,
                }
            else:
                entry = {"status": "rows-only", "rows": int(len(spdf))}
        except Exception as e:  # noqa: BLE001 — record and continue the sweep
            entry = {"status": "ERROR", "problems": [repr(e)[:300]]}
        entry["secs"] = round(time.time() - t0, 1)
        ledger[name] = entry
        save()
        print(f"{entry['status']:9s} {name}: {entry.get('rows', '-')} rows "
              f"[{entry['secs']}s]", flush=True)

    # "deferred-*" entries are rows a scoped run pre-seeded as explicitly
    # out of scope (e.g. the r14 sf30 run swept only the 5 heaviest rows);
    # they are neither failures nor coverage — report them separately.
    deferred = {n for n, e in ledger.items() if e["status"].startswith("deferred")}
    bad = {
        n: e
        for n, e in ledger.items()
        if e["status"] not in ("ok", "rows-only") and n not in deferred
    }
    total = sum(e["secs"] for e in ledger.values())
    print(f"\n{len(ledger)}/{len(qs)} rows recorded, {len(bad)} failing, "
          f"{len(deferred)} deferred, {round(total)}s total")
    if bad:
        print("failing:", sorted(bad))
        sys.exit(1)


if __name__ == "__main__":
    main()
