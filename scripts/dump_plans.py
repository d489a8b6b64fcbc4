"""Dump `.explain("formatted")` for named queries() rows to text files.

Used to produce the per-round plan evidence under plans/rNN/:

    python scripts/dump_plans.py plans/r14 after minhash_lsh dedup_pipeline ...

writes plans/r14/<query>_after.txt for each named query. Run the same
command from a worktree of the previous round's HEAD (with the output dir
pointed back at the working repo) to produce the matching `_before` files.

Set AUTOMEM_SPARK_DISABLE_CHECKPOINT=1 to dump the full lineage instead of
the checkpoint-truncated production plan (the suffix `_full` is appended to
the stage label in the header, not the filename, so callers control names).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from automem_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    nolineage = os.environ.get("AUTOMEM_SPARK_DISABLE_CHECKPOINT") == "1"
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(jmode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(
                f"# {name} — explain('formatted'), {suffix}, sf_dir={SF_DIR}\n"
                f"# checkpoint-truncation disabled: {nolineage}\n\n"
            )
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
