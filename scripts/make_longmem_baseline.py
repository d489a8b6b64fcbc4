"""Regenerate tests/golden/longmem_baseline.json — the pinned
LongMemEval-mini QA baseline (SURVEY §5 benchmark layer; reference shape:
tests/benchmarks/longmemeval/evaluator.py's per-category scorer plus the
retrieved-session metric).

The corpus, questions, and scoring are fully deterministic
(tests/qa_longmem.py), so the committed file pins the end-to-end composed
recall behavior question by question — including session-scoped retrieval,
knowledge-update suppression, and abstention. Re-run ONLY on a deliberate
semantic change; the diff then documents the QA impact for review.
"""

from __future__ import annotations

import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import qa_longmem  # noqa: E402

from automem_spark.session import get_spark  # noqa: E402

OUT = os.path.join(_ROOT, "tests", "golden", "longmem_baseline.json")


def main() -> None:
    spark = get_spark("make-longmem-baseline", shuffle_partitions=4)
    res = qa_longmem.run_all(spark)
    res["min_accuracy"] = 1.0  # regression gate: the fixture is answerable
    with open(OUT, "w") as f:
        json.dump(res, f, indent=2, sort_keys=True)
        f.write("\n")
    print(
        f"wrote {OUT}: accuracy={res['accuracy']} over {res['n_questions']}"
        f" questions; session_recall={res['session_recall']};"
        f" categories={res['category_accuracy']}"
    )


if __name__ == "__main__":
    main()
