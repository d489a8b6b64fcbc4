"""Regenerate tests/golden/qa_baseline.json — the pinned LoCoMo-mini QA
accuracy baseline (SURVEY §5 benchmark layer; reference shape:
benchmarks/baselines/locomo-mini_baseline.json — overall accuracy plus
per-question verdicts and evidence ids).

The corpus, questions, and scoring are fully deterministic
(tests/qa_harness.py), so the committed file pins the end-to-end composed
recall behavior question by question. Re-run ONLY on a deliberate semantic
change — the diff then documents the QA impact for review.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import qa_harness  # noqa: E402

from automem_spark.session import get_spark  # noqa: E402

OUT = os.path.join(_ROOT, "tests", "golden", "qa_baseline.json")


def provenance(script: str) -> dict:
    """Regeneration provenance stamped into the golden (r12 verdict ask
    #7): records WHICH harness script produced the file and at what git
    state, so a future engine-output-pasted-as-baseline regression is
    detectable — a golden whose provenance names anything but the
    make_qa* harness script is inadmissible (asserted by the QA tests)."""
    try:
        head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=_ROOT,
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except OSError:
        head = "unknown"
    return {"generated_by": script, "git_head": head}


def main() -> None:
    spark = get_spark("make-qa-baseline", shuffle_partitions=4)
    res = qa_harness.run_all(spark)
    res["min_accuracy"] = 1.0  # regression gate: the fixture is answerable
    res["provenance"] = provenance("scripts/make_qa_baseline.py")
    with open(OUT, "w") as f:
        json.dump(res, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT}: accuracy={res['accuracy']} over {res['n_questions']} questions")


if __name__ == "__main__":
    main()
