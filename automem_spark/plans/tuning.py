"""Cluster-sizing knobs for the dispatch bounds (r13 verdict ask #5).

The three physical-strategy dispatch constants — ``CC_LOCAL_MAX_EDGES``,
``SUPERSESSION_LOCAL_MAX_WALKS`` (both sized by executor-heap arithmetic:
the single-task paths hold a ~2-entries-per-row dict in ONE executor core)
and ``RECALL_FUSE_SCAN_MIN_ROWS`` (a cold-cache scan-economics crossover)
— are correct defaults for a 4-8 GB-heap executor, but a real cluster
wants them turnable without a code edit: a 2 GB-heap fleet must LOWER the
local-path bounds, a 64 GB one can raise them.

Resolution order per call (no caching — a test or a long-lived session can
flip a knob between queries):

1. ``spark.automem.<name>`` on the active session's runtime conf — the
   spark-submit ``--conf`` surface a cluster operator actually uses;
2. env var ``AUTOMEM_<NAME>`` (upper-cased) — for driver environments with
   no session in hand yet;
3. the module-constant default, unchanged from the measured values.

Callers keep their explicit keyword argument (e.g.
``connected_components(..., local_max_edges=...)``) as the strongest
override; the knob layer only fills the ``None`` default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def tuning_int(name: str, default: int) -> int:
    """Resolve dispatch-bound knob ``name`` (snake_case) to an int."""
    spark = SparkSession.getActiveSession()
    if spark is not None:
        v = spark.conf.get(f"spark.automem.{name}", None)
        if v is not None:
            return int(v)
    env = os.environ.get("AUTOMEM_" + name.upper())
    if env is not None:
        return int(env)
    return default
