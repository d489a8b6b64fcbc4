"""ST1's retry state machine as a custom stateful streaming operator.

The reference's enrichment worker (automem/enrichment/runtime_worker.py:6-164;
config: attempts <= 3, backoff) pulls memories off a FIFO queue, retries
failures up to a cap, then gives up. `dedup_stream` (streaming/ingest.py)
covers the drain-once half; this operator covers the ATTEMPT-COUNTING half:
per-key mutable state that survives micro-batches (and restarts, via the
checkpoint) — the part of the reference's semantics that plain stateless
transforms and dropDuplicates cannot express, and exactly what
`applyInPandasWithState` exists for.

Semantics per key, over event-time-ordered delivery attempts:
- an event with ok=true   -> emit (key, 'processed', attempts_so_far + 1),
  clear state (a later redelivery starts fresh — drain-once is upstream's
  job, see dedup_stream);
- an event with ok=false  -> increment the persisted attempt counter; once
  it reaches `max_attempts`, emit (key, 'dead_letter', max_attempts) and
  clear state; below the cap, emit nothing and keep waiting.

Scale shape: state is one int per in-flight key, sharded by the groupBy
hash — no global structure, no driver participation; Arrow batches flow
per key-group. The batch analog (a groupBy count over a bounded attempt
log) is what the enrichment tests pin; this operator is the streaming
deployment shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

OUTPUT_SCHEMA = "id bigint, status string, attempts int"
STATE_SCHEMA = "attempts int"


def retry_gate(
    events: DataFrame,
    *,
    key_col: str = "id",
    ok_col: str = "ok",
    ts_col: str = "ts",
    max_attempts: int = 3,
) -> DataFrame:
    """Apply the attempt-counting state machine to a streaming (or batch)
    events frame with columns (key, ok, ts). Returns the decision stream:
    one row per key outcome ('processed' | 'dead_letter')."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def track(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (kid,) = key
        attempts = state.get[0] if state.exists else 0
        rows = []
        events_seen: list[tuple] = []
        for pdf in pdfs:
            events_seen.extend(zip(pdf[ts_col], pdf[ok_col]))
        # deterministic order inside the batch: event time, failures first
        # on ties (a success at the same instant wins only after the
        # failure is counted — matches the reference's queue ordering)
        events_seen.sort(key=lambda e: (e[0], bool(e[1])))
        done = False
        for _, ok in events_seen:
            if done:
                break
            if bool(ok):
                rows.append((int(kid), "processed", attempts + 1))
                attempts = 0
                done = True
            else:
                attempts += 1
                if attempts >= max_attempts:
                    rows.append((int(kid), "dead_letter", attempts))
                    attempts = 0
                    done = True
        if done:
            state.remove()
        else:
            state.update((attempts,))
        if rows:
            yield pd.DataFrame(rows, columns=["id", "status", "attempts"])

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            track,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
