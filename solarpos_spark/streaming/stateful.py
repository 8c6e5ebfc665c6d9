"""Custom stateful streaming operator via applyInPandasWithState.

``sweep_progress`` tracks each doc_id's coordinate sweep across micro-batches
and emits exactly one summary row per document when the sweep completes
(all ``expected`` records seen) or when the group times out (processing-time
timeout = the stream's "sweep abandoned" signal). This is the
beyond-built-in-session-window custom CEP operator of the north_rule —
arbitrary per-key state (seen-count, seq extent, event-time extent) with
explicit timeout semantics, impossible to express with ``session_window``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("n_records", LongType()),
    StructField("min_seq", IntegerType()),
    StructField("max_seq", IntegerType()),
    StructField("first_event_usec", LongType()),
    StructField("last_event_usec", LongType()),
    StructField("status", StringType()),  # COMPLETE | TIMEOUT
])

STATE_SCHEMA = StructType([
    StructField("n_records", LongType()),
    StructField("min_seq", IntegerType()),
    StructField("max_seq", IntegerType()),
    StructField("first_event_usec", LongType()),
    StructField("last_event_usec", LongType()),
])


def _make_tracker(expected: int, timeout_ms: int):
    def track(key: tuple, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        (doc_id,) = key
        if state.hasTimedOut:
            n, mn, mx, f, l = state.get
            state.remove()
            yield pd.DataFrame([{
                "doc_id": doc_id, "n_records": n, "min_seq": mn,
                "max_seq": mx, "first_event_usec": f, "last_event_usec": l,
                "status": "TIMEOUT",
            }])
            return

        n, mn, mx, f, l = state.get if state.exists else (0, None, None, None, None)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            smn, smx = int(pdf["seq_index"].min()), int(pdf["seq_index"].max())
            umn, umx = int(pdf["unix_sec"].min()), int(pdf["unix_sec"].max())
            mn = smn if mn is None else min(mn, smn)
            mx = smx if mx is None else max(mx, smx)
            f = umn if f is None else min(f, umn)
            l = umx if l is None else max(l, umx)

        if n >= expected:
            state.remove()
            yield pd.DataFrame([{
                "doc_id": doc_id, "n_records": n, "min_seq": mn,
                "max_seq": mx, "first_event_usec": f, "last_event_usec": l,
                "status": "COMPLETE",
            }])
        else:
            state.update((n, mn, mx, f, l))
            state.setTimeoutDuration(timeout_ms)

    return track


def sweep_progress(decoded: DataFrame, *, expected: int = 8,
                   timeout_ms: int = 60_000) -> DataFrame:
    """One summary row per doc_id when its sweep completes or times out.

    ``decoded`` is the decoded token stream (doc_id, seq_index, unix_sec, ...).
    State per key is five scalars — O(#in-flight docs), evicted on emit.
    """
    return (
        decoded.groupBy("doc_id").applyInPandasWithState(
            _make_tracker(expected, timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
