"""Streaming complex-event processing: ordered-sequence detection with
per-step gap bounds via ``applyInPandasWithState`` — the MATCH_RECOGNIZE
subset (ordered pattern, maximal-gap constraint) open-source Spark lacks.

Semantics (identical to the batch twin ``queries/cep_q.py``, tested equal):
a match is events e1 < … < en with types = ``pattern`` and every
consecutive gap ≤ ``gap_seconds``.  The detector keeps, per key, ONLY the
latest completion time of each proper prefix — the greedy-existence
recurrence: a length-k prefix completes at t iff the stored length-(k−1)
time is ≥ t − gap.  Keeping the latest time is optimal (it can only extend
the future window), so greedy existence equals full existence, and state is
a fixed ``len(pattern)−1`` longs per key — bounded regardless of stream
length, with an event-time timeout clearing keys whose every prefix has
aged out of the gap window.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

MATCH_SCHEMA = "user_id long, match_ep long"


def detect_sequence_stream(
    events: DataFrame,
    pattern: Sequence[str] = ("view", "click", "purchase"),
    gap_seconds: int = 3600,
    watermark: str = "10 minutes",
) -> DataFrame:
    """One output row per pattern completion (the event completing the
    final step).  Input needs (user_id long, ts timestamp, event_type
    string).  Rows inside a microbatch are processed in (ts, event_id)
    order when event_id is present, else (ts) order."""
    pattern = list(pattern)
    if len(pattern) < 2:
        raise ValueError("pattern needs at least 2 steps")
    if len(set(pattern)) != len(pattern):
        # repeated step types need per-step disambiguation the greedy
        # single-pass recurrence does not model
        raise ValueError("pattern step types must be distinct")
    n_prefix = len(pattern) - 1
    state_schema = ", ".join(f"p{i} long" for i in range(n_prefix))
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            state.remove()  # every prefix aged out of the gap window
            return
        prefix = list(state.get) if state.exists else [None] * n_prefix
        rows = pd.concat(list(pdfs))
        sort_cols = ["ts"] + (["event_id"] if "event_id" in rows else [])
        rows = rows.sort_values(sort_cols)
        ts_us = rows["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        types = rows["event_type"].to_numpy()
        matches = []
        for t, et in zip(ts_us.tolist(), types.tolist()):
            if et == pattern[0]:
                prefix[0] = t
            else:
                for i in range(1, len(pattern)):
                    if et != pattern[i]:
                        continue
                    prev = prefix[i - 1]
                    if prev is not None and t - prev <= gap_us:
                        if i == len(pattern) - 1:
                            matches.append(t)
                        else:
                            prefix[i] = t
                    break
        state.update(tuple(prefix))
        # state is garbage once every stored prefix is > gap old
        newest = max((p for p in prefix if p is not None), default=None)
        if newest is not None:
            state.setTimeoutTimestamp(newest // 1000 + gap_seconds * 1000)
        if matches:
            yield pd.DataFrame(
                {"user_id": [user] * len(matches), "match_ep": [m // 1_000_000 for m in matches]}
            )

    cols = ["user_id", "ts", "event_type"] + (
        ["event_id"] if "event_id" in events.columns else []
    )
    return (
        events.select(*cols)
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=MATCH_SCHEMA,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
