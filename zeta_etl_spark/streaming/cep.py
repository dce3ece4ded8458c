"""Streaming complex-event processing: ordered-sequence detection with
per-step gap bounds via ``applyInPandasWithState`` — the MATCH_RECOGNIZE
subset (ordered pattern, maximal-gap constraint) open-source Spark lacks.

Semantics (identical to the batch twin ``queries/cep_q.py``, tested equal
including out-of-order arrivals): a match is events e1 < … < en with types
= ``pattern`` and every consecutive gap ≤ ``gap_seconds``.  Event times are
floored to whole SECONDS before ordering and gap comparison — exactly the
batch twin's ``unix_timestamp`` granularity, so the two forms agree on
sub-second data too (the gap boundary and same-second ordering both resolve
at second granularity + event_id tie-break).

Correctness under re-ordering: microbatches deliver events in ARRIVAL
order, but the recurrence is order-sensitive, so events are BUFFERED in
state until the watermark passes their event time; only then do they run
through the greedy recurrence in (ts, event_id) order.  Matches are
therefore watermark-final — an in-lateness event arriving in a later batch
is slotted into its true position (the review pass showed the unbuffered
form both emitted false matches on backward-in-time steps and missed
matches on delayed early steps).

State per key = the fixed ``len(pattern)−1`` prefix-completion times plus
the buffer of not-yet-finalized events — bounded by the lateness window,
not the stream.  The greedy-existence recurrence keeps only the LATEST
completion time per proper prefix (optimal: a later completion can only
extend the future window, so greedy existence equals full existence).
Timeouts are clamped above the current watermark (setTimeoutTimestamp
raises below it) and fire to flush the buffer or GC aged-out state.
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
    final step), emitted once the watermark passes the completing event.
    Input needs (user_id long, ts timestamp, event_type string) and
    optionally event_id for a total order on ties."""
    pattern = list(pattern)
    if len(pattern) < 2:
        raise ValueError("pattern needs at least 2 steps")
    if len(set(pattern)) != len(pattern):
        # repeated step types need per-step disambiguation the greedy
        # single-pass recurrence does not model
        raise ValueError("pattern step types must be distinct")
    n_prefix = len(pattern) - 1
    state_schema = (
        ", ".join(f"p{i} long" for i in range(n_prefix))
        + ", buf_ts array<long>, buf_id array<long>, buf_type array<string>"
    )
    gap_us = gap_seconds * 1_000_000

    def _advance(prefix, t, et, matches):
        """One step of the greedy recurrence (event-time order input)."""
        if et == pattern[0]:
            prefix[0] = t
            return
        for i in range(1, len(pattern)):
            if et != pattern[i]:
                continue
            prev = prefix[i - 1]
            # 0 <= gap: a step can never chain onto a LATER prefix time
            if prev is not None and 0 <= t - prev <= gap_us:
                if i == len(pattern) - 1:
                    matches.append(t)
                else:
                    prefix[i] = t
            return

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.exists:
            stored = state.get
            prefix = list(stored[:n_prefix])
            buf = list(zip(stored[n_prefix], stored[n_prefix + 1],
                           stored[n_prefix + 2]))
        else:
            prefix = [None] * n_prefix
            buf = []

        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs))
            ts_us = (
                rows["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            )
            # floor to whole seconds: the batch twin (queries/cep_q.py)
            # compares gaps on unix_timestamp epochs (second floor) and
            # orders by (ep, event_id) — without this, sub-second events
            # 3600.4s apart match in batch but not here (ADVICE r6).  The
            # ≤1s readiness skew this introduces is absorbed by the
            # watermark (minutes ≫ 1s).
            ts_us = (ts_us // 1_000_000) * 1_000_000
            ids = (
                rows["event_id"].to_numpy(dtype="int64").tolist()
                if "event_id" in rows
                else [0] * len(rows)
            )
            buf.extend(zip(ts_us.tolist(), ids, rows["event_type"].tolist()))

        wm_us = state.getCurrentWatermarkMs() * 1000
        buf.sort()
        matches = []
        ready = [e for e in buf if e[0] <= wm_us]
        buf = [e for e in buf if e[0] > wm_us]
        for t, _eid, et in ready:
            _advance(prefix, t, et, matches)

        # GC: prefixes older than the gap window can never chain again
        prefix = [
            p if p is not None and wm_us - p <= gap_us else None
            for p in prefix
        ]
        if not buf and all(p is None for p in prefix):
            if state.exists:
                state.remove()
        else:
            state.update(
                (
                    *prefix,
                    [e[0] for e in buf],
                    [e[1] for e in buf],
                    [e[2] for e in buf],
                )
            )
            # wake when the watermark reaches the next buffered event or
            # the oldest live prefix ages out — clamped above the current
            # watermark (setTimeoutTimestamp raises below it)
            candidates = [e[0] // 1000 for e in buf] + [
                p // 1000 + gap_seconds * 1000
                for p in prefix
                if p is not None
            ]
            state.setTimeoutTimestamp(
                max(min(candidates), state.getCurrentWatermarkMs() + 1)
            )
        if matches:
            yield pd.DataFrame(
                {
                    "user_id": [user] * len(matches),
                    "match_ep": [m // 1_000_000 for m in matches],
                }
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
