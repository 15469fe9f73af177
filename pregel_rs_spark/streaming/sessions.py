"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` — the Structured Streaming counterpart of the
batch ``operators/events.sessionize`` plan.

Per user, events within ``gap_minutes`` of each other form one session;
a session is EMITTED when it provably cannot grow: either a later event of
the same user opened the next session (intra-batch close), or the event-time
watermark passed ``last_event + gap`` (event-time timeout close).  State per
user is O(1) — ``(session_start, last_event, n_events, total_value)`` as
integer microseconds + a double — evicted on emit, so total state is bounded
by (users active within the watermark horizon), not the stream's history.

Scale shape: ONE stateful shuffle on user_id (the same hash partitioning the
batch sessionizer uses); the pandas state function touches only each user's
in-batch events (Arrow batches, no per-row Python crossing).  Batch parity
is tested: the emitted sessions equal ``session_bounds`` (the batch rollup)
on the same corpus once every session has closed.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
_STATE_SCHEMA = "start_us long, last_us long, n long, val double"


def _us(ts: Any) -> int:
    """pandas Timestamp → integer epoch microseconds (no float time math —
    same contract as the batch sessionizer's unix_micros)."""
    return int(pd.Timestamp(ts).value // 1_000)


def _round6(val: float) -> float:
    """HALF_UP to 6 decimals — replicates Spark's F.round on doubles
    (BigDecimal.valueOf uses the shortest decimal repr, = Python repr),
    where Python's round() is banker's rounding and can differ by 1 ulp
    on exact .5 boundaries, breaking stream/batch parity."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(val)).quantize(Decimal("1e-6"),
                                             rounding=ROUND_HALF_UP))


def _emit(user_id: int, start_us: int, last_us: int, n: int, val: float):
    return {
        "user_id": user_id,
        "session_start": pd.Timestamp(start_us * 1_000),
        "session_end": pd.Timestamp(last_us * 1_000),
        "n_events": n,
        "total_value": _round6(val),
    }


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming gap-sessionization.  ``events`` is a streaming DataFrame
    with at least ``(user_id, ts, value)``; returns the stream of CLOSED
    sessions ``(user_id, session_start, session_end, n_events,
    total_value)``.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.hasTimedOut:
            start_us, last_us, n, val = state.get
            state.remove()
            yield pd.DataFrame([_emit(user_id, start_us, last_us, n, val)])
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("ts", kind="stable")
        cur = state.get if state.exists else None
        out = []
        for ts, value in zip(rows["ts"], rows["value"]):
            t = _us(ts)
            v = float(value) if value == value else 0.0  # NaN-safe
            if cur is None:
                cur = (t, t, 1, v)
            elif t - cur[1] > gap_us:
                out.append(_emit(user_id, *cur))
                cur = (t, t, 1, v)
            else:
                cur = (cur[0], max(cur[1], t), cur[2] + 1, cur[3] + v)
        state.update(cur)
        # close via event-time timeout once the watermark passes last + gap
        state.setTimeoutTimestamp((cur[1] + gap_us) // 1_000)
        if out:
            yield pd.DataFrame(out)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
