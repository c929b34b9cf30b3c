"""Custom stateful streaming operator: gap-based sessionization.

The harvester has no windowing machinery of its own (SURVEY.md §2.10) — but
the rebuild's streaming surface should cover custom stateful operators, the
``applyInPandasWithState`` path the driver brief names. Sessionization with
an inactivity gap is the canonical one: per ``user_id``, events within
``gap`` of the previous event extend the session, otherwise a new session
starts. State = the open session; every batch emits all sessions it touched
(closed ones final, the open one as a running update — "update" output mode,
last write per (user_id, session_start) wins downstream).

Late data: events are gap-clustered AS INTERVALS around the open state
(see ``_sessionize_pdf``), so a late event within ``gap`` of the open
session extends it — possibly backwards, in which case the superseding
update row carries the NEW (earlier) session_start and the previously
emitted row for the old start becomes stale; downstream folding that needs
exactness under late data should key on overlap (or take the max-n_events
row per user per covering window). Events older than every reachable
session form their own immediately-final session. True retractions would
need complete-mode or a changelog sink — out of scope for this operator.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_MINUTES = 30

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
STATE_SCHEMA = "start_us long, end_us long, n_events long, total_value double"
_US = 1_000_000


def _sessionize_pdf(
    ts_us: list[int], values: list[float], gap_us: int,
    open_session: tuple[int, int, int, float] | None,
) -> tuple[list[tuple[int, int, int, float]], tuple[int, int, int, float]]:
    """Pure sessionizer: event times (any order) + open state → (closed,
    open) — input is sorted internally as part of the interval merge.

    INTERVAL-MERGE semantics (round-3 fix): the open state participates as
    an interval and events gap-cluster around it, so a cross-batch LATE
    event within ``gap`` of the open session extends it BACKWARDS
    (``session_start`` = min) instead of silently keeping the stale start,
    and an ancient straggler (older than start-gap) becomes its own
    immediately-closed session instead of wrongly folding in (the old
    ``t - end <= gap`` test passed for ARBITRARILY old events — any
    negative difference). The open session is the LAST cluster (max end) —
    the only one future events can still extend; earlier clusters are
    final. For in-order input this reduces exactly to the classic forward
    fold. Watermark-free best effort: a late event whose true session
    already closed cannot reopen it (update mode has emitted it)."""
    items = [(t, t, 1, v) for t, v in zip(ts_us, values)]
    if open_session is not None:
        items.append(tuple(open_session))
    items.sort(key=lambda s: (s[0], s[1]))
    merged: list[tuple[int, int, int, float]] = []
    for it in items:
        if merged and it[0] <= merged[-1][1] + gap_us:
            m = merged[-1]
            merged[-1] = (
                m[0], max(m[1], it[1]), m[2] + it[2], m[3] + it[3]
            )
        else:
            merged.append(it)
    if not merged:
        return [], None
    return merged[:-1], merged[-1]


def sessionize(events, gap_minutes: int = GAP_MINUTES):
    """Streaming events(user_id, ts, value, ...) → session updates."""
    gap_us = gap_minutes * 60 * _US

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        ts_us = [t // 1000 for t in rows["ts"].astype("int64")]  # ns → µs
        values = rows["value"].astype(float).tolist()
        open_session = tuple(state.get) if state.exists else None
        closed, cur = _sessionize_pdf(ts_us, values, gap_us, open_session)
        if cur is not None:
            state.update(cur)
        out = closed + ([cur] if cur is not None else [])
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out),
                "session_start": [pd.Timestamp(s[0], unit="us") for s in out],
                "session_end": [pd.Timestamp(s[1], unit="us") for s in out],
                "n_events": [s[2] for s in out],
                "total_value": [s[3] for s in out],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, OUTPUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )


def sessionize_batch_oracle(pdf: pd.DataFrame, gap_minutes: int = GAP_MINUTES) -> pd.DataFrame:
    """Batch reference implementation (pure pandas) for tests."""
    gap_us = gap_minutes * 60 * _US
    rows = []
    for user_id, g in pdf.groupby("user_id"):
        ts_us = [t // 1000 for t in g["ts"].astype("int64")]
        closed, cur = _sessionize_pdf(ts_us, g["value"].astype(float).tolist(), gap_us, None)
        for s in closed + ([cur] if cur else []):
            rows.append(
                (
                    user_id,
                    pd.Timestamp(s[0], unit="us"),
                    pd.Timestamp(s[1], unit="us"),
                    s[2],
                    s[3],
                )
            )
    return pd.DataFrame(
        rows,
        columns=["user_id", "session_start", "session_end", "n_events", "total_value"],
    )
