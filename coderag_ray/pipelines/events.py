"""Windowed aggregation over the ``events`` stream table.

Ray Data has no event-time windowing; per the streaming-shaped-workload
pattern the input is treated as a partitioned log: tumbling windows are
a derived ``window_start`` column + ``groupby`` aggregate (one shuffle
over pre-aggregable rows), session windows are
``groupby(user_id).map_groups`` gap-and-island over the ts-sorted group
(ordering assumption: one user's events fit one group).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from coderag_ray.functions.rounding import round6

TUMBLE_SECONDS = 3600
SESSION_GAP_SECONDS = 1800


def tumbling_window(events_ds, seconds: int = TUMBLE_SECONDS):
    """→ Dataset (event_type, window_start:int64 epoch s, n_events,
    sum_value round6, n_users?)."""
    from ray.data.aggregate import Count, Sum

    def derive(t: pa.Table) -> pa.Table:
        epoch = pc.cast(t["ts"], pa.int64())  # µs since epoch (Arrow timestamp[us])
        win = pc.multiply(pc.floor(pc.divide(epoch, seconds * 1_000_000)), seconds)
        return pa.table(
            {
                "event_type": t["event_type"],
                "window_start": pc.cast(win, pa.int64()),
                "value": t["value"],
            }
        )

    agg = (
        events_ds.map_batches(derive, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )

    def final(t: pa.Table) -> pa.Table:
        sv = round6(t["sum_value"].to_numpy(zero_copy_only=False).astype(np.float64))
        return t.set_column(t.schema.get_field_index("sum_value"), "sum_value", pa.array(sv))

    return agg.map_batches(final, batch_format="pyarrow")


def session_windows(events_ds, gap_seconds: int = SESSION_GAP_SECONDS):
    """Per-user session windows (gap-and-island).

    → Dataset (user_id, session_id (0-based per user by time),
    session_start:int64 epoch s, n_events).
    """

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].astype("int64").to_numpy() // 1_000_000  # epoch seconds
        new_sess = np.ones(len(ts), dtype=bool)
        new_sess[1:] = (ts[1:] - ts[:-1]) > gap_seconds
        sid = np.cumsum(new_sess) - 1
        out = pd.DataFrame({"sid": sid, "ts": ts})
        aggd = out.groupby("sid").agg(session_start=("ts", "min"), n_events=("ts", "size"))
        aggd = aggd.reset_index()
        return pd.DataFrame(
            {
                "user_id": np.repeat(int(g["user_id"].iloc[0]), len(aggd)).astype(np.int64),
                "session_id": aggd["sid"].astype(np.int64),
                "session_start": aggd["session_start"].astype(np.int64),
                "n_events": aggd["n_events"].astype(np.int64),
            }
        )

    return events_ds.groupby("user_id").map_groups(sessions, batch_format="pandas")
