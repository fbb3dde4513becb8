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

    def project(t: pa.Table) -> pa.Table:
        # column-prune before the user_id shuffle — only 3 of the 6
        # event columns cross the exchange; rebuilding the table also
        # drops the b'pandas' schema metadata (unhashable → Ray's
        # "Failed to hash the schemas" warning in shuffle reduces)
        return pa.table({"user_id": t["user_id"], "event_id": t["event_id"], "ts": t["ts"]})

    events_ds = events_ds.map_batches(project, batch_format="pyarrow")

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        # explicit µs resolution: pandas/Arrow may surface datetime64 as ns
        # or µs depending on the conversion path — pin it so the epoch-
        # seconds division is resolution-independent
        ts = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64) // 1_000_000
        new_sess = np.ones(len(ts), dtype=bool)
        new_sess[1:] = (ts[1:] - ts[:-1]) > gap_seconds
        sid = np.cumsum(new_sess) - 1
        out = pd.DataFrame({"sid": sid, "ts": ts})
        aggd = out.groupby("sid").agg(session_start=("ts", "min"), n_events=("ts", "size"))
        aggd = aggd.reset_index()
        # Arrow out (explicit schema): keeps blocks hashable/uniform for
        # any downstream shuffle and avoids empty-group schema warnings
        return pa.table(
            {
                "user_id": pa.array(np.repeat(int(g["user_id"].iloc[0]), len(aggd)), type=pa.int64()),
                "session_id": pa.array(aggd["sid"].to_numpy(dtype=np.int64), type=pa.int64()),
                "session_start": pa.array(aggd["session_start"].to_numpy(dtype=np.int64), type=pa.int64()),
                "n_events": pa.array(aggd["n_events"].to_numpy(dtype=np.int64), type=pa.int64()),
            }
        )

    return events_ds.groupby("user_id").map_groups(sessions, batch_format="pandas")
