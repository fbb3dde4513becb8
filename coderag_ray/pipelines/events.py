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


def session_windows(events_ds, gap_seconds: int = SESSION_GAP_SECONDS,
                    island_span_seconds: int = 86400):
    """Per-user session windows (gap-and-island), two-phase.

    → Dataset (user_id, session_id (0-based per user by time),
    session_start:int64 epoch s, n_events).

    Hot-user safety: phase 1 groups by ``(user_id, coarse time bucket)``
    and collapses each bucket's events into gap-islands (one summary row
    per island); phase 2 groups the island SUMMARIES by user and merges
    islands across bucket edges with the same gap rule — exactly the
    global gap partition, but no group ever holds more than one user-day
    of raw events, so a single hot user cannot OOM a worker.  The result
    is identical to the single-phase computation (bucket boundaries are
    just extra cut points that phase 2 re-joins; equal-timestamp events
    always share a bucket, so the (ts, event_id) tie order is preserved).
    """

    def project(t: pa.Table) -> pa.Table:
        # column-prune before the shuffle (3 of 6 columns) + explicit µs
        # resolution so epoch seconds are independent of the input's ns/µs
        # backing; rebuilding the table also drops the b'pandas' schema
        # metadata (unhashable → Ray's "Failed to hash" shuffle warning)
        epoch_s = pc.divide(pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()),
                            1_000_000)
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "s": pc.cast(epoch_s, pa.int64()),
            "bucket": pc.cast(pc.divide(pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()),
                                        island_span_seconds * 1_000_000), pa.int64()),
        })

    def islands(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["s", "event_id"])
        ts = g["s"].to_numpy(dtype=np.int64)
        new_isl = np.ones(len(ts), dtype=bool)
        new_isl[1:] = (ts[1:] - ts[:-1]) > gap_seconds
        iid = np.cumsum(new_isl) - 1
        df = pd.DataFrame({"iid": iid, "s": ts})
        aggd = (df.groupby("iid")
                  .agg(island_start=("s", "min"), island_end=("s", "max"),
                       n_events=("s", "size")).reset_index())
        return pa.table({
            "user_id": pa.array(np.repeat(int(g["user_id"].iloc[0]), len(aggd)), type=pa.int64()),
            "island_start": pa.array(aggd["island_start"].to_numpy(dtype=np.int64), type=pa.int64()),
            "island_end": pa.array(aggd["island_end"].to_numpy(dtype=np.int64), type=pa.int64()),
            "n_events": pa.array(aggd["n_events"].to_numpy(dtype=np.int64), type=pa.int64()),
        })

    def merge(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("island_start")
        start = g["island_start"].to_numpy(dtype=np.int64)
        end = g["island_end"].to_numpy(dtype=np.int64)
        n = g["n_events"].to_numpy(dtype=np.int64)
        new_sess = np.ones(len(start), dtype=bool)
        # islands from the same phase-1 group are > gap apart by
        # construction; this re-joins only the bucket-edge cuts
        new_sess[1:] = (start[1:] - np.maximum.accumulate(end)[:-1]) > gap_seconds
        sid = np.cumsum(new_sess) - 1
        df = pd.DataFrame({"sid": sid, "start": start, "n": n})
        aggd = (df.groupby("sid")
                  .agg(session_start=("start", "min"), n_events=("n", "sum"))
                  .reset_index())
        return pa.table({
            "user_id": pa.array(np.repeat(int(g["user_id"].iloc[0]), len(aggd)), type=pa.int64()),
            "session_id": pa.array(aggd["sid"].to_numpy(dtype=np.int64), type=pa.int64()),
            "session_start": pa.array(aggd["session_start"].to_numpy(dtype=np.int64), type=pa.int64()),
            "n_events": pa.array(aggd["n_events"].to_numpy(dtype=np.int64), type=pa.int64()),
        })

    return (
        events_ds.map_batches(project, batch_format="pyarrow")
        .groupby(["user_id", "bucket"])
        .map_groups(islands, batch_format="pandas")
        .groupby("user_id")
        .map_groups(merge, batch_format="pandas")
    )
