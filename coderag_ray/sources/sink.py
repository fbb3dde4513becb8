"""Resumable partitioned parquet sink.

The index build already writes per-partition directories atomically with
a manifest; this is the same discipline as a GENERIC sink for any
Dataset: hash-partition rows by a key column into ``part=NNNNN/``
directories, each written tmp+atomic-rename with a ``_SUCCESS`` marker,
so a failed or re-run job skips finished partitions instead of
rewriting the world (the brief's "resumable output" requirement —
never one giant file, restartable at partition granularity).

Files are DETERMINISTIC: rows are sorted by the partition key (plus all
other columns as tie-breaks) before writing, so a resumed run that does
rewrite a partition produces byte-identical parquet — verified in
tests by SIGKILL-free delete-and-rewrite equality.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from coderag_ray.functions.hashing import splitmix64

SUCCESS_MARKER = "_SUCCESS"


def _bucket_array(col, num_partitions: int) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        keys = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        return (splitmix64(keys) % np.uint64(num_partitions)).astype(np.int32)
    import zlib

    return np.array(
        [zlib.crc32(str(s).encode("utf-8")) % num_partitions for s in col.to_pylist()],
        dtype=np.int32,
    )


def write_partitioned(ds, out_dir: str, key_col: str, num_partitions: int = 64,
                      skip_complete: bool = True):
    """Hash-partitioned, resumable, deterministic parquet write.

    → pyarrow Table (part, n_rows, skipped) — one summary row per
    partition actually present in the data.  Re-running over the same
    input is a no-op for partitions whose ``_SUCCESS`` marker exists
    (``skip_complete=False`` forces rewrite).
    """
    os.makedirs(out_dir, exist_ok=True)

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__part", pa.array(_bucket_array(t[key_col], num_partitions)))

    sort_cols = None

    def write_group(g: pa.Table) -> pa.Table:
        part = int(g["__part"][0].as_py())
        part_dir = os.path.join(out_dir, f"part={part:05d}")
        done = os.path.join(part_dir, SUCCESS_MARKER)
        if skip_complete and os.path.exists(done):
            return pa.table({"part": pa.array([part], type=pa.int32()),
                             "n_rows": pa.array([g.num_rows], type=pa.int64()),
                             "skipped": pa.array([True])})
        g = g.drop_columns(["__part"])
        # deterministic row order → byte-identical rewrite
        keys = [(key_col, "ascending")] + [
            (c, "ascending") for c in g.column_names if c != key_col
        ]
        try:
            g = g.take(pc.sort_indices(g, sort_keys=keys))
        except pa.ArrowNotImplementedError:
            g = g.take(pc.sort_indices(g, sort_keys=[(key_col, "ascending")]))
        tmp_dir = f"{part_dir}.tmp{os.getpid()}"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir)
        pq.write_table(g, os.path.join(tmp_dir, "data.parquet"),
                       compression="zstd", row_group_size=64 * 1024)
        open(os.path.join(tmp_dir, SUCCESS_MARKER), "w").close()
        shutil.rmtree(part_dir, ignore_errors=True)
        os.replace(tmp_dir, part_dir)
        return pa.table({"part": pa.array([part], type=pa.int32()),
                         "n_rows": pa.array([g.num_rows], type=pa.int64()),
                         "skipped": pa.array([False])})

    summary = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(write_group, batch_format="pyarrow")
        .to_pandas()  # one row per partition — tiny
    )
    return pa.Table.from_pandas(
        summary.sort_values("part").reset_index(drop=True), preserve_index=False
    ).replace_schema_metadata(None)


def read_partitioned(out_dir: str):
    """Read back a :func:`write_partitioned` layout (complete partitions
    only — incomplete ones have no ``_SUCCESS`` and are skipped with the
    assumption the producing job will be resumed)."""
    import ray.data

    files = []
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if name.startswith("part=") and os.path.exists(os.path.join(p, SUCCESS_MARKER)):
            files.extend(os.path.join(p, f) for f in sorted(os.listdir(p))
                         if f.endswith(".parquet"))
    return ray.data.read_parquet(files)
