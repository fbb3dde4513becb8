"""Bucketed high-cardinality aggregation.

Ray Data's declarative ``groupby(key).aggregate(...)`` pays per-group
Python overhead at group boundaries — fine for thousands of groups,
minutes for millions (measured: ~1.2M distinct keys ≈ 300 s on 16
CPUs).  The scalable pattern is two-phase: hash keys into a bounded
number of buckets (the shuffle key), then aggregate each bucket's rows
with one vectorized pandas ``groupby`` call (C speed).  Exact results,
same shuffle volume, O(buckets) Python overhead.

Used by the global IDF merge and the dedup pair-count merge; any new
aggregate whose key cardinality grows with the corpus should go through
here.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from coderag_ray.functions.hashing import splitmix64

BUCKET_COL = "__bucket"


def _add_bucket(key_col: str, num_buckets: int):
    def add(t: pa.Table) -> pa.Table:
        col = t[key_col]
        typ = col.type if not isinstance(col, pa.ChunkedArray) else col.type
        if pa.types.is_integer(typ):
            keys = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            b = (splitmix64(keys) % np.uint64(num_buckets)).astype(np.int32)
        else:
            b = np.array(
                [zlib.crc32(s.encode("utf-8")) % num_buckets for s in col.to_pylist()],
                dtype=np.int32,
            )
        return t.append_column(BUCKET_COL, pa.array(b))

    return add


def bucketed_groupby_sum(
    ds,
    key_cols: str | list[str],
    sum_col: str,
    alias: str,
    num_buckets: int = 64,
):
    """Exact ``SELECT key, SUM(sum_col) AS alias GROUP BY key`` as a
    bucketed shuffle + vectorized per-bucket pandas aggregation.

    Bucketing hashes the FIRST key column; rows with equal keys land in
    one bucket, so per-bucket sums are globally complete.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def agg(g: pd.DataFrame) -> pa.Table:
        s = g.groupby(keys, sort=False)[sum_col].sum().reset_index()
        # emit Arrow, not pandas: pandas blocks reaching a downstream
        # sort trip Ray's unhashable-PandasBlockSchema warning path;
        # metadata stripped — a schema with b'pandas' metadata is
        # unhashable (holds a dict) and triggers the same warning
        return pa.Table.from_pandas(s.rename(columns={sum_col: alias}),
                                    preserve_index=False).replace_schema_metadata(None)

    return (
        ds.map_batches(_add_bucket(keys[0], num_buckets), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(agg, batch_format="pandas")
    )
