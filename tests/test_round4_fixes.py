"""Round-4 fixes: input-size-derived bucket counts (VERDICT r3 item 3),
distributed packing, consolidated driver surface."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_auto_buckets_grows_with_input():
    from coderag_ray.config import auto_buckets

    # unknown / small input → the historical constant
    assert auto_buckets(0) == 64
    assert auto_buckets(10_000) == 64
    assert auto_buckets(None) == 64
    # grows with row count, power-of-two, capped
    a = auto_buckets(500_000_000)
    b = auto_buckets(5_000_000_000)
    assert 64 < a < b
    assert a & (a - 1) == 0 and b & (b - 1) == 0
    assert auto_buckets(10**13) == 65_536
    # per-operator targets shift the curve; lo floor respected
    assert auto_buckets(10**6, target_rows=100_000, lo=256) == 256
    assert auto_buckets(10**8, target_rows=100_000) == 1024


def test_auto_buckets_accepts_dataset(ray_session):
    import ray.data

    from coderag_ray.config import auto_buckets

    ds = ray.data.from_arrow(pa.table({"x": pa.array(np.arange(100))}))
    assert auto_buckets(ds) == 64


def test_driver_registry_is_exactly_50_and_extras_disjoint():
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    extras = entrymod.extra_queries()
    assert len(qs) == 50
    assert not set(qs) & set(extras)
    # every oracle key corresponds to a registered query
    assert set(entrymod.oracle_sql()) <= set(qs)
    assert set(entrymod.extra_oracle_sql()) <= set(extras)
