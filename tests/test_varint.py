import numpy as np
from hypothesis import given, settings, strategies as st

from coderag_ray.functions import varint as V


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 2**63 - 1), max_size=200))
def test_roundtrip(vals):
    v = np.array(vals, dtype=np.uint64)
    assert np.array_equal(V.decode(V.encode(v)), v)


def test_delta_roundtrip_and_block_skip():
    rng = np.random.default_rng(7)
    ids = np.sort(rng.choice(10**7, size=1000, replace=False)).astype(np.uint64)
    buf = V.encode_deltas(ids)
    assert np.array_equal(V.decode_deltas(buf), ids)
    d = np.empty_like(ids)
    d[0] = ids[0]
    d[1:] = np.diff(ids)
    lens = V.value_byte_lengths(d)
    # skip to block 3 (values 384..511)
    off = int(lens[:384].sum())
    got = V.decode_deltas(buf, offset=off, count=128, base=int(ids[383]))
    assert np.array_equal(got, ids[384:512])


def test_lengths_match_encoding():
    v = np.array([0, 1, 127, 128, 2**14 - 1, 2**14, 2**62], dtype=np.uint64)
    assert V.value_byte_lengths(v).sum() == len(V.encode(v))


def test_empty():
    assert V.encode(np.empty(0, dtype=np.uint64)) == b""
    assert V.decode(b"").size == 0
