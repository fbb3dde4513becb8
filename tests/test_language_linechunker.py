"""Language registry (M1-M3), simple_hash (M4), line chunker (M6 stand-in)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from coderag_ray.functions.chunker import chunk_lines
from coderag_ray.functions.hashing import simple_hash
from coderag_ray.functions.language import (
    detect_language,
    is_text_file,
    language_for_extension,
    make_text_file_guard,
)


def test_detect_language():
    assert detect_language("src/a/b.ts") == "TypeScript"
    assert detect_language("x.PY") == "Python"
    assert detect_language("noext") is None
    assert detect_language("a.unknownext") is None


def test_is_text_file():
    assert is_text_file("src/x.py")
    assert is_text_file("Dockerfile")
    assert is_text_file("deep/path/Makefile")
    assert is_text_file(".env.local")
    assert not is_text_file("img.png")
    assert not is_text_file("bin/data.bin")


def test_language_registry():
    assert language_for_extension(".tsx") == "typescript"
    assert language_for_extension("rs") == "rust"
    assert language_for_extension(".xyz") is None


def test_text_file_guard_vectorized():
    import pyarrow as pa

    t = pa.table({"path": ["a.py", "b.png", "Dockerfile", "c.rs"], "v": [1, 2, 3, 4]})
    out = make_text_file_guard()(t)
    assert out["v"].to_pylist() == [1, 3, 4]


def test_simple_hash_reference_semantics():
    # JS: Math.abs(((h<<5)-h+c)|0 chain).toString(36); "" → "0"
    assert simple_hash("") == "0"
    a, b = simple_hash("hello world"), simple_hash("hello world")
    assert a == b and a != simple_hash("hello worle")
    assert all(ch in "0123456789abcdefghijklmnopqrstuvwxyz" for ch in a)
    # unicode-stable (UTF-16 units like JS charCodeAt)
    assert simple_hash("héllo🎉") == simple_hash("héllo🎉")


def test_chunk_lines_reassembles_and_progresses():
    text = "\n".join(f"line {i} " + "x" * (i % 40) for i in range(200))
    chunks = chunk_lines(text, 500)
    # chunks cover the text exactly, in order, no overlap
    assert chunks[0][0] == 0
    for (s0, e0, _, el0), (s1, e1, sl1, _) in zip(chunks, chunks[1:]):
        assert s1 == e0 and sl1 == el0 + 1
    assert chunks[-1][1] == len(text)
    assert "".join(text[s:e] for s, e, _, _ in chunks) == text
    # respects max size except single oversize lines
    for s, e, sl, el in chunks:
        assert e - s <= 500 or sl == el


def test_chunk_lines_oversize_line_is_own_chunk():
    text = "short\n" + "y" * 3000 + "\nshort2"
    chunks = chunk_lines(text, 100)
    sizes = [e - s for s, e, _, _ in chunks]
    assert max(sizes) == 3001  # the oversize line + newline
    assert "".join(text[s:e] for s, e, _, _ in chunks) == text


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="ab\n x", max_size=400), st.integers(5, 60))
def test_chunk_lines_property(text, size):
    chunks = chunk_lines(text, size)
    assert "".join(text[s:e] for s, e, _, _ in chunks) == text
    for (s0, e0, _, _), (s1, _, _, _) in zip(chunks, chunks[1:]):
        assert s1 == e0


def test_line_chunker_stage_builds_and_searches(ray_session, tmp_path):
    import ray.data

    from coderag_ray.config import IndexConfig
    from coderag_ray.corpus import make_corpus
    from coderag_ray.index.build import build_index
    from coderag_ray.query.search import search

    d = str(tmp_path / "idx")
    cfg = IndexConfig(num_partitions=3, chunker="lines")
    r = build_index(ray.data.from_arrow(make_corpus(60, seed=4)), d, cfg)
    assert r.n_chunks > 0
    res = search(d, "authenticate user", 5)
    assert res.num_rows > 0
    # line chunks carry 1-based line ranges
    import pyarrow.parquet as pq
    import os

    docs = pq.read_table(os.path.join(d, "parts", "part=00000", "docs.parquet"))
    assert min(docs["start_line"].to_pylist()) >= 1
    assert docs["chunk_type"][0].as_py() == "code"
