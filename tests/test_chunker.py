"""Chunker tests mirroring reference cases (ast-chunking.test.ts window
boundaries, forward progress; embeddings.test.ts:115-157 overlap)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from coderag_ray.functions.chunker import batch_chunk_offsets, chunk_offsets, chunk_text, num_chunks


def reference_chunk_loop(text: str, size: int = 1000, overlap: int = 100) -> list[str]:
    """Literal transcription of chunkText's control flow (embeddings.ts:266-296)."""
    if len(text) == 0:
        return []
    chunks, start = [], 0
    while start < len(text):
        end = min(start + size, len(text))
        chunks.append(text[start:end])
        if end >= len(text):
            break
        nxt = end - overlap
        start = end if nxt <= start else nxt
    return chunks


def test_window_boundaries():
    assert chunk_text("") == []
    assert chunk_text("x" * 1000) == ["x" * 1000]
    cs = chunk_text("a" * 1001)
    assert len(cs) == 2 and len(cs[0]) == 1000 and len(cs[1]) == 101


def test_overlap_content_preserved():
    text = "".join(chr(ord("a") + (i % 26)) for i in range(3456))
    cs = chunk_text(text)
    for (s, e), c in zip(chunk_offsets(len(text)), cs):
        assert text[s:e] == c
    # consecutive chunks share exactly `overlap` chars
    offs = chunk_offsets(len(text))
    for (s0, e0), (s1, e1) in zip(offs, offs[1:]):
        assert s1 == e0 - 100


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 5000), st.integers(2, 50), st.integers(0, 30))
def test_matches_reference_loop(n, size, overlap):
    overlap = min(overlap, size - 1)
    text = "x" * n
    assert chunk_text(text, size, overlap) == reference_chunk_loop(text, size, overlap)
    assert num_chunks(n, size, overlap) == len(reference_chunk_loop(text, size, overlap))


def test_batch_matches_scalar():
    lens = np.array([0, 1, 500, 1000, 1001, 1900, 1901, 9999])
    di, ci, s, e = batch_chunk_offsets(lens)
    for i, n in enumerate(lens):
        mine = [(int(a), int(b)) for a, b in zip(s[di == i], e[di == i])]
        assert mine == chunk_offsets(int(n)), i
        assert (ci[di == i] == np.arange(len(mine))).all()
