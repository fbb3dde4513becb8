"""Deterministic character-window chunker.

Mirrors the reference's fallback chunker exactly
(``/root/reference/packages/core/src/embeddings.ts:259-297`` ``chunkText``
and ``ast-chunking.ts:59-68`` ``createFallbackChunks``): fixed windows of
``max_chunk_size`` characters with ``overlap`` characters of overlap and
guaranteed forward progress.  Fallback chunks in the reference carry
``startLine = endLine = 0`` and ``type = 'text'`` (``ast-chunking.ts:63-66``);
we additionally record exact character offsets so content can be
re-assembled and sha-verified.

With the defaults (1000 / 100) chunk ``i`` covers
``[i*(size-overlap), min(i*(size-overlap)+size, n))`` and the number of
chunks is ``0`` for empty text else ``1 + max(0, ceil((n-size)/(size-overlap)))``
— a closed form shared with the DuckDB oracle SQL.

Lengths/offsets are Unicode code points (Python ``str`` indexing ==
DuckDB ``substr``; the reference uses UTF-16 code units — identical for
BMP text, a documented deviation beyond).
"""

from __future__ import annotations

import numpy as np


def num_chunks(n_chars: int, max_chunk_size: int = 1000, overlap: int = 100) -> int:
    if n_chars <= 0:
        return 0
    if n_chars <= max_chunk_size:
        return 1
    step = max_chunk_size - overlap
    if step <= 0:  # degenerate config: loop advances start to end (no overlap)
        step = max_chunk_size
    return 1 + int(np.ceil((n_chars - max_chunk_size) / step))


def chunk_offsets(n_chars: int, max_chunk_size: int = 1000, overlap: int = 100) -> list[tuple[int, int]]:
    """[(start, end)] per chunk — the frozen spec (matches chunkText's loop)."""
    n = num_chunks(n_chars, max_chunk_size, overlap)
    step = max_chunk_size - overlap
    if step <= 0:
        step = max_chunk_size
    return [(i * step, min(i * step + max_chunk_size, n_chars)) for i in range(n)]


def chunk_text(text: str, max_chunk_size: int = 1000, overlap: int = 100) -> list[str]:
    return [text[s:e] for s, e in chunk_offsets(len(text), max_chunk_size, overlap)]


def chunk_lines(text: str, max_chunk_size: int = 1000) -> list[tuple[int, int, int, int]]:
    """Line-aware chunker — the deterministic stand-in for the
    reference's AST chunking (``ast-chunking.ts:183-225``; tree-sitter
    is unavailable offline).  Greedily packs whole lines into chunks of
    at most ``max_chunk_size`` chars, preferring to break after blank
    lines (the reference's AST path also breaks at declaration
    boundaries); a single oversize line becomes its own chunk
    (guaranteed forward progress).  Returns
    ``[(start_offset, end_offset, start_line, end_line)]`` with 1-based
    line numbers like the reference's AST chunks (``ast-chunking.ts:76-80``).
    """
    if not text:
        return []
    # line spans including the trailing newline (so chunks reassemble)
    spans: list[tuple[int, int]] = []
    pos = 0
    while pos <= len(text) - 1:
        nl = text.find("\n", pos)
        end = len(text) if nl < 0 else nl + 1
        spans.append((pos, end))
        if nl < 0:
            break
        pos = end
    out = []
    i = 0
    while i < len(spans):
        start = spans[i][0]
        start_line = i + 1
        j = i
        last_blank = -1
        while j < len(spans) and (spans[j][1] - start <= max_chunk_size or j == i):
            if text[spans[j][0] : spans[j][1]].strip() == "":
                last_blank = j
            j += 1
        # prefer a blank-line break if it keeps the chunk at least half full
        if j < len(spans) and last_blank > i and (spans[last_blank][1] - start) * 2 >= max_chunk_size:
            j = last_blank + 1
        out.append((start, spans[j - 1][1], start_line, j))
        i = j
    return out


def batch_chunk_offsets(
    n_chars: np.ndarray, max_chunk_size: int = 1000, overlap: int = 100
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized chunk layout for a batch of documents.

    Input: array of per-doc char counts.  Output
    ``(doc_idx, chunk_id, start, end)`` flat arrays, one entry per chunk,
    chunk_id = 0-based ordinal within its doc.
    """
    n_chars = np.asarray(n_chars, dtype=np.int64)
    step = max_chunk_size - overlap
    if step <= 0:
        step = max_chunk_size
    n_chunks = np.where(
        n_chars <= 0,
        0,
        np.where(
            n_chars <= max_chunk_size,
            1,
            1 + np.ceil((n_chars - max_chunk_size) / step).astype(np.int64),
        ),
    ).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(n_chars), dtype=np.int64), n_chunks)
    total = int(n_chunks.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy(), z.copy()
    # ordinal within doc: arange minus start offset of each doc's run
    run_starts = np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
    chunk_id = np.arange(total, dtype=np.int64) - run_starts
    start = chunk_id * step
    end = np.minimum(start + max_chunk_size, n_chars[doc_idx])
    return doc_idx, chunk_id, start, end
