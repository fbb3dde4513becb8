"""Chunk stage — 1 doc row in, N chunk rows out.

Ray-native replacement for the reference's per-file chunking step
(``/root/reference/packages/core/src/ast-chunking.ts:183-225``
``chunkCodeByAST`` with the character fallback ``createFallbackChunks``
``ast-chunking.ts:59-68``): a stateless flat-mapping ``map_batches``
transform.  The window layout is computed vectorized
(:func:`coderag_ray.functions.chunker.batch_chunk_offsets`); the actual
string slicing is a per-doc loop because Arrow has no per-row-offset
substring kernel — the work is O(total chunk bytes) either way, and
single-chunk docs (the common case) pass their string through without
copying.

Like the reference, empty docs emit no chunks (``chunkText('') → []``,
``embeddings.ts:268-270``) and whitespace-only docs emit a chunk that
later tokenizes to zero tokens but still counts toward N/avgdl
(``storage-persistent.ts:973``).  Fallback chunks carry
``start_line = end_line = 0`` and ``chunk_type='text'`` exactly like the
reference (``ast-chunking.ts:63-66``); exact char offsets are recorded
for sha-verifiable reassembly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from coderag_ray.config import IndexConfig
from coderag_ray.functions.chunker import batch_chunk_offsets
from coderag_ray.functions.hashing import batch_sha256

CHUNK_COLUMNS = ["doc_id", "part_id", "chunk_id", "chunk_type", "start_line", "end_line",
                 "start_offset", "end_offset", "n_chunk_chars", "content", "chunk_sha256",
                 "content_sha256", "repo", "path", "commit", "lang"]


def make_chunker(config: IndexConfig):
    size, overlap = config.max_chunk_size, config.chunk_overlap

    def chunk(t: pa.Table) -> pa.Table:
        n_chars = t["n_chars"].to_numpy(zero_copy_only=False)
        doc_idx, chunk_id, start, end = batch_chunk_offsets(n_chars, size, overlap)
        contents = t["content"].to_pylist()
        out_text: list[str] = []
        for di, s, e in zip(doc_idx.tolist(), start.tolist(), end.tolist()):
            c = contents[di]
            out_text.append(c if (s == 0 and e == len(c)) else c[s:e])
        take = pa.array(doc_idx)
        text_arr = pa.array(out_text, type=pa.string())
        n = len(out_text)
        return pa.table(
            {
                "doc_id": t["doc_id"].take(take),
                "part_id": t["part_id"].take(take),
                "chunk_id": pa.array(chunk_id),
                "chunk_type": pa.array(["text"] * n, type=pa.string()),
                "start_line": pa.array(np.zeros(n, dtype=np.int32)),
                "end_line": pa.array(np.zeros(n, dtype=np.int32)),
                "start_offset": pa.array(start),
                "end_offset": pa.array(end),
                "n_chunk_chars": pa.array(end - start),
                "content": text_arr,
                "chunk_sha256": batch_sha256(text_arr),
                "content_sha256": t["content_sha256"].take(take),
                "repo": t["repo"].take(take),
                "path": t["path"].take(take),
                "commit": t["commit"].take(take),
                "lang": t["lang"].take(take),
            }
        )

    return chunk
