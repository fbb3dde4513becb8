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
    if config.chunker == "lines":
        return _make_line_chunker(config)
    if config.chunker == "ast":
        return _make_ast_chunker(config)
    if config.chunker == "auto":
        # real-asset hook (VERDICT r3 item 7): tree-sitter parse trees
        # when the runtime+grammar are importable, the deterministic
        # stdlib-ast / brace-lexer chunkers otherwise — same pipeline,
        # zero code change outside this factory
        return _make_ast_chunker(config, use_treesitter=True)
    if config.chunker != "chars":
        raise ValueError(f"unknown chunker {config.chunker!r}")
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


def _make_ast_chunker(config: IndexConfig, use_treesitter: bool = False):
    """Semantic AST chunking: stdlib-``ast`` for Python and the
    deterministic brace lexer for TypeScript/JavaScript/Go/Java/Rust —
    the reference's six tree-sitter languages (``chunkCodeByAST``,
    ``ast-chunking.ts:47-54,183-225``); everything else — and any file
    the Python parser rejects — takes the reference's character-window
    fallback (``createFallbackChunks``, ``ast-chunking.ts:59-68``: type
    ``text``, lines 0, ``metadata.fallback = true``).  Emits the extra
    ``chunk_meta`` column (canonical-JSON scope/entities per chunk,
    ``ast-chunking.ts:76-88``); the partition writer selects its own
    columns, so downstream stages are unaffected."""
    import json

    from coderag_ray.functions.ast_chunker import chunk_python_ast
    from coderag_ray.functions.brace_chunker import chunk_braces_ast
    from coderag_ray.functions.chunker import batch_chunk_offsets

    size, overlap = config.max_chunk_size, config.chunk_overlap

    def chunk(t: pa.Table) -> pa.Table:
        langs = t["lang"].to_pylist()
        contents = t["content"].to_pylist()
        cols: dict[str, list] = {c: [] for c in
                                 ("doc_idx", "chunk_id", "type", "sl", "el",
                                  "start", "end", "text", "meta")}

        def emit(di, ci, typ, sl, el, s, e, text, meta):
            cols["doc_idx"].append(di)
            cols["chunk_id"].append(ci)
            cols["type"].append(typ)
            cols["sl"].append(sl)
            cols["el"].append(el)
            cols["start"].append(s)
            cols["end"].append(e)
            cols["text"].append(text)
            cols["meta"].append(meta)

        for di, (lang, c) in enumerate(zip(langs, contents)):
            # case-insensitive: corpus tables say "python", the filesystem
            # source's LANGUAGE_REGISTRY says "Python"
            low = lang.lower() if isinstance(lang, str) else ""
            chunks = None
            if use_treesitter:
                from coderag_ray.functions.treesitter_chunker import chunk_treesitter

                chunks = chunk_treesitter(c, low, size)  # None unless importable
            if chunks is None:
                if low == "python":
                    chunks = chunk_python_ast(c, size)
                else:
                    chunks = chunk_braces_ast(c, low, size)
            if chunks is not None:
                for ci, ch in enumerate(chunks):
                    emit(di, ci, ch.type, ch.start_line, ch.end_line,
                         ch.start_offset, ch.end_offset, ch.content, ch.meta)
            else:
                n = np.array([len(c)], dtype=np.int64)
                _, cid, start, end = batch_chunk_offsets(n, size, overlap)
                for ci, s, e in zip(cid.tolist(), start.tolist(), end.tolist()):
                    emit(di, ci, "text", 0, 0, s, e,
                         c if (s == 0 and e == len(c)) else c[s:e],
                         json.dumps({"fallback": True, "index": ci}, sort_keys=True))

        take = pa.array(np.array(cols["doc_idx"], dtype=np.int64))
        text_arr = pa.array(cols["text"], type=pa.string())
        start = np.array(cols["start"], dtype=np.int64)
        end = np.array(cols["end"], dtype=np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"].take(take),
                "part_id": t["part_id"].take(take),
                "chunk_id": pa.array(np.array(cols["chunk_id"], dtype=np.int64)),
                "chunk_type": pa.array(cols["type"], type=pa.string()),
                "start_line": pa.array(np.array(cols["sl"], dtype=np.int32)),
                "end_line": pa.array(np.array(cols["el"], dtype=np.int32)),
                "start_offset": pa.array(start),
                "end_offset": pa.array(end),
                "n_chunk_chars": pa.array(end - start),
                "content": text_arr,
                "chunk_meta": pa.array(cols["meta"], type=pa.string()),
                "chunk_sha256": batch_sha256(text_arr),
                "content_sha256": t["content_sha256"].take(take),
                "repo": t["repo"].take(take),
                "path": t["path"].take(take),
                "commit": t["commit"].take(take),
                "lang": t["lang"].take(take),
            }
        )

    return chunk


def _make_line_chunker(config: IndexConfig):
    from coderag_ray.functions.chunker import chunk_lines

    size = config.max_chunk_size

    def chunk(t: pa.Table) -> pa.Table:
        contents = t["content"].to_pylist()
        cols: dict[str, list] = {c: [] for c in
                                 ("doc_idx", "chunk_id", "start", "end", "sl", "el", "text")}
        for di, c in enumerate(contents):
            for ci, (s, e, sl, el) in enumerate(chunk_lines(c, size)):
                cols["doc_idx"].append(di)
                cols["chunk_id"].append(ci)
                cols["start"].append(s)
                cols["end"].append(e)
                cols["sl"].append(sl)
                cols["el"].append(el)
                cols["text"].append(c if (s == 0 and e == len(c)) else c[s:e])
        take = pa.array(np.array(cols["doc_idx"], dtype=np.int64))
        text_arr = pa.array(cols["text"], type=pa.string())
        start = np.array(cols["start"], dtype=np.int64)
        end = np.array(cols["end"], dtype=np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"].take(take),
                "part_id": t["part_id"].take(take),
                "chunk_id": pa.array(np.array(cols["chunk_id"], dtype=np.int64)),
                "chunk_type": pa.array(["code"] * len(text_arr), type=pa.string()),
                "start_line": pa.array(np.array(cols["sl"], dtype=np.int32)),
                "end_line": pa.array(np.array(cols["el"], dtype=np.int32)),
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
