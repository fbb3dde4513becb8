"""Hybrid (vector + BM25) search — the reference's optional LanceDB path
re-expressed Ray-native.

- :func:`build_embeddings` adds an ordinal-aligned ``embeddings.parquet``
  sidecar to every index partition (actor-pool ``EmbedStage`` over each
  partition's chunk content — one task per partition, no shuffle).
- :func:`vector_topk` scores partitions independently (numpy cosine
  against the query embedding) and merges, like the BM25 path.
- :func:`hybrid_search` merges the two top-k lists with the reference's
  weighted max-normalized fusion (``hybrid-search.ts:169-263``
  ``mergeSearchResults``): each side is normalized by its own max score
  (floor 0.01), fused = ``vw * norm_vec + (1 - vw) * norm_bm25``; chunks
  present on both sides get the summed score ("hybrid" method).
  Deterministic tie-break (fused DESC, doc_id, chunk_id) replaces the
  reference's unstable JS sort.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from coderag_ray.functions.embeddings import DEFAULT_DIMENSIONS, EmbedStage, mock_embedding
from coderag_ray.index.reader import IndexReader
from coderag_ray.query.search import search


def build_embeddings(index_dir: str, dimensions: int = DEFAULT_DIMENSIONS) -> int:
    """Embed every chunk of every partition (mock provider); returns rows embedded."""
    import ray

    reader = IndexReader(index_dir)

    @ray.remote
    def embed_part(part_dir: str, dims: int) -> int:
        chunks = pq.read_table(os.path.join(part_dir, "chunks.parquet"))
        stage = EmbedStage(dims, text_col="content")
        out = stage(chunks).select(["ordinal", "embedding"])
        tmp = os.path.join(part_dir, f"_tmp_embeddings_{os.getpid()}.parquet")
        pq.write_table(out, tmp, compression="zstd")
        os.replace(tmp, os.path.join(part_dir, "embeddings.parquet"))
        return out.num_rows

    futures = [
        embed_part.remote(reader.part_dir(pid), dimensions) for pid in reader.partitions
    ]
    return int(sum(ray.get(futures)))


def vector_topk(reader: IndexReader, query: str, k: int,
                dimensions: int = DEFAULT_DIMENSIONS) -> pa.Table:
    """Exact cosine top-k over the chunk-embedding sidecars."""
    qv = mock_embedding(query, dimensions)
    rows = []
    for pid in reader.partitions:
        path = os.path.join(reader.part_dir(pid), "embeddings.parquet")
        if not os.path.exists(path):
            raise FileNotFoundError(f"no embeddings sidecar in partition {pid}; "
                                    "run build_embeddings() first")
        tbl = pq.read_table(path)
        E = np.stack(tbl["embedding"].to_pylist()).astype(np.float64)
        sims = E @ qv  # embeddings are unit vectors
        h = reader.partition(pid)
        top = np.lexsort((h.chunk_ids, h.doc_ids, -sims))[:k]
        for o in top:
            rows.append((int(h.doc_ids[o]), int(h.chunk_ids[o]), float(sims[o]),
                         int(pid), int(o)))
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    rows = rows[:k]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "chunk_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "similarity": pa.array([r[2] for r in rows], type=pa.float64()),
            "part_id": pa.array([r[3] for r in rows], type=pa.int64()),
            "ordinal": pa.array([r[4] for r in rows], type=pa.int64()),
        }
    )


def hybrid_search(index: IndexReader | str, query: str, k: int = 10,
                  vector_weight: float = 0.5,
                  dimensions: int = DEFAULT_DIMENSIONS) -> pa.Table:
    """→ (doc_id, chunk_id, score, method, similarity, bm25_score)."""
    reader = index if isinstance(index, IndexReader) else IndexReader(index)
    vec = vector_topk(reader, query, k, dimensions)
    bm = search(reader, query, k, with_doc_columns=False)

    max_vec = max([s for s in vec["similarity"].to_pylist()] + [0.01])
    max_bm = max([s for s in bm["score"].to_pylist()] + [0.01])

    fused: dict[tuple[int, int], dict] = {}
    for r in vec.to_pylist():
        key = (r["doc_id"], r["chunk_id"])
        fused[key] = {
            "doc_id": r["doc_id"], "chunk_id": r["chunk_id"],
            "score": (r["similarity"] / max_vec) * vector_weight,
            "method": "vector", "similarity": r["similarity"], "bm25_score": None,
        }
    for r in bm.to_pylist():
        key = (r["doc_id"], r["chunk_id"])
        norm = (r["score"] / max_bm) * (1.0 - vector_weight)
        if key in fused:
            fused[key]["score"] += norm
            fused[key]["method"] = "hybrid"
            fused[key]["bm25_score"] = r["score"]
        else:
            fused[key] = {
                "doc_id": r["doc_id"], "chunk_id": r["chunk_id"], "score": norm,
                "method": "tfidf", "similarity": None, "bm25_score": r["score"],
            }
    out = sorted(fused.values(), key=lambda d: (-d["score"], d["doc_id"], d["chunk_id"]))[:k]
    return pa.table(
        {
            "rank": pa.array(range(1, len(out) + 1), type=pa.int32()),
            "doc_id": pa.array([d["doc_id"] for d in out], type=pa.int64()),
            "chunk_id": pa.array([d["chunk_id"] for d in out], type=pa.int64()),
            "score": pa.array([d["score"] for d in out], type=pa.float64()),
            "method": pa.array([d["method"] for d in out], type=pa.string()),
            "similarity": pa.array([d["similarity"] for d in out], type=pa.float64()),
            "bm25_score": pa.array([d["bm25_score"] for d in out], type=pa.float64()),
        }
    )
