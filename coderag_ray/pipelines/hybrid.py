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


ANN_DIRNAME = "ann"


def build_vector_ann(index_dir: str, dimensions: int = DEFAULT_DIMENSIONS) -> int:
    """Build the ANN candidate index for :func:`vector_topk_ann`: the
    random-hyperplane LSH bucket layout from
    :mod:`coderag_ray.pipelines.similarity` applied to the per-partition
    embedding sidecars (the reference's LanceDB ANN store,
    ``vector-storage.ts:67-377``, re-expressed as a partitioned-parquet
    layout).

    Two map/reduce waves, no shuffle through the object store: one Ray
    task per index partition writes ``bucket=NNNN/part-<pid>.parquet``
    map outputs into a FRESH staging dir, then one task per bucket
    compacts its part files into a single ``data.parquet`` (queries
    probe one file per bucket instead of up to P small files — the
    round-2 cold-probe p95 inversion came from exactly that fan-out).
    The staging dir atomically replaces ``ann/`` at the end, so a
    rebuild can never serve stale buckets from a previous build.
    Returns rows indexed.
    """
    import json
    import shutil

    import ray

    from coderag_ray.pipelines.similarity import _bucket_of, _planes, derive_lsh_planes

    from coderag_ray.pipelines.similarity import (
        recover_dir_from_bak, swap_dir_crash_safe, sweep_stale_staging)

    reader = IndexReader(index_dir)
    final_ann_dir = os.path.join(index_dir, ANN_DIRNAME)
    recover_dir_from_bak(final_ann_dir)
    # orphaned staging dirs from crashed builds carry OTHER pids —
    # sweep them before staging anew (ADVICE r3)
    sweep_stale_staging(index_dir, f"_tmp_{ANN_DIRNAME}_")
    ann_dir = os.path.join(index_dir, f"_tmp_{ANN_DIRNAME}_{os.getpid()}")
    shutil.rmtree(ann_dir, ignore_errors=True)
    os.makedirs(ann_dir)
    # plane count sized to the corpus (fixed 12 planes over a small test
    # corpus = 4096 near-empty buckets = ~zero recall); persisted so
    # probes always use the layout's own geometry
    n_planes = derive_lsh_planes(reader.n_chunks)
    with open(os.path.join(ann_dir, "_lsh.json"), "w") as f:
        json.dump({"n_planes": n_planes}, f)

    @ray.remote
    def ann_part(part_dir: str, pid: int, ann_root: str, n_planes: int) -> int:
        emb = pq.read_table(os.path.join(part_dir, "embeddings.parquet"))
        docs = pq.read_table(os.path.join(part_dir, "docs.parquet"),
                             columns=["doc_id", "chunk_id"])
        E = _emb_matrix(emb)
        buckets = _bucket_of(E, _planes(E.shape[1], n_planes))  # embeddings are unit vectors
        tbl = pa.table(
            {
                "part_id": pa.array(np.full(len(buckets), pid, dtype=np.int64)),
                "ordinal": emb["ordinal"],
                "doc_id": docs["doc_id"],
                "chunk_id": docs["chunk_id"],
                "bucket": pa.array(buckets, type=pa.int32()),
                "embedding": emb["embedding"],
            }
        )
        order = np.argsort(buckets, kind="stable")
        tbl = tbl.take(pa.array(order))
        b_sorted = buckets[order]
        starts = np.flatnonzero(np.r_[True, b_sorted[1:] != b_sorted[:-1]])
        ends = np.r_[starts[1:], len(b_sorted)]
        for s, e in zip(starts, ends):
            b = int(b_sorted[s])
            bdir = os.path.join(ann_root, f"bucket={b}")
            os.makedirs(bdir, exist_ok=True)
            path = os.path.join(bdir, f"part-{pid:05d}.parquet")
            tmp = f"{path}.tmp{os.getpid()}"
            pq.write_table(tbl.slice(s, e - s).drop_columns(["bucket"]), tmp,
                           compression="zstd")
            os.replace(tmp, path)
        return len(buckets)

    @ray.remote
    def compact_bucket(bdir: str) -> int:
        parts = sorted(f for f in os.listdir(bdir) if f.startswith("part-"))
        tbl = pa.concat_tables([pq.read_table(os.path.join(bdir, f)) for f in parts])
        tmp = os.path.join(bdir, f"_data.tmp{os.getpid()}")
        pq.write_table(tbl, tmp, compression="zstd")
        for f in parts:
            os.remove(os.path.join(bdir, f))
        os.replace(tmp, os.path.join(bdir, "data.parquet"))
        return tbl.num_rows

    futures = [ann_part.remote(reader.part_dir(pid), pid, ann_dir, n_planes)
               for pid in reader.partitions]
    n = int(sum(ray.get(futures)))
    bdirs = [os.path.join(ann_dir, d) for d in os.listdir(ann_dir)
             if d.startswith("bucket=")]
    ray.get([compact_bucket.remote(b) for b in bdirs])
    swap_dir_crash_safe(ann_dir, final_ann_dir)
    return n


def vector_topk_ann(reader: IndexReader, query: str, k: int,
                    dimensions: int = DEFAULT_DIMENSIONS,
                    multiprobe: int = 2) -> pa.Table:
    """ANN cosine top-k: probe only the query's LSH buckets (plus
    ``multiprobe`` lowest-margin bit flips) in the ``ann/`` layout and
    verify candidates with exact cosine — same schema as
    :func:`vector_topk`, approximate recall by construction.  Falls back
    to the exact scan when the ANN index hasn't been built."""
    from coderag_ray.pipelines.similarity import (
        _probe_buckets, layout_lsh_planes, probe_paths,
    )

    ann_dir = os.path.join(reader.index_dir, ANN_DIRNAME)
    if not os.path.isdir(ann_dir):
        return vector_topk(reader, query, k, dimensions)
    qv = mock_embedding(query, dimensions)
    probes = _probe_buckets(qv[None, :], multiprobe, layout_lsh_planes(ann_dir))[0]
    paths = probe_paths(ann_dir, probes)
    if not paths:
        return vector_topk(reader, query, k, dimensions)
    if len(paths) > 4:
        # cold probes read one small file per (bucket, partition) — up
        # to probes×P of them; parquet reads release the GIL, so a
        # thread pool turns the cold-probe p95 from sum-of-reads into
        # max-of-reads (warm probes hit the cache either way)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(16, len(paths))) as ex:
            tables = list(ex.map(_ann_table_cached, paths))
    else:
        tables = [_ann_table_cached(p) for p in paths]
    tbl = pa.concat_tables(tables)
    E = _emb_matrix(tbl)
    sims = E @ qv
    doc_ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    chunk_ids = tbl["chunk_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    top = np.lexsort((chunk_ids, doc_ids, -sims))[:k]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[top], type=pa.int64()),
            "chunk_id": pa.array(chunk_ids[top], type=pa.int64()),
            "similarity": pa.array(sims[top], type=pa.float64()),
            "part_id": pa.array(tbl["part_id"].to_numpy(zero_copy_only=False)[top], type=pa.int64()),
            "ordinal": pa.array(tbl["ordinal"].to_numpy(zero_copy_only=False)[top], type=pa.int64()),
        }
    )


def _emb_matrix(tbl: pa.Table) -> np.ndarray:
    """Fixed-dim list<float64> column → (n, d) matrix, zero-copy."""
    from coderag_ray.pipelines.similarity import emb_matrix

    return emb_matrix(tbl["embedding"])


_EMB_CACHE: dict[tuple[str, float], np.ndarray] = {}
_ANN_CACHE: dict[tuple[str, float], pa.Table] = {}


def _ann_table_cached(path: str) -> pa.Table:
    """ANN bucket file, cached by (path, mtime) — probes hit the same
    hot buckets repeatedly and must not re-read parquet per query."""
    key = (path, os.path.getmtime(path))
    tbl = _ANN_CACHE.get(key)
    if tbl is None:
        for k in [k for k in _ANN_CACHE if k[0] == path]:
            del _ANN_CACHE[k]
        tbl = pq.read_table(path)
        _ANN_CACHE[key] = tbl
    return tbl


def _emb_matrix_cached(path: str) -> np.ndarray:
    """Per-partition embedding matrix, cached by (path, mtime) — the
    exact scan serves many queries per process and must not re-read the
    sidecar per query (a rebuild changes mtime → fresh entry)."""
    key = (path, os.path.getmtime(path))
    E = _EMB_CACHE.get(key)
    if E is None:
        for k in [k for k in _EMB_CACHE if k[0] == path]:  # drop stale builds
            del _EMB_CACHE[k]
        E = _emb_matrix(pq.read_table(path))
        _EMB_CACHE[key] = E
    return E


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
        E = _emb_matrix_cached(path)
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
                  dimensions: int = DEFAULT_DIMENSIONS,
                  use_ann: bool = False) -> pa.Table:
    """→ (doc_id, chunk_id, score, method, similarity, bm25_score).

    ``use_ann=True`` sources the vector side from the LSH bucket index
    (:func:`vector_topk_ann`) instead of the exact partition scan —
    approximate recall, bucket-local latency; build it once with
    :func:`build_vector_ann`."""
    reader = index if isinstance(index, IndexReader) else IndexReader(index)
    if use_ann:
        vec = vector_topk_ann(reader, query, k, dimensions)
    else:
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
