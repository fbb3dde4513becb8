"""Similarity search over an embedding column.

- :func:`knn_bruteforce` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``) and every ``map_batches`` task does one
  numpy matmul against its batch, emitting per-batch top-k candidates;
  the tiny candidate set merges on the driver.  No shuffle, no
  per-batch re-serialization of the queries — the broadcast-small-side
  pattern from the Ray guide.
- :func:`lsh_knn` — the scale path: random-hyperplane LSH buckets
  (fixed seed), queries probe only their bucket (+ optional multiprobe
  by flipping the lowest-margin bits).  Approximate by construction →
  rows-only correctness check (no SQL oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from coderag_ray.functions.rounding import round6

LSH_PLANES = 12
_rng = np.random.default_rng(777)
_PLANES_CACHE: dict[int, np.ndarray] = {}


def _planes(dim: int) -> np.ndarray:
    p = _PLANES_CACHE.get(dim)
    if p is None:
        p = np.random.default_rng(777).standard_normal((LSH_PLANES, dim))
        _PLANES_CACHE[dim] = p
    return p


def _normalize(E: np.ndarray) -> np.ndarray:
    return E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)


def knn_bruteforce(emb_ds, query_ids: list[int], k: int = 5):
    """Exact cosine top-k for each query vector id.

    → pyarrow Table (query_id, vec_id, cos_sim round6), per query the k
    nearest (self excluded), ordered (query_id, cos_sim DESC, vec_id).
    """
    import pyarrow.compute as pc
    import ray

    qset = pa.array(sorted(query_ids), type=pa.int64())

    def grab(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(pc.cast(t["vec_id"], pa.int64()), value_set=qset))

    q = emb_ds.map_batches(grab, batch_format="pyarrow").to_pandas().sort_values("vec_id")
    Q = _normalize(np.stack(q["embedding"].to_numpy()).astype(np.float64))
    qids = q["vec_id"].to_numpy().astype(np.int64)
    q_ref = ray.put((qids, Q))

    def batch_topk(t: pa.Table) -> pa.Table:
        ids_b, Qb = ray.get(q_ref)
        E = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        vids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        S = Qb @ _normalize(E).T  # [n_q, n_batch]
        out_q, out_v, out_s = [], [], []
        kk = min(k + 1, S.shape[1])  # +1 in case self is in this batch
        for qi in range(S.shape[0]):
            # exact per-batch top-kk under the GLOBAL ordering
            # (sim DESC, vec_id ASC): argpartition alone keeps an
            # arbitrary subset of candidates tied at the boundary, which
            # can drop a tied smaller-vec_id winner (e.g. duplicate
            # embeddings) — include all boundary ties, then order them
            # by the real tie-break before truncating
            part = np.argpartition(-S[qi], kk - 1)
            boundary = S[qi][part[kk - 1]]
            cand = np.flatnonzero(S[qi] >= boundary)
            order = np.lexsort((vids[cand], -S[qi][cand]))[:kk]
            idx = cand[order]
            out_q.extend([ids_b[qi]] * len(idx))
            out_v.extend(vids[idx].tolist())
            out_s.extend(S[qi, idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "cos_sim": pa.array(out_s, type=pa.float64()),
            }
        )

    cand = emb_ds.map_batches(batch_topk, batch_format="pyarrow", batch_size=4096).to_pandas()
    cand = cand[cand["query_id"] != cand["vec_id"]]  # exclude self
    cand = cand.sort_values(["query_id", "cos_sim", "vec_id"], ascending=[True, False, True])
    top = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["cos_sim"] = round6(top["cos_sim"].to_numpy())
    return pa.Table.from_pandas(top, preserve_index=False)


def lsh_knn(emb_ds, query_ids: list[int], k: int = 5, multiprobe: int = 2):
    """Approximate cosine top-k via random-hyperplane LSH buckets.

    Vectors are bucketed by the sign pattern of ``LSH_PLANES`` fixed
    hyperplanes; each query scans its own bucket plus ``multiprobe``
    neighbor buckets (lowest-|margin| bit flips).  → same schema as
    :func:`knn_bruteforce` plus ``n_scanned``.
    """
    pdf = emb_ds.to_pandas()  # index-build side; at scale this is a
    # groupby(bucket) → per-bucket parquet layout instead
    E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    En = _normalize(E)
    vids = pdf["vec_id"].to_numpy().astype(np.int64)
    P = _planes(E.shape[1])
    proj = En @ P.T
    bits = (proj > 0).astype(np.uint32)
    buckets = (bits << np.arange(LSH_PLANES, dtype=np.uint32)).sum(axis=1)
    by_bucket: dict[int, list[int]] = {}
    for i, b in enumerate(buckets):
        by_bucket.setdefault(int(b), []).append(i)

    rows = []
    qpos = {int(v): i for i, v in enumerate(vids)}
    for qid in sorted(query_ids):
        qi = qpos[qid]
        margins = np.abs(proj[qi])
        flip_order = np.argsort(margins)[:multiprobe]
        probe = [int(buckets[qi])]
        for f in flip_order:
            probe.append(int(buckets[qi]) ^ (1 << int(f)))
        cand_idx = sorted({i for b in probe for i in by_bucket.get(b, []) if i != qi})
        if not cand_idx:
            continue
        sims = En[cand_idx] @ En[qi]
        order = np.lexsort((np.array(cand_idx), -sims))[:k]
        for o in order:
            rows.append((qid, int(vids[cand_idx[o]]), round6(float(sims[o])), len(cand_idx)))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "vec_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "cos_sim": pa.array([r[2] for r in rows], type=pa.float64()),
            "n_scanned": pa.array([r[3] for r in rows], type=pa.int64()),
        }
    )
