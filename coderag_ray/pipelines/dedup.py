"""Deduplication pipelines — exact, n-gram Jaccard, MinHash-LSH, SimHash,
embedding-cosine.

The reference has only exact per-file replacement (SURVEY.md §2.7 "no
near-dedup"); these are the training-data-scale operations a 100 TB
corpus pipeline needs.  Shapes:

- **exact**: content-hash groupby → group size + keeper (min doc_id).
  One tiny shuffle over (sha256, doc_id) pairs.
- **n-gram Jaccard**: word n-gram shingles → explode →
  ``groupby(shingle)`` pair generation → pair-count groupby → exact
  Jaccard.  At 100 TB the shingle groupby must cap pathological
  shingle df (``max_shingle_df``) — a hot shingle generates O(df²)
  pairs; the cap is OFF by default for oracle parity on test data and
  documented as the scale knob (MinHash-LSH is the real scale path).
- **MinHash-LSH**: per-doc 64-perm MinHash signature (vectorized
  universal hashing over blake2b shingle hashes), banded into 16
  buckets → candidate pairs from bucket groupby → exact-Jaccard verify.
  Deterministic: all hash seeds are fixed constants.
- **SimHash**: 64-bit weighted sign-hash per doc; near-dups = hamming
  distance ≤ t among banded candidates.
- **embedding cosine**: within-block (label) pairwise cosine via
  ``groupby(label).map_groups`` numpy matmul.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pandas as pd

from coderag_ray.functions.rounding import round6
import pyarrow as pa
import pyarrow.compute as pc

WS_SPLIT = r"\s+"
MINHASH_PERMS = 64
MINHASH_BANDS = 16
_MERS_P = (1 << 61) - 1


def _word_shingles(text: str, n: int = 3) -> set[str]:
    """Distinct word n-grams of the lowercased, ws-split text (frozen spec,
    mirrored in the SQL oracle)."""
    words = [w for w in text.lower().split() if w]
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def shingle_batch(t: pa.Table, n: int = 3) -> pa.Table:
    """(doc_id, shingle) rows — distinct word n-grams per doc."""
    ids, shingles = [], []
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        for s in _word_shingles(text, n):
            ids.append(did)
            shingles.append(s)
    return pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()), "shingle": pa.array(shingles, type=pa.string())}
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs_ds):
    """→ Dataset (content_sha256, n_copies, keeper_doc_id). Groups with
    n_copies > 1 are duplicates; keeper = min doc_id (frozen policy)."""
    from ray.data.aggregate import Count, Min

    from coderag_ray.functions.hashing import batch_sha256

    def add_sha(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "content_sha256": batch_sha256(t["text"]),
            }
        )

    return (
        docs_ds.map_batches(add_sha, batch_format="pyarrow")
        .groupby("content_sha256")
        .aggregate(Count(alias_name="n_copies"), Min("doc_id", alias_name="keeper_doc_id"))
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(docs_ds, n: int = 3, top: int = 50,
                        max_shingle_df: int | None = None):
    """Top-``top`` doc pairs by exact word-n-gram Jaccard.

    Returns a pyarrow Table (doc_a, doc_b, n_common, n_a, n_b, jaccard)
    ordered by (jaccard DESC, doc_a, doc_b) — jaccard is an exact
    integer ratio evaluated in float64, so ordering is reproducible
    bit-for-bit in any engine.
    """
    shingles = docs_ds.map_batches(lambda t: shingle_batch(t, n), batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        """Hash-bucket shingles so pair expansion runs over ~B large
        groups instead of one Python call per distinct shingle."""
        import zlib

        b = np.array(
            [zlib.crc32(s.encode("utf-8")) & 0x3F for s in t["shingle"].to_pylist()],
            dtype=np.int32,
        )
        return t.append_column("bucket", pa.array(b))

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-shingle pair expansion: sort by shingle, take
        # run lengths, emit all within-run index pairs with numpy only
        codes, _ = pd.factorize(g["shingle"], sort=False)
        order = np.lexsort((g["doc_id"].to_numpy(), codes))
        ids = g["doc_id"].to_numpy()[order]
        codes = codes[order]
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        lens = np.diff(np.r_[starts, len(codes)])
        if max_shingle_df is not None:
            keep_run = lens <= max_shingle_df
            starts, lens = starts[keep_run], lens[keep_run]
        out_a, out_b = [], []
        for ln in np.unique(lens):
            if ln < 2:
                continue
            runs = starts[lens == ln]  # all runs of this length, together
            idx = runs[:, None] + np.arange(ln)[None, :]
            block = ids[idx]  # [n_runs, ln]
            ai, bi = np.triu_indices(int(ln), k=1)
            out_a.append(block[:, ai].ravel())
            out_b.append(block[:, bi].ravel())
        if not out_a:
            return pd.DataFrame({"pair_key": pd.Series([], dtype=np.int64),
                                 "cnt": pd.Series([], dtype=np.int64)})
        # pre-aggregate within the bucket and pack (a, b) into one int64
        # key — Ray's single-key Sum groupby is far cheaper than a
        # two-key aggregate over the raw pair stream
        key = np.concatenate(out_a) * (1 << 31) + np.concatenate(out_b)
        uniq, cnt = np.unique(key, return_counts=True)
        return pd.DataFrame({"pair_key": uniq.astype(np.int64), "cnt": cnt.astype(np.int64)})

    from ray.data.aggregate import Count

    from coderag_ray.stages.bucket_agg import bucketed_groupby_sum

    pair_key_counts = bucketed_groupby_sum(
        shingles.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_of_bucket, batch_format="pandas"),
        "pair_key", "cnt", "n_common", num_buckets=64,
    )

    def unpack(t: pa.Table) -> pa.Table:
        key = t["pair_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_a": pa.array(key >> 31),
                "doc_b": pa.array(key & ((1 << 31) - 1)),
                "n_common": pc.cast(t["n_common"], pa.int64()),
            }
        )

    pair_counts = pair_key_counts.map_batches(unpack, batch_format="pyarrow")
    sizes = (
        shingles.groupby("doc_id").aggregate(Count(alias_name="n_shingles")).to_pandas()
    )
    size_of = dict(zip(sizes["doc_id"], sizes["n_shingles"]))
    pdf = pair_counts.to_pandas()
    if len(pdf) == 0:
        return pa.table({"doc_a": pa.array([], type=pa.int64()),
                         "doc_b": pa.array([], type=pa.int64()),
                         "n_common": pa.array([], type=pa.int64()),
                         "n_a": pa.array([], type=pa.int64()),
                         "n_b": pa.array([], type=pa.int64()),
                         "jaccard": pa.array([], type=pa.float64())})
    pdf["n_a"] = pdf["doc_a"].map(size_of).astype(np.int64)
    pdf["n_b"] = pdf["doc_b"].map(size_of).astype(np.int64)
    union = pdf["n_a"] + pdf["n_b"] - pdf["n_common"]
    pdf["jaccard"] = pdf["n_common"].astype(np.float64) / union.astype(np.float64)
    pdf = pdf.sort_values(["jaccard", "doc_a", "doc_b"], ascending=[False, True, True]).head(top)
    pdf["jaccard"] = round6(pdf["jaccard"].to_numpy())
    for c in ("doc_a", "doc_b", "n_common", "n_a", "n_b"):
        pdf[c] = pdf[c].astype(np.int64)
    return pa.Table.from_pandas(pdf.reset_index(drop=True), preserve_index=False)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


_rng = np.random.default_rng(12345)
_MH_A = (_rng.integers(1, _MERS_P, size=MINHASH_PERMS, dtype=np.int64)).astype(np.uint64)
_MH_B = (_rng.integers(0, _MERS_P, size=MINHASH_PERMS, dtype=np.int64)).astype(np.uint64)


def minhash_signature(shingle_hashes: np.ndarray) -> np.ndarray:
    """64-perm MinHash of a set of 64-bit shingle hashes (uint64[perms])."""
    if len(shingle_hashes) == 0:
        return np.full(MINHASH_PERMS, np.iinfo(np.uint64).max, dtype=np.uint64)
    h = shingle_hashes.astype(np.object_)  # python ints: exact mod-p arithmetic
    sig = np.empty(MINHASH_PERMS, dtype=np.uint64)
    for i in range(MINHASH_PERMS):
        vals = (int(_MH_A[i]) * h + int(_MH_B[i])) % _MERS_P
        sig[i] = np.uint64(int(vals.min()))
    return sig


class MinHashStage:
    """Actor-pool map_batches stage: doc → (band_id, band_hash, doc_id)
    rows.  Shingle→hash cache lives per actor."""

    def __init__(self, n: int = 3):
        self.n = n
        self.cache: dict[str, int] = {}

    def _sh(self, s: str) -> int:
        v = self.cache.get(s)
        if v is None:
            v = _hash64(s)
            if len(self.cache) < 2_000_000:
                self.cache[s] = v
        return v

    def __call__(self, t: pa.Table) -> pa.Table:
        rows_doc, rows_band, rows_hash = [], [], []
        rpb = MINHASH_PERMS // MINHASH_BANDS
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sh = _word_shingles(text, self.n)
            hashes = np.array([self._sh(s) for s in sh], dtype=np.uint64)
            sig = minhash_signature(hashes)
            for b in range(MINHASH_BANDS):
                band = sig[b * rpb : (b + 1) * rpb]
                bh = int.from_bytes(
                    hashlib.blake2b(band.tobytes(), digest_size=8).digest(), "big"
                ) >> 1
                rows_doc.append(did)
                rows_band.append(b)
                rows_hash.append(bh)
        return pa.table(
            {
                "doc_id": pa.array(rows_doc, type=pa.int64()),
                "band_id": pa.array(rows_band, type=pa.int32()),
                "band_hash": pa.array(rows_hash, type=pa.int64()),
            }
        )


def minhash_lsh_pairs(docs_ds, n: int = 3, jaccard_threshold: float = 0.5):
    """Near-dup pairs via MinHash-LSH candidates + exact-Jaccard verify.

    → pyarrow Table (doc_a, doc_b, jaccard) sorted (doc_a, doc_b);
    deterministic (fixed seeds).  The exact-Jaccard verify re-reads the
    candidate docs' shingles (small set) on the driver.
    """
    bands = docs_ds.map_batches(MinHashStage, fn_constructor_args=(n,),
                                batch_format="pyarrow", concurrency=2)

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64)})
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    cand = (
        bands.groupby(["band_id", "band_hash"])
        .map_groups(pairs_of_bucket, batch_format="pandas")
        .to_pandas()
    )
    cand = cand.drop_duplicates()
    if len(cand) == 0:
        return pa.table({"doc_a": pa.array([], type=pa.int64()),
                         "doc_b": pa.array([], type=pa.int64()),
                         "jaccard": pa.array([], type=pa.float64())})
    need = sorted(set(cand["doc_a"]) | set(cand["doc_b"]))
    need_set = set(need)

    def filt(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(pc.cast(t["doc_id"], pa.int64()),
                                 value_set=pa.array(need, type=pa.int64())))

    docs = docs_ds.map_batches(filt, batch_format="pyarrow").to_pandas()
    sh = {int(d): _word_shingles(t, n) for d, t in zip(docs["doc_id"], docs["text"])}
    out_a, out_b, out_j = [], [], []
    for a, b in zip(cand["doc_a"], cand["doc_b"]):
        sa, sb = sh[int(a)], sh[int(b)]
        u = len(sa | sb)
        j = (len(sa & sb) / u) if u else 0.0
        if j >= jaccard_threshold:
            out_a.append(int(a)); out_b.append(int(b)); out_j.append(round6(j))
    order = np.lexsort((out_b, out_a))
    return pa.table(
        {
            "doc_a": pa.array(np.array(out_a, dtype=np.int64)[order] if out_a else [], type=pa.int64()),
            "doc_b": pa.array(np.array(out_b, dtype=np.int64)[order] if out_b else [], type=pa.int64()),
            "jaccard": pa.array(np.array(out_j, dtype=np.float64)[order] if out_j else [], type=pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_batch(t: pa.Table) -> pa.Table:
    """(doc_id, simhash) — 64-bit weighted sign hash over word frequencies."""
    ids, sims = [], []
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        tf = Counter(w for w in text.lower().split() if w)
        acc = np.zeros(64, dtype=np.int64)
        for w, f in tf.items():
            h = _hash64(w)
            bits = (h >> np.arange(64, dtype=np.uint64)) & 1
            acc += np.where(bits.astype(bool), f, -f)
        sim = int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
        ids.append(did)
        sims.append(sim >> 1 if sim >= (1 << 63) else sim)  # keep int64-positive
    return pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()), "simhash": pa.array(sims, type=pa.int64())}
    )


def simhash_table(docs_ds):
    return docs_ds.map_batches(simhash_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_dup_pairs(emb_ds, threshold: float = 0.25):
    """Within-label pairwise cosine ≥ threshold.

    ``groupby(label).map_groups`` with a numpy matmul per block — the
    blocked (rather than all-pairs) design is the scale decision: at
    10^9 vectors the block key comes from coarse quantization/LSH; here
    the provided ``label`` plays that role.
    → Dataset (label, vec_a, vec_b, cos_sim round6) sorted within group.
    """

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        E = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
        S = En @ En.T
        a, b = np.triu_indices(len(ids), k=1)
        keep = S[a, b] >= threshold
        return pd.DataFrame(
            {
                "label": np.repeat(int(g["label"].iloc[0]), keep.sum()).astype(np.int64),
                "vec_a": ids[a[keep]].astype(np.int64),
                "vec_b": ids[b[keep]].astype(np.int64),
                "cos_sim": round6(S[a[keep], b[keep]]),
            }
        )

    return emb_ds.groupby("label").map_groups(pairs, batch_format="pandas")
