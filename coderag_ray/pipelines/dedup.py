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

from coderag_ray.functions.datasets import schema_stable
from coderag_ray.functions.rounding import round6
from coderag_ray.functions.tokenizer import ascii_ws_words
import pyarrow as pa
import pyarrow.compute as pc

WS_SPLIT = r"\s+"
MINHASH_PERMS = 64

# declared output schemas for the Dataset-returning pipelines — each
# ends in schema_stable() so empty/degenerate inputs keep the documented
# columns (Ray drops empty map_groups blocks; see functions/datasets.py)
EXACT_DEDUP_SCHEMA = pa.schema([
    ("content_sha256", pa.string()), ("n_copies", pa.int64()),
    ("keeper_doc_id", pa.int64()),
])
PAIR_SCORE_SCHEMA = pa.schema([
    ("doc_a", pa.int64()), ("doc_b", pa.int64()), ("n_common", pa.int64()),
    ("n_a", pa.int64()), ("n_b", pa.int64()), ("jaccard", pa.float64()),
])
SIMHASH_SCHEMA = pa.schema([("doc_id", pa.int64()), ("simhash", pa.int64())])
EMB_DUP_SCHEMA = pa.schema([
    ("label", pa.int64()), ("vec_a", pa.int64()), ("vec_b", pa.int64()),
    ("cos_sim", pa.float64()),
])
CLUSTER_SCHEMA = pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])

# ds.stats() of the last minhash_lsh_pairs run's verify wave — the
# per-operator wall/CPU audit; printed by CODERAG_BENCH_STATS=1 bench.py
LAST_MINHASH_STATS: str | None = None
MINHASH_BANDS = 16
_MERS_P = (1 << 61) - 1


def _from_pandas(df: pd.DataFrame) -> pa.Table:
    """Convert a map_groups result to an ARROW block.  Pandas blocks
    flowing into a downstream sort hit Ray's unhashable
    ``PandasBlockSchema`` path (the "Failed to hash the schemas" warning
    seen in round-1 bench logs) and empty pandas groups emit
    schema-mismatch warnings — emitting Arrow with explicit dtypes
    avoids both.  The b'pandas' schema metadata is stripped too: a
    schema carrying it holds a dict and is UNHASHABLE, which is exactly
    what tripped Ray's "Failed to hash the schemas" warning in round-1
    bench logs."""
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def _word_shingles(text: str, n: int = 3) -> set[str]:
    """Distinct word n-grams of the lowercased, ws-split text (frozen spec,
    mirrored in the SQL oracle)."""
    words = ascii_ws_words(text.lower())
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def shingle_batch(t: pa.Table, n: int = 3) -> pa.Table:
    """(doc_id, shingle, n_doc_shingles) rows — distinct word n-grams per
    doc.  The per-doc shingle-set size is carried INLINE on every row so
    downstream pair scoring never needs a corpus-sized doc→size lookup
    (no driver-side sizes dict, no extra join)."""
    ids, shingles, sizes = [], [], []
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        sh = _word_shingles(text, n)
        for s in sh:
            ids.append(did)
            shingles.append(s)
            sizes.append(len(sh))
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "shingle": pa.array(shingles, type=pa.string()),
            "n_doc_shingles": pa.array(sizes, type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs_ds):
    """→ Dataset (content_sha256, n_copies, keeper_doc_id). Groups with
    n_copies > 1 are duplicates; keeper = min doc_id (frozen policy).

    Distinct-sha cardinality grows with the corpus, so the aggregation
    is BUCKETED (hash sha → auto_buckets(input) groups, one vectorized
    pandas groupby per bucket) rather than per-sha declarative — the
    bucket_agg pattern; exact integer results either way."""
    import zlib

    from coderag_ray.config import auto_buckets
    from coderag_ray.functions.hashing import batch_sha256

    nb = auto_buckets(docs_ds, target_rows=2_000_000)  # narrow sha rows

    def add_sha(t: pa.Table) -> pa.Table:
        shas = batch_sha256(t["text"])
        b = np.array([zlib.crc32(s.encode()) % nb for s in shas.to_pylist()],
                     dtype=np.int32)
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "content_sha256": shas,
                "__bucket": pa.array(b),
            }
        )

    def agg_bucket(g: pd.DataFrame) -> pa.Table:
        a = (g.groupby("content_sha256", sort=False)["doc_id"]
               .agg(n_copies="size", keeper_doc_id="min").reset_index())
        return pa.table({
            "content_sha256": pa.array(a["content_sha256"].tolist(), type=pa.string()),
            "n_copies": pa.array(a["n_copies"].to_numpy(dtype=np.int64), type=pa.int64()),
            "keeper_doc_id": pa.array(a["keeper_doc_id"].to_numpy(dtype=np.int64), type=pa.int64()),
        })

    return schema_stable(
        docs_ds.map_batches(add_sha, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(agg_bucket, batch_format="pandas"),
        EXACT_DEDUP_SCHEMA,
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------


# Recommended hot-shingle df cap at corpus scale — NOT the default:
# capping silently changes exact all-pairs Jaccard into an approximation,
# so scale-sensitive callers must opt in explicitly (the capped path is
# exercised by tests/test_round2_fixes.py::test_ngram_jaccard_hot_shingle_cap; the
# driver queries and bench run the exact default for SQL-oracle parity,
# with MinHash-LSH as the documented scale path).
SCALE_MAX_SHINGLE_DF = 1024


def ngram_jaccard_pairs(docs_ds, n: int = 3, top: int = 50,
                        max_shingle_df: int | None = None):
    """Top-``top`` doc pairs by exact word-n-gram Jaccard.

    Returns a pyarrow Table (doc_a, doc_b, n_common, n_a, n_b, jaccard)
    ordered by (jaccard DESC, doc_a, doc_b) — jaccard is an exact
    integer ratio evaluated in float64, so ordering is reproducible
    bit-for-bit in any engine.

    Scale shape (no corpus-sized state on the driver):

    - per-doc shingle-set sizes ride along on every shingle row
      (:func:`shingle_batch`), so pair rows are born with (n_a, n_b)
      attached — no sizes dict, no second join;
    - pair generation and counting key on the (doc_a, doc_b) COLUMN
      PAIR throughout (never packed into one int64 — packing silently
      corrupts 63-bit stable doc ids, e.g. the engine's own
      ``stable_doc_id``);
    - ``max_shingle_df`` caps the O(df²) pair blowup of a hot shingle
      (boilerplate headers, empty-ish docs).  OFF by default — the
      default result is the exact all-pairs Jaccard (SQL-oracle
      parity); pass ``SCALE_MAX_SHINGLE_DF`` (or your own cap) at
      corpus scale, where one boilerplate shingle shared by 10^6 docs
      would otherwise expand to 10^12 pair rows.  Dropped runs are
      counted and logged;
    - the jaccard/top-k tail is a distributed ``sort().limit()`` —
      only the final ``top`` rows ever reach the driver.
    """
    scored = _ngram_pair_scores(docs_ds, n, max_shingle_df)
    # distributed top-k: sort + limit — only `top` rows reach the driver
    pdf = (
        scored.sort(["jaccard", "doc_a", "doc_b"], descending=[True, False, False])
        .limit(top)
        .to_pandas()
    )
    if len(pdf) == 0:
        return pa.table({"doc_a": pa.array([], type=pa.int64()),
                         "doc_b": pa.array([], type=pa.int64()),
                         "n_common": pa.array([], type=pa.int64()),
                         "n_a": pa.array([], type=pa.int64()),
                         "n_b": pa.array([], type=pa.int64()),
                         "jaccard": pa.array([], type=pa.float64())})
    pdf["jaccard"] = round6(pdf["jaccard"].to_numpy())
    return pa.Table.from_pandas(pdf.reset_index(drop=True), preserve_index=False)


def _ngram_pair_scores(docs_ds, n: int = 3,
                       max_shingle_df: int | None = None):
    """Distributed Dataset of scored pairs
    (doc_a, doc_b, n_common, n_a, n_b, jaccard) — the shared engine of
    :func:`ngram_jaccard_pairs` and :func:`near_dup_clusters`."""
    import logging

    from coderag_ray.config import auto_buckets

    from coderag_ray.config import dataset_rows_estimate

    n_rows = dataset_rows_estimate(docs_ds)
    # shingle groups hold ~dozens of text rows per doc → small target;
    # pair-merge groups hold duplicate-rate-sized narrow rows
    nb_shingle = auto_buckets(n_rows, target_rows=50_000)
    nb_pair = auto_buckets(n_rows, target_rows=200_000)

    shingles = docs_ds.map_batches(lambda t: shingle_batch(t, n), batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        """Hash-bucket shingles so pair expansion runs over ~B large
        groups instead of one Python call per distinct shingle."""
        import zlib

        b = np.array(
            [zlib.crc32(s.encode("utf-8")) % nb_shingle for s in t["shingle"].to_pylist()],
            dtype=np.int32,
        )
        return t.append_column("bucket", pa.array(b))

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-shingle pair expansion: sort by shingle, take
        # run lengths, emit all within-run index pairs with numpy only
        codes, _ = pd.factorize(g["shingle"], sort=False)
        order = np.lexsort((g["doc_id"].to_numpy(), codes))
        ids = g["doc_id"].to_numpy()[order]
        sizes = g["n_doc_shingles"].to_numpy()[order]
        codes = codes[order]
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        lens = np.diff(np.r_[starts, len(codes)])
        if max_shingle_df is not None:
            keep_run = lens <= max_shingle_df
            n_dropped = int((~keep_run).sum())
            if n_dropped:
                logging.getLogger(__name__).warning(
                    "ngram_jaccard: dropped %d hot shingles (df > %d) in bucket %s",
                    n_dropped, max_shingle_df, int(g["bucket"].iloc[0]),
                )
            starts, lens = starts[keep_run], lens[keep_run]
        out_a, out_b, out_na, out_nb = [], [], [], []
        for ln in np.unique(lens):
            if ln < 2:
                continue
            runs = starts[lens == ln]  # all runs of this length, together
            idx = runs[:, None] + np.arange(ln)[None, :]
            block = ids[idx]  # [n_runs, ln]
            sblock = sizes[idx]
            ai, bi = np.triu_indices(int(ln), k=1)
            out_a.append(block[:, ai].ravel())
            out_b.append(block[:, bi].ravel())
            out_na.append(sblock[:, ai].ravel())
            out_nb.append(sblock[:, bi].ravel())
        if not out_a:
            return _from_pandas(pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                              "doc_b": pd.Series([], dtype=np.int64),
                                              "n_a": pd.Series([], dtype=np.int64),
                                              "n_b": pd.Series([], dtype=np.int64),
                                              "cnt": pd.Series([], dtype=np.int64)}))
        # pre-aggregate within the bucket (combiner) so the global merge
        # only moves one row per (pair, bucket)
        df = pd.DataFrame({"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b),
                           "n_a": np.concatenate(out_na), "n_b": np.concatenate(out_nb)})
        agg = (df.groupby(["doc_a", "doc_b"], sort=False)
                 .agg(n_a=("n_a", "first"), n_b=("n_b", "first"),
                      cnt=("doc_a", "size")).reset_index())
        agg["cnt"] = agg["cnt"].astype(np.int64)
        return _from_pandas(agg)

    from coderag_ray.functions.hashing import splitmix64

    pair_rows = (
        shingles.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_of_bucket, batch_format="pandas")
    )

    # global merge: hash-bucket on doc_a (rows with equal (doc_a, doc_b)
    # share doc_a → same bucket), one vectorized pandas groupby per
    # bucket — the bucket_agg pattern generalized to a two-column key
    def add_pair_bucket(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (splitmix64(a) % np.uint64(nb_pair)).astype(np.int32)
        return t.append_column("__bucket", pa.array(b))

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby(["doc_a", "doc_b"], sort=False)
                 .agg(n_common=("cnt", "sum"), n_a=("n_a", "first"),
                      n_b=("n_b", "first")).reset_index())
        union = agg["n_a"] + agg["n_b"] - agg["n_common"]
        agg["jaccard"] = agg["n_common"].astype(np.float64) / union.astype(np.float64)
        for c in ("doc_a", "doc_b", "n_common", "n_a", "n_b"):
            agg[c] = agg[c].astype(np.int64)
        return _from_pandas(agg[["doc_a", "doc_b", "n_common", "n_a", "n_b", "jaccard"]])

    return schema_stable(
        pair_rows.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(merge_bucket, batch_format="pandas"),
        PAIR_SCORE_SCHEMA,
    )


def clusters_from_pairs(pairs: pa.Table) -> pa.Table:
    """Connected components over an edge table with ``doc_a``/``doc_b``
    columns (the output shape of :func:`minhash_lsh_pairs` or a
    thresholded :func:`_ngram_pair_scores`): min-label union-find →
    (doc_id, cluster_id) sorted by doc_id.  Edges are duplicate-rate-
    sized by construction, so the driver-side union-find is appropriate;
    see :func:`near_dup_clusters` for the scale note."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist()):
        a, b = int(a), int(b)
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:  # union by smaller root id → canonical min label
                parent[rb] = ra
            else:
                parent[ra] = rb
    ids = sorted(parent)
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "cluster_id": pa.array([find(i) for i in ids], type=pa.int64()),
    })


def _cc_star_rounds(edges_ds, num_buckets: int = 256, max_rounds: int = 64):
    """Distributed connected components over a canonical (doc_a < doc_b)
    edge Dataset: the alternating large-star / small-star algorithm from
    the MapReduce-CC literature (Kiveris et al., "Connected Components
    in MapReduce and Beyond") — every step is a bucketed groupby over
    the edge list, so no corpus- or component-sized state ever exists in
    one place.  Converges (O(log n) rounds in practice) to star graphs
    whose centers are each component's minimum id; returns the final
    star-edge Dataset (doc_a = min label, doc_b = member).

    Per round: large-star connects every node's larger neighbors to the
    min of its neighborhood, small-star re-points the smaller neighbors
    (plus the node itself); each groupby is hash-bucketed (node-keyed
    group cardinality grows with the graph) with vectorized
    ``minimum.reduceat`` segment minima inside.  A (count, hash-sum)
    fixed-point check on the deduped edge set detects convergence.
    """
    from coderag_ray.functions.hashing import splitmix64

    NB = np.uint64(num_buckets)

    def _segments(keys: np.ndarray) -> np.ndarray:
        return np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])

    def _star(g: pd.DataFrame, large: bool) -> pa.Table:
        # rows: (u = group key node, v = neighbor); large-star sees the
        # full symmetric neighborhood, small-star only smaller neighbors
        u = g["u"].to_numpy(dtype=np.int64)
        v = g["v"].to_numpy(dtype=np.int64)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        starts = _segments(u)
        ends = np.r_[starts[1:], len(u)]
        neigh_min = np.minimum.reduceat(v, starts)
        m = np.minimum(neigh_min, u[starts])  # min(N(u) ∪ {u})
        reps = ends - starts
        m_row = np.repeat(m, reps)
        if large:
            keep = v > u  # connect larger neighbors to m
            a, b = m_row[keep], v[keep]
        else:
            # connect smaller neighbors ∪ {u} to m (skip m itself)
            keep = v != m_row
            a = np.r_[m_row[keep], m]
            b = np.r_[v[keep], u[starts]]
            sk = a != b
            a, b = a[sk], b[sk]
        e = np.unique(np.stack([a, b], axis=1), axis=0)
        return pa.table({"doc_a": pa.array(e[:, 0], type=pa.int64()),
                         "doc_b": pa.array(e[:, 1], type=pa.int64())})

    def _large_star_input(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.r_[a, b]
        v = np.r_[b, a]
        bk = (splitmix64(u.astype(np.uint64)) % NB).astype(np.int32)
        return pa.table({"u": pa.array(u), "v": pa.array(v),
                         "__bucket": pa.array(bk)})

    def _small_star_input(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        # group by the LARGER endpoint; neighbors are the smaller ends
        bk = (splitmix64(b.astype(np.uint64)) % NB).astype(np.int32)
        return pa.table({"u": pa.array(b), "v": pa.array(a),
                         "__bucket": pa.array(bk)})

    def _dedupe_input(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bk = (splitmix64(a * np.uint64(0x9E3779B97F4A7C15) ^ splitmix64(b)) % NB)
        return t.append_column("__bucket", pa.array(bk.astype(np.int32)))

    def _dedupe(g: pd.DataFrame) -> pa.Table:
        e = np.unique(np.stack([g["doc_a"].to_numpy(dtype=np.int64),
                                g["doc_b"].to_numpy(dtype=np.int64)], axis=1), axis=0)
        return pa.table({"doc_a": pa.array(e[:, 0], type=pa.int64()),
                         "doc_b": pa.array(e[:, 1], type=pa.int64())})

    def _fingerprint(ds) -> tuple[int, int]:
        def h(t: pa.Table) -> pa.Table:
            a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
            b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
            hv = splitmix64(a * np.uint64(1000003) + b)
            return pa.table({"n": pa.array([len(a)], type=pa.int64()),
                             "s": pa.array([int(hv.sum() & np.uint64(0x7FFFFFFFFFFFFFFF))],
                                           type=pa.int64())})

        from ray.data.aggregate import Sum

        agg = ds.map_batches(h, batch_format="pyarrow").aggregate(
            Sum("n", alias_name="n"), Sum("s", alias_name="s"))
        return (int(agg["n"] or 0), int(agg["s"] or 0))

    cur = edges_ds
    prev_fp = None
    for _ in range(max_rounds):
        cur = (cur.map_batches(_large_star_input, batch_format="pyarrow")
               .groupby("__bucket")
               .map_groups(lambda g: _star(g, True), batch_format="pandas"))
        cur = (cur.map_batches(_small_star_input, batch_format="pyarrow")
               .groupby("__bucket")
               .map_groups(lambda g: _star(g, False), batch_format="pandas"))
        cur = (cur.map_batches(_dedupe_input, batch_format="pyarrow")
               .groupby("__bucket")
               .map_groups(_dedupe, batch_format="pandas")
               .materialize())
        fp = _fingerprint(cur)
        if fp == prev_fp:
            break
        prev_fp = fp
    return cur


def clusters_from_edges_ds(edges_ds, edge_budget: int = 5_000_000):
    """(doc_id, cluster_id) connected components for a canonical edge
    Dataset — driver union-find below ``edge_budget`` edges (returns a
    pyarrow Table), the distributed star-contraction loop
    (:func:`_cc_star_rounds`) above it (returns a sorted DATASET — the
    label set is dup-rate-sized, unbounded at 100 TB, so it never
    materializes on the driver; VERDICT r4 item 3).  Identical values
    either way: cluster_id = min reachable id, rows sorted by doc_id."""
    edges_ds = edges_ds.materialize()  # duplicate-rate-sized, reused twice
    n_edges = edges_ds.count()
    if n_edges == 0:  # to_pandas drops columns on 0-row datasets
        return CLUSTER_SCHEMA.empty_table()
    if n_edges <= edge_budget:
        edges = edges_ds.to_pandas()
        return clusters_from_pairs(pa.table({
            "doc_a": pa.array(edges["doc_a"].to_numpy(dtype=np.int64), type=pa.int64()),
            "doc_b": pa.array(edges["doc_b"].to_numpy(dtype=np.int64), type=pa.int64()),
        }))
    from coderag_ray.config import auto_buckets

    stars = _cc_star_rounds(
        edges_ds, num_buckets=auto_buckets(n_edges, target_rows=1_000_000, lo=256))

    def to_labels(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        # star edges: (root=min label, member); roots label themselves
        return pa.table({
            "doc_id": pa.array(np.r_[b, a], type=pa.int64()),
            "cluster_id": pa.array(np.r_[a, a], type=pa.int64()),
        })

    # dedup the (doc, root) labels with one more bucketed groupby (a doc
    # appears once per incident star edge) and sort DISTRIBUTED — the
    # driver never holds the label table
    from coderag_ray.functions.hashing import splitmix64

    nb_label = np.uint64(auto_buckets(n_edges, target_rows=2_000_000))

    def add_label_bucket(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column("__bucket",
                               pa.array((splitmix64(d) % nb_label).astype(np.int32)))

    def dedup_labels(g: pd.DataFrame) -> pa.Table:
        u = g.drop_duplicates("doc_id")  # one root per doc post-convergence
        return pa.table({
            "doc_id": pa.array(u["doc_id"].to_numpy(dtype=np.int64), type=pa.int64()),
            "cluster_id": pa.array(u["cluster_id"].to_numpy(dtype=np.int64), type=pa.int64()),
        })

    from coderag_ray.functions.datasets import schema_stable

    return schema_stable(
        stars.map_batches(to_labels, batch_format="pyarrow")
        .map_batches(add_label_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(dedup_labels, batch_format="pandas")
        .sort("doc_id"),
        CLUSTER_SCHEMA,
    )


def near_dup_clusters(docs_ds, threshold: float = 0.5, n: int = 3,
                      max_shingle_df: int | None = None,
                      edge_budget: int = 5_000_000):
    """Connected components of the ≥-threshold n-gram-Jaccard pair graph
    — the "keep one per cluster" step after near-dup detection.

    → (doc_id, cluster_id) for every doc with at least one qualifying
    pair, ``cluster_id`` = the smallest doc_id reachable (deterministic
    canonical label), sorted by doc_id.  A pyarrow Table below
    ``edge_budget`` edges; a sorted Ray DATASET above it (the label set
    is dup-rate-sized — unbounded at 100 TB, so it never materializes
    on the driver).  Consume with ``.to_pandas()`` / ``to_arrow_refs``
    accordingly; values are identical either way.

    Scale shape: pair scoring runs distributed
    (:func:`_ngram_pair_scores`) and only EDGES above the threshold
    leave it — the near-dup edge set scales with the duplicate rate,
    not the corpus.  Below ``edge_budget`` edges the components come
    from a driver union-find; above it the distributed large-star /
    small-star contraction (:func:`_cc_star_rounds`) runs entirely as
    bucketed groupbys over the edge Dataset, so no edge- or
    component-sized state ever reaches the driver.  Same output either
    way (tests force the low-budget path and assert equality).
    """
    import pyarrow.compute as pc

    scored = _ngram_pair_scores(docs_ds, n, max_shingle_df)
    edges_ds = scored.map_batches(
        lambda t: t.filter(pc.greater_equal(t["jaccard"], threshold))
                   .select(["doc_a", "doc_b"]),
        batch_format="pyarrow",
    )
    return clusters_from_edges_ds(edges_ds, edge_budget)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


# vectorized shingle hashing (round 3): rolling splitmix64 fold over
# per-word blake2b hashes replaces per-shingle string joins + blake2b —
# the shingling stage was the single most expensive bench pipeline.
# The SAME function feeds the signature stage and the exact-Jaccard
# verify, so candidate and verify sets stay hash-consistent; distinct
# hash sets ≡ distinct shingle-string sets modulo 2^-64 collisions.
_SH_SEED = np.uint64(0x243F6A8885A308D3)
_SH_PHI = np.uint64(0x9E3779B97F4A7C15)
_WORD_HASH_CACHE: dict[str, int] = {}  # per-process; vocab is Zipfian


def doc_shingle_hashes(text: str, n: int) -> np.ndarray:
    """Distinct uint64 hashes of the doc's word n-gram shingles
    (window = min(n, n_words), matching :func:`_word_shingles`'s
    short-doc behavior)."""
    from coderag_ray.functions.hashing import splitmix64

    ws = ascii_ws_words(text.lower())
    m = len(ws)
    if m == 0:
        return np.empty(0, dtype=np.uint64)
    cache = _WORD_HASH_CACHE
    h = np.empty(m, dtype=np.uint64)
    for i, w in enumerate(ws):
        v = cache.get(w)
        if v is None:
            v = _hash64(w)
            if len(cache) < 2_000_000:
                cache[w] = v
        h[i] = v
    w_len = min(n, m)
    L = m - w_len + 1
    acc = np.full(L, _SH_SEED, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(w_len):
            acc = splitmix64(acc ^ (h[j:j + L] * _SH_PHI))
    return np.unique(acc)


_rng = np.random.default_rng(12345)
_MH_A = (_rng.integers(1, _MERS_P, size=MINHASH_PERMS, dtype=np.int64)).astype(np.uint64)
_MH_B = (_rng.integers(0, _MERS_P, size=MINHASH_PERMS, dtype=np.int64)).astype(np.uint64)

_M61 = np.uint64(_MERS_P)
_U = np.uint64  # shorthand for shift constants


def _mod61(x: np.ndarray) -> np.ndarray:
    """x (uint64, any value) mod 2^61-1, exact.  2^61 ≡ 1 (mod p), so
    fold the top bits down once; one conditional subtract finishes."""
    r = (x & _M61) + (x >> _U(61))
    return np.where(r >= _M61, r - _M61, r)


def _mulmod61(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a * b) mod 2^61-1 for a, b < 2^61, fully vectorized in uint64.

    Schoolbook 32-bit limb split; every partial product fits uint64:
    a·b = hi·2^64 + mid·2^32 + lo with hi = a₁b₁ < 2^58,
    mid = a₁b₀ + a₀b₁ < 2^62, lo = a₀b₀ < 2^64.  Reductions use
    2^61 ≡ 1: 2^64 ≡ 8, and mid·2^32 = (mid≫29) + (mid mod 2^29)·2^32.
    """
    a_hi, a_lo = a >> _U(32), a & _U(0xFFFFFFFF)
    b_hi, b_lo = b >> _U(32), b & _U(0xFFFFFFFF)
    lo = a_lo * b_lo
    mid = a_hi * b_lo + a_lo * b_hi
    hi = a_hi * b_hi
    r = (lo & _M61) + (lo >> _U(61))                    # < 2^61 + 8
    r = r + (mid >> _U(29)) + ((mid & _U((1 << 29) - 1)) << _U(32))  # + <2^33 + <2^61
    r = r + (hi << _U(3))                               # + < 2^61 → total < 2^63, no overflow
    r = (r & _M61) + (r >> _U(61))
    r = (r & _M61) + (r >> _U(61))
    return np.where(r >= _M61, r - _M61, r)


def minhash_signature(shingle_hashes: np.ndarray) -> np.ndarray:
    """64-perm MinHash of a set of 64-bit shingle hashes (uint64[perms]).

    One (perms × shingles) uint64 Mersenne-61 mulmod matrix — bitwise
    identical to exact big-int ``(a·h + b) mod p`` (asserted in tests)
    at numpy speed instead of 64 sequential object-dtype passes.
    """
    if len(shingle_hashes) == 0:
        return np.full(MINHASH_PERMS, np.iinfo(np.uint64).max, dtype=np.uint64)
    h = _mod61(np.ascontiguousarray(shingle_hashes, dtype=np.uint64))  # (a·h)%p == (a·(h%p))%p
    vals = _mulmod61(_MH_A[:, None], h[None, :]) + _MH_B[:, None]  # < 2p < 2^62
    vals = np.where(vals >= _M61, vals - _M61, vals)
    return vals.min(axis=1)


def minhash_signatures_batch(hash_lists: list[np.ndarray],
                             max_shingles_per_block: int = 16384) -> np.ndarray:
    """Signatures for a whole batch of docs in one (perms × shingles)
    matrix per block, with per-doc segment minima via
    ``np.minimum.reduceat``.  Block size 16k keeps the ~15 uint64
    temporaries cache-resident (64k blocks are 3× slower — DRAM-bound;
    measured sweep in docs/PERF_NOTES.md).  ~11× vs the round-1
    object-dtype loop at ~125 shingles/doc, more on bigger docs.
    → (n_docs, perms) uint64; empty docs get the all-max sentinel."""
    n = len(hash_lists)
    out = np.full((n, MINHASH_PERMS), np.iinfo(np.uint64).max, dtype=np.uint64)
    idx = [i for i in range(n) if len(hash_lists[i])]
    pos = 0
    while pos < len(idx):
        # take docs until the shingle budget is hit (≥1 doc per block)
        blk, total = [], 0
        while pos < len(idx) and (not blk or total + len(hash_lists[idx[pos]]) <= max_shingles_per_block):
            blk.append(idx[pos])
            total += len(hash_lists[idx[pos]])
            pos += 1
        H = _mod61(np.concatenate([hash_lists[i] for i in blk]).astype(np.uint64))
        lens = np.array([len(hash_lists[i]) for i in blk], dtype=np.int64)
        starts = np.r_[0, np.cumsum(lens)[:-1]]
        vals = _mulmod61(_MH_A[:, None], H[None, :]) + _MH_B[:, None]
        vals = np.where(vals >= _M61, vals - _M61, vals)
        out[blk, :] = np.minimum.reduceat(vals, starts, axis=1).T
    return out


class MinHashStage:
    """Actor-pool map_batches stage: doc → (band_id, band_hash, doc_id)
    rows.  Word-hash cache lives per actor; shingle hashing and band
    hashing are vectorized (:func:`doc_shingle_hashes` + a splitmix64
    fold over each band's signature rows)."""

    def __init__(self, n: int = 3):
        self.n = n

    def __call__(self, t: pa.Table) -> pa.Table:
        from coderag_ray.functions.hashing import splitmix64

        rpb = MINHASH_PERMS // MINHASH_BANDS
        dids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        hash_lists = [doc_shingle_hashes(text, self.n)
                      for text in t["text"].to_pylist()]
        sigs = minhash_signatures_batch(hash_lists)  # (n_docs, perms)
        n_docs = len(dids)
        # band hash = splitmix64 fold over the band's rpb signature
        # values — vectorized over (docs × bands) at once
        bands = sigs.reshape(n_docs, MINHASH_BANDS, rpb)
        acc = np.full((n_docs, MINHASH_BANDS), _SH_SEED, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(rpb):
                acc = splitmix64(acc ^ (bands[:, :, j] * _SH_PHI))
        bh = (acc >> np.uint64(1)).astype(np.int64)  # fits int64, positive
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(dids, MINHASH_BANDS), type=pa.int64()),
                "band_id": pa.array(np.tile(np.arange(MINHASH_BANDS, dtype=np.int32),
                                            n_docs)),
                "band_hash": pa.array(bh.reshape(-1), type=pa.int64()),
            }
        )


def _empty_pairs() -> pa.Table:
    return pa.table({"doc_a": pa.array([], type=pa.int64()),
                     "doc_b": pa.array([], type=pa.int64()),
                     "jaccard": pa.array([], type=pa.float64())})


def minhash_lsh_pairs(docs_ds, n: int = 3, jaccard_threshold: float = 0.5,
                      max_bucket_docs: int = 1024):
    """Near-dup pairs via MinHash-LSH candidates + exact-Jaccard verify.

    → pyarrow Table (doc_a, doc_b, jaccard) sorted (doc_a, doc_b);
    deterministic (fixed seeds).

    Every corpus-growing intermediate stays distributed:

    1. candidate pairs come from a ``groupby(band_id, band_hash)`` with a
       per-bucket doc cap (``max_bucket_docs``, logged when it trims —
       one hot band hash, e.g. many near-empty docs, would otherwise
       emit O(df²) pairs);
    2. pair dedup across bands is a bucketed ``map_groups`` keyed on
       ``hash(doc_a)``;
    3. exact-Jaccard verify is a two-round distributed join: candidate
       docs' shingle-HASH sets (sorted uint64 arrays — same blake2b-64
       hashes the signatures use; a 64-bit collision is negligible) are
       attached to each pair side via a doc-keyed bucket join, then
       pairs reunite in a pair-keyed bucket join where the intersection
       runs as ``np.intersect1d``.  Only candidate doc IDs (bounded by
       the bucket cap) and the final verified pairs touch the driver.
    """
    import logging

    import ray

    from coderag_ray.config import auto_buckets
    from coderag_ray.functions.hashing import splitmix64

    from coderag_ray.config import dataset_rows_estimate

    n_rows = dataset_rows_estimate(docs_ds)
    # band rows = docs × MINHASH_BANDS narrow rows; join rounds hold
    # candidate-scale rows — all derived, never fixed (VERDICT r3 item 3)
    nb_band = auto_buckets(n_rows * MINHASH_BANDS, target_rows=2_000_000, lo=256)
    nb_join = auto_buckets(n_rows, target_rows=500_000)

    def add_band_bucket(t: pa.Table) -> pa.Table:
        # distinct (band_id, band_hash) cardinality grows with the
        # corpus → hash band buckets into nb_band coarse groups so pair
        # expansion pays Python overhead per COARSE group only (the
        # bucket_agg lesson), with vectorized run detection inside
        h = t["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (splitmix64(h) % np.uint64(nb_band)).astype(np.int32)
        return t.append_column("__bucket", pa.array(b))

    from coderag_ray.config import auto_concurrency

    bands = (docs_ds.map_batches(MinHashStage, fn_constructor_args=(n,),
                                 batch_format="pyarrow",
                                 concurrency=auto_concurrency())
             .map_batches(add_band_bucket, batch_format="pyarrow"))

    def pairs_of_bucket(g: pd.DataFrame) -> pa.Table:
        """All (band_id, band_hash) runs of one coarse bucket, pair-
        expanded vectorized (same run-batched scheme as the n-gram
        path); runs over ``max_bucket_docs`` are capped (logged)."""
        order = np.lexsort((g["doc_id"].to_numpy(), g["band_hash"].to_numpy(),
                            g["band_id"].to_numpy()))
        bi = g["band_id"].to_numpy()[order]
        bh = g["band_hash"].to_numpy()[order]
        ids = g["doc_id"].to_numpy()[order]
        new_run = np.ones(len(ids), dtype=bool)
        new_run[1:] = (bi[1:] != bi[:-1]) | (bh[1:] != bh[:-1])
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.r_[starts, len(ids)])
        if max_bucket_docs is not None:
            over = lens > max_bucket_docs
            if over.any():
                logging.getLogger(__name__).warning(
                    "minhash_lsh: %d band buckets over %d docs capped",
                    int(over.sum()), max_bucket_docs)
                lens = np.minimum(lens, max_bucket_docs)
        out_a, out_b = [], []
        for ln in np.unique(lens):
            if ln < 2:
                continue
            runs = starts[lens == ln]
            idx = runs[:, None] + np.arange(ln)[None, :]
            block = ids[idx]
            ai, bi2 = np.triu_indices(int(ln), k=1)
            out_a.append(block[:, ai].ravel())
            out_b.append(block[:, bi2].ravel())
        if not out_a:
            return pa.table({"doc_a": pa.array([], type=pa.int64()),
                             "doc_b": pa.array([], type=pa.int64())})
        return pa.table({"doc_a": pa.array(np.concatenate(out_a), type=pa.int64()),
                         "doc_b": pa.array(np.concatenate(out_b), type=pa.int64())})

    def add_bucket_a(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column("__bucket", pa.array((splitmix64(a) % np.uint64(nb_join)).astype(np.int32)))

    def dedup_bucket(g: pd.DataFrame) -> pa.Table:
        return _from_pandas(g.drop_duplicates(["doc_a", "doc_b"])[["doc_a", "doc_b"]])

    cand = (
        bands.groupby("__bucket")
        .map_groups(pairs_of_bucket, batch_format="pandas")
        .map_batches(add_bucket_a, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(dedup_bucket, batch_format="pandas")
        .materialize()  # consumed twice (id collection + side expansion); candidate-scale, not corpus-scale
    )

    # distinct candidate doc IDs — ints only, bounded by the bucket cap;
    # broadcast once for the docs semi-join
    id_chunks = [
        np.unique(np.concatenate([
            b["doc_a"].to_numpy(zero_copy_only=False),
            b["doc_b"].to_numpy(zero_copy_only=False),
        ]))
        for b in cand.iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    if not id_chunks:
        return _empty_pairs()
    need = np.unique(np.concatenate(id_chunks)).astype(np.int64)
    need_ref = ray.put(need)

    hashes_type = pa.list_(pa.uint64())

    def doc_hashes(t: pa.Table) -> pa.Table:
        """Semi-join docs → (doc_id, hashes) for candidate docs only."""
        need_ids = ray.get(need_ref)
        t = t.filter(pc.is_in(pc.cast(t["doc_id"], pa.int64()),
                              value_set=pa.array(need_ids, type=pa.int64())))
        ids, arrs = [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            hs = doc_shingle_hashes(text, n)  # same hash family as the stage
            ids.append(did)
            arrs.append(hs)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "doc_a": pa.array([None] * len(ids), type=pa.int64()),
            "doc_b": pa.array([None] * len(ids), type=pa.int64()),
            "hashes": pa.array(arrs, type=hashes_type),
        })

    def pair_sides(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_id = np.concatenate([a, b])
        return pa.table({
            "doc_id": pa.array(doc_id, type=pa.int64()),
            "doc_a": pa.array(np.concatenate([a, a]), type=pa.int64()),
            "doc_b": pa.array(np.concatenate([b, b]), type=pa.int64()),
            "hashes": pa.array([None] * len(doc_id), type=hashes_type),
        })

    def add_bucket_docid(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column("__bucket", pa.array((splitmix64(d) % np.uint64(nb_join)).astype(np.int32)))

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        """Doc-keyed join round: give each pair side its doc's hash set."""
        has = g["hashes"].notna()
        lookup = dict(zip(g.loc[has, "doc_id"], g.loc[has, "hashes"]))
        pr = g.loc[~has]
        return pa.table({
            "doc_a": pa.array(pr["doc_a"].to_numpy(dtype=np.int64), type=pa.int64()),
            "doc_b": pa.array(pr["doc_b"].to_numpy(dtype=np.int64), type=pa.int64()),
            "hashes": pa.array(
                [lookup.get(d) for d in pr["doc_id"]], type=hashes_type),
        })

    sides = (
        docs_ds.map_batches(doc_hashes, batch_format="pyarrow")
        .union(cand.map_batches(pair_sides, batch_format="pyarrow"))
        .map_batches(add_bucket_docid, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(attach, batch_format="pandas")
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        """Pair-keyed join round: both sides of a pair meet here."""
        out_a, out_b, out_j = [], [], []
        for (a, b), gg in g.groupby(["doc_a", "doc_b"], sort=False):
            hs = [np.asarray(h, dtype=np.uint64) for h in gg["hashes"]
                  if h is not None and not (isinstance(h, float) and np.isnan(h))]
            if len(hs) < 2:
                continue
            h0, h1 = hs[0], hs[1]
            u = h0.size + h1.size - np.intersect1d(h0, h1).size
            j = (h0.size + h1.size - u) / u if u else 0.0
            if j >= jaccard_threshold:
                out_a.append(int(a)); out_b.append(int(b)); out_j.append(round6(j))
        return pa.table({"doc_a": pa.array(out_a, type=pa.int64()),
                         "doc_b": pa.array(out_b, type=pa.int64()),
                         "jaccard": pa.array(np.array(out_j, dtype=np.float64),
                                             type=pa.float64())})

    verified_ds = (
        sides.map_batches(add_bucket_a, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(verify, batch_format="pandas")
        .materialize()
    )
    global LAST_MINHASH_STATS
    LAST_MINHASH_STATS = verified_ds.stats()  # per-operator audit (bench)
    verified = verified_ds.to_pandas()  # final verified pairs only — small
    if len(verified) == 0:
        return _empty_pairs()
    verified = verified.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(verified, preserve_index=False)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_batch(t: pa.Table) -> pa.Table:
    """(doc_id, simhash) — 64-bit weighted sign hash over word frequencies."""
    ids, sims = [], []
    shifts = np.arange(64, dtype=np.uint64)
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        tf = Counter(ascii_ws_words(text.lower()))
        if tf:
            hs = np.array([_hash64(w) for w in tf], dtype=np.uint64)
            f = np.fromiter(tf.values(), dtype=np.int64, count=len(tf))
            # one (words × 64) matrix op per doc instead of a per-word loop
            bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(bool)
            acc = np.where(bits, f[:, None], -f[:, None]).sum(axis=0)
        else:
            acc = np.zeros(64, dtype=np.int64)
        sim = int(((acc > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))
        ids.append(did)
        sims.append(sim >> 1 if sim >= (1 << 63) else sim)  # keep int64-positive
    return pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()), "simhash": pa.array(sims, type=pa.int64())}
    )


def simhash_table(docs_ds):
    return schema_stable(docs_ds.map_batches(simhash_batch, batch_format="pyarrow"),
                         SIMHASH_SCHEMA)


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

    def project(t: pa.Table) -> pa.Table:
        # rebuild schema before the label shuffle: drops extra columns
        # and the unhashable b'pandas' schema metadata
        return pa.table({"label": t["label"], "vec_id": t["vec_id"],
                         "embedding": t["embedding"]})

    emb_ds = emb_ds.map_batches(project, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        E = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
        S = En @ En.T
        a, b = np.triu_indices(len(ids), k=1)
        keep = S[a, b] >= threshold
        return pa.table(
            {
                "label": pa.array(np.repeat(int(g["label"].iloc[0]), keep.sum()), type=pa.int64()),
                "vec_a": pa.array(ids[a[keep]].astype(np.int64), type=pa.int64()),
                "vec_b": pa.array(ids[b[keep]].astype(np.int64), type=pa.int64()),
                "cos_sim": pa.array(np.atleast_1d(round6(S[a[keep], b[keep]])), type=pa.float64()),
            }
        )

    return schema_stable(
        emb_ds.groupby("label").map_groups(pairs, batch_format="pandas"),
        EMB_DUP_SCHEMA)


# ---------------------------------------------------------------------------
# windowed substring duplication (exact-substring dedup profile)
# ---------------------------------------------------------------------------


SPAN_DUP_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("n_windows", pa.int64()),
    ("n_dup_windows", pa.int64()),
    ("dup_fraction", pa.float64()),
])


def duplicated_spans(docs_ds, window: int = 32, stride: int = 8,
                     min_dup: int = 2):
    """Per-document substring-duplication profile — the windowed
    distributed stand-in for suffix-array exact-substring dedup (Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): every ``window``-byte window taken at ``stride`` offsets
    is exchanged by window-hash bucket; a window whose TEXT occurs in
    ≥ ``min_dup`` distinct documents marks every occurrence duplicated.

    → Dataset ``(doc_id, n_windows, n_dup_windows, dup_fraction
    round6)`` for docs with ≥ 1 window (``len(text) ≥ window`` bytes),
    sorted by doc_id.

    Scale shape: the window exchange ships ≈ corpus_bytes·window/stride
    bytes ONCE (the irreducible cost of substring-level dedup in any
    shuffle formulation); bucket count is auto-derived from input docs
    with a window-expansion-aware target.  Within a bucket, duplicate
    detection is one vectorized pandas groupby on the exact window
    BYTES — the routing hash only co-locates, so a hash collision can
    never create a false duplicate.  Per-doc counts leave each bucket
    as PARTIALS (≤ docs-touching-bucket rows) and meet in a second,
    doc-keyed bucketed sum, so nothing window-count-sized ever
    concentrates.  Windows are byte offsets of the utf-8 encoding
    (== character offsets for ASCII corpora, which is what the SQL
    oracle's ``substr`` view checks)."""
    from numpy.lib.stride_tricks import sliding_window_view

    from coderag_ray.config import auto_buckets, dataset_rows_estimate
    from coderag_ray.functions.hashing import splitmix64

    # each doc expands to ~len/stride window rows of ~window bytes: use
    # a doc-count target small enough that one bucket's window rows stay
    # ~10^6 at typical document sizes.  One row estimate feeds both
    # bucket counts (the estimate's count() backstop may execute a
    # derived plan — pay it at most once).
    n_docs_est = dataset_rows_estimate(docs_ds)
    nb_win = np.uint64(auto_buckets(n_docs_est, target_rows=10_000))
    nb_doc = np.uint64(auto_buckets(n_docs_est, target_rows=2_000_000))
    _empty_win = pa.table({"doc_id": pa.array([], type=pa.int64()),
                           "win": pa.array([], type=pa.binary(window)),
                           "__bucket": pa.array([], type=pa.int32())})

    def win_batch(t: pa.Table) -> pa.Table:
        docs, wins = [], []
        for did, text in zip(pc.cast(t["doc_id"], pa.int64()).to_pylist(),
                             t["text"].to_pylist()):
            b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
            if len(b) < window:
                continue
            sw = np.ascontiguousarray(sliding_window_view(b, window)[::stride])
            docs.append(np.full(len(sw), did, dtype=np.int64))
            wins.append(sw)
        if not docs:
            return _empty_win
        d = np.concatenate(docs)
        W = np.concatenate(wins)  # [n, window] uint8 — kept raw:
        # numpy S-dtype items strip trailing NUL bytes, which would make
        # two windows differing only in trailing NULs compare equal; a
        # fixed-size-binary array built straight from the byte buffer
        # preserves every byte
        win_arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(window), len(W), [None, pa.py_buffer(W.tobytes())])
        # vectorized FNV-1a fold over the window bytes (routing only);
        # column ops upcast on the fly — no 8× uint64 materialization
        h = np.full(len(W), np.uint64(14695981039346656037))
        for j in range(window):
            h = (h ^ W[:, j]) * np.uint64(1099511628211)
        bkt = (splitmix64(h) % nb_win).astype(np.int32)
        return pa.table({
            "doc_id": pa.array(d, type=pa.int64()),
            "win": win_arr,
            "__bucket": pa.array(bkt),
        })

    def dup_bucket(g: pd.DataFrame) -> pa.Table:
        dup = (g.groupby("win", sort=False)["doc_id"].transform("nunique")
               >= min_dup)
        a = (g.assign(dup=dup.to_numpy())
             .groupby("doc_id", sort=False)["dup"]
             .agg(n_windows="size", n_dup_windows="sum").reset_index())
        bkt = (splitmix64(a["doc_id"].to_numpy(dtype=np.uint64)) % nb_doc
               ).astype(np.int32)
        return pa.table({
            "doc_id": pa.array(a["doc_id"].to_numpy(dtype=np.int64), type=pa.int64()),
            "n_windows": pa.array(a["n_windows"].to_numpy(dtype=np.int64), type=pa.int64()),
            "n_dup_windows": pa.array(a["n_dup_windows"].to_numpy(dtype=np.int64), type=pa.int64()),
            "__bucket": pa.array(bkt),
        })

    def sum_doc(g: pd.DataFrame) -> pa.Table:
        a = (g.groupby("doc_id", sort=True)[["n_windows", "n_dup_windows"]]
             .sum().reset_index())
        nw = a["n_windows"].to_numpy(dtype=np.int64)
        nd = a["n_dup_windows"].to_numpy(dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(a["doc_id"].to_numpy(dtype=np.int64), type=pa.int64()),
            "n_windows": pa.array(nw, type=pa.int64()),
            "n_dup_windows": pa.array(nd, type=pa.int64()),
            "dup_fraction": pa.array(
                np.atleast_1d(round6(nd / np.maximum(nw, 1))), type=pa.float64()),
        })

    return schema_stable(
        docs_ds.map_batches(win_batch, batch_format="pyarrow")
        .groupby("__bucket").map_groups(dup_bucket, batch_format="pandas")
        .groupby("__bucket").map_groups(sum_doc, batch_format="pandas")
        .sort("doc_id"),
        SPAN_DUP_SCHEMA)
