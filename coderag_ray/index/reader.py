"""Index reader — query-side access to a built index.

Loads the small global state once (meta, manifest, per-query idf rows)
and exposes per-partition posting/doc access.  The reference's
equivalent is the SQLite connection + ``getIdfScoresForTerms`` broadcast
lookup (``/root/reference/packages/core/src/storage-persistent.ts:812-837``)
and ``getAverageDocLength`` (``:939-963``); here idf rows are fetched by
parquet predicate pushdown on the term-sorted ``idf/`` table, and each
partition's postings by pushdown on the term-sorted
``postings.parquet``.  Partition doc arrays are cached per reader (one
reader per query-server process / scorer actor — ST-style state,
``indexer.ts:103`` analog).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from coderag_ray.functions import varint

from coderag_ray.config import IndexConfig
from coderag_ray.index import manifest as mf
from coderag_ray.index.partition import part_dirname


@dataclass
class PartitionHandle:
    part_id: int
    doc_ids: np.ndarray      # [n_local] int64, ordinal-indexed
    chunk_ids: np.ndarray    # [n_local] int64
    dls: np.ndarray          # [n_local] int64 token counts
    paths: np.ndarray | None = None  # lazily loaded for result filters
    magnitudes: np.ndarray | None = None  # lazily loaded for cosine mode

    @property
    def n_chunks(self) -> int:
        return len(self.doc_ids)


@dataclass
class CompactIndex:
    """Merged-partition resident query view.

    When the whole shard is preloaded, per-query work per term collapses
    from P python iterations to ONE numpy pass over a global posting
    array (``global_ord = part_offset + local_ord``; segments are
    concatenated in ascending part order).  Results are bitwise-identical
    to the per-partition path: per-doc score sums still run in query-term
    order and the explicit (score, doc_id, chunk_id) tie-break never
    depends on ordinal layout.
    """

    doc_ids: np.ndarray
    chunk_ids: np.ndarray
    dls: np.ndarray
    part_offsets: dict[int, int]
    # term → (global ords, per-posting BM25 impact).  The impact is the
    # full per-posting contribution idf * (tf*(k1+1)) / (tf + dl_norm[ord])
    # precomputed ONCE at preload with the identical float64 expression
    # tree the per-query path would evaluate — per query, scoring a term
    # is a single gather-add.
    postings: dict[str, tuple[np.ndarray, np.ndarray]]

    def locate(self, global_ords: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """global ordinal → (part_id, local ordinal) arrays."""
        pids = np.array(sorted(self.part_offsets), dtype=np.int64)
        offs = np.array([self.part_offsets[int(p)] for p in pids], dtype=np.int64)
        idx = np.searchsorted(offs, global_ords, side="right") - 1
        return pids[idx], global_ords - offs[idx]

    @property
    def n_chunks(self) -> int:
        return len(self.doc_ids)


class IndexReader:
    def __init__(self, index_dir: str, preload: str = "auto",
                 partitions: list[int] | None = None):
        """``preload``: "auto" builds the resident compact index on first
        search when the shard fits (latency-optimal, ~secs of startup);
        "never" keeps lazy row-group-pruned reads + per-term LRU
        (startup-optimal — e.g. many short-lived batch-scorer actors).

        ``partitions``: restrict this reader to a subset of index
        partitions — the SHARD of a scatter-gather query tier
        (:mod:`coderag_ray.query.sharded`).  Global statistics (N,
        avgdl, idf) always come from the whole index, so shard-local
        scores are bitwise identical to whole-index scores."""
        self._preload_mode = preload
        self.index_dir = index_dir
        self.meta = mf.load_meta(index_dir)
        self.config = IndexConfig.from_dict(self.meta["config"])
        man = mf.load_manifest(index_dir)
        self.partitions = sorted(
            p for p, row in mf.manifest_partitions(man).items() if row.get("n_chunks", 0) > 0
        )
        if partitions is not None:
            subset = set(partitions)
            self.partitions = [p for p in self.partitions if p in subset]
        self.avgdl = float(self.meta["avgdl"])
        self.n_chunks = int(self.meta["n_chunks"])
        self._part_cache: dict[int, PartitionHandle] = {}
        self._idf_cache: dict[str, tuple[int, float]] = {}
        self._idf_misses: set[str] = set()
        # per-(part, term) posting-record LRU — the query-server analog of
        # the reference's query-token/search caches (tfidf.ts:20-38,
        # search-cache.ts:24-132); invalidation = new reader per index build
        from collections import OrderedDict

        self._post_cache: OrderedDict[tuple[int, str], dict | None] = OrderedDict()
        self._post_cache_cap = 200_000
        self._full_parts: set[int] = set()
        self._preload_checked = False
        import threading

        # serializes ensure_preloaded against preload_async's background
        # thread — a search arriving mid-preload blocks until resident
        self._preload_lock = threading.Lock()
        self._preload_thread: threading.Thread | None = None
        # idf_for_terms is called by searches BEFORE they block on the
        # preload lock AND by the preload thread itself — a separate
        # lock (not _preload_lock: that would deadlock the preload
        # thread's own idf call) keeps the full-load check-then-set and
        # the cache/miss mutations single-writer
        self._idf_lock = threading.Lock()
        self._bytes_postings = sum(
            row.get("bytes_postings", 0) for row in mf.manifest_partitions(man).values()
        )

    # -- global state ----------------------------------------------------
    _IDF_FULL_LOAD_MAX = 5_000_000  # rows; above this, per-term pushdown only

    def idf_for_terms(self, terms: list[str]) -> dict[str, tuple[int, float]]:
        """term → (df, idf) for the query's terms only (J3 broadcast lookup).

        Small vocabularies are loaded whole into the cache on first use;
        beyond ``_IDF_FULL_LOAD_MAX`` rows the term-sorted parquet is
        probed per query via predicate pushdown.  Thread-safe: early
        queries race the ``preload_async`` thread here, and without the
        lock the full-load could run twice (duplicated I/O on every
        pool-actor spin-up).
        """
        with self._idf_lock:
            return self._idf_for_terms_locked(terms)

    def _idf_for_terms_locked(self, terms: list[str]) -> dict[str, tuple[int, float]]:
        if not getattr(self, "_idf_checked_full", False):
            self._idf_checked_full = True
            idf_path = os.path.join(self.index_dir, "idf")
            dataset = pads.dataset(idf_path, format="parquet")
            if dataset.count_rows() <= self._IDF_FULL_LOAD_MAX:
                tbl = dataset.to_table()
                self._idf_cache = dict(
                    zip(
                        tbl["term"].to_pylist(),
                        zip(tbl["df"].to_pylist(), tbl["idf"].to_pylist()),
                    )
                )
                self._idf_full = True
        if getattr(self, "_idf_full", False):
            return {t: self._idf_cache[t] for t in terms if t in self._idf_cache}
        missing = [t for t in terms if t not in self._idf_cache and t not in self._idf_misses]
        if missing:
            idf_path = os.path.join(self.index_dir, "idf")
            dataset = pads.dataset(idf_path, format="parquet")
            tbl = dataset.to_table(filter=pc.field("term").isin(missing))
            found = set()
            for t, df, idf in zip(
                tbl["term"].to_pylist(), tbl["df"].to_pylist(), tbl["idf"].to_pylist()
            ):
                self._idf_cache[t] = (int(df), float(idf))
                found.add(t)
            self._idf_misses.update(set(missing) - found)
        return {t: self._idf_cache[t] for t in terms if t in self._idf_cache}

    # -- partitions ------------------------------------------------------
    def part_dir(self, part_id: int) -> str:
        return os.path.join(self.index_dir, "parts", part_dirname(part_id))

    def partition(self, part_id: int) -> PartitionHandle:
        h = self._part_cache.get(part_id)
        if h is None:
            tbl = pq.read_table(
                os.path.join(self.part_dir(part_id), "docs.parquet"),
                columns=["doc_id", "chunk_id", "dl"],
            )
            h = PartitionHandle(
                part_id=part_id,
                doc_ids=tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                chunk_ids=tbl["chunk_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                dls=tbl["dl"].to_numpy(zero_copy_only=False).astype(np.int64),
            )
            self._part_cache[part_id] = h
        return h

    def partition_paths(self, part_id: int) -> np.ndarray:
        h = self.partition(part_id)
        if h.paths is None:
            tbl = pq.read_table(
                os.path.join(self.part_dir(part_id), "docs.parquet"), columns=["path"]
            )
            h.paths = np.array(tbl["path"].to_pylist(), dtype=object)
        return h.paths

    PRELOAD_MAX_BYTES = 512 << 20  # compressed; per query-server shard

    def compact(self) -> "CompactIndex | None":
        """Merged-partition resident view (see :class:`CompactIndex`);
        built lazily by :meth:`ensure_preloaded` when the shard fits."""
        return getattr(self, "_compact", None)

    def preload_async(self) -> None:
        """Kick the resident preload off on a background thread — called
        from scorer-actor ``__init__`` so pool spin-up overlaps preload
        with Ray's actor-pool construction and the upstream feed
        scheduling instead of paying it serialized on the first query
        (VERDICT r4 item 6; measured 5.9 → 25.5 spin-up-inclusive q/s at
        the bench shape).  The first search blocks on the shared lock
        for whatever build time remains, so latency tiers never see a
        half-warm reader.  (A serve-the-lazy-path-while-building variant
        was tried and REVERTED: on a slow-memory box the lazy queries
        starve the preload thread and the whole feed runs lazy — strictly
        worse than blocking; see BASELINE.md's spin-up box control.)"""
        import threading

        if self._preload_checked or self._preload_thread is not None:
            return
        t = threading.Thread(target=self.ensure_preloaded, daemon=True)
        self._preload_thread = t
        t.start()

    def ensure_preloaded(self) -> bool:
        """Pin all posting lists in RAM when the shard is small enough.

        This is the query-server scale design: each scorer holds its
        partition shard's postings in memory (Lucene/ES-style); the
        row-group-pruned parquet path remains the cold/oversized
        fallback (and serves the WAND/cosine block-structured paths).
        Fully vectorized: each partition's posting buffers are decoded in
        one pass (:func:`coderag_ray.functions.varint.decode_delta_runs`)
        — no per-term Python loop.  Returns True if resident.
        """
        with self._preload_lock:
            return self._ensure_preloaded_locked()

    def _ensure_preloaded_locked(self) -> bool:
        if self._preload_checked:
            return self.compact() is not None
        self._preload_checked = True
        if self._preload_mode == "never" or self._bytes_postings > self.PRELOAD_MAX_BYTES:
            return False

        offsets: dict[int, int] = {}
        doc_ids, chunk_ids, dls = [], [], []
        total = 0
        for pid in self.partitions:
            h = self.partition(pid)
            offsets[pid] = total
            total += h.n_chunks
            doc_ids.append(h.doc_ids)
            chunk_ids.append(h.chunk_ids)
            dls.append(h.dls)

        all_dls = np.concatenate(dls) if dls else np.empty(0, dtype=np.int64)
        k1, b = self.config.k1, self.config.b
        dl_eff = np.maximum(all_dls, 1).astype(np.float64)
        dl_norm = k1 * (1.0 - b + (b * dl_eff) / self.avgdl)

        def load_part(pid: int):
            tbl = pq.read_table(
                os.path.join(self.part_dir(pid), "postings.parquet"),
                columns=["term", "df_local", "doc_buf", "freq_buf"],
            )
            terms = tbl["term"].to_pylist()
            df = tbl["df_local"].to_numpy(zero_copy_only=False).astype(np.int64)
            part_off = np.uint64(offsets[pid])
            for col_name, is_delta in (("doc_buf", True), ("freq_buf", False)):
                col = tbl[col_name].combine_chunks()
                bufs = col.buffers()
                off_arr = np.frombuffer(
                    bufs[1], dtype=np.int64, count=len(col) + 1, offset=col.offset * 8
                )
                data = memoryview(bufs[2])[off_arr[0]: off_arr[-1]]
                if is_delta:
                    ords_all = varint.decode_delta_runs(data, df) + part_off
                else:
                    freqs_all = varint.decode(data).astype(np.float64)
            return terms, df, ords_all.astype(np.int64), freqs_all

        # partitions decode in a thread pool (parquet read + the varint
        # kernels release the GIL for their heavy parts) — this is every
        # scorer actor's startup cost
        from concurrent.futures import ThreadPoolExecutor

        n_threads = min(8, max(1, len(self.partitions)))
        with ThreadPoolExecutor(n_threads) as ex:
            parts = list(ex.map(load_part, self.partitions))

        # global merge, fully vectorized (the old per-term Python loop —
        # 864k slice/setdefault iterations + 414k np.concatenate calls —
        # and per-partition idf list-comps were ~45 s of the preload):
        # factorize term rows, order rows by (term, ascending pid) with a
        # stable lexsort (same per-term concatenation order as the old
        # loop), materialize the reordered posting arrays with ONE
        # segment-gather, compute impacts in one arithmetic pass over
        # the same expression tree, and hand out per-term VIEWS.
        import pandas as pd

        all_terms: list[str] = []
        for terms, _, _, _ in parts:
            all_terms.extend(terms)
        df_rows = np.concatenate([df for _, df, _, _ in parts]) \
            if parts else np.empty(0, dtype=np.int64)
        pid_rows = np.concatenate([
            np.full(len(terms), i, dtype=np.int32)
            for i, (terms, _, _, _) in enumerate(parts)
        ]) if parts else np.empty(0, dtype=np.int32)
        G_ords = np.concatenate([o for _, _, o, _ in parts]) \
            if parts else np.empty(0, dtype=np.int64)
        G_freqs = np.concatenate([f for _, _, _, f in parts]) \
            if parts else np.empty(0)
        row_starts = np.concatenate([[0], np.cumsum(df_rows)])[:-1]

        codes, uniques = pd.factorize(np.asarray(all_terms, dtype=object))
        order = np.lexsort((pid_rows, codes))
        codes_o, df_o, starts_o = codes[order], df_rows[order], row_starts[order]
        out_end = np.cumsum(df_o)
        out_start = out_end - df_o
        total = int(out_end[-1]) if len(out_end) else 0
        gather = (np.repeat(starts_o - out_start, df_o)
                  + np.arange(total, dtype=np.int64))
        ords_sorted = G_ords[gather]
        freqs_sorted = G_freqs[gather]
        del G_ords, G_freqs, gather
        # idf per term once, broadcast per posting — identical float64
        # expression tree as the per-query scorer
        idf_map = self.idf_for_terms(list(uniques))
        idf_u = np.array([idf_map.get(t, (0, 0.0))[1] for t in uniques])
        idf_pp = np.repeat(idf_u[codes_o], df_o)
        imp_sorted = idf_pp * (
            (freqs_sorted * (k1 + 1.0)) / (freqs_sorted + dl_norm[ords_sorted])
        )
        del idf_pp, freqs_sorted
        # per-term boundaries in the sorted row space → dict of views
        first_row = np.flatnonzero(np.r_[True, codes_o[1:] != codes_o[:-1]]) \
            if len(codes_o) else np.empty(0, dtype=np.int64)
        counts = np.add.reduceat(df_o, first_row) if len(first_row) else []
        term_start = out_start[first_row] if len(first_row) else []
        merged_terms = uniques[codes_o[first_row]] if len(first_row) else []
        merged = {
            t: ((s, int(s + c)))
            for t, s, c in zip(merged_terms, term_start, counts)
        }

        postings = {
            t: (ords_sorted[s:e], imp_sorted[s:e])  # views, zero-copy
            for t, (s, e) in merged.items()
        }
        compact = CompactIndex(
            doc_ids=np.concatenate(doc_ids) if doc_ids else np.empty(0, dtype=np.int64),
            chunk_ids=np.concatenate(chunk_ids) if chunk_ids else np.empty(0, dtype=np.int64),
            dls=all_dls,
            part_offsets=offsets,
            postings=postings,
        )
        self._preseed_champions(compact, postings)
        # publish LAST: compact() is read without the lock elsewhere, so
        # it must only ever become visible fully built (champions
        # included)
        self._compact = compact
        return True

    def _preseed_champions(self, compact, postings) -> None:
        """Eagerly build the hot-term champion prefixes at preload time
        (VERDICT r3 item 8): the one-time O(n) per-term argpartition
        otherwise lands on the first QUERY touching the term — it was
        ~70% of cold-tail latency.  Preload is the warm-up phase of
        every serving shape (sharded shards, batch-scorer actors, the
        single reader), so moving the cost here makes cold p95 ≈ warm
        p95 without taxing the build headline the way persisting
        champion files into the layout would (and without a stale-
        champions-vs-index consistency surface).  The computation is
        byte-identical to the lazy path in ``query.search``; lazy
        per-term fill remains for terms beyond the seed cap."""
        from collections import OrderedDict

        from coderag_ray.query.search import (
            CHAMPION_C, CHAMPION_CACHE_TERMS, CHAMPION_LADDER)

        c_max = CHAMPION_C * CHAMPION_LADDER[-1]
        hot = [(t, pl) for t, pl in postings.items() if len(pl[0]) > c_max]
        hot.sort(key=lambda kv: len(kv[1][0]), reverse=True)
        champs = OrderedDict()
        # seed COLDEST-first: the champion LRU evicts first-inserted, so
        # the hottest terms (whose O(n) rebuild is the whole point of
        # preseeding) must be the most recently inserted
        for t, (ords, imps) in reversed(hot[:CHAMPION_CACHE_TERMS]):
            part = np.argpartition(-imps, c_max)
            champs[t] = {"top": (ords[part[:c_max]], imps[part[:c_max]],
                                 float(imps[part[c_max]])),
                         "rungs": {}}
        compact._champions = champs

    def partition_magnitudes(self, part_id: int) -> np.ndarray:
        """Per-chunk TF-IDF magnitudes (cosine mode); built by
        :func:`coderag_ray.index.magnitudes.build_magnitudes`."""
        h = self.partition(part_id)
        if h.magnitudes is None:
            path = os.path.join(self.part_dir(part_id), "magnitudes.parquet")
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"no magnitudes in partition {part_id}; build with "
                    "store_magnitudes=True or run build_magnitudes()"
                )
            tbl = pq.read_table(path, columns=["magnitude"])
            h.magnitudes = tbl["magnitude"].to_numpy(zero_copy_only=False).astype(np.float64)
        return h.magnitudes

    def postings_for_terms(self, part_id: int, terms: list[str]) -> dict[str, dict]:
        """term → posting-list record (encoded buffers + block metadata).

        Term-sorted parquet + row-group statistics make this an
        O(#query-terms) selective read, the analog of the reference's
        ``WHERE term IN (...)`` posting scan
        (storage-persistent.ts:715-740) without the candidate cap.
        """
        out: dict[str, dict] = {}
        missing = []
        for t in terms:
            key = (part_id, t)
            if key in self._post_cache:
                self._post_cache.move_to_end(key)
                rec = self._post_cache[key]
                if rec is not None:
                    out[t] = rec
            elif part_id in self._full_parts:
                continue  # fully resident: a cache miss means the term is absent
            else:
                missing.append(t)
        if missing:
            pf, rg_mins, rg_maxs = self._postings_file(part_id)
            # postings.parquet is term-sorted → row-group statistics form
            # sorted, disjoint term ranges; binary-search the groups that
            # can contain each query term and read only those.
            import bisect

            rgs = sorted(
                {
                    i
                    for t in missing
                    for i in [bisect.bisect_right(rg_mins, t) - 1]
                    if 0 <= i < len(rg_mins) and rg_mins[i] <= t <= rg_maxs[i]
                }
            )
            found = set()
            if rgs:
                tbl = pf.read_row_groups(rgs)
                tbl = tbl.filter(pc.field("term").isin(missing))
                for i in range(tbl.num_rows):
                    rec = {name: tbl[name][i].as_py() for name in
                           ("term", "df_local", "doc_buf", "freq_buf")}
                    for name in ("block_last_ord", "block_max_freq", "block_min_dl",
                                 "block_doc_off", "block_freq_off"):
                        rec[name] = np.asarray(tbl[name][i].as_py(), dtype=np.int64)
                    out[rec["term"]] = rec
                    found.add(rec["term"])
                    self._post_cache[(part_id, rec["term"])] = rec
            for t in missing:
                if t not in found:
                    self._post_cache[(part_id, t)] = None  # negative cache
            while len(self._post_cache) > self._post_cache_cap:
                self._post_cache.popitem(last=False)
        return out

    def _postings_file(self, part_id: int):
        """Cached ParquetFile + per-row-group (term_min, term_max) stats."""
        cached = getattr(self, "_pf_cache", None)
        if cached is None:
            cached = self._pf_cache = {}
        entry = cached.get(part_id)
        if entry is None:
            pf = pq.ParquetFile(os.path.join(self.part_dir(part_id), "postings.parquet"))
            term_idx = pf.schema_arrow.get_field_index("term")
            mins, maxs = [], []
            for rg in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(rg).column(term_idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            entry = cached[part_id] = (pf, mins, maxs)
        return entry

    def chunk_contents(self, part_id: int, ordinals: np.ndarray) -> list[str]:
        """Chunk text for a handful of ordinals — row-group-pruned: the
        ordinal IS the row index (chunks.parquet is written in ordinal
        order), so only the row groups covering the requested ordinals
        are decoded instead of the whole content column."""
        pf = pq.ParquetFile(os.path.join(self.part_dir(part_id), "chunks.parquet"))
        md = pf.metadata
        bounds = np.cumsum([md.row_group(i).num_rows for i in range(md.num_row_groups)])
        ords = np.asarray(ordinals, dtype=np.int64)
        groups = np.unique(np.searchsorted(bounds, ords, side="right"))
        tbl = pf.read_row_groups(groups.tolist(), columns=["content"])
        col = tbl["content"]
        # re-base each ordinal into the concatenated selected groups
        starts = np.r_[0, bounds[:-1]]  # first ordinal of each row group
        sel_offset = {}
        acc = 0
        for g in groups.tolist():
            sel_offset[g] = acc - int(starts[g])
            acc += md.row_group(g).num_rows
        return [
            col[int(o) + sel_offset[int(np.searchsorted(bounds, o, side="right"))]].as_py()
            for o in ords
        ]
