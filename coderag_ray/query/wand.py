"""Block-max WAND top-k scoring over one index partition.

Document-at-a-time traversal with two pruning levels, per the classic
WAND / Block-Max-WAND design (Broder et al. 2003; Ding & Suel 2011 —
public literature, see PAPERS.md):

- a per-term global upper bound (max over its block bounds) drives
  pivot selection: cursors are kept sorted by current doc; the pivot is
  the first position where the cumulative upper bound exceeds the
  heap threshold — docs before the pivot cannot make top-k and are
  skipped wholesale via ``seek``.
- per-block upper bounds (``block_max_freq`` / ``block_min_dl`` stored
  at index time, combined with idf/avgdl at query time — a valid bound
  because the BM25 kernel is monotone ↑ in tf and ↓ in dl) refine the
  check at the pivot before full evaluation, and ``seek`` decodes only
  the v-byte block containing the target (block-aligned byte offsets).

Results are **exactly** the exhaustive top-k: traversal visits docs in
ascending (doc_id, chunk_id) order, so the strict ``score > threshold``
replacement rule implements the frozen tie-break (score DESC, doc ASC)
— a later equal-scoring doc always loses.  Scores are computed with the
same shared kernel in the same query-term order as the exhaustive path,
hence bitwise-identical.  pytest asserts WAND == exhaustive on every
query.

On a single partition of a small index the vectorized exhaustive path
is faster (numpy beats a Python DAAT loop); WAND is the scale path —
its value is the *postings skipped*, which ``WandResult.blocks_decoded``
/ ``docs_scored`` expose for the tests and bench to verify.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field

import numpy as np

from coderag_ray.functions import varint
from coderag_ray.functions.bm25 import bm25_term_score
from coderag_ray.index.reader import IndexReader

_SENTINEL = np.iinfo(np.int64).max


class _Cursor:
    __slots__ = ("rec", "idf", "avgdl", "k1", "b", "block_last", "block_ub",
                 "term_ub", "n_blocks", "df", "cur_block", "ords", "freqs",
                 "pos", "doc", "blocks_decoded")

    def __init__(self, rec: dict, idf: float, dls_eff: np.ndarray, avgdl: float,
                 k1: float, b: float):
        self.rec = rec
        self.idf = idf
        self.avgdl = avgdl
        self.k1 = k1
        self.b = b
        self.block_last = rec["block_last_ord"]
        self.n_blocks = len(self.block_last)
        self.df = int(rec["df_local"])
        # block upper bounds: kernel at (max_freq, min_dl) — monotone bound
        self.block_ub = bm25_term_score(
            rec["block_max_freq"].astype(np.float64), idf,
            np.maximum(rec["block_min_dl"], 1).astype(np.float64), avgdl, k1, b,
        )
        self.term_ub = float(self.block_ub.max()) if self.n_blocks else 0.0
        self.cur_block = -1
        self.ords: np.ndarray | None = None
        self.freqs: np.ndarray | None = None
        self.pos = 0
        self.blocks_decoded = 0
        self.doc = -1
        self._load_block(0)
        self.doc = int(self.ords[0])

    def _block_size(self, b: int) -> int:
        from coderag_ray.config import POSTING_BLOCK

        return min(POSTING_BLOCK, self.df - b * POSTING_BLOCK)

    def _load_block(self, b: int) -> None:
        base = int(self.block_last[b - 1]) if b > 0 else 0
        size = self._block_size(b)
        self.ords = varint.decode_deltas(
            self.rec["doc_buf"], offset=int(self.rec["block_doc_off"][b]),
            count=size, base=base,
        ).astype(np.int64)
        self.freqs = varint.decode(
            self.rec["freq_buf"], offset=int(self.rec["block_freq_off"][b]), count=size
        ).astype(np.float64)
        self.cur_block = b
        self.pos = 0
        self.blocks_decoded += 1

    def seek(self, target: int) -> None:
        """Advance to the first posting with ordinal >= target."""
        if self.doc >= target:
            return
        b = int(np.searchsorted(self.block_last, target, side="left"))
        if b >= self.n_blocks:
            self.doc = _SENTINEL
            return
        if b != self.cur_block:
            self._load_block(b)
        self.pos = int(np.searchsorted(self.ords[self.pos:], target) + self.pos) \
            if b == self.cur_block else int(np.searchsorted(self.ords, target))
        if self.pos >= len(self.ords):  # within-block overshoot → next block
            if b + 1 >= self.n_blocks:
                self.doc = _SENTINEL
                return
            self._load_block(b + 1)
        self.doc = int(self.ords[self.pos])

    def advance(self) -> None:
        self.pos += 1
        if self.pos >= len(self.ords):
            if self.cur_block + 1 >= self.n_blocks:
                self.doc = _SENTINEL
                return
            self._load_block(self.cur_block + 1)
        self.doc = int(self.ords[self.pos])

    def block_ub_at(self, target: int) -> float:
        b = int(np.searchsorted(self.block_last, target, side="left"))
        return float(self.block_ub[b]) if b < self.n_blocks else 0.0

    def score_current(self, dls_eff: np.ndarray) -> float:
        return bm25_term_score(
            float(self.freqs[self.pos]), self.idf, float(dls_eff[self.doc]),
            self.avgdl, self.k1, self.b,
        )


@dataclass
class WandResult:
    ordinals: np.ndarray
    scores: np.ndarray
    matched: np.ndarray  # bitmask in query-token order
    docs_scored: int = 0
    blocks_decoded: int = 0
    docs_total_matching: int = 0  # Σ df_local over query terms (upper bound)


def wand_topk(
    reader: IndexReader,
    part_id: int,
    tokens: list[str],
    idf_map: dict[str, tuple[int, float]],
    k: int,
    min_score: float = 0.0,
) -> WandResult:
    """Exact top-k of one partition via block-max WAND."""
    h = reader.partition(part_id)
    recs = reader.postings_for_terms(part_id, [t for t in tokens if t in idf_map])
    dls_eff = np.maximum(h.dls, 1).astype(np.float64)
    k1, b = reader.config.k1, reader.config.b

    cursors: list[tuple[int, _Cursor]] = []  # (query_index, cursor)
    for qi, tok in enumerate(tokens):
        rec = recs.get(tok)
        if rec is not None and rec["df_local"] > 0:
            cursors.append((qi, _Cursor(rec, idf_map[tok][1], dls_eff,
                                        reader.avgdl, k1, b)))
    empty = WandResult(
        np.empty(0, dtype=np.int64), np.empty(0), np.empty(0, dtype=np.int64)
    )
    if not cursors:
        return empty

    heap: list[tuple[float, int]] = []  # min-heap of (score, -ordinal)
    results: dict[int, tuple[float, int]] = {}  # ordinal → (score, matched_mask)
    docs_scored = 0
    total_matching = sum(c.df for _, c in cursors)

    def threshold() -> float:
        return heap[0][0] if len(heap) >= k else min_score - 1.0

    while True:
        live = [(qi, c) for qi, c in cursors if c.doc != _SENTINEL]
        if not live:
            break
        live.sort(key=lambda t: t[1].doc)
        # pivot: first prefix whose Σ term_ub can beat the threshold
        th = threshold()
        acc = 0.0
        pivot = -1
        for i, (qi, c) in enumerate(live):
            acc += c.term_ub
            if acc > th:
                pivot = i
                break
        if pivot == -1:
            break  # nothing can make top-k anymore
        pivot_doc = live[pivot][1].doc
        if live[0][1].doc == pivot_doc:
            # block-max refinement at the pivot doc — over EVERY cursor
            # currently at this doc (cursors past the pivot index may tie
            # on the doc and still contribute; excluding them would
            # underestimate the bound and wrongly prune)
            bub = sum(c.block_ub_at(pivot_doc) for qi, c in live
                      if c.doc == pivot_doc)
            if bub > th:
                score = 0.0
                mask = 0
                for qi, c in sorted(
                    (t for t in live if t[1].doc == pivot_doc), key=lambda t: t[0]
                ):  # query order — float determinism
                    score += c.score_current(dls_eff)
                    mask |= 1 << qi
                docs_scored += 1
                if score >= min_score and (len(heap) < k or score > heap[0][0]):
                    if len(heap) == k:
                        old = heapq.heappushpop(heap, (score, -pivot_doc))
                        results.pop(-old[1], None)
                    else:
                        heapq.heappush(heap, (score, -pivot_doc))
                    results[pivot_doc] = (score, mask)
                for qi, c in live:
                    if c.doc == pivot_doc:
                        c.advance()
            else:
                # BMW "shallow move" (Ding & Suel 2011): every candidate
                # cursor sits AT pivot_doc (live is doc-sorted and
                # live[0] ties the pivot), and each one's bound holds for
                # its whole current block — so every doc up to the
                # shortest such block's end is bounded by bub ≤ threshold
                # and cannot enter the top-k.  Jump there wholesale
                # (bounded by the next distinct live doc, whose cursor's
                # block we have NOT bounded) instead of advancing one
                # posting at a time.
                jump = min(int(c.block_last[c.cur_block]) + 1
                           for qi, c in live if c.doc == pivot_doc)
                nxt = next((c.doc for qi, c in live if c.doc != pivot_doc),
                           _SENTINEL)
                target = min(jump, nxt)
                for qi, c in live:
                    if c.doc == pivot_doc:
                        c.seek(target)
        else:
            # skip every cursor before the pivot up to the pivot doc
            for qi, c in live[:pivot]:
                c.seek(pivot_doc)

    if not results:
        return empty
    ords = np.array(sorted(results), dtype=np.int64)
    return WandResult(
        ordinals=ords,
        scores=np.array([results[o][0] for o in ords]),
        matched=np.array([results[o][1] for o in ords], dtype=np.int64),
        docs_scored=docs_scored,
        blocks_decoded=sum(c.blocks_decoded for _, c in cursors),
        docs_total_matching=total_matching,
    )

def blockmax_topk(
    reader: IndexReader,
    part_id: int,
    tokens: list[str],
    idf_map: dict[str, tuple[int, float]],
    k: int,
    min_score: float = 0.0,
) -> WandResult:
    """Exact top-k via VECTORIZED block-max pruning (VERDICT r3 item 6
    — the doc-at-a-time loop above is parity/skip-count reference; this
    is the latency path for ``use_wand=True``).

    Segment formulation: the union of every term's block-end ordinals
    partitions the partition's ordinal space into segments, and within
    a segment each term stays inside ONE posting block — so the
    segment's upper bound is a sum of constant block bounds.  Segments
    are scored in UB-descending order with numpy (decode block → slice
    → gather-add, same float expression tree and query-term order as
    the exhaustive path), and scoring stops when the best remaining
    UB is STRICTLY below the current k-th candidate score: every chunk
    ordinal lives in exactly one segment, so scored segments carry
    complete scores, and an unscored doc has score ≤ UB < kth — it can
    neither enter the top-k nor tie into it (ties must be scored, hence
    the strict stop).  Results are bitwise-identical to the exhaustive
    scorer; ``blocks_decoded``/``docs_scored`` expose the pruning.
    """
    h = reader.partition(part_id)
    recs = reader.postings_for_terms(part_id, [t for t in tokens if t in idf_map])
    dls_eff = np.maximum(h.dls, 1).astype(np.float64)
    k1, b = reader.config.k1, reader.config.b

    terms = []  # (qi, rec, idf, block_last:int64[], block_ub:float64[])
    for qi, tok in enumerate(tokens):
        rec = recs.get(tok)
        if rec is None or rec["df_local"] <= 0:
            continue
        idf = idf_map[tok][1]
        ub = bm25_term_score(
            rec["block_max_freq"].astype(np.float64), idf,
            np.maximum(rec["block_min_dl"], 1).astype(np.float64),
            reader.avgdl, k1, b,
        )
        terms.append((qi, rec, idf, rec["block_last_ord"].astype(np.int64), ub))
    empty = WandResult(
        np.empty(0, dtype=np.int64), np.empty(0), np.empty(0, dtype=np.int64)
    )
    if not terms or k <= 0:
        return empty
    total_matching = sum(int(rec["df_local"]) for _, rec, _, _, _ in terms)

    # segment ends = union of block-end ordinals (inclusive);
    # segment i covers (edges[i-1], edges[i]]
    edges = np.unique(np.concatenate([bl for _, _, _, bl, _ in terms]))
    seg_ub = np.zeros(len(edges))
    seg_block = np.full((len(terms), len(edges)), -1, dtype=np.int64)
    for ti, (qi, rec, idf, bl, ub) in enumerate(terms):
        j = np.searchsorted(bl, edges, side="left")
        valid = j < len(bl)
        seg_ub[valid] += ub[j[valid]]
        seg_block[ti, valid] = j[valid]

    order = np.argsort(-seg_ub, kind="stable")
    # bounded per-term decoded-block cache: segments arrive in UB order,
    # not ordinal order, so a block can be touched by several segments —
    # but caching every decoded block would materialize the full posting
    # lists in RAM, the exact condition that routed the query to this
    # disk path.  Small FIFO per term; a miss re-decodes one block.
    from collections import OrderedDict as _OD

    DEC_CACHE_BLOCKS = 16
    dec_cache: list[_OD] = [_OD() for _ in terms]
    blocks_decoded = 0
    docs_scored = 0
    cand_ords: list[np.ndarray] = []
    cand_scores: list[np.ndarray] = []
    cand_masks: list[np.ndarray] = []
    n_cand = 0
    kth = min_score - 1.0  # segments with UB < min_score can never contribute
    have_k = k <= 0

    for si in order:
        if have_k and not (seg_ub[si] >= kth):  # strict stop: UB < kth
            break
        lo_excl = int(edges[si - 1]) if si > 0 else -1
        hi_incl = int(edges[si])
        width = hi_incl - lo_excl
        scores_seg = np.zeros(width)
        mask_seg = np.zeros(width, dtype=np.int64)
        for ti, (qi, rec, idf, bl, ub) in enumerate(terms):
            j = int(seg_block[ti, si])
            if j < 0:
                continue
            blk = dec_cache[ti].get(j)
            if blk is None:
                from coderag_ray.config import POSTING_BLOCK

                size = min(POSTING_BLOCK, int(rec["df_local"]) - j * POSTING_BLOCK)
                base = int(bl[j - 1]) if j > 0 else 0
                ords_j = varint.decode_deltas(
                    rec["doc_buf"], offset=int(rec["block_doc_off"][j]),
                    count=size, base=base,
                ).astype(np.int64)
                freqs_j = varint.decode(
                    rec["freq_buf"], offset=int(rec["block_freq_off"][j]), count=size
                ).astype(np.float64)
                blk = dec_cache[ti][j] = (ords_j, freqs_j)
                if len(dec_cache[ti]) > DEC_CACHE_BLOCKS:
                    dec_cache[ti].popitem(last=False)
                blocks_decoded += 1
            ords_j, freqs_j = blk
            a = int(np.searchsorted(ords_j, lo_excl, side="right"))
            z = int(np.searchsorted(ords_j, hi_incl, side="right"))
            if a == z:
                continue
            sl_ords = ords_j[a:z]
            ts = bm25_term_score(freqs_j[a:z], idf, dls_eff[sl_ords],
                                 reader.avgdl, k1, b)
            idxs = sl_ords - (lo_excl + 1)
            scores_seg[idxs] += ts
            mask_seg[idxs] |= np.int64(1 << qi)
            docs_scored += z - a
        nz = np.flatnonzero(mask_seg)
        if len(nz) == 0:
            continue
        cand_ords.append(nz + (lo_excl + 1))
        cand_scores.append(scores_seg[nz])
        cand_masks.append(mask_seg[nz])
        n_cand += len(nz)
        if n_cand >= k and k > 0:
            # recompute kth, then PRUNE the accumulation to scores >= kth
            # (ties kept for the ordinal tie-break): anything below kth
            # can never re-enter the top-k since kth only rises, and the
            # prune keeps each recompute O(current survivors), not
            # O(total candidates ever seen) — quadratic otherwise on
            # non-selective queries
            allsc = np.concatenate(cand_scores) if len(cand_scores) > 1 else cand_scores[0]
            kth = np.partition(allsc, len(allsc) - k)[len(allsc) - k]
            have_k = True
            keep_mask = allsc >= kth
            all_ords = np.concatenate(cand_ords) if len(cand_ords) > 1 else cand_ords[0]
            all_masks = np.concatenate(cand_masks) if len(cand_masks) > 1 else cand_masks[0]
            cand_ords = [all_ords[keep_mask]]
            cand_scores = [allsc[keep_mask]]
            cand_masks = [all_masks[keep_mask]]
            n_cand = len(cand_ords[0])

    if not cand_ords:
        return empty
    ords = np.concatenate(cand_ords)
    scores = np.concatenate(cand_scores)
    masks = np.concatenate(cand_masks)
    keep = scores >= min_score
    ords, scores, masks = ords[keep], scores[keep], masks[keep]
    if len(ords) == 0:
        return empty
    sel = np.lexsort((ords, -scores))[:k]  # score DESC, ordinal ASC — the frozen tie-break
    sel = sel[np.argsort(ords[sel], kind="stable")]  # ascending-ordinal layout like DAAT
    return WandResult(
        ordinals=ords[sel],
        scores=scores[sel],
        matched=masks[sel],
        docs_scored=docs_scored,
        blocks_decoded=blocks_decoded,
        docs_total_matching=total_matching,
    )
