"""Single-process exhaustive BM25 oracle — the rank-parity spec.

An independent, deliberately simple implementation of the whole
index+search semantics (dict-of-Counters, no Arrow, no Ray, no posting
lists) against which the distributed engine must be **exactly** equal:
same top-k (doc_id, chunk_id) in the same order AND bitwise-identical
float64 scores, on every query (BASELINE.md "rank parity").

It mirrors the reference's in-memory path
(``/root/reference/packages/core/src/tfidf.ts:354-427``
``searchDocuments`` — the exhaustive one, not the candidate-capped SQL
path) with the frozen decisions of SURVEY.md §7.0: chunk-level
documents, smoothed IDF, dl floor 1, avgdl over all chunks including
empty ones, query-order score summation, tie-break
``(score DESC, doc_id ASC, chunk_id ASC)``.

Only the *pure per-row spec functions* (tokenizer, chunker, BM25
kernel) are shared with the engine — the indexing and scoring machinery
here is written independently of the Ray pipeline it validates.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass

from coderag_ray.config import IndexConfig
from coderag_ray.functions.bm25 import avg_doc_length, bm25_term_score, idf_smoothed
from coderag_ray.functions.chunker import chunk_text
from coderag_ray.functions.tokenizer import tokenize


@dataclass
class OracleChunk:
    doc_id: int
    chunk_id: int
    tf: Counter
    token_count: int
    path: str


class OracleIndex:
    def __init__(self, config: IndexConfig | None = None):
        self.config = config or IndexConfig()
        self.chunks: list[OracleChunk] = []
        self.df: Counter = Counter()

    @staticmethod
    def from_rows(rows, config: IndexConfig | None = None) -> "OracleIndex":
        """rows: iterable of dicts with doc_id, path, content (corpus schema)."""
        cfg = config or IndexConfig()
        idx = OracleIndex(cfg)
        for row in rows:
            content = row["content"]
            if len(content.encode("utf-8")) > cfg.max_file_size:
                continue  # utils.ts:206-208 size filter
            for ci, chunk in enumerate(
                chunk_text(content, cfg.max_chunk_size, cfg.chunk_overlap)
            ):
                tf = Counter(tokenize(chunk, cfg.tokenizer,
                      getattr(cfg, "bpe_vocab_path", None)))
                idx.chunks.append(
                    OracleChunk(
                        doc_id=int(row["doc_id"]),
                        chunk_id=ci,
                        tf=tf,
                        token_count=sum(tf.values()),
                        path=row.get("path", ""),
                    )
                )
                for term in tf:
                    idx.df[term] += 1
        return idx

    @property
    def n_chunks(self) -> int:
        return len(self.chunks)

    def avgdl(self) -> float:
        return avg_doc_length(sum(c.token_count for c in self.chunks), self.n_chunks)

    def idf(self, term: str) -> float:
        # missing term → idf of df=0; never consulted for unmatched terms
        return idf_smoothed(self.df[term], self.n_chunks)

    def search(self, query: str, k: int = 10, min_score: float = 0.0):
        """→ list of (doc_id, chunk_id, score, matched_terms)."""
        tokens = list(dict.fromkeys(tokenize(query, self.config.tokenizer,
                                     getattr(self.config, "bpe_vocab_path", None))))  # tfidf.ts:28
        if not tokens or not self.chunks:
            return []
        avgdl = self.avgdl()
        idf = {t: self.idf(t) for t in tokens}
        results = []
        for c in self.chunks:
            matched = [t for t in tokens if t in c.tf]
            if not matched:
                continue
            dl = max(c.token_count, 1)  # tfidf.ts:400
            score = 0.0
            for t in matched:  # query order — tfidf.ts:405-412
                score += bm25_term_score(c.tf[t], idf[t], dl, avgdl)
            if score < min_score:
                continue
            results.append((c.doc_id, c.chunk_id, score, matched))
        results.sort(key=lambda r: (-r[2], r[0], r[1]))
        return results[:k]

    def search_cosine(self, query: str, k: int = 10, min_score: float = 0.0):
        """Cosine-similarity ranking — tfidf.ts:160-212 semantics:
        vectors are tfidf = (rawFreq/totalTerms) * idf; cos = dot/( |q||d| ),
        0 when either magnitude is 0; same frozen tie-break."""
        all_toks = tokenize(query, self.config.tokenizer,
                    getattr(self.config, "bpe_vocab_path", None))
        uniq = list(dict.fromkeys(all_toks))
        if not uniq or not self.chunks:
            return []
        total = float(len(all_toks))
        counts = Counter(all_toks)
        idf = {t: self.idf(t) if self.df[t] > 0 else 0.0 for t in uniq}
        q_vec = {t: (counts[t] / total) * idf[t] for t in uniq}
        import math

        qmag = math.sqrt(sum(v * v for v in q_vec.values()))
        results = []
        for c in self.chunks:
            matched = [t for t in uniq if t in c.tf]
            if not matched:
                continue
            dl = max(c.token_count, 1)
            # sorted term order matches the engine's term-sorted postings
            # accumulation → bitwise-equal magnitudes (ASCII terms: python
            # str order == Arrow UTF-8 byte order)
            dmag_sq = 0.0
            for t in sorted(c.tf):
                v = (c.tf[t] / dl) * self.idf(t)
                dmag_sq += v * v
            dmag = math.sqrt(dmag_sq)
            dot = 0.0
            for t in uniq:  # query-vector order
                if t in c.tf and q_vec[t] != 0.0:
                    dot += q_vec[t] * ((c.tf[t] / dl) * idf[t])
            score = dot / (qmag * dmag) if qmag > 0 and dmag > 0 else 0.0
            if score < min_score:
                continue
            results.append((c.doc_id, c.chunk_id, score, matched))
        results.sort(key=lambda r: (-r[2], r[0], r[1]))
        return results[:k]

    def term_df_table(self) -> dict[str, int]:
        return dict(self.df)
