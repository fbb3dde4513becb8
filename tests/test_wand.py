"""Block-max WAND: exact equivalence with exhaustive scoring on every
reference query, plus evidence that it actually skips work."""

import numpy as np
import pytest

from coderag_ray.config import IndexConfig
from coderag_ray.corpus import make_corpus
from coderag_ray.index.build import build_index
from coderag_ray.index.reader import IndexReader
from coderag_ray.query.search import dedupe_query_tokens, search
from coderag_ray.query.wand import wand_topk
from coderag_ray.functions.tokenizer import tokenize

QUERIES = [
    "user", "user authentication", "authenticate user", "database connection",
    "getUserById", "validate credentials password", "self return function",
    "mergeSortedRuns posting_list", "const import export class",
    "nonexistent_term_xyz", "handleRequest parse query",
]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data

    corpus = make_corpus(n_docs=300, seed=21)
    d = str(tmp_path_factory.mktemp("wandidx"))
    build_index(ray.data.from_arrow(corpus), d, IndexConfig(num_partitions=4))
    return d


def test_wand_equals_exhaustive(built):
    # use_wand on a resident shard routes through the compact champion
    # path; the DISK traversal is what needs parity coverage, so the
    # wand side runs on a preload="never" reader
    reader = IndexReader(built)
    cold = IndexReader(built, preload="never")
    sem = ["rank", "doc_id", "chunk_id", "score", "matched_terms"]
    for q in QUERIES:
        for k in (1, 3, 10, 100):
            a = search(reader, q, k, with_doc_columns=False).select(sem)
            b = search(cold, q, k, with_doc_columns=False, use_wand=True).select(sem)
            c = search(reader, q, k, with_doc_columns=False, use_wand=True).select(sem)
            assert a.equals(b), f"q={q!r} k={k}"
            assert a.equals(c), f"compact-routed wand q={q!r} k={k}"


def test_wand_min_score_equals_exhaustive(built):
    reader = IndexReader(built)
    cold = IndexReader(built, preload="never")
    sem = ["rank", "doc_id", "chunk_id", "score"]
    for ms in (0.5, 2.0, 5.0):
        a = search(reader, "self return function", 20,
                   min_score=ms, with_doc_columns=False).select(sem)
        b = search(cold, "self return function", 20,
                   min_score=ms, with_doc_columns=False, use_wand=True).select(sem)
        assert a.equals(b), ms


def test_wand_skips_work_on_selective_query(built):
    """A rare term + hot terms with small k: WAND must evaluate far fewer
    docs than the number of matching postings."""
    reader = IndexReader(built)
    tokens = dedupe_query_tokens(tokenize("self return function const import", reader.config.tokenizer))
    idf_map = reader.idf_for_terms(tokens)
    reader.ensure_preloaded()
    total_scored = 0
    total_matching = 0
    for pid in reader.partitions:
        r = wand_topk(reader, pid, tokens, idf_map, k=3)
        total_scored += r.docs_scored
        total_matching += r.docs_total_matching
    assert total_matching > 0
    # hot terms match nearly every chunk; with k=3 WAND should prune hard
    assert total_scored < total_matching * 0.8, (total_scored, total_matching)


def test_blockmax_equals_daat_wand_per_partition(built):
    """The vectorized block-at-a-time scorer must return the same
    (ordinals, scores, matched) as the DAAT reference on every query ×
    partition × k."""
    from coderag_ray.query.wand import blockmax_topk

    reader = IndexReader(built)
    reader.ensure_preloaded()
    for q in QUERIES:
        tokens = dedupe_query_tokens(tokenize(q, reader.config.tokenizer))
        if not tokens:
            continue
        idf_map = reader.idf_for_terms(tokens)
        if not idf_map:
            continue
        for k in (1, 3, 10, 100):
            for pid in reader.partitions:
                a = wand_topk(reader, pid, tokens, idf_map, k)
                b = blockmax_topk(reader, pid, tokens, idf_map, k)
                assert (a.ordinals == b.ordinals).all(), (q, k, pid)
                assert (a.scores == b.scores).all(), (q, k, pid)
                assert (a.matched == b.matched).all(), (q, k, pid)


def test_blockmax_skips_blocks_on_selective_query(built):
    from coderag_ray.query.wand import blockmax_topk

    reader = IndexReader(built)
    tokens = dedupe_query_tokens(
        tokenize("self return function const import", reader.config.tokenizer))
    idf_map = reader.idf_for_terms(tokens)
    scored = matching = 0
    for pid in reader.partitions:
        r = blockmax_topk(reader, pid, tokens, idf_map, k=3)
        scored += r.docs_scored
        matching += r.docs_total_matching
    assert matching > 0
    assert scored < matching, (scored, matching)


def test_blockmax_flat_impacts_ties_exact(ray_session, tmp_path):
    """Adversarial for the strict UB<kth stop: a corpus where most
    impacts are IDENTICAL (every doc repeats the same words the same
    number of times) makes segment upper bounds tie with the kth score
    everywhere — tied segments must still be scored, and the final
    (score DESC, ordinal ASC) tie-break must match the exhaustive and
    DAAT paths bitwise."""
    import pyarrow as pa
    import ray.data

    from coderag_ray.config import IndexConfig
    from coderag_ray.index.build import build_index
    from coderag_ray.query.wand import blockmax_topk

    n = 600  # > POSTING_BLOCK so multiple blocks per term
    docs = pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "repo": pa.array(["r"] * n), "path": pa.array([f"p/{i}" for i in range(n)]),
        "commit": pa.array([""] * n), "lang": pa.array(["text"] * n),
        "content": pa.array(["alpha beta gamma " * 4] * n),  # identical docs
    })
    idx = str(tmp_path / "flat")
    build_index(ray.data.from_arrow(docs), idx, IndexConfig(num_partitions=2))
    reader = IndexReader(idx, preload="never")
    tokens = dedupe_query_tokens(tokenize("alpha beta", reader.config.tokenizer))
    idf_map = reader.idf_for_terms(tokens)
    for k in (1, 5, 50, 600):
        for pid in reader.partitions:
            a = wand_topk(reader, pid, tokens, idf_map, k)
            b = blockmax_topk(reader, pid, tokens, idf_map, k)
            assert (a.ordinals == b.ordinals).all(), (k, pid)
            assert (a.scores == b.scores).all(), (k, pid)
    # search-level parity too (routes through blockmax on this cold reader)
    sem = ["rank", "doc_id", "chunk_id", "score"]
    warm = IndexReader(idx)
    x = search(warm, "alpha beta", 20, with_doc_columns=False).select(sem)
    y = search(reader, "alpha beta", 20, with_doc_columns=False, use_wand=True).select(sem)
    assert x.equals(y)
