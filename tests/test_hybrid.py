"""Hybrid vector+BM25 search tests (J8 merge semantics, ST3 mock provider)."""

import pytest

from coderag_ray.config import IndexConfig
from coderag_ray.corpus import make_corpus
from coderag_ray.index.build import build_index
from coderag_ray.index.reader import IndexReader
from coderag_ray.pipelines.hybrid import build_embeddings, hybrid_search, vector_topk
from coderag_ray.query.search import search


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data

    d = str(tmp_path_factory.mktemp("hyidx"))
    build_index(ray.data.from_arrow(make_corpus(120, seed=9)), d,
                IndexConfig(num_partitions=3))
    n = build_embeddings(d, dimensions=32)
    return d, n


def test_embeddings_cover_all_chunks(built):
    d, n = built
    reader = IndexReader(d)
    assert n == reader.n_chunks


def test_vector_topk_shape_and_order(built):
    d, _ = built
    reader = IndexReader(d)
    out = vector_topk(reader, "database connection", 5, dimensions=32)
    assert out.num_rows == 5
    sims = out["similarity"].to_pylist()
    assert sims == sorted(sims, reverse=True)


def test_hybrid_weights(built):
    d, _ = built
    reader = IndexReader(d)
    # vw=0 → pure BM25 ranking
    h0 = hybrid_search(reader, "validate credentials", 5, vector_weight=0.0,
                       dimensions=32)
    bm = search(reader, "validate credentials", 5, with_doc_columns=False)
    assert h0["doc_id"].to_pylist() == bm["doc_id"].to_pylist()
    # vw=1 → pure vector ranking
    h1 = hybrid_search(reader, "validate credentials", 5, vector_weight=1.0,
                       dimensions=32)
    v = vector_topk(reader, "validate credentials", 5, dimensions=32)
    assert h1["doc_id"].to_pylist() == v["doc_id"].to_pylist()
    # mixed: fused score ≤ 1 (max-normalized each side), methods labeled
    h = hybrid_search(reader, "validate credentials", 10, vector_weight=0.5,
                      dimensions=32)
    assert max(h["score"].to_pylist()) <= 1.0 + 1e-12
    assert set(h["method"].to_pylist()) <= {"vector", "tfidf", "hybrid"}


def test_ann_candidate_generator_matches_bruteforce_top1(ray_session, tmp_path):
    """build_vector_ann + vector_topk_ann: probes the LSH bucket layout,
    exact-cosine-verifies candidates; the fallback (no index) is the
    exact scan. Hybrid search can source candidates from it via use_ann."""
    import os

    from coderag_ray.config import IndexConfig
    from coderag_ray.corpus import corpus_from_documents
    from coderag_ray.index.build import build_index
    from coderag_ray.index.reader import IndexReader
    from coderag_ray.pipelines.hybrid import (
        ANN_DIRNAME,
        build_embeddings,
        build_vector_ann,
        hybrid_search,
        vector_topk,
        vector_topk_ann,
    )

    idx = str(tmp_path / "annidx")
    build_index(corpus_from_documents("/root/testdata/sf0.001"), idx,
                IndexConfig(tokenizer="simple", num_partitions=4))
    build_embeddings(idx, dimensions=32)
    reader = IndexReader(idx)

    # fallback before the ANN index exists → identical to exact scan
    q = "customer data row"
    exact = vector_topk(reader, q, 5, dimensions=32)
    fb = vector_topk_ann(reader, q, 5, dimensions=32)
    assert fb.equals(exact)

    n = build_vector_ann(idx, dimensions=32)
    assert n > 0 and os.path.isdir(os.path.join(idx, ANN_DIRNAME))
    ann = vector_topk_ann(reader, q, 5, dimensions=32).to_pandas()
    # every ANN similarity is an exact cosine of a real chunk: it must
    # appear in the exact ranking with the same score
    ex = exact.to_pandas()
    exmap = {(r.doc_id, r.chunk_id): r.similarity for r in ex.itertuples()}
    for r in ann.itertuples():
        if (r.doc_id, r.chunk_id) in exmap:
            assert abs(exmap[(r.doc_id, r.chunk_id)] - r.similarity) < 1e-12
    # sims sorted desc
    assert (ann.similarity.to_numpy()[:-1] >= ann.similarity.to_numpy()[1:] - 1e-15).all()

    res = hybrid_search(reader, q, 5, dimensions=32, use_ann=True)
    assert res.num_rows > 0
    assert set(res.column_names) >= {"doc_id", "chunk_id", "score", "method"}
