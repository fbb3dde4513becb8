"""End-to-end: distributed build → BM25 search, with exact rank/score
parity against the single-process oracle (the correctness spine,
SURVEY.md §5) and the per-row content-sha256 invariant."""

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from coderag_ray.config import IndexConfig
from coderag_ray.corpus import make_corpus
from coderag_ray.index.build import build_index
from coderag_ray.index.reader import IndexReader
from coderag_ray.oracle import OracleIndex
from coderag_ray.query.search import SearchFilters, dedupe_query_tokens, search

QUERIES = [
    "user", "user authentication", "authenticate user", "user name",
    "database connection", "connect", "handleRequest", "async function error",
    "getUserById", "validate credentials password", "class admin permissions",
    "nonexistent_term_xyz", "", "self return function", "mergeSortedRuns posting_list",
]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    corpus = make_corpus(n_docs=200, seed=42)
    index_dir = str(tmp_path_factory.mktemp("idx"))
    import ray.data

    cfg = IndexConfig(num_partitions=5)
    report = build_index(ray.data.from_arrow(corpus), index_dir, cfg)
    oracle = OracleIndex.from_rows(corpus.to_pylist(), cfg)
    return corpus, index_dir, report, oracle


def test_build_report_counts(built):
    corpus, index_dir, report, oracle = built
    assert report.n_chunks == oracle.n_chunks
    assert report.total_tokens == sum(c.token_count for c in oracle.chunks)
    assert report.n_docs == len({c.doc_id for c in oracle.chunks})
    assert report.dirty_partitions == 5
    # oversize docs filtered, empty docs chunkless
    assert report.n_docs < 200


def test_avgdl_and_idf_match_oracle(built):
    corpus, index_dir, report, oracle = built
    reader = IndexReader(index_dir)
    assert reader.avgdl == oracle.avgdl()
    assert reader.n_chunks == oracle.n_chunks
    # spot-check idf of hot + rare + missing terms
    terms = ["self", "return", "function", "getuserbyid", "zzz_never_seen"]
    got = reader.idf_for_terms(terms)
    for t in terms[:4]:
        assert t in got, t
        df, idf = got[t]
        assert df == oracle.df[t]
        assert idf == oracle.idf(t)
    assert "zzz_never_seen" not in got


def test_full_idf_table_matches_oracle(built):
    corpus, index_dir, report, oracle = built
    idf_tbl = pq.read_table(os.path.join(index_dir, "idf"))
    got = dict(zip(idf_tbl["term"].to_pylist(), idf_tbl["df"].to_pylist()))
    assert got == oracle.term_df_table()
    # sorted by term for pushdown
    terms = idf_tbl["term"].to_pylist()
    assert terms == sorted(terms)


def test_rank_parity_exact(built):
    corpus, index_dir, report, oracle = built
    reader = IndexReader(index_dir)
    for q in QUERIES:
        for k in (1, 5, 10, 50):
            expected = oracle.search(q, k)
            got = search(reader, q, k, with_doc_columns=False)
            got_rows = list(
                zip(got["doc_id"].to_pylist(), got["chunk_id"].to_pylist(),
                    got["score"].to_pylist())
            )
            exp_rows = [(d, c, s) for d, c, s, _ in expected]
            assert got_rows == exp_rows, f"query={q!r} k={k}"


def test_matched_terms(built):
    corpus, index_dir, report, oracle = built
    got = search(IndexReader(index_dir), "user authentication", 5, with_doc_columns=False)
    exp = oracle.search("user authentication", 5)
    for row_terms, (_, _, _, exp_terms) in zip(got["matched_terms"].to_pylist(), exp):
        assert row_terms == exp_terms


def test_sha256_invariant_through_stages(built):
    """North-rule invariant: per-row content sha256 equality at every stage."""
    corpus, index_dir, report, oracle = built
    src_sha = {
        int(d): hashlib.sha256(c.encode()).hexdigest()
        for d, c in zip(corpus["doc_id"].to_pylist(), corpus["content"].to_pylist())
    }
    seen_docs = set()
    for pdir in sorted(os.listdir(os.path.join(index_dir, "parts"))):
        docs = pq.read_table(os.path.join(index_dir, "parts", pdir, "docs.parquet"))
        chunks = pq.read_table(os.path.join(index_dir, "parts", pdir, "chunks.parquet"))
        contents = chunks["content"].to_pylist()
        for i in range(docs.num_rows):
            did = docs["doc_id"][i].as_py()
            seen_docs.add(did)
            # doc-level sha carried intact
            assert docs["content_sha256"][i].as_py() == src_sha[did]
            # chunk-level sha re-verifies stored chunk content
            assert (
                hashlib.sha256(contents[i].encode()).hexdigest()
                == docs["chunk_sha256"][i].as_py()
            )
            # offsets reassemble into the source doc
            s, e = docs["start_offset"][i].as_py(), docs["end_offset"][i].as_py()
            src = corpus["content"][corpus["doc_id"].to_pylist().index(did)].as_py()
            assert src[s:e] == contents[i]
    assert len(seen_docs) == report.n_docs


def test_search_filters(built):
    corpus, index_dir, report, oracle = built
    reader = IndexReader(index_dir)
    res = search(reader, "function", 20, filters=SearchFilters(file_extensions=[".py"]))
    assert res.num_rows > 0
    assert all(p.endswith(".py") for p in res["path"].to_pylist())
    res2 = search(reader, "function", 20, filters=SearchFilters(exclude_paths=["src/"]))
    assert res2.num_rows == 0  # every path is under src/


def test_parallel_matches_serial(built):
    corpus, index_dir, report, oracle = built
    reader = IndexReader(index_dir)
    a = search(reader, "database connection", 10, with_doc_columns=False, parallel=False)
    b = search(reader, "database connection", 10, with_doc_columns=False, parallel=True)
    assert a.equals(b)


def test_partition_count_invariance(ray_session, tmp_path):
    """Identical results at P=1 and P=7 — merge correctness."""
    import ray.data

    corpus = make_corpus(n_docs=60, seed=7)
    dirs = {}
    for p in (1, 7):
        d = str(tmp_path / f"idx{p}")
        build_index(ray.data.from_arrow(corpus), d, IndexConfig(num_partitions=p))
        dirs[p] = d
    sem = ["rank", "doc_id", "chunk_id", "score", "matched_terms"]
    for q in ["user authentication", "self return", "getUserById"]:
        r1 = search(dirs[1], q, 10, with_doc_columns=False).select(sem)
        r7 = search(dirs[7], q, 10, with_doc_columns=False).select(sem)
        assert r1.equals(r7), q  # part_id/ordinal legitimately differ


def test_dedupe_query_tokens():
    assert dedupe_query_tokens(["a", "b", "a", "c", "b"]) == ["a", "b", "c"]
