"""runs-shuffle build == groupby-shuffle build (byte-identical partitions)."""

import os

import pyarrow.parquet as pq
import pytest

from coderag_ray.config import IndexConfig
from coderag_ray.corpus import make_corpus
from coderag_ray.index.build import build_index
from coderag_ray.query.search import search


def test_runs_equals_groupby(ray_session, tmp_path):
    import ray.data

    corpus = make_corpus(n_docs=150, seed=51)
    dirs = {}
    for mode in ("runs", "groupby"):
        d = str(tmp_path / mode)
        r = build_index(ray.data.from_arrow(corpus), d,
                        IndexConfig(num_partitions=5, shuffle=mode))
        dirs[mode] = d
        assert r.n_chunks > 0

    # identical partition data files
    for pdir in sorted(os.listdir(os.path.join(dirs["runs"], "parts"))):
        for f in ("docs.parquet", "postings.parquet", "termdf.parquet", "chunks.parquet"):
            a = pq.read_table(os.path.join(dirs["runs"], "parts", pdir, f))
            b = pq.read_table(os.path.join(dirs["groupby"], "parts", pdir, f))
            assert a.equals(b), (pdir, f)
    # identical idf + identical search results
    assert pq.read_table(os.path.join(dirs["runs"], "idf")).to_pydict() == \
        pq.read_table(os.path.join(dirs["groupby"], "idf")).to_pydict()
    sem = ["rank", "doc_id", "chunk_id", "score"]
    for q in ["user authentication", "self return function", "getUserById"]:
        assert search(dirs["runs"], q, 10, with_doc_columns=False).select(sem).equals(
            search(dirs["groupby"], q, 10, with_doc_columns=False).select(sem)), q


def test_runs_dir_cleaned_after_build(ray_session, tmp_path):
    import ray.data

    d = str(tmp_path / "idx")
    build_index(ray.data.from_arrow(make_corpus(40, seed=2)), d,
                IndexConfig(num_partitions=3, shuffle="runs"))
    assert not os.path.exists(os.path.join(d, "_runs"))


def test_runs_resume_single_partition(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    corpus = make_corpus(n_docs=80, seed=8)
    d = str(tmp_path / "idx")
    cfg = IndexConfig(num_partitions=4, shuffle="runs")
    build_index(ray.data.from_arrow(corpus), d, cfg)
    contents = corpus["content"].to_pylist()
    contents[10] = contents[10] + "\nconst zz_new_symbol = 1;"
    corpus2 = corpus.set_column(
        corpus.schema.get_field_index("content"), "content", pa.array(contents)
    )
    r = build_index(ray.data.from_arrow(corpus2), d, cfg)
    assert r.dirty_partitions == 1
    res = search(d, "zz_new_symbol", 3, with_doc_columns=False)
    assert res.num_rows == 1
