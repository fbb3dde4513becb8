"""Degenerate-input edges: empty corpus, single doc, all-empty docs."""

import pyarrow as pa

from coderag_ray.config import IndexConfig
from coderag_ray.index.build import build_index
from coderag_ray.index.reader import IndexReader
from coderag_ray.query.search import search

SCHEMA = {
    "doc_id": pa.int64(), "repo": pa.string(), "path": pa.string(),
    "commit": pa.string(), "lang": pa.string(), "content": pa.string(),
}


def _corpus(rows):
    cols = {k: [] for k in SCHEMA}
    for r in rows:
        for k in SCHEMA:
            cols[k].append(r.get(k))
    return pa.table({k: pa.array(v, type=SCHEMA[k]) for k, v in cols.items()})


def test_empty_corpus(ray_session, tmp_path):
    import ray.data

    d = str(tmp_path / "idx")
    r = build_index(ray.data.from_arrow(_corpus([])), d, IndexConfig(num_partitions=3))
    assert r.n_chunks == 0 and r.avgdl == 1.0
    assert search(d, "anything", 5).num_rows == 0


def test_all_empty_docs(ray_session, tmp_path):
    import ray.data

    rows = [{"doc_id": i, "repo": "r", "path": f"p{i}", "commit": "", "lang": "x",
             "content": ""} for i in range(5)]
    d = str(tmp_path / "idx")
    r = build_index(ray.data.from_arrow(_corpus(rows)), d, IndexConfig(num_partitions=3))
    assert r.n_docs == 0 and r.n_chunks == 0  # empty docs produce no chunks
    assert search(d, "x", 5).num_rows == 0
    # resume is a no-op, not a perpetual rebuild
    r2 = build_index(ray.data.from_arrow(_corpus(rows)), d, IndexConfig(num_partitions=3))
    assert r2.dirty_partitions == 0


def test_single_doc(ray_session, tmp_path):
    import ray.data

    rows = [{"doc_id": 7, "repo": "r", "path": "a.py", "commit": "c", "lang": "python",
             "content": "def authenticate(user):\n    return user"}]
    d = str(tmp_path / "idx")
    r = build_index(ray.data.from_arrow(_corpus(rows)), d, IndexConfig(num_partitions=4))
    assert r.n_docs == 1 and r.n_chunks == 1
    res = search(d, "authenticate", 5)
    assert res.num_rows == 1 and res["doc_id"][0].as_py() == 7
    # whitespace-only doc still counts toward N (zero-token chunk)
    rows.append({"doc_id": 8, "repo": "r", "path": "b.py", "commit": "c",
                 "lang": "python", "content": "   \n  "})
    r2 = build_index(ray.data.from_arrow(_corpus(rows)), d, IndexConfig(num_partitions=4))
    assert r2.n_chunks == 2
    reader = IndexReader(d)
    assert reader.n_chunks == 2  # avgdl denominator includes the empty chunk
