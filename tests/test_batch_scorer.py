"""BatchScorer actor-pool stage + incremental deletion semantics."""

import numpy as np
import pyarrow as pa
import pytest

from coderag_ray.config import IndexConfig
from coderag_ray.corpus import make_corpus
from coderag_ray.index.build import build_index
from coderag_ray.index.reader import IndexReader
from coderag_ray.query.search import BatchScorer, search


def test_batch_scorer_matches_single_search(ray_session, tmp_path):
    import ray.data

    d = str(tmp_path / "idx")
    build_index(ray.data.from_arrow(make_corpus(100, seed=13)), d,
                IndexConfig(num_partitions=3))
    queries = ["user authentication", "database connection", "getUserById",
               "self return", "nonexistent_zzz"]
    qds = ray.data.from_arrow(
        pa.table({"query_id": pa.array(range(len(queries)), type=pa.int64()),
                  "text": pa.array(queries)})
    )
    out = qds.map_batches(
        BatchScorer, fn_constructor_args=(d, 5), batch_format="pyarrow",
        batch_size=2, concurrency=2,
    ).to_pandas()
    reader = IndexReader(d)
    for qid, q in enumerate(queries):
        exp = search(reader, q, 5, with_doc_columns=False)
        got = out[out.query_id == qid].sort_values("rank")
        assert list(got.doc_id) == exp["doc_id"].to_pylist(), q
        assert np.allclose(got.score.to_numpy(), exp["score"].to_numpy(), rtol=0, atol=0)


def test_deleted_docs_leave_index_and_idf(ray_session, tmp_path):
    """Deleted-file sync analog (indexer.ts:455-464 / D4): rebuilding with
    a doc removed rebuilds only its partition and shrinks N/df."""
    import ray.data

    corpus = make_corpus(90, seed=17)
    d = str(tmp_path / "idx")
    cfg = IndexConfig(num_partitions=4)
    r1 = build_index(ray.data.from_arrow(corpus), d, cfg)

    # find a doc matching a rare query, then delete it
    res = search(d, "authenticate", 1, with_doc_columns=False)
    victim = int(res["doc_id"][0].as_py())
    keep = [i for i, did in enumerate(corpus["doc_id"].to_pylist()) if did != victim]
    corpus2 = corpus.take(pa.array(keep))

    r2 = build_index(ray.data.from_arrow(corpus2), d, cfg)
    assert r2.dirty_partitions == 1
    assert r2.n_docs == r1.n_docs - 1
    assert r2.n_chunks < r1.n_chunks

    res2 = search(d, "authenticate", 50, with_doc_columns=False)
    assert victim not in res2["doc_id"].to_pylist()

    # idf table reflects the new corpus exactly (fresh-build equivalence)
    import os
    import pyarrow.parquet as pq

    d_fresh = str(tmp_path / "fresh")
    build_index(ray.data.from_arrow(corpus2), d_fresh, cfg)
    a = pq.read_table(os.path.join(d, "idf")).to_pydict()
    b = pq.read_table(os.path.join(d_fresh, "idf")).to_pydict()
    assert a == b
