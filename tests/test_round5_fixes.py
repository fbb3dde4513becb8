"""Round-5 verdict items: schema stability on empty/degenerate inputs
(every map_groups / filter-heavy pipeline keeps its documented columns —
Ray drops empty blocks, see functions/datasets.py), the distributed
top-k reduction in knn_bruteforce, and the Dataset-returning distributed
CC labeling branch."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events_table(rows=()):
    """(event_id, ts, user_id, event_type, value) — the events shape."""
    n = len(rows)
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array(pd.to_datetime([r[1] * 1_000_000 for r in rows],
                                      unit="us").astype("datetime64[us]")),
        "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[3] for r in rows], type=pa.string()),
        "value": pa.array([r[4] for r in rows], type=pa.float64()),
    }) if n else pa.table({
        "event_id": pa.array([], type=pa.int64()),
        "ts": pa.array([], type=pa.timestamp("us")),
        "user_id": pa.array([], type=pa.int64()),
        "event_type": pa.array([], type=pa.string()),
        "value": pa.array([], type=pa.float64()),
    })


def _docs_table(texts=()):
    return pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(list(texts), type=pa.string()),
    })


def _emb_table(n=0, d=4):
    return pa.table({
        "vec_id": pa.array(range(n), type=pa.int64()),
        "label": pa.array([0] * n, type=pa.int64()),
        "embedding": pa.array([[float(i + j) for j in range(d)] for i in range(n)],
                              type=pa.list_(pa.float32())),
    })


# the judge's round-4 falsifying input: zero probe events
VIEWS_ONLY = [(i, i, 0, "view", 1.0) for i in range(7)]


def test_temporal_join_views_only_has_documented_columns(ray_session):
    """Round-4 judge counterexample, pinned deterministic: a zero-probe
    stream returns an EMPTY result with the 8 documented columns."""
    import ray.data

    from coderag_ray.pipelines.events import TEMPORAL_SCHEMA, temporal_join

    ds = ray.data.from_arrow(_events_table(VIEWS_ONLY))
    out = temporal_join(ds, n_buckets=2)
    assert out.schema().names == TEMPORAL_SCHEMA.names
    df = out.to_pandas()
    assert list(df.columns) == TEMPORAL_SCHEMA.names
    assert len(df) == 0


EVENT_CASES = [
    ("tumbling", lambda m, ds: m.tumbling_window(ds),
     ["event_type", "window_start", "n_events", "sum_value"]),
    ("hopping", lambda m, ds: m.hopping_window(ds),
     ["event_type", "window_start", "n_events", "sum_value"]),
    ("sessions", lambda m, ds: m.session_windows(ds),
     ["user_id", "session_id", "session_start", "n_events"]),
    ("asof", lambda m, ds: m.asof_join(ds, n_buckets=2),
     ["event_id", "user_id", "ts_us", "value", "ref_event_id", "lag_us"]),
    ("range", lambda m, ds: m.range_join_agg(ds, n_buckets=2),
     ["event_id", "user_id", "ts_us", "n_ref", "sum_ref_value"]),
    ("temporal", lambda m, ds: m.temporal_join(ds, n_buckets=2),
     ["event_id", "user_id", "ts_us", "value", "ref_event_id", "lag_us",
      "n_ref", "sum_ref_value"]),
    ("props", lambda m, ds: m.props_stats(ds),
     ["event_type", "n_events", "sum_k", "max_k"]),
]


@pytest.mark.parametrize("name,run,cols", EVENT_CASES,
                         ids=[c[0] for c in EVENT_CASES])
@pytest.mark.parametrize("rows", [(), tuple(VIEWS_ONLY)], ids=["empty", "views_only"])
def test_event_pipelines_schema_stable_on_degenerate_input(ray_session, name,
                                                           run, cols, rows):
    import ray.data

    from coderag_ray.pipelines import events as m

    tbl = _events_table(list(rows))
    if name == "props" and len(rows):
        tbl = tbl.append_column("props", pa.array(['{"k": 1}'] * tbl.num_rows))
    elif name == "props":
        tbl = tbl.append_column("props", pa.array([], type=pa.string()))
    out = run(m, ray.data.from_arrow(tbl))
    df = out.to_pandas()
    assert list(df.columns) == cols, name


DOC_CASES = [
    ("exact_dedup", lambda ds: __import__(
        "coderag_ray.pipelines.dedup", fromlist=["x"]).exact_dedup(ds),
     ["content_sha256", "n_copies", "keeper_doc_id"]),
    ("curate", lambda ds: __import__(
        "coderag_ray.pipelines.curation", fromlist=["x"]).curate(ds),
     ["doc_id", "n_words", "stopword_ratio", "is_keeper", "contaminated",
      "kept", "reason"]),
    ("hash_sample", lambda ds: __import__(
        "coderag_ray.pipelines.sampling", fromlist=["x"]).hash_sample(ds, rate=0),
     ["doc_id", "bucket"]),
    ("split", lambda ds: __import__(
        "coderag_ray.pipelines.sampling", fromlist=["x"]).train_val_test_split(ds),
     ["doc_id", "bucket", "split"]),
    ("lang_quota", lambda ds: __import__(
        "coderag_ray.pipelines.sampling", fromlist=["x"]).lang_quota_sample(ds),
     ["doc_id", "lang_pred"]),
    ("simhash", lambda ds: __import__(
        "coderag_ray.pipelines.dedup", fromlist=["x"]).simhash_table(ds),
     ["doc_id", "simhash"]),
    ("decontaminate", lambda ds: __import__(
        "coderag_ray.pipelines.text_analysis", fromlist=["x"]).decontaminate(ds),
     ["doc_id", "n_shingles", "n_overlap", "contaminated"]),
]


@pytest.mark.parametrize("name,run,cols", DOC_CASES, ids=[c[0] for c in DOC_CASES])
def test_doc_pipelines_schema_stable_on_empty_corpus(ray_session, name, run, cols):
    import ray.data

    out = run(ray.data.from_arrow(_docs_table()))
    df = out.to_pandas()
    assert list(df.columns) == cols, name
    assert len(df) == 0


def test_mixture_sample_schema_stable_on_empty_corpus(ray_session):
    import ray.data

    from coderag_ray.pipelines.sampling import mixture_sample

    tbl = pa.table({"doc_id": pa.array([], type=pa.int64()),
                    "source": pa.array([], type=pa.string())})
    df = mixture_sample(ray.data.from_arrow(tbl)).to_pandas()
    assert list(df.columns) == ["doc_id", "group", "bucket"]


def test_embedding_dup_pairs_schema_stable_on_empty(ray_session):
    import ray.data

    from coderag_ray.pipelines.dedup import embedding_dup_pairs

    df = embedding_dup_pairs(ray.data.from_arrow(_emb_table(0))).to_pandas()
    assert list(df.columns) == ["label", "vec_a", "vec_b", "cos_sim"]


def test_ngram_scores_and_clusters_on_empty_and_no_pairs(ray_session):
    import ray.data

    from coderag_ray.pipelines.dedup import near_dup_clusters, ngram_jaccard_pairs

    # empty corpus
    out = ngram_jaccard_pairs(ray.data.from_arrow(_docs_table()))
    assert out.schema.names == ["doc_a", "doc_b", "n_common", "n_a", "n_b", "jaccard"]
    cl = near_dup_clusters(ray.data.from_arrow(_docs_table()))
    assert cl.schema.names == ["doc_id", "cluster_id"] and cl.num_rows == 0
    # corpus with zero qualifying pairs
    docs = _docs_table(["alpha beta gamma delta", "zz yy xx ww vv"])
    cl2 = near_dup_clusters(ray.data.from_arrow(docs), threshold=0.9)
    assert cl2.schema.names == ["doc_id", "cluster_id"] and cl2.num_rows == 0


# ---------------------------------------------------------------------------
# VERDICT r4 item 2 — knn_bruteforce driver state is O(k·|Q|)
# ---------------------------------------------------------------------------


def test_knn_bruteforce_driver_collect_bounded(ray_session, monkeypatch):
    """The driver pulls only the reduced top-k table: ≤ k·|Q| rows, not
    one candidate set per corpus block."""
    import ray.data
    from ray.data import Dataset

    from coderag_ray.pipelines.similarity import knn_bruteforce

    rng = np.random.default_rng(7)
    n, d, k = 400, 8, 5
    emb = pa.table({
        "vec_id": pa.array(range(n), type=pa.int64()),
        "embedding": pa.array(rng.standard_normal((n, d)).tolist(),
                              type=pa.list_(pa.float32())),
    })
    pulled = []
    orig = Dataset.to_pandas

    def spy(self, *a, **kw):
        df = orig(self, *a, **kw)
        pulled.append(len(df))
        return df

    monkeypatch.setattr(Dataset, "to_pandas", spy)
    qids = [0, 1, 2, 3]
    # many tiny blocks: the old direct collect scaled with block count
    out = knn_bruteforce(ray.data.from_arrow(emb).repartition(16), qids, k=k)
    monkeypatch.setattr(Dataset, "to_pandas", orig)
    assert max(pulled) <= k * len(qids) + len(qids), pulled  # + query grab rows
    # exactness unchanged: matches the direct numpy computation
    E = np.array(emb["embedding"].to_pylist(), dtype=np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    df = out.to_pandas()
    for qi in qids:
        sims = En @ En[qi]
        order = np.lexsort((np.arange(n), -sims))
        want = [i for i in order if i != qi][:k]
        got = df[df.query_id == qi]["vec_id"].tolist()
        assert got == want, (qi, got, want)


# ---------------------------------------------------------------------------
# VERDICT r4 item 3 — distributed CC labeling returns a bounded-driver Dataset
# ---------------------------------------------------------------------------


def test_distributed_cc_returns_dataset_and_driver_bounded(ray_session, monkeypatch):
    import ray.data
    from ray.data import Dataset

    from coderag_ray.pipelines.dedup import clusters_from_edges_ds, clusters_from_pairs

    edges = [(i, i + 1) for i in range(200)] + [(500, 501), (501, 502)]
    tbl = pa.table({
        "doc_a": pa.array([a for a, _ in edges], type=pa.int64()),
        "doc_b": pa.array([b for _, b in edges], type=pa.int64()),
    })
    pulled = []
    orig = Dataset.to_pandas

    def spy(self, *a, **kw):
        df = orig(self, *a, **kw)
        pulled.append(len(df))
        return df

    monkeypatch.setattr(Dataset, "to_pandas", spy)
    out = clusters_from_edges_ds(ray.data.from_arrow(tbl).repartition(8),
                                 edge_budget=0)  # force distributed
    assert isinstance(out, Dataset)  # labels never materialize on the driver
    assert not pulled, pulled  # planning pulled nothing
    monkeypatch.setattr(Dataset, "to_pandas", orig)
    want = clusters_from_pairs(tbl).to_pandas()
    got = out.to_pandas()
    assert got.values.tolist() == want.values.tolist()
