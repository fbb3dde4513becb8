"""Checkpoint/resume tests (M4, SURVEY.md §7.2): unchanged input →
nothing recomputed; one modified doc → only its partition recomputed;
missing partition dir → self-heals; results identical after resume."""

import os
import shutil

import pyarrow as pa
import pytest

from coderag_ray.config import IndexConfig
from coderag_ray.corpus import make_corpus
from coderag_ray.functions.hashing import part_for_doc
from coderag_ray.index.build import build_index
from coderag_ray.index.manifest import load_manifest
from coderag_ray.query.search import search

CFG = IndexConfig(num_partitions=6)


def _mtimes(index_dir):
    out = {}
    root = os.path.join(index_dir, "parts")
    for d in sorted(os.listdir(root)):
        out[d] = os.path.getmtime(os.path.join(root, d, "postings.parquet"))
    return out


@pytest.fixture()
def corpus():
    return make_corpus(n_docs=120, seed=11)


def test_noop_rebuild_skips_everything(ray_session, tmp_path, corpus):
    import ray.data

    d = str(tmp_path / "idx")
    r1 = build_index(ray.data.from_arrow(corpus), d, CFG)
    assert r1.dirty_partitions == CFG.num_partitions
    m1 = _mtimes(d)
    r2 = build_index(ray.data.from_arrow(corpus), d, CFG)
    assert r2.dirty_partitions == 0
    assert _mtimes(d) == m1  # no partition rewritten
    assert r2.n_chunks == r1.n_chunks


def test_single_doc_change_rebuilds_one_partition(ray_session, tmp_path, corpus):
    import ray.data

    d = str(tmp_path / "idx")
    build_index(ray.data.from_arrow(corpus), d, CFG)
    m1 = _mtimes(d)

    # modify one doc's content
    ids = corpus["doc_id"].to_pylist()
    contents = corpus["content"].to_pylist()
    victim = 17
    contents[victim] = contents[victim] + "\nfunction freshlyAddedSymbol() { return 42; }"
    corpus2 = corpus.set_column(
        corpus.schema.get_field_index("content"), "content", pa.array(contents)
    )
    r2 = build_index(ray.data.from_arrow(corpus2), d, CFG)
    assert r2.dirty_partitions == 1
    changed_part = part_for_doc(ids[victim], CFG.num_partitions)
    m2 = _mtimes(d)
    for pdir, t in m1.items():
        if pdir == f"part={changed_part:05d}":
            assert m2[pdir] != t
        else:
            assert m2[pdir] == t
    # the new symbol is searchable, full index consistent
    res = search(d, "freshlyAddedSymbol", 5, with_doc_columns=False)
    assert res.num_rows >= 1 and res["doc_id"][0].as_py() == ids[victim]


def test_file_level_noop_resume(ray_session, tmp_path, corpus):
    """Two-tier resume: unchanged input files → tier-1 stat sweep only
    (no corpus re-read); touched mtime → tier-2 content scan, still
    zero dirty partitions; real edit → exactly one partition rebuilt."""
    import pyarrow.parquet as pq

    src = str(tmp_path / "docs.parquet")
    pq.write_table(corpus, src)
    d = str(tmp_path / "idx")
    r1 = build_index(src, d, CFG)
    assert r1.fingerprint_mode == "fresh"
    assert load_manifest(d).get("input_files"), "tier-1 fingerprint missing"

    r2 = build_index(src, d, CFG)
    assert r2.fingerprint_mode == "file"  # no content scan
    assert r2.dirty_partitions == 0
    assert r2.n_chunks == r1.n_chunks

    os.utime(src)  # mtime bump → tier-1 miss, tier-2 finds no change
    r3 = build_index(src, d, CFG)
    assert r3.fingerprint_mode == "content"
    assert r3.dirty_partitions == 0

    # a real edit goes through tier-2 and rebuilds only its partition
    contents = corpus["content"].to_pylist()
    contents[3] = contents[3] + "\nfunction tierTwoSymbol() {}"
    corpus2 = corpus.set_column(
        corpus.schema.get_field_index("content"), "content", pa.array(contents)
    )
    pq.write_table(corpus2, src)
    r4 = build_index(src, d, CFG)
    assert r4.fingerprint_mode == "content"
    assert r4.dirty_partitions == 1
    res = search(d, "tierTwoSymbol", 5, with_doc_columns=False)
    assert res.num_rows >= 1

    # and the partition dir self-heals through tier-1 without a scan
    victim = next(p for p in range(CFG.num_partitions)
                  if load_manifest(d)["partitions"][str(p)]["n_chunks"] > 0)
    shutil.rmtree(os.path.join(d, "parts", f"part={victim:05d}"))
    r5 = build_index(src, d, CFG)
    assert r5.fingerprint_mode == "file"
    assert r5.dirty_partitions == 1


def test_resume_result_equals_fresh_build(ray_session, tmp_path, corpus):
    """Kill-and-resume analog: fresh build vs resumed build → identical
    search results and identical idf."""
    import pyarrow.parquet as pq
    import ray.data

    d_fresh = str(tmp_path / "fresh")
    d_res = str(tmp_path / "resumed")
    build_index(ray.data.from_arrow(corpus), d_fresh, CFG)
    build_index(ray.data.from_arrow(corpus), d_res, CFG)
    # simulate mid-build crash: remove two partition dirs + manifest rows stale
    for p in (1, 3):
        shutil.rmtree(os.path.join(d_res, "parts", f"part={p:05d}"))
    r = build_index(ray.data.from_arrow(corpus), d_res, CFG)
    assert r.dirty_partitions == 2  # self-healed just the missing ones
    sem = ["rank", "doc_id", "chunk_id", "score"]
    for q in ["user authentication", "self return function", "validateCredentials"]:
        a = search(d_fresh, q, 10, with_doc_columns=False).select(sem)
        b = search(d_res, q, 10, with_doc_columns=False).select(sem)
        assert a.equals(b), q
    ta = pq.read_table(os.path.join(d_fresh, "idf")).to_pydict()
    tb = pq.read_table(os.path.join(d_res, "idf")).to_pydict()
    assert ta == tb


def test_config_change_invalidates(ray_session, tmp_path, corpus):
    import ray.data

    d = str(tmp_path / "idx")
    build_index(ray.data.from_arrow(corpus), d, CFG)
    r = build_index(
        ray.data.from_arrow(corpus), d, IndexConfig(num_partitions=6, tokenizer="simple")
    )
    assert r.dirty_partitions == CFG.num_partitions


def test_manifest_metrics_recorded(ray_session, tmp_path, corpus):
    import ray.data

    d = str(tmp_path / "idx")
    build_index(ray.data.from_arrow(corpus), d, CFG)
    man = load_manifest(d)
    parts = man["partitions"]
    assert len(parts) == CFG.num_partitions
    for row in parts.values():
        assert set(row) >= {"fingerprint", "n_docs", "n_chunks", "n_postings",
                            "total_tokens", "bytes_postings", "wall_s"}
        if row["n_chunks"] > 0:
            assert row["docs_per_sec"] > 0
