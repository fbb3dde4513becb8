"""Round-4 fixes: input-size-derived bucket counts (VERDICT r3 item 3),
distributed packing, consolidated driver surface."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_auto_buckets_grows_with_input():
    from coderag_ray.config import auto_buckets

    # unknown / small input → the historical constant
    assert auto_buckets(0) == 64
    assert auto_buckets(10_000) == 64
    assert auto_buckets(None) == 64
    # grows with row count, power-of-two, capped
    a = auto_buckets(500_000_000)
    b = auto_buckets(5_000_000_000)
    assert 64 < a < b
    assert a & (a - 1) == 0 and b & (b - 1) == 0
    assert auto_buckets(10**13) == 65_536
    # per-operator targets shift the curve; lo floor respected
    assert auto_buckets(10**6, target_rows=100_000, lo=256) == 256
    assert auto_buckets(10**8, target_rows=100_000) == 1024


def test_ascii_ws_split_matches_re2_not_unicode():
    """str.split() splits on U+00A0/U+2028 etc. while the DuckDB
    oracles split on RE2 '\\s+' (ASCII-only) — the engine must side
    with the oracle (ADVICE r3 item 4)."""
    from coderag_ray.functions.tokenizer import ascii_ws_words

    s = "alpha\u00a0beta gamma\u2028delta"
    assert s.split() == ["alpha", "beta", "gamma", "delta"]  # the trap
    assert ascii_ws_words(s) == ["alpha\u00a0beta", "gamma\u2028delta"]
    assert ascii_ws_words(" a\t b\nc ") == ["a", "b", "c"]
    # shingles of a non-ASCII-whitespace doc now match the SQL side
    from coderag_ray.pipelines.dedup import _word_shingles

    assert _word_shingles("x\u00a0y z", n=1) == {"x\u00a0y", "z"}


def test_auto_buckets_accepts_dataset(ray_session):
    import ray.data

    from coderag_ray.config import auto_buckets

    ds = ray.data.from_arrow(pa.table({"x": pa.array(np.arange(100))}))
    assert auto_buckets(ds) == 64


def test_driver_registry_is_exactly_50_and_extras_disjoint():
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    extras = entrymod.extra_queries()
    assert len(qs) == 50
    assert not set(qs) & set(extras)
    # every oracle key corresponds to a registered query
    assert set(entrymod.oracle_sql()) <= set(qs)
    assert set(entrymod.extra_oracle_sql()) <= set(extras)

def test_champion_cache_is_bounded():
    """ADVICE r3 item 5: a wide query vocabulary must not grow the
    per-term champion cache without bound (LRU-evicted)."""
    import types

    from coderag_ray.query import search as sm

    compact = types.SimpleNamespace(
        doc_ids=np.arange(10_000, dtype=np.int64),
        chunk_ids=np.zeros(10_000, dtype=np.int64))
    rng = np.random.default_rng(0)
    n_terms = sm.CHAMPION_CACHE_TERMS + 50
    for i in range(n_terms):
        tok = f"t{i}"
        ords = np.arange(300, dtype=np.int64)  # > CHAMPION_C → cached
        imps = rng.random(300)
        sm._champion_select(compact, [tok], [(tok, (ords, imps))], 1)
    assert len(compact._champions) <= sm.CHAMPION_CACHE_TERMS
    # most-recent terms survive, oldest evicted
    assert f"t{n_terms - 1}" in compact._champions
    assert "t0" not in compact._champions

def test_champion_preseed_at_preload_matches_lazy(ray_session, tmp_path):
    """ensure_preloaded pre-builds hot-term champion prefixes (cold p95
    fix): the seeded entries must be byte-identical to the ones the
    lazy query path would compute, and search results must be unchanged."""
    import ray.data

    from coderag_ray.config import IndexConfig
    from coderag_ray.corpus import make_corpus
    from coderag_ray.index.build import build_index
    from coderag_ray.index.reader import IndexReader
    from coderag_ray.query import search as sm

    corpus = make_corpus(n_docs=400, seed=7)
    idx = str(tmp_path / "idx")
    build_index(ray.data.from_arrow(corpus), idx, IndexConfig(num_partitions=3))

    old_c, old_ladder = sm.CHAMPION_C, sm.CHAMPION_LADDER
    sm.CHAMPION_C, sm.CHAMPION_LADDER = 8, (1, 4)  # make terms "hot" at this scale
    try:
        reader = IndexReader(idx)
        assert reader.ensure_preloaded()
        compact = reader.compact()
        seeded = compact._champions
        c_max = sm.CHAMPION_C * sm.CHAMPION_LADDER[-1]
        hot_terms = {t for t, (o, _) in compact.postings.items() if len(o) > c_max}
        assert hot_terms, "fixture must produce hot terms"
        assert seeded, "preseed must actually seed"
        if len(hot_terms) <= sm.CHAMPION_CACHE_TERMS:
            assert set(seeded) == hot_terms
        else:
            assert len(seeded) == sm.CHAMPION_CACHE_TERMS
            assert set(seeded) <= hot_terms
        # byte-identical to the lazy computation
        for t in list(seeded)[:5]:
            ords, imps = compact.postings[t]
            part = np.argpartition(-imps, c_max)
            top = seeded[t]["top"]
            assert (np.sort(top[0]) == np.sort(ords[part[:c_max]])).all()
            assert top[2] == float(imps[part[c_max]])
        # a fresh reader without preseed gives identical search results
        r2 = IndexReader(idx)
        assert r2.ensure_preloaded()
        r2.compact()._champions.clear()
        for q in ("self return function", "user data value", "the a of"):
            a = sm.search(reader, q, 10, with_doc_columns=False)
            b = sm.search(r2, q, 10, with_doc_columns=False)
            assert a.equals(b), q
    finally:
        sm.CHAMPION_C, sm.CHAMPION_LADDER = old_c, old_ladder
