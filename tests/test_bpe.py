"""Mini-BPE tokenizer tests — training determinism, the reference's
post-processing (code-tokenizer.ts:102-117), and exact rank parity of a
BPE-tokenized distributed build vs the Python oracle (the ST1
actor-pool path end to end)."""

import pytest

from coderag_ray.functions.bpe import BPETokenizer, default_tokenizer, train_bpe


def test_training_is_deterministic():
    texts = ["the user authenticates the user database", "user auth token"]
    m1 = train_bpe(texts, n_merges=50)
    m2 = train_bpe(list(reversed(texts)), n_merges=50)  # order-independent
    assert m1 == m2 and len(m1) > 0


def test_encode_word_reassembles():
    tok = default_tokenizer()
    for w in ("authenticate", "getuserbyid", "user_id", "zzqqxx", "a"):
        assert "".join(tok.encode_word(w)) == w


def test_reference_postprocessing_drop_short_and_fallback():
    tok = default_tokenizer()
    toks = tok.tokenize("authenticate the user")
    assert toks and all(len(t) > 1 for t in toks)
    assert all(t == t.lower() for t in toks)
    # a text whose pieces are all length-1 falls back to the simple split
    # (code-tokenizer.ts:113-117); single letters die in both paths
    assert tok.tokenize("a b c") == []
    assert tok.tokenize("") == []


def test_common_identifiers_stay_whole():
    # seed-corpus words should merge back into single pieces
    tok = default_tokenizer()
    assert tok.encode_word("user") == ["user"]
    assert tok.encode_word("return") == ["return"]


def test_vocab_save_load_roundtrip(tmp_path):
    tok = default_tokenizer()
    p = str(tmp_path / "vocab.json")
    tok.save(p)
    tok2 = BPETokenizer.load(p)
    assert tok2.merges == tok.merges
    assert tok2.tokenize("authenticate user database") == tok.tokenize(
        "authenticate user database")


def test_external_vocab_path_config(ray_session, tmp_path):
    """An index built with ``bpe_vocab_path`` (the external-model-vocab
    hook, code-tokenizer.ts:87-118) loads the merge table from disk in
    every tokenizer actor; pointing it at a copy of the built-in vocab
    reproduces the default build exactly."""
    import ray.data

    from coderag_ray.config import IndexConfig
    from coderag_ray.corpus import make_corpus
    from coderag_ray.index.build import build_index
    from coderag_ray.query.search import search

    vocab = str(tmp_path / "vocab.json")
    default_tokenizer().save(vocab)
    corpus = make_corpus(n_docs=60, seed=7)
    d_def = str(tmp_path / "def")
    d_ext = str(tmp_path / "ext")
    build_index(ray.data.from_arrow(corpus), d_def,
                IndexConfig(tokenizer="bpe", num_partitions=3))
    build_index(ray.data.from_arrow(corpus), d_ext,
                IndexConfig(tokenizer="bpe", num_partitions=3,
                            bpe_vocab_path=vocab))
    sem = ["rank", "doc_id", "chunk_id", "score"]
    for q in ["validate credentials", "database connection"]:
        a = search(d_def, q, 10, with_doc_columns=False).select(sem)
        b = search(d_ext, q, 10, with_doc_columns=False).select(sem)
        assert a.equals(b), q

    # a genuinely DIFFERENT vocab flows through build AND query side
    # (both must use the index's own merge table) — rank parity vs the
    # Python oracle holds under the custom vocabulary
    from coderag_ray.functions.bpe import BPETokenizer, train_bpe
    from coderag_ray.oracle import OracleIndex

    small = str(tmp_path / "small_vocab.json")
    BPETokenizer(train_bpe(["function return value database connect"], 16)).save(small)
    cfg_small = IndexConfig(tokenizer="bpe", num_partitions=3, bpe_vocab_path=small)
    d_small = str(tmp_path / "small")
    build_index(ray.data.from_arrow(corpus), d_small, cfg_small)
    oracle = OracleIndex.from_rows(corpus.to_pylist(), cfg_small)
    got = search(d_small, "database connection", 10, with_doc_columns=False)
    want = oracle.search("database connection", 10)
    assert got["doc_id"].to_pylist() == [r[0] for r in want]
    assert got["chunk_id"].to_pylist() == [r[1] for r in want]


@pytest.fixture(scope="module")
def built_bpe(ray_session, tmp_path_factory):
    import ray.data

    from coderag_ray.config import IndexConfig
    from coderag_ray.corpus import make_corpus
    from coderag_ray.index.build import build_index
    from coderag_ray.oracle import OracleIndex

    corpus = make_corpus(n_docs=150, seed=42)
    index_dir = str(tmp_path_factory.mktemp("bpe_idx"))
    cfg = IndexConfig(tokenizer="bpe", num_partitions=4)
    report = build_index(ray.data.from_arrow(corpus), index_dir, cfg)
    oracle = OracleIndex.from_rows(corpus.to_pylist(), cfg)
    return index_dir, report, oracle


def test_bpe_build_counts_match_oracle(built_bpe):
    index_dir, report, oracle = built_bpe
    assert report.n_chunks == oracle.n_chunks
    assert report.total_tokens == sum(c.token_count for c in oracle.chunks)


def test_bpe_rank_parity_exact(built_bpe):
    from coderag_ray.index.reader import IndexReader
    from coderag_ray.query.search import search

    index_dir, report, oracle = built_bpe
    reader = IndexReader(index_dir)
    for q in ("user authentication", "database connection", "handleRequest",
              "validate credentials password", "mergeSortedRuns"):
        for k in (5, 20):
            expected = [(d, c, s) for d, c, s, _ in oracle.search(q, k)]
            got = search(reader, q, k, with_doc_columns=False)
            got_rows = list(zip(got["doc_id"].to_pylist(),
                                got["chunk_id"].to_pylist(),
                                got["score"].to_pylist()))
            assert got_rows == expected, f"query={q!r} k={k}"
