"""Tokenizer tests mirroring the reference's
``code-tokenizer.test.ts`` cases (camelCase/snake_case splits, empty
input, len<=1 dropped) plus batch==scalar equivalence properties."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from coderag_ray.functions.tokenizer import (
    batch_term_counts,
    term_frequencies,
    tokenize,
    tokenize_code,
    tokenize_simple,
)


def test_simple_tokenize_reference_semantics():
    # code-tokenizer.ts:14-19: split [^a-zA-Z0-9_]+, len>1, lowercase
    assert tokenize_simple("function getUserById(id)") == ["function", "getuserbyid", "id"]
    assert tokenize_simple("a b X yz_W 12") == ["yz_w", "12"]
    assert tokenize_simple("") == []
    assert tokenize_simple("   \n\t") == []
    assert tokenize_simple("!!??") == []


def test_code_tokenize_camel_snake_splits():
    assert tokenize_code("getUserById") == ["get", "user", "by", "id", "getuserbyid"]
    assert tokenize_code("snake_case_word") == ["snake", "case", "word", "snake_case_word"]
    assert tokenize_code("HTTPServer") == ["http", "server", "httpserver"]
    # single-token identifier is emitted once, not twice
    assert tokenize_code("return") == ["return"]
    assert tokenize_code("x") == []  # len<=1 dropped


def test_code_tokenize_digit_boundaries():
    assert tokenize_code("v2") == ["v2"]  # parts 'v','2' are len<=1
    assert tokenize_code("utf8Decode") == ["utf", "decode", "utf8decode"]


def test_empty_and_whitespace():
    for t in ["", "   ", "\n\n"]:
        assert tokenize(t, "code") == []
        assert tokenize(t, "simple") == []


def test_term_frequencies():
    tf = term_frequencies("user user name", "simple")
    assert tf == Counter({"user": 2, "name": 1})


@pytest.mark.parametrize("tok", ["simple", "code"])
def test_batch_matches_scalar_on_code_samples(tok):
    texts = [
        "function getUserById(id) { return db.query(user_id); }",
        "class HTTPServer2 extends BaseServer { self.x = 1 }",
        "",
        "   ",
        "def parse_query_v2(input): return input.lower()",
        "éàü über_straße x",  # non-ascii separators
    ]
    rows, terms, freqs, tc = batch_term_counts(pa.array(texts), tok)
    got = {i: Counter() for i in range(len(texts))}
    for r, t, f in zip(rows.tolist(), terms.to_pylist(), freqs.tolist()):
        got[r][t] = f
    for i, text in enumerate(texts):
        ref = term_frequencies(text, tok)
        assert got[i] == ref, (i, got[i], ref)
        assert tc[i] == sum(ref.values())


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(codec="utf-8"), max_size=80), max_size=8))
@pytest.mark.parametrize("tok", ["simple", "code"])
def test_batch_matches_scalar_property(tok, texts):
    rows, terms, freqs, tc = batch_term_counts(pa.array(texts, type=pa.string()), tok)
    got = {i: Counter() for i in range(len(texts))}
    for r, t, f in zip(rows.tolist(), terms.to_pylist(), freqs.tolist()):
        got[r][t] = f
    for i, text in enumerate(texts):
        assert got[i] == term_frequencies(text, tok)
        assert tc[i] == sum(got[i].values())


def test_code_tokenizer_sql_mirror_parity():
    """The DuckDB RE2 replace-chain mirror of tokenize_code (the
    q_bm25_topk_code oracle's _CORE_CODE tokenization) produces
    identical term frequencies on representative corpus text."""
    from collections import Counter

    import duckdb

    from coderag_ray.corpus import make_corpus
    from coderag_ray.functions.tokenizer import tokenize_code

    texts = make_corpus(25, seed=13)["content"].to_pylist() + [
        "getUserById HTTPServer fooBar v2 2x _foo_ a2X X __init__ A1B2C3",
    ]
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t.replace(chr(39), chr(39)*2)}')"
                     for i, t in enumerate(texts))
    got = {(r[0], r[1]): r[2] for r in con.execute(f"""
WITH inp AS (SELECT * FROM (VALUES {vals}) t(rid, chunk)),
ids AS (
  SELECT rid, ident, lower(ident) AS whole,
         list_filter(regexp_split_to_array(
           regexp_replace(
            regexp_replace(
             regexp_replace(
              regexp_replace(ident, '([a-z0-9])([A-Z])', '\\1 \\2', 'g'),
              '([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g'),
             '([A-Za-z])([0-9])', '\\1 \\2', 'g'),
            '([0-9])([A-Za-z])', '\\1 \\2', 'g'),
           '[^a-zA-Z0-9]+'), x -> length(x) > 0) AS parts
  FROM (SELECT rid, unnest(regexp_split_to_array(chunk, '[^a-zA-Z0-9_]+')) AS ident FROM inp)
  WHERE ident != ''
),
tk AS (
  SELECT rid, lower(p) AS term FROM
    (SELECT rid, unnest(parts) AS p FROM ids
     WHERE len(parts) > 1 OR (len(parts) = 1 AND lower(parts[1]) != whole))
  WHERE length(p) > 1
  UNION ALL
  SELECT rid, whole AS term FROM ids WHERE length(whole) > 1
)
SELECT rid, term, count(*) FROM tk GROUP BY 1, 2""").fetchall()}
    want = {(i, t): f for i, x in enumerate(texts)
            for t, f in Counter(tokenize_code(x)).items()}
    assert got == want
