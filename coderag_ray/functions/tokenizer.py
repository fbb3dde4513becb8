"""Deterministic code-aware tokenizers.

Two tokenizers, mirroring the reference's surface
(``/root/reference/packages/core/src/code-tokenizer.ts``):

- ``simple``: the reference's fallback ``simpleWordTokenize``
  (``code-tokenizer.ts:14-19``): split on ``[^a-zA-Z0-9_]+``, keep
  tokens with length > 1, lowercase.  This tokenizer is also
  expressible in ANSI SQL, so it backs the DuckDB oracle queries.
- ``code``: a deterministic code-aware lexer standing in for the
  reference's StarCoder2-BPE path (``code-tokenizer.ts:87-118`` — the
  sandbox has no network, so no HF download; the north rule asks for
  "code-aware lexing with identifier/camelCase/snake_case splitting").
  Identifiers (``[A-Za-z0-9_]+`` runs) are split on ``_``, on
  lower→Upper and ACRONYMUpper boundaries, and on letter↔digit
  boundaries; both the split parts and the whole identifier are
  emitted.  Post-processing matches the reference exactly:
  ``trim → lowercase → drop length ≤ 1`` (``code-tokenizer.ts:102-107``).

Each tokenizer has a pure-Python row implementation (the oracle spec,
``tokenize()``) and a vectorized Arrow batch implementation
(``batch_term_counts()``) used in the hot ``map_batches`` path; a
property test asserts they agree.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SEP = "\x1f"  # separator inserted at identifier-part boundaries (never occurs in [A-Za-z0-9_])

_ID_SPLIT = r"[^a-zA-Z0-9_]+"  # identifier extraction — code-tokenizer.ts:16
_PART_SPLIT = r"[^a-zA-Z0-9]+"  # part extraction also breaks on '_' and SEP

# Boundary-insertion rules defining the camelCase/acronym/digit splits.
# Applied in order; together they are the canonical spec for "parts".
_BOUNDARY_RULES: list[tuple[str, str]] = [
    (r"([a-z0-9])([A-Z])", rf"\1{SEP}\2"),        # fooBar    -> foo|Bar ; 2X -> 2|X
    (r"([A-Z]+)([A-Z][a-z])", rf"\1{SEP}\2"),     # HTTPServer-> HTTP|Server
    (r"([A-Za-z])([0-9])", rf"\1{SEP}\2"),        # v2        -> v|2
    (r"([0-9])([A-Za-z])", rf"\1{SEP}\2"),        # 2x        -> 2|x
]

_id_split_re = re.compile(_ID_SPLIT)
_part_split_re = re.compile(_PART_SPLIT)
_boundary_res = [(re.compile(p), r) for p, r in _BOUNDARY_RULES]


def _insert_boundaries(ident: str) -> str:
    for rx, repl in _boundary_res:
        ident = rx.sub(repl, ident)
    return ident


def tokenize_simple(text: str) -> list[str]:
    """Reference fallback tokenizer — code-tokenizer.ts:14-19 semantics."""
    return [w.lower() for w in _id_split_re.split(text) if len(w) > 1]


def tokenize_code(text: str) -> list[str]:
    """Code-aware lexer: per identifier emit split parts then the whole.

    Emission rule (frozen spec): for each identifier in text order, let
    ``parts`` be its non-empty boundary-split pieces.  If the identifier
    actually splits (``len(parts) > 1``) or its single part differs from
    the lowercased whole (underscore trimming, e.g. ``_foo_``), emit
    each lowercased part with length > 1 first, then the lowercased
    whole with length > 1; otherwise emit just the whole.
    """
    out: list[str] = []
    for ident in _id_split_re.split(text):
        if not ident:
            continue
        whole = ident.lower()
        parts = [p for p in _part_split_re.split(_insert_boundaries(ident)) if p]
        if len(parts) > 1 or (parts and parts[0].lower() != whole):
            out.extend(p.lower() for p in parts if len(p) > 1)
        if len(whole) > 1:
            out.append(whole)
    return out


def tokenize(text: str, tokenizer: str = "code",
             bpe_vocab_path: str | None = None) -> list[str]:
    if tokenizer == "simple":
        return tokenize_simple(text)
    if tokenizer == "code":
        return tokenize_code(text)
    if tokenizer == "bpe":
        from coderag_ray.functions.bpe import default_tokenizer, loaded_tokenizer

        tok = loaded_tokenizer(bpe_vocab_path) if bpe_vocab_path else default_tokenizer()
        return tok.tokenize(text)
    raise ValueError(f"unknown tokenizer {tokenizer!r}")


def term_frequencies(text: str, tokenizer: str = "code") -> Counter:
    """Token list → term→rawFreq map (tfidf.ts:134-143, code-tokenizer.ts:123-132)."""
    return Counter(tokenize(text, tokenizer))


# ---------------------------------------------------------------------------
# Vectorized batch path (Arrow kernels + numpy; no Python loop over rows)
# ---------------------------------------------------------------------------


def _flatten_with_parents(lst: pa.ListArray) -> tuple[pa.Array, np.ndarray]:
    """Flatten a list array; return (values, parent_row_index_per_value)."""
    lengths = pc.list_value_length(lst).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
    parents = np.repeat(np.arange(len(lst), dtype=np.int64), lengths)
    return pc.list_flatten(lst), parents


def _batch_tokens_simple(texts: pa.Array) -> tuple[np.ndarray, pa.Array]:
    """→ (row_index_per_token, lowered_token) for the simple tokenizer."""
    toks_list = pc.split_pattern_regex(texts, pattern=_ID_SPLIT)
    toks, rows = _flatten_with_parents(toks_list)
    keep = pc.greater(pc.utf8_length(toks), 1)
    keep_np = keep.to_numpy(zero_copy_only=False)
    toks = pc.utf8_lower(toks.filter(keep))
    return rows[keep_np], toks


def _batch_tokens_code(texts: pa.Array) -> tuple[np.ndarray, pa.Array]:
    """→ (row_index_per_token, lowered_token) for the code tokenizer.

    Mirrors :func:`tokenize_code` with Arrow kernels: one regex split for
    identifiers, a chain of ``replace_substring_regex`` boundary
    insertions, and a second split for parts.  Token multiset per row is
    identical to the pure-Python spec (order differs; BM25 only consumes
    frequencies).
    """
    wholes_list = pc.split_pattern_regex(texts, pattern=_ID_SPLIT)
    wholes, row_of_whole = _flatten_with_parents(wholes_list)
    nonempty = pc.greater(pc.utf8_length(wholes), 0)
    ne_np = nonempty.to_numpy(zero_copy_only=False)
    wholes = wholes.filter(nonempty)
    row_of_whole = row_of_whole[ne_np]
    n_wholes = len(wholes)
    if n_wholes == 0:
        return np.empty(0, dtype=np.int64), pa.array([], type=pa.string())

    seps = wholes
    for pat, repl in _BOUNDARY_RULES:
        seps = pc.replace_substring_regex(seps, pattern=pat, replacement=repl)
    parts_list = pc.split_pattern_regex(seps, pattern=_PART_SPLIT)
    parts, whole_of_part = _flatten_with_parents(parts_list)
    p_nonempty = pc.greater(pc.utf8_length(parts), 0)
    p_ne = p_nonempty.to_numpy(zero_copy_only=False)
    parts = parts.filter(p_nonempty)
    whole_of_part = whole_of_part[p_ne]

    n_parts = np.bincount(whole_of_part, minlength=n_wholes)
    wholes_l = pc.utf8_lower(wholes)
    parts_l = pc.utf8_lower(parts)

    # emit parts for identifiers that split, or whose single part != whole
    first_idx = np.full(n_wholes, -1, dtype=np.int64)
    # whole_of_part is non-decreasing; first occurrence index per whole:
    if len(whole_of_part):
        uniq, first_pos = np.unique(whole_of_part, return_index=True)
        first_idx[uniq] = first_pos
    single = n_parts == 1
    differs = np.zeros(n_wholes, dtype=bool)
    if single.any():
        sel = first_idx[single]
        eq = pc.equal(parts_l.take(pa.array(sel)), wholes_l.filter(pa.array(single)))
        differs[single] = ~eq.to_numpy(zero_copy_only=False)
    emit_parts_of_whole = (n_parts > 1) | differs

    part_emit = emit_parts_of_whole[whole_of_part] & (
        pc.greater(pc.utf8_length(parts_l), 1).to_numpy(zero_copy_only=False)
    )
    whole_emit = pc.greater(pc.utf8_length(wholes_l), 1).to_numpy(zero_copy_only=False)

    rows = np.concatenate([row_of_whole[whole_of_part[part_emit]], row_of_whole[whole_emit]])
    toks = pa.concat_arrays(
        [
            pa.array(parts_l.filter(pa.array(part_emit))).cast(pa.string()),
            pa.array(wholes_l.filter(pa.array(whole_emit))).cast(pa.string()),
        ]
    )
    return rows, toks


def batch_term_counts(
    texts: pa.Array | pa.ChunkedArray, tokenizer: str = "code"
) -> tuple[np.ndarray, pa.Array, np.ndarray, np.ndarray]:
    """Vectorized per-batch term-frequency extraction.

    Returns ``(row_idx, term, raw_freq, token_count_per_row)`` where
    ``(row_idx, term)`` pairs are unique with ``raw_freq`` occurrences
    each, and ``token_count_per_row[r]`` is the total token count of row
    ``r`` (Σ raw_freq — the BM25 document length, tfidf.ts:395-400).
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_rows = len(texts)
    if tokenizer == "simple":
        rows, toks = _batch_tokens_simple(texts)
    elif tokenizer == "code":
        rows, toks = _batch_tokens_code(texts)
    else:
        raise ValueError(f"unknown tokenizer {tokenizer!r}")

    token_count = np.bincount(rows, minlength=n_rows).astype(np.int64) if len(rows) else np.zeros(n_rows, dtype=np.int64)
    if len(rows) == 0:
        return (
            np.empty(0, dtype=np.int64),
            pa.array([], type=pa.string()),
            np.empty(0, dtype=np.int64),
            token_count,
        )

    # group-count by (row, term): dictionary-encode terms, combine keys
    dict_arr = pc.dictionary_encode(toks)
    if isinstance(dict_arr, pa.ChunkedArray):
        dict_arr = dict_arr.combine_chunks()
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = dict_arr.dictionary
    n_vocab = len(vocab)
    combined = rows * n_vocab + codes
    uniq, counts = np.unique(combined, return_counts=True)
    out_rows = uniq // n_vocab
    out_codes = uniq % n_vocab
    out_terms = vocab.take(pa.array(out_codes))
    return out_rows, out_terms, counts.astype(np.int64), token_count


# ASCII whitespace splitter — matches RE2/DuckDB '\\s+' (ASCII-only),
# unlike str.split() which also splits on U+00A0/U+2028/...: any oracle
# that mirrors a Python split with regexp_split_to_array must use THIS
# (ADVICE r3 item 4)
import re as _re

_ASCII_WS = _re.compile(r"[ \t\n\r\f\v]+")


def ascii_ws_words(text: str) -> list[str]:
    """Non-empty tokens of ``text`` split on ASCII whitespace only."""
    return [w for w in _ASCII_WS.split(text) if w]
