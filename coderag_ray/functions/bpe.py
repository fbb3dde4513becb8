"""Deterministic mini-BPE tokenizer — the model-tokenizer actor path
(ST1) made real offline.

The reference tokenizes with StarCoder2 BPE loaded once per worker
(``/root/reference/packages/core/src/code-tokenizer.ts:37-118``):
encode → per-token decode → ``trim → lowercase → drop length ≤ 1``,
falling back to ``simpleWordTokenize`` when the model yields nothing.
No model download is possible offline, so this module implements
classic byte-pair encoding with a DETERMINISTIC, self-contained
training corpus: same interface, same post-processing, same
load-state-once-per-actor deployment shape
(:class:`coderag_ray.stages.tokenize.BpeTokenizeStage`).

Determinism: merges are learned with most-frequent-pair selection and
lexicographic tie-breaks from a fixed seed text, so every process (and
the pure-Python :class:`coderag_ray.oracle.OracleIndex`) derives the
identical vocabulary.
"""

from __future__ import annotations

import json
from collections import Counter
from functools import lru_cache

_EOW = "</w>"
DEFAULT_MERGES = 384


def train_bpe(texts, n_merges: int = DEFAULT_MERGES) -> list[tuple[str, str]]:
    """Classic word-level BPE training.

    Words are the lowercased ``[^a-zA-Z0-9_]+``-split tokens; symbols
    start as characters plus an end-of-word marker.  Each step merges
    the most frequent adjacent pair; ties break lexicographically so
    training is order-independent and deterministic.
    """
    import re

    word_freq: Counter[tuple[str, ...]] = Counter()
    for text in texts:
        for w in re.split(r"[^a-zA-Z0-9_]+", text.lower()):
            if w:
                word_freq[tuple(w) + (_EOW,)] += 1

    merges: list[tuple[str, str]] = []
    vocab = dict(word_freq)
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for sym, freq in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))  # freq desc, pair lex asc
        pair = best[0]
        merged = pair[0] + pair[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, freq in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == pair[0] and sym[i + 1] == pair[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
        vocab = new_vocab
        merges.append(pair)
    return merges


class BPETokenizer:
    """Greedy lowest-rank-merge encoder over a fixed merge table."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.merges = list(merges)
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self._cache: dict[str, list[str]] = {}

    # -- persistence (the actor-load path) --------------------------------
    def save(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            json.dump({"merges": [list(m) for m in self.merges]}, f)

    @classmethod
    def load(cls, path: str) -> "BPETokenizer":
        with open(path, encoding="utf-8") as f:
            data = json.load(f)
        return cls([tuple(m) for m in data["merges"]])

    # -- encoding ---------------------------------------------------------
    def encode_word(self, word: str) -> list[str]:
        hit = self._cache.get(word)
        if hit is not None:
            return hit
        sym = list(word) + [_EOW]
        while len(sym) > 1:
            ranked = [
                (self.ranks[p], i)
                for i, p in enumerate(zip(sym, sym[1:]))
                if p in self.ranks
            ]
            if not ranked:
                break
            _, i = min(ranked)
            sym[i : i + 2] = [sym[i] + sym[i + 1]]
        pieces = [s[: -len(_EOW)] if s.endswith(_EOW) else s for s in sym]
        pieces = [p for p in pieces if p]
        if len(self._cache) < 500_000:
            self._cache[word] = pieces
        return pieces

    def tokenize(self, text: str) -> list[str]:
        """Reference post-processing (code-tokenizer.ts:102-107): per
        piece trim+lowercase, keep length > 1; empty result falls back
        to the simple word split (code-tokenizer.ts:113-117)."""
        import re

        out: list[str] = []
        for w in re.split(r"[^a-zA-Z0-9_]+", text.lower()):
            if not w:
                continue
            for p in self.encode_word(w):
                p = p.strip().lower()
                if len(p) > 1:
                    out.append(p)
        if not out:
            from coderag_ray.functions.tokenizer import tokenize_simple

            return tokenize_simple(text)
        return out


# Fixed seed corpus: the identifier/keyword soup the synthetic corpus
# and ordinary source code share.  Frozen — changing it changes every
# BPE index (schema-versioned via the config's tokenizer field).
_SEED_TEXT = """
self return function const import export class async await public static void
authenticate validate credentials password username database connection query
handle request response server client config index partition merge sorted runs
posting list term hash block max token count raw freq doc length user id
get set build parse encode decode score rank filter stream batch window
getUserById validateCredentials handleRequest parseQueryString
DatabaseConnection HTTPServerConfig buildIndexPartition mergeSortedRuns
user_id query_plan token_count raw_freq doc_length posting_list term_hash
for while if else try except finally with lambda yield none true false
int str float bool list dict tuple set frozenset bytes bytearray
"""


class HFTokenizerAdapter:
    """Real HuggingFace ``tokenizer.json`` (e.g. StarCoder2's) behind
    the same ``.tokenize(text) -> list[str]`` contract as
    :class:`BPETokenizer` — the real-asset hook for ST1 (VERDICT r3
    item 7; reference ``code-tokenizer.ts:87-118`` AutoTokenizer
    singleton).  Requires the ``tokenizers`` runtime, absent in this
    sandbox; the detect path is covered by a pytest that skips unless
    importable."""

    def __init__(self, path: str):
        from tokenizers import Tokenizer  # gated import

        self._tok = Tokenizer.from_file(path)

    def tokenize(self, text: str) -> list[str]:
        return [t for t in self._tok.encode(text).tokens if t.strip()]


def _is_hf_tokenizer_json(path: str) -> bool:
    """Cheap format sniff: HF tokenizer.json carries a "model" object;
    the offline merge table carries "merges" at top level only."""
    import json as _json

    try:
        with open(path, encoding="utf-8") as f:
            head = _json.load(f)
        return isinstance(head, dict) and "model" in head
    except (OSError, ValueError):
        return False


@lru_cache(maxsize=8)
def loaded_tokenizer(vocab_path: str):
    """External vocabulary loaded once per process per path — the
    query-side counterpart of ``BpeTokenizeStage``'s per-actor load, so
    searches against an index built with ``bpe_vocab_path`` tokenize the
    query with the SAME vocabulary.

    Detect-and-use: a real HF ``tokenizer.json`` (sniffed by format)
    loads through the ``tokenizers`` runtime when importable and falls
    back to the offline merge-table codec otherwise — build and query
    share this single chokepoint, so real assets need zero code change
    outside it."""
    if _is_hf_tokenizer_json(vocab_path):
        try:
            return HFTokenizerAdapter(vocab_path)
        except ImportError as exc:
            # LOUD by design (ADVICE r4): silently substituting the
            # built-in vocabulary would answer queries against an index
            # built elsewhere with a completely different tokenizer —
            # degraded results with no error is the worst failure mode.
            raise RuntimeError(
                f"{vocab_path} is a HuggingFace tokenizer.json but the "
                "'tokenizers' runtime is not installed — refusing to "
                "substitute the built-in vocabulary (a query/index "
                "tokenizer mismatch must be loud). Install 'tokenizers' "
                "or point bpe_vocab_path at an offline merge-table file."
            ) from exc
    return BPETokenizer.load(vocab_path)


@lru_cache(maxsize=1)
def default_tokenizer(n_merges: int = DEFAULT_MERGES) -> BPETokenizer:
    """Process-wide tokenizer trained from the frozen seed text —
    deterministic across processes, engines and the Python oracle."""
    return BPETokenizer(train_bpe([_SEED_TEXT], n_merges))
