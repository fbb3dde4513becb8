"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Generates a Parquet-shaped table with exactly the input-hint schema
``(repo, path, commit, lang, content)`` plus a dense ``doc_id``.
Content mimics the reference's own test fixtures
(``/root/reference/packages/core/src/indexer.test.ts:29-68``: small TS
files around ``authenticate`` / ``DatabaseConnection`` / ``handleRequest``)
with controlled properties:

- Zipfian-hot terms (``self``, ``return``, ``function``, ``const``) in
  every file, plus a long tail of rare identifiers (``getUserById{n}``)
  so IDF varies and skew handling is exercised.
- camelCase / snake_case identifiers for tokenizer-split coverage.
- A size spread including multi-chunk files (>1000 chars), empty and
  whitespace-only files (zero-token chunks must count toward N/avgdl),
  oversize files (> max_file_size) and exact duplicate contents under
  different paths.

Everything derives from ``seed`` via a counter-based PRNG — no global
state, stable across processes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_EXTS = ["ts", "py", "go", "rs", "java", "js", "md"]
_LANGS = {"ts": "typescript", "py": "python", "go": "go", "rs": "rust",
          "java": "java", "js": "javascript", "md": "markdown"}

_HOT = ["self", "return", "function", "const", "import", "export", "class"]
_CAMEL = ["getUserById", "validateCredentials", "handleRequest", "parseQueryString",
          "DatabaseConnection", "HTTPServerConfig", "buildIndexPartition", "mergeSortedRuns"]
_SNAKE = ["user_id", "query_plan", "token_count", "raw_freq", "doc_length",
          "posting_list", "term_hash", "block_max"]
_VERBS = ["query", "connect", "authenticate", "validate", "merge", "encode",
          "decode", "score", "rank", "filter"]


def _rng(seed: int, i: int) -> np.random.Generator:
    return np.random.default_rng(np.random.PCG64(seed * 1_000_003 + i))


def _gen_content(seed: int, i: int, target_chars: int) -> str:
    g = _rng(seed, i)
    lines = [f"// module {i} generated fixture", "import { config } from './config'"]
    rare = f"{_CAMEL[int(g.integers(len(_CAMEL)))]}{i % 997}"
    while sum(len(ln) + 1 for ln in lines) < target_chars:
        v = _VERBS[int(g.integers(len(_VERBS)))]
        c = _CAMEL[int(g.integers(len(_CAMEL)))]
        s = _SNAKE[int(g.integers(len(_SNAKE)))]
        h = _HOT[int(g.integers(len(_HOT)))]
        kind = int(g.integers(4))
        if kind == 0:
            lines.append(f"export function {v}{c}({s}) {{ {h} {s}.{v}(); }}")
        elif kind == 1:
            lines.append(f"const {s} = {rare}({c.lower()}_{v}); return {s};")
        elif kind == 2:
            lines.append(f"class {c} {{ {v}() {{ return self.{s} + {int(g.integers(100))}; }} }}")
        else:
            lines.append(f"if ({s} > 0) {{ {h} {v}({rare}); }} // {h} {h}")
    text = "\n".join(lines)
    return text[:target_chars] if len(text) > target_chars else text


def make_corpus(n_docs: int = 500, seed: int = 42, max_file_size: int = 1024 * 1024) -> pa.Table:
    """Build the synthetic corpus table; deterministic in (n_docs, seed)."""
    return make_corpus_range(0, n_docs, seed, max_file_size)


def make_corpus_range(lo: int, hi: int, seed: int = 42,
                      max_file_size: int = 1024 * 1024) -> pa.Table:
    """Rows [lo, hi) of the corpus — each row depends only on its index,
    so ranges can be generated in parallel (bench.py fans this out with
    ``ray.data.range(...).map_batches``)."""
    repos, paths, commits, langs, contents = [], [], [], [], []
    dup_cache: str | None = None
    for i in range(lo, hi):
        g = _rng(seed, 10_000_000 + i)
        ext = _EXTS[i % len(_EXTS)]
        repo = f"org{i % 7}/repo{i % 23}"
        path = f"src/mod{i % 41}/file{i}.{ext}"
        commit = hashlib.sha256(f"{repo}|{path}|{seed}".encode()).hexdigest()[:40]
        mod = i % 50
        if mod == 47:
            content = ""  # empty file
        elif mod == 48:
            content = "   \n\t\n  "  # whitespace-only → zero-token chunk
        elif mod == 49:
            content = "// big\n" + "x" * (max_file_size + 10)  # oversize → filtered
        elif mod in (23, 24):
            # exact duplicates under different paths (same sha256)
            if dup_cache is None:
                dup_cache = _gen_content(seed, -1, 800)
            content = dup_cache
        else:
            # log-uniform size spread 300..6000 chars → 1-7 chunks
            target = int(np.exp(g.uniform(np.log(300), np.log(6000))))
            content = _gen_content(seed, i, target)
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
        langs.append(_LANGS[ext])
        contents.append(content)
    return pa.table(
        {
            "doc_id": pa.array(range(lo, hi), type=pa.int64()),
            "repo": pa.array(repos),
            "path": pa.array(paths),
            "commit": pa.array(commits),
            "lang": pa.array(langs),
            "content": pa.array(contents),
        }
    )


def corpus_from_documents(sf_dir: str):
    """Adapt the driver's ``documents`` table to the corpus schema.

    ``documents(doc_id, text, lang, source, n_chars)`` →
    ``(doc_id, repo=source, path='doc/<id>', commit='', lang, content=text)``.
    Returns a lazy ray Dataset (shared adapter with the jsonl/csv
    sources, so every interchange format maps identically).
    """
    import ray.data

    # scan-level pruning: n_chars is never consumed by the build
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang", "source"])
    return _adapt_documents(ds)


def _adapt_documents(ds):
    """documents-shaped Dataset → corpus schema (shared by the parquet /
    jsonl / csv sources).  Missing optional columns (lang, source) are
    filled with defaults so any docs-like dump indexes."""
    import pyarrow.compute as pc

    def adapt(t: pa.Table) -> pa.Table:
        did = pc.cast(t["doc_id"], pa.int64())
        n = len(t)
        lang = t["lang"] if "lang" in t.column_names else pa.array(
            ["text"] * n, type=pa.string())
        src = t["source"] if "source" in t.column_names else pa.array(
            ["import"] * n, type=pa.string())
        return pa.table(
            {
                "doc_id": did,
                "repo": pc.cast(src, pa.string()),
                "path": pc.binary_join_element_wise(
                    pa.array(["doc"] * n), pc.cast(did, pa.string()), "/"
                ),
                "commit": pa.array([""] * n, type=pa.string()),
                "lang": pc.cast(lang, pa.string()),
                "content": pc.cast(t["text"], pa.string()),
            }
        )

    return ds.map_batches(adapt, batch_format="pyarrow")


def corpus_from_jsonl(path: str):
    """Index a JSONL dump of documents (``{"doc_id": ..., "text": ...}``
    per line, optional ``lang``/``source``) — the interchange format
    most training-data dumps ship in.  Lazy distributed read
    (``ray.data.read_json`` handles files or directories of ``.jsonl``/
    ``.json`` parts); same downstream pipeline as the parquet source.
    """
    import ray.data

    return _adapt_documents(ray.data.read_json(path))


def corpus_from_csv(path: str):
    """Index a CSV dump of documents (header must include ``doc_id`` and
    ``text``; optional ``lang``/``source``).  Lazy distributed read."""
    import ray.data

    return _adapt_documents(ray.data.read_csv(path))
