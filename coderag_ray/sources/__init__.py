"""Input sources for the engine (alias package).

The canonical corpus source is a Parquet table with the input-hint
schema ``(repo, path, commit, lang, content[, doc_id])`` read via
``ray.data.read_parquet``; adapters and the deterministic synthetic
generator live in :mod:`coderag_ray.corpus`.
"""

from coderag_ray.corpus import corpus_from_documents, make_corpus, make_corpus_range

__all__ = ["corpus_from_documents", "make_corpus", "make_corpus_range"]
