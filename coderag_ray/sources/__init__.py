"""Input sources for the engine.

- :mod:`coderag_ray.sources.files` — real filesystem scan
  (``scanFiles`` + ``loadGitignore`` semantics) → input-hint Dataset.
- :mod:`coderag_ray.corpus` — parquet corpora and the deterministic
  synthetic generator.
"""

from coderag_ray.corpus import corpus_from_documents, make_corpus
from coderag_ray.sources.files import GitignoreFilter, list_files, scan_directory

__all__ = ["GitignoreFilter", "corpus_from_documents", "list_files",
           "make_corpus", "scan_directory"]
