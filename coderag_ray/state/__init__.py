"""Persistent engine state (alias package).

The index directory layout, checkpoint manifest, and query-side state
holders live in :mod:`coderag_ray.index`:

- ``index.manifest`` — ``_manifest.json`` / ``meta.json`` (per-partition
  fingerprints, build metrics, global stats; the checkpoint).
- ``index.reader`` — ``IndexReader`` (idf/posting caches,
  ``CompactIndex`` resident view), the per-query-server state.
- ``index.magnitudes`` — per-chunk TF-IDF magnitudes (cosine support).
"""

from coderag_ray.index.manifest import load_manifest, load_meta, save_manifest, save_meta
from coderag_ray.index.reader import CompactIndex, IndexReader, PartitionHandle

__all__ = [
    "CompactIndex", "IndexReader", "PartitionHandle",
    "load_manifest", "load_meta", "save_manifest", "save_meta",
]
