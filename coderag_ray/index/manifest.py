"""Per-partition build manifest — checkpoint, lineage and metrics.

Ray-native replacement for "SQLite is the checkpoint" in the reference
(``/root/reference/packages/core/src/indexer.ts:368-434`` re-index diff,
``:483-507`` skip-unchanged hash check): ``_manifest.json`` records, per
partition, the input fingerprint it was built from plus its build
metrics (docs/sec, postings/sec, bytes) — the north rule's "resumable
from per-partition checkpoints with lineage and build metrics".  A
re-run recomputes only the cheap ingest fingerprints and skips every
partition whose fingerprint matches.
"""

from __future__ import annotations

import json
import os
from typing import Any

MANIFEST_NAME = "_manifest.json"
META_NAME = "meta.json"


def _atomic_write_json(path: str, obj: Any) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def load_manifest(index_dir: str) -> dict | None:
    p = os.path.join(index_dir, MANIFEST_NAME)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def save_manifest(index_dir: str, version: int, config: dict, partitions: dict[int, dict],
                  *, input_files: dict[str, list] | None = None) -> None:
    obj = {
        "schema_version": version,
        "config": config,
        "partitions": {str(k): v for k, v in sorted(partitions.items())},
    }
    if input_files is not None:
        # tier-1 resume fingerprint: {path: [size, mtime_ns]} of every
        # input file — lets a no-op resume skip the content scan
        obj["input_files"] = input_files
    _atomic_write_json(os.path.join(index_dir, MANIFEST_NAME), obj)


def load_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, META_NAME)) as f:
        return json.load(f)


def save_meta(index_dir: str, meta: dict) -> None:
    _atomic_write_json(os.path.join(index_dir, META_NAME), meta)


def manifest_partitions(m: dict | None) -> dict[int, dict]:
    if not m:
        return {}
    return {int(k): v for k, v in m.get("partitions", {}).items()}


def fingerprint_of(n_docs: int, sha_sum: int) -> str:
    """Cheap order-independent partition input fingerprint over the
    partition's non-empty docs: doc count + Σ sha256-prefix.  Empty docs
    are excluded on purpose — they contribute nothing to the index, and
    excluding them lets the partition writer recompute the identical
    fingerprint from its chunk group (fresh builds then skip the
    separate ingest fingerprint pass entirely)."""
    return f"{n_docs}:{sha_sum & 0xFFFFFFFFFFFFFFFF:x}"
