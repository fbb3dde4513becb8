"""Multimodal (binary-payload) stage plumbing.

Treats media as opaque ``binary`` columns with typed metadata.  The
actual decoders (image/audio libs) are NOT in this container, so
``decode_image`` raises ``NotImplementedError`` and the pipeline runs a
clearly-marked deterministic fake — but the Ray-side plumbing (schema,
actor-pool signature, small batch size for wide binary rows, output
layout) is real and tested, per the multimodal-stub requirement.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def decode_image(payload: bytes) -> "object":
    """Real decoder stub — requires an image library not present here."""
    raise NotImplementedError(
        "image decoding requires an imaging library not installed in this "
        "environment; MediaFeatureStage uses the deterministic fake instead"
    )


class MediaFeatureStage:
    """Actor-pool ``map_batches`` stage: binary payload → feature row.

    ``__init__`` is where a real model/decoder would load once per
    actor; ``__call__`` handles a (small) batch of wide binary rows.
    Fake features are pure functions of the payload bytes so the DuckDB
    oracle can mirror them: ``n_bytes``, ``payload_sha256``, and
    ``fake_width/fake_height`` derived from ``n_bytes``.
    """

    def __init__(self, use_real_decoder: bool = False):
        self.use_real_decoder = use_real_decoder

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        if self.use_real_decoder:
            decode_image(payloads[0])  # raises: documented stub
        n_bytes = np.array([len(p) for p in payloads], dtype=np.int64)
        shas = [hashlib.sha256(p).hexdigest() for p in payloads]
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_bytes": pa.array(n_bytes),
                "payload_sha256": pa.array(shas, type=pa.string()),
                "fake_width": pa.array((n_bytes % 64 + 1).astype(np.int64)),
                "fake_height": pa.array(((n_bytes // 64) % 64 + 1).astype(np.int64)),
            }
        )


def media_features(docs_ds, batch_size: int = 256, concurrency: int = 2):
    """documents → binary payload (utf-8 of text, standing in for image
    bytes) → actor-pool feature extraction."""

    def to_payload(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "payload": pc.cast(t["text"], pa.binary()),
            }
        )

    return docs_ds.map_batches(to_payload, batch_format="pyarrow").map_batches(
        MediaFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size,  # wide binary rows → small batches
        concurrency=concurrency,
    )
