"""Per-chunk TF-IDF magnitudes — the cosine-similarity support (A3).

Mirrors the reference's magnitude maintenance
(``/root/reference/packages/core/src/tfidf.ts:118-129``
``calculateMagnitude`` over ``tfidf = (rawFreq/totalTerms) * idf``, and
the SQL pass ``storage-persistent.ts:1051-1062``
``updateChunkMagnitudes``): ``magnitude = sqrt(Σ_t ((freq_t/dl) * idf_t)²)``
over ALL of a chunk's terms.

Runs as one task per partition after the global IDF build — every term
of a chunk is colocated in its partition's postings, so no shuffle is
needed (SURVEY.md §2.5 A3).  Because idf is global, a change to any
partition staleness-invalidates all magnitudes; like the reference's
"incremental" path (``indexer.ts:187-348`` does a global TF-IDF recalc
too), the pass reruns over every partition whenever idf was rebuilt.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from coderag_ray.functions import varint

MAGNITUDES_FILE = "magnitudes.parquet"


def _partition_magnitudes(part_dir: str, idf: dict[str, float]) -> int:
    postings = pq.read_table(os.path.join(part_dir, "postings.parquet"),
                             columns=["term", "df_local", "doc_buf", "freq_buf"])
    docs = pq.read_table(os.path.join(part_dir, "docs.parquet"), columns=["dl"])
    dl = docs["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
    sq = np.zeros(len(dl), dtype=np.float64)
    dl_safe = np.maximum(dl, 1.0)  # zero-token chunks have no postings anyway
    for i in range(postings.num_rows):
        term = postings["term"][i].as_py()
        t_idf = idf.get(term, 0.0)
        if t_idf == 0.0:
            continue
        ords = varint.decode_deltas(postings["doc_buf"][i].as_py()).astype(np.int64)
        freqs = varint.decode(postings["freq_buf"][i].as_py()).astype(np.float64)
        tfidf = (freqs / dl_safe[ords]) * t_idf
        np.add.at(sq, ords, tfidf * tfidf)
    mags = np.sqrt(sq)
    tmp = os.path.join(part_dir, f"_tmp_{MAGNITUDES_FILE}.{os.getpid()}")
    pq.write_table(
        pa.table({"ordinal": pa.array(np.arange(len(dl), dtype=np.int64)),
                  "magnitude": pa.array(mags)}),
        tmp, compression="zstd",
    )
    os.replace(tmp, os.path.join(part_dir, MAGNITUDES_FILE))
    return len(dl)


def build_magnitudes(index_dir: str) -> int:
    """Compute + write magnitudes for every partition (one Ray task each,
    idf dict broadcast once via ``ray.put``)."""
    import ray

    from coderag_ray.index.reader import IndexReader

    reader = IndexReader(index_dir)
    idf_tbl = pq.read_table(os.path.join(index_dir, "idf"), columns=["term", "idf"])
    idf = dict(zip(idf_tbl["term"].to_pylist(), idf_tbl["idf"].to_pylist()))
    idf_ref = ray.put(idf)

    @ray.remote
    def run(part_dir: str, idf_dict):  # ObjectRef arg auto-dereferenced by Ray
        return _partition_magnitudes(part_dir, idf_dict)

    futures = [run.remote(reader.part_dir(p), idf_ref) for p in reader.partitions]
    return int(sum(ray.get(futures)))
