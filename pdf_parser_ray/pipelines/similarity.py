"""Similarity search over the embedding column.

* ``knn_cosine`` — exact brute-force top-k: the query vector is
  broadcast (closure capture of a small ndarray), each batch computes a
  vectorized cosine against it and emits only its local top-k, and the
  global top-k is a sort+limit over ≤ k·num_batches candidate rows.  At
  100 TB the per-batch top-k is what keeps the exchange tiny — the sort
  never sees the full corpus.
* ``knn_lsh`` — the scale path: random-hyperplane signatures bucket the
  corpus; only buckets within 1 bit of the query signature are scored
  (probing), trading recall for a ~2^bits search-space reduction.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from .dedup import _blocks_for


def _query_vector(sf_dir: str, query_vec_id: int) -> np.ndarray:
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = t.column("vec_id").to_pylist()
    idx = ids.index(query_vec_id)
    return np.array(t.column("embedding")[idx].as_py(), dtype=np.float64)


def _batch_cosine(vecs: np.ndarray, q: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(vecs, axis=1) * np.linalg.norm(q)
    norms[norms == 0] = np.inf
    return (vecs @ q) / norms


def knn_cosine(sf_dir: str, query_vec_id: int = 0, k: int = 10) -> rd.Dataset:
    """(vec_id,): exact top-k ids by cosine similarity to the query
    vector (query row excluded).  Ranking uses integer micro-units with
    a vec_id tie-break so Ray and the SQL oracle order identically; the
    float score itself is dropped from the output to keep the comparison
    rounding-safe."""
    q = _query_vector(sf_dir, query_vec_id)

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        vecs = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        cos = _batch_cosine(vecs, q)
        mask = ids != query_vec_id
        ids, cos = ids[mask], cos[mask]
        if len(ids) > k:
            keep = np.argpartition(-cos, k)[:k]
            ids, cos = ids[keep], cos[keep]
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cos_micros": pa.array(
                    np.rint(cos * 1_000_000).astype(np.int64), pa.int64()
                ),
            }
        )

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    ds = rd.read_parquet(
        emb_path,
        columns=["vec_id", "embedding"],
        override_num_blocks=_blocks_for(emb_path),
    )
    return (
        ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["cos_micros", "vec_id"], descending=[True, False])
        .limit(k)
        .select_columns(["vec_id"])
    )


_LSH_BITS = 8


def _signatures(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    return ((vecs @ planes) > 0).dot(1 << np.arange(planes.shape[1])).astype(np.int64)


def knn_lsh(sf_dir: str, query_vec_id: int = 0, k: int = 10) -> rd.Dataset:
    """(vec_id, cos_micros): approximate top-k — scores only vectors
    whose hyperplane signature is within hamming distance 1 of the
    query's (multi-probe LSH)."""
    q = _query_vector(sf_dir, query_vec_id)
    rng = np.random.default_rng(20240817)
    planes = rng.standard_normal((q.shape[0], _LSH_BITS))
    q_sig = int(_signatures(q[None, :], planes)[0])
    probe = {q_sig} | {q_sig ^ (1 << b) for b in range(_LSH_BITS)}

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        vecs = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        sigs = _signatures(vecs, planes)
        mask = np.isin(sigs, list(probe)) & (ids != query_vec_id)
        ids, vecs = ids[mask], vecs[mask]
        if len(ids) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "cos_micros": pa.array([], pa.int64())}
            )
        cos = _batch_cosine(vecs, q)
        if len(ids) > k:
            keep = np.argpartition(-cos, k)[:k]
            ids, cos = ids[keep], cos[keep]
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cos_micros": pa.array(
                    np.rint(cos * 1_000_000).astype(np.int64), pa.int64()
                ),
            }
        )

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    ds = rd.read_parquet(
        emb_path,
        columns=["vec_id", "embedding"],
        override_num_blocks=_blocks_for(emb_path),
    )
    return (
        ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["cos_micros", "vec_id"], descending=[True, False])
        .limit(k)
    )


def embedding_norms(sf_dir: str) -> rd.Dataset:
    """(vec_id, l2_micros): vectorized L2 norm per embedding."""

    def norms(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        l2 = np.linalg.norm(vecs, axis=1)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "l2_micros": pa.array(
                    np.rint(l2 * 1_000_000).astype(np.int64), pa.int64()
                ),
            }
        )

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    return rd.read_parquet(
        emb_path,
        columns=["vec_id", "embedding"],
        override_num_blocks=_blocks_for(emb_path),
    ).map_batches(norms, batch_format="pyarrow", zero_copy_batch=True)
