"""Distributed k-means over the embedding column — the centroid-learning
building block behind IVF partitioning and embedding-space ("semantic")
dedup/curation at corpus scale.

Scale shape: each Lloyd iteration is ONE streaming pass over the
vectors — assignment is a vectorized numpy distance computation per
batch against the (tiny, broadcast-by-closure) centroid matrix, and the
centroid update is a partial-sum combiner: every batch emits a single
constant-size (k, dim+1) sum/count state row, the narrow state rows
tree-reduce through a 64-bucket ``groupby`` level, and the driver sums
64 rows into the next centroids.  The wide embedding column never
shuffles; the only driver state is k centroids per round.

Determinism (what makes the DuckDB oracle possible): centroids are
initialised from an integer formula, all math is float64, distances use
the direct sum-of-squared-differences form, argmin ties break to the
lowest cluster index, and every merge sums the partial states in sorted
key order — so identical input always yields identical centroids, and
the oracle unrolls the same iterations in SQL.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .io_util import read_parquet_clean

KM_K = 8
KM_ITERS = 3
_REDUCE_BUCKETS = 64


def _init_centroids(k: int, dim: int) -> np.ndarray:
    """Deterministic integer-formula init (recomputable in SQL):
    c[j, d] = (((j*61 + d*53) % 41) - 20) / 20  ∈ [-1, 1]."""
    j = np.arange(k, dtype=np.int64)[:, None]
    d = np.arange(dim, dtype=np.int64)[None, :]
    return (((j * 61 + d * 53) % 41) - 20) / 20.0


def _assign(vecs: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Argmin Euclidean assignment, ties to the lowest cluster index.
    Uses the direct (v - c)^2 sum (one k-length Python loop, vectorized
    over the batch) so the oracle's per-dimension SQL sum computes the
    same formula."""
    dists = np.stack([((vecs - c) ** 2).sum(axis=1) for c in cents])
    return np.argmin(dists, axis=0)


def _one_pass_centroids(ds: rd.Dataset, cents: np.ndarray) -> np.ndarray:
    """One Lloyd update: per-batch partial (sum, count) states, reduced
    through a 64-bucket groupby (narrow rows only), summed on the driver
    in sorted bucket order."""
    k, dim = cents.shape

    def partials(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch.column("embedding").to_pylist(), np.float64)
        state = np.zeros((k, dim + 1), np.float64)
        seq = 0
        if len(vecs):
            a = _assign(vecs, cents)
            np.add.at(state[:, :dim], a, vecs)
            np.add.at(state[:, dim], a, 1.0)
            seq = int(batch.column("vec_id")[0].as_py())
        return pa.table(
            {
                "g": pa.array([seq % _REDUCE_BUCKETS], pa.int32()),
                "seq": pa.array([seq], pa.int64()),
                "state": pa.array(
                    [state.ravel().tolist()], pa.list_(pa.float64())
                ),
            }
        )

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("seq")  # fixed merge order -> deterministic sum
        s = np.array(g["state"].tolist(), np.float64).sum(axis=0)
        return pd.DataFrame(
            {"g": [int(g["g"].iloc[0])], "seq": [0], "state": [s.tolist()]}
        )

    rows = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .map_groups(reduce_bucket, batch_format="pandas")
        .to_pandas()
    )
    rows = rows.sort_values("g")
    state = np.array(rows["state"].tolist(), np.float64).sum(axis=0)
    state = state.reshape(k, dim + 1)
    counts = state[:, dim]
    new = cents.copy()
    nonempty = counts > 0
    new[nonempty] = state[nonempty, :dim] / counts[nonempty, None]
    return new


def kmeans_embeddings(
    sf_dir: str, k: int = KM_K, iters: int = KM_ITERS
) -> rd.Dataset:
    """(vec_id, cluster): Lloyd's k-means assignment after ``iters``
    full-pass iterations from the deterministic init.  Empty clusters
    keep their previous centroid (mirrored by the oracle's COALESCE).
    The parquet is re-read per iteration on purpose: at corpus scale a
    ``materialize()`` would pin the vectors in the object store, while
    re-reading streams them with backpressure."""
    from .dedup import _blocks_for

    emb_path = os.path.join(sf_dir, "embeddings.parquet")

    def ds() -> rd.Dataset:
        return read_parquet_clean(
            emb_path,
            columns=["vec_id", "embedding"],
            override_num_blocks=_blocks_for(emb_path),
        )

    import pyarrow.parquet as pq

    first = pq.ParquetFile(emb_path).read_row_group(0, columns=["embedding"])
    dim = len(first.column("embedding")[0].as_py())

    cents = _init_centroids(k, dim)
    for _ in range(iters):
        cents = _one_pass_centroids(ds(), cents)
    final = cents

    def assign_batch(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch.column("embedding").to_pylist(), np.float64)
        a = _assign(vecs, final) if len(vecs) else np.zeros(0, np.int64)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "cluster": pa.array(a.astype(np.int64)),
            }
        )

    return ds().map_batches(
        assign_batch, batch_format="pyarrow", zero_copy_batch=True
    )
