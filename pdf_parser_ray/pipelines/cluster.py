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

from .io_util import arrow_udf, list_column_matrix, read_parquet_clean

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
        vecs = list_column_matrix(batch.column("embedding"))
        state = np.zeros((k, dim + 1), np.float64)
        # seq orders the merge: first vec_id is unique across non-empty
        # batches (row ids are unique), and empty batches (-1, possibly
        # several) carry all-zero states whose addition is exact at any
        # position — so equal-seq rows can never perturb the float sum
        seq = -1
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
        .map_groups(arrow_udf(reduce_bucket), batch_format="pandas")
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


def _emb_dim(emb_path: str) -> int:
    import pyarrow.parquet as pq

    first = pq.ParquetFile(emb_path).read_row_group(0, columns=["embedding"])
    return len(first.column("embedding")[0].as_py())


def _fit_centroids(make_ds, dim: int, k: int, iters: int) -> np.ndarray:
    """Lloyd's loop over a dataset factory: the parquet is re-read per
    iteration on purpose — at corpus scale a ``materialize()`` would pin
    the vectors in the object store, while re-reading streams them with
    backpressure."""
    cents = _init_centroids(k, dim)
    for _ in range(iters):
        cents = _one_pass_centroids(make_ds(), cents)
    return cents


def _assign_ds(make_ds, cents: np.ndarray) -> rd.Dataset:
    def assign_batch(batch: pa.Table) -> pa.Table:
        vecs = list_column_matrix(batch.column("embedding"))
        a = _assign(vecs, cents) if len(vecs) else np.zeros(0, np.int64)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "cluster": pa.array(a.astype(np.int64)),
            }
        )

    return make_ds().map_batches(
        assign_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def kmeans_embeddings(
    sf_dir: str, k: int = KM_K, iters: int = KM_ITERS
) -> rd.Dataset:
    """(vec_id, cluster): Lloyd's k-means assignment after ``iters``
    full-pass iterations from the deterministic init.  Empty clusters
    keep their previous centroid (mirrored by the oracle's COALESCE)."""
    from .dedup import _blocks_for

    emb_path = os.path.join(sf_dir, "embeddings.parquet")

    def ds() -> rd.Dataset:
        return read_parquet_clean(
            emb_path,
            columns=["vec_id", "embedding"],
            override_num_blocks=_blocks_for(emb_path),
        )

    dim = _emb_dim(emb_path)
    cents = _fit_centroids(ds, dim, k, iters)
    return _assign_ds(ds, cents)


SEMDEDUP_THRESHOLD_MILLIS = 950


def semantic_dedup(
    sf_dir: str,
    threshold_millis: int = SEMDEDUP_THRESHOLD_MILLIS,
    k: int = KM_K,
    iters: int = KM_ITERS,
) -> rd.Dataset:
    """(vec_id, cluster, keep): SemDeDup-style semantic deduplication —
    k-means clusters the (clone-augmented) embedding corpus, then within
    each cluster a vector is dropped (keep=0) when a SMALLER-id vector
    in the same cluster has cosine >= the trunc-millis threshold.

    Scale shape: clustering is the bucketing structure that makes
    within-bucket pairwise feasible — pick k ≈ N / target_cluster_size
    so each ``map_groups`` matmul stays bounded (SemDeDup uses k in the
    tens of thousands at corpus scale; the per-cluster work never
    leaves the workers).  The same clone augmentation as
    embedding_dedup guarantees the operator provably fires."""
    import pandas as pd

    from .dedup import _blocks_for, vec_clone_arrays

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    dim = _emb_dim(emb_path)

    def clone_stage(batch: pa.Table) -> pa.Table:
        ids, arr = vec_clone_arrays(batch, dim)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in arr], pa.list_(pa.float64())
                ),
            }
        )

    def ds() -> rd.Dataset:
        return read_parquet_clean(
            emb_path,
            columns=["vec_id", "embedding"],
            override_num_blocks=_blocks_for(emb_path),
        ).map_batches(clone_stage, batch_format="pyarrow", zero_copy_batch=True)

    cents = _fit_centroids(ds, dim, k, iters)

    def assign_with_vec(batch: pa.Table) -> pa.Table:
        vecs = list_column_matrix(batch.column("embedding"))
        a = _assign(vecs, cents) if len(vecs) else np.zeros(0, np.int64)
        return pa.table(
            {
                "cluster": pa.array(a.astype(np.int64)),
                "vec_id": batch.column("vec_id"),
                "embedding": batch.column("embedding"),
            }
        )

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy().astype(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        vecs = np.array(g["embedding"].tolist(), np.float64)[order]
        norms = np.linalg.norm(vecs, axis=1)
        denom = np.outer(norms, norms)
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(denom > 0, (vecs @ vecs.T) / denom, 0.0)
        millis = np.trunc(cos * 1000)
        # row i is a dup when some j < i (smaller id) clears the bar
        dup = np.tril(millis >= threshold_millis, k=-1).any(axis=1)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": np.full(len(ids), int(g["cluster"].iloc[0]), np.int64),
                "keep": (~dup).astype(np.int64),
            }
        )

    return (
        ds()
        .map_batches(assign_with_vec, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cluster")
        .map_groups(arrow_udf(prune), batch_format="pandas")
    )


def label_centroids(sf_dir: str) -> rd.Dataset:
    """(label, d, sum_micros, n): per-label embedding centroid as EXACT
    per-dimension integer sums — each component floors to micros BEFORE
    summation, so the aggregate is order-free and the SQL oracle hashes
    identically (a float sum would depend on reduction order).  The
    mean is sum_micros / n downstream.

    Scale shape: per-batch partial (label, component-sum vector, n)
    rows — one narrow row per label per batch — then a label groupby
    combines partials and explodes to (label, d) rows.  The exchange
    carries labels × blocks rows, never vectors."""
    import os

    import pandas as pd

    from .dedup import _blocks_for
    from .io_util import list_column_matrix, read_parquet_clean

    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = read_parquet_clean(
        path,
        columns=["label", "embedding"],
        override_num_blocks=_blocks_for(path),
    )

    def partials(batch: pa.Table) -> pa.Table:
        vecs = list_column_matrix(batch.column("embedding"))
        micros = np.floor(vecs * 1_000_000).astype(np.int64)
        labels = batch.column("label").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        uniq = np.unique(labels)
        dim = micros.shape[1] if len(micros) else 0
        sums = np.zeros((len(uniq), dim), np.int64)
        ns = np.zeros(len(uniq), np.int64)
        idx = np.searchsorted(uniq, labels)
        np.add.at(sums, idx, micros)
        np.add.at(ns, idx, 1)
        return pa.table(
            {
                "label": pa.array(uniq),
                "state": pa.array(sums.tolist(), pa.list_(pa.int64())),
                "n": pa.array(ns),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        s = np.array(g["state"].tolist(), np.int64).sum(axis=0)
        rows = pd.DataFrame(
            {
                "label": int(g["label"].iloc[0]),
                "d": np.arange(len(s), dtype=np.int64),
                "sum_micros": s,
                "n": int(g["n"].sum()),
            }
        )
        return rows

    return (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("label")
        .map_groups(arrow_udf(combine), batch_format="pandas")
    )
