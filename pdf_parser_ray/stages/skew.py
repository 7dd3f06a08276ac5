"""Explicit skew handling (north_rule: "byte-size-aware repartition +
groupby(url-hash-bucket)"; SURVEY.md §4.2).

Two independent mechanisms:

* **Byte-size routing** — a single multi-hundred-MB page is an
  indivisible row: inside a 32-row batch it blows the worker heap and
  the block it lands in.  ``split_by_size`` routes rows over a byte
  threshold to a dedicated branch processed with ``batch_size=1`` and
  extra per-task memory headroom, while the small branch keeps large
  batches.  The split is a vectorized ``binary_length`` filter — the
  giant branch discards non-giant rows immediately after the read, so
  the second pass over the input is column-pruned and cheap relative to
  the extraction it protects.
* **URL-hash bucketing** — ``bucket = crc32(url) % NUM_BUCKETS`` is the
  single partition key reused everywhere (output layout, resume
  lineage, any later co-location shuffle).  ``bucketed_output`` writes
  one directory per bucket via parquet partitioning, which spreads hot
  shards and gives reruns partition-granular identity.  The bucket
  column is cheap to compute and *carrying the key beats shuffling*:
  the extraction itself is embarrassingly parallel, so no groupby is
  needed before it — the shuffle that the key enables (co-locating a
  url's rows for dedup or incremental re-crawls) happens downstream and
  only when a consumer needs it.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

DEFAULT_GIANT_BYTES = 8 * 1024 * 1024


def with_payload_size(pages: rd.Dataset) -> rd.Dataset:
    """Add a ``payload_bytes`` column (vectorized; no python loop)."""
    return pages.map_batches(
        lambda t: t.append_column(
            "payload_bytes", pc.cast(pc.binary_length(t.column("html")), pa.int64())
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def split_by_size(
    pages: rd.Dataset, threshold_bytes: int = DEFAULT_GIANT_BYTES
) -> tuple[rd.Dataset, rd.Dataset]:
    """-> (small, giant) branches; both lazy, both column-pruned reads."""

    def keep_small(t: pa.Table) -> pa.Table:
        return t.filter(pc.less_equal(pc.binary_length(t.column("html")), threshold_bytes))

    def keep_giant(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(pc.binary_length(t.column("html")), threshold_bytes))

    small = pages.map_batches(keep_small, batch_format="pyarrow", zero_copy_batch=True)
    giant = pages.map_batches(keep_giant, batch_format="pyarrow", zero_copy_batch=True)
    return small, giant


def extract_with_size_routing(
    pages: rd.Dataset,
    *,
    threshold_bytes: int = DEFAULT_GIANT_BYTES,
    small_batch_size: int = 64,
    giant_num_cpus: float = 2.0,
) -> rd.Dataset:
    """The size-aware extraction plan: big batches for the common case,
    one-row tasks with reserved memory headroom for giants, unioned."""
    from .extract import extract_batch

    small, giant = split_by_size(pages, threshold_bytes)
    small_out = small.map_batches(
        extract_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=small_batch_size,
    )
    giant_out = giant.map_batches(
        extract_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1,
        num_cpus=giant_num_cpus,  # reserves heap headroom per giant row
    )
    return small_out.union(giant_out)


def bucketed_output(extracted: rd.Dataset, out_dir: str) -> None:
    """Write the extraction output partitioned by the url-hash bucket —
    one directory per bucket, the resumable layout unit."""
    extracted.write_parquet(out_dir, partition_cols=["bucket"])
