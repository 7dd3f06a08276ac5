"""Explicit skew handling (north_rule: "byte-size-aware repartition +
groupby(url-hash-bucket)"; SURVEY.md §4.2).

Two independent mechanisms:

* **Byte-size routing** — a single multi-hundred-MB page is an
  indivisible row: decoding it alongside 63 siblings multiplies the
  task's transient heap.  ``extract_with_size_routing`` is a **single
  fused pass**: each batch is partitioned by a vectorized
  ``binary_length`` mask, the small rows extract in one vectorized
  call, and each giant row extracts on its own 1-row slice so at most
  one giant document is decoded at a time per task.  The input is read
  exactly once — the earlier two-branch design re-scanned the wide
  payload column per branch, doubling the dominant I/O at scale.  (If
  giants ever need *dedicated task resources* rather than just bounded
  decode memory, persist ``payload_bytes`` at ingest and push
  ``filter=payload_bytes > t`` into the scan so the giant branch prunes
  to the row groups that contain giants.)
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


def split_batch_by_size(
    batch: pa.Table, threshold_bytes: int
) -> tuple[pa.Table, pa.Table]:
    """One-pass (small, giant) partition of a batch on payload bytes —
    a vectorized mask, each side a zero-copy filter view."""
    giant_mask = pc.greater(pc.binary_length(batch.column("html")), threshold_bytes)
    return batch.filter(pc.invert(giant_mask)), batch.filter(giant_mask)


def routed_extract(batch: pa.Table, threshold_bytes: int) -> pa.Table:
    """The fused size-routing task body: small rows extract in one
    vectorized call, each giant row extracts on its own zero-copy
    1-row slice so at most ONE decoded giant is live per task at a
    time.  Module-level (not a closure) so the memory-ceiling test can
    measure exactly the shipped code path
    (tests/test_skew.py::TestGiantRowMemory)."""
    from .extract import extract_batch

    small, giant = split_batch_by_size(batch, threshold_bytes)
    outs = []
    if small.num_rows:
        outs.append(extract_batch(small))
    for i in range(giant.num_rows):
        outs.append(extract_batch(giant.slice(i, 1)))
    if not outs:
        outs.append(extract_batch(batch))  # typed empty passthrough
    return pa.concat_tables(outs)


def extract_with_size_routing(
    pages: rd.Dataset,
    *,
    threshold_bytes: int = DEFAULT_GIANT_BYTES,
    small_batch_size: int = 64,
) -> rd.Dataset:
    """The size-aware extraction plan, as ONE pass over the input:
    small rows extract vectorized, giant rows extract one-per-slice so
    a task never holds more than one decoded giant at a time."""
    import functools

    return pages.map_batches(
        functools.partial(routed_extract, threshold_bytes=threshold_bytes),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=small_batch_size,
    )


def bucketed_output(extracted: rd.Dataset, out_dir: str) -> None:
    """Write the extraction output partitioned by the url-hash bucket —
    one directory per bucket, the resumable layout unit."""
    extracted.write_parquet(out_dir, partition_cols=["bucket"])
