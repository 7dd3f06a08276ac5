"""Flagship pipeline: read pages parquet -> fused extraction actor pool
-> (optionally) partitioned parquet out.

Pure ``Dataset`` composition — lazy, streaming, no mid-pipeline
materialization.  Scale knobs:

* ``batch_size`` is small (default 64 rows) because the ``html`` payload
  column is wide; batch bytes ≈ rows × mean payload, and the actor holds
  one decoded document at a time.
* ``concurrency`` sizes the extraction actor pool.  Leave 1-2 CPUs of
  headroom for the read/write stages so the pipeline doesn't serialize
  (a pool that reserves every CPU starves I/O).
* Reads prune to the five input columns explicitly; extraction drops the
  payload column so everything downstream of the actor pool is narrow.
"""

from __future__ import annotations

from typing import Any

import ray.data as rd

from ..stages.extract import ExtractPages, extract_batch

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]
DEFAULT_BATCH_SIZE = 64


def read_pages(paths: str | list[str], **read_kwargs: Any) -> rd.Dataset:
    return rd.read_parquet(paths, columns=PAGES_COLUMNS, **read_kwargs)


def build_extraction_pipeline(
    pages: rd.Dataset,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> rd.Dataset:
    """Default: stateless tasks (warm module state reused across tasks by
    Ray's persistent worker processes; fully elastic scheduling).  Pass
    ``concurrency`` to switch to a fixed actor pool — only worth it for
    extractors with real per-pool construction cost."""
    if concurrency is None:
        return pages.map_batches(
            extract_batch,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
        )
    return pages.map_batches(
        ExtractPages,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def extract_dir(
    pages_dir: str,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> rd.Dataset:
    return build_extraction_pipeline(
        read_pages(pages_dir), concurrency=concurrency, batch_size=batch_size
    )


def domain_stats(
    pages_dir: str, *, batch_size: int = DEFAULT_BATCH_SIZE
) -> rd.Dataset:
    """(host, n_pages, total_chars): per-host page counts and extracted
    main-content volume — the standard per-domain curation rollup
    (domain blocklists, crawl budgeting, per-site quality triage).

    Scale shape: the host is computed with a vectorized Arrow regex on
    the ``url`` column, and each batch is collapsed to one partial row
    per distinct host (Arrow ``group_by``) before the global groupby, so
    the exchange carries domain-cardinality partials, not
    page-cardinality rows.  Runs on the extraction output, so the
    oracle covers the full HTML/PDF extraction path per domain."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(
            batch.column("url"), pattern=r"^[a-z]+://(?P<host>[^/]+)"
        )
        hosts = pc.fill_null(pc.struct_field(m, "host"), "")
        t = pa.table(
            {
                "host": hosts,
                "n_pages": pa.array([1] * len(batch), pa.int64()),
                "total_chars": pc.cast(
                    pc.utf8_length(batch.column("extracted_text")), pa.int64()
                ),
            }
        )
        g = t.group_by("host").aggregate(
            [("n_pages", "sum"), ("total_chars", "sum")]
        )
        return pa.table(
            {
                "host": g.column("host"),
                "n_pages": g.column("n_pages_sum"),
                "total_chars": g.column("total_chars_sum"),
            }
        )

    return (
        extract_dir(pages_dir, batch_size=batch_size)
        .select_columns(["url", "extracted_text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("host")
        .aggregate(
            Sum("n_pages", alias_name="n_pages"),
            Sum("total_chars", alias_name="total_chars"),
        )
    )
