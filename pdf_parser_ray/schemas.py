"""Explicit Arrow schemas for every table the engine reads or writes
(SURVEY.md §1.2 — the reference's schema is implicit/hard-coded; here it
is a single authoritative module)."""

from __future__ import annotations

import pyarrow as pa

# Input: Common-Crawl-style pages (BASELINE.json input_hint).
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

SPAN_TYPE = pa.struct([("start", pa.int64()), ("end", pa.int64()), ("kind", pa.string())])

RECORD_TYPE = pa.struct(
    [
        ("date", pa.string()),  # ISO string, parity with reference output
        ("description", pa.string()),
        ("amount", pa.float64()),  # >= 0 after normalization
        ("direction", pa.string()),  # in | out | unknown
    ]
)

# Output of the flagship extraction pipeline.
EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("content_type", pa.string()),  # html | pdf | empty
        ("encoding", pa.string()),
        ("parser_key", pa.string()),
        ("extracted_text", pa.large_string()),
        ("spans", pa.list_(SPAN_TYPE)),
        ("records", pa.list_(RECORD_TYPE)),
        ("n_records", pa.int32()),
        ("content_sha256", pa.string()),
        ("bucket", pa.int32()),  # hash(url) % NUM_BUCKETS partition key
    ]
)

NUM_BUCKETS = 64
