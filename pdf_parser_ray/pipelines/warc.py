"""WARC-style crawl-archive source/sink for the pages corpus — the
canonical web-crawl interchange shape: one archive file per shard,
each record a response block

    WARC/1.0\\r\\n
    WARC-Type: response\\r\\n
    WARC-Target-URI: <url>\\r\\n
    WARC-Date-US: <epoch micros>\\r\\n
    X-Extracted-Text-Length: <bytes of the text field>\\r\\n
    X-Lang: <lang>\\r\\n
    Content-Length: <payload bytes>\\r\\n
    \\r\\n
    <payload bytes>\\r\\n<utf-8 text>\\r\\n\\r\\n

(a faithful subset of ISO 28500 framing — length-delimited payloads
after a CRLF-terminated header block — with the extracted text carried
as a length-prefixed trailer so the roundtrip is exact for ANY payload
bytes, including ones containing header-lookalike sequences).

Scale shape: the WRITER streams one archive per input block
(``map_batches`` emitting a path row per shard — the partitioned-sink
layout; the content-hash shard name makes rewrite-on-retry
idempotent); the READER is ``ray.data.read_binary_files`` over the
archive files — each file is one task, framing is parsed with
byte-offset arithmetic driven by Content-Length (never by scanning
payloads for delimiters), and the output batch is schema-identical to
``extract.read_pages``, so every downstream operator runs unchanged.
Malformed tails degrade: a truncated final record or trailing garbage
is dropped, never a raised batch (the crawl-hostility rule extraction
follows)."""

from __future__ import annotations

import os
from typing import Any

import pyarrow as pa
import ray.data as rd

_MAGIC = b"WARC/1.0\r\n"


def _encode_record(
    url: str, ts_us: int, payload: bytes, text: str, lang: str
) -> bytes:
    tb = text.encode("utf-8")
    header = (
        _MAGIC
        + b"WARC-Type: response\r\n"
        + b"WARC-Target-URI: " + url.encode("utf-8") + b"\r\n"
        + b"WARC-Date-US: " + str(ts_us).encode() + b"\r\n"
        + b"X-Extracted-Text-Length: " + str(len(tb)).encode() + b"\r\n"
        + b"X-Lang: " + lang.encode("utf-8") + b"\r\n"
        + b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
        + b"\r\n"
    )
    return header + payload + b"\r\n" + tb + b"\r\n\r\n"


def write_pages_warc(pages: rd.Dataset, out_dir: str) -> str:
    """One ``shard-XXXXXXXX.warc`` archive per input block under
    ``out_dir`` (content-hash names); returns the directory."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        import hashlib

        urls = batch.column("url").to_pylist()
        ts = batch.column("warc_ts").cast(pa.int64()).to_pylist()
        htmls = batch.column("html").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        blob = b"".join(
            _encode_record(u, t, h, x, lg)
            for u, t, h, x, lg in zip(urls, ts, htmls, texts, langs)
        )
        # 64-bit content-hash names collide at birthday odds ~50% by
        # ~77k shards for 32-bit crc32 — sha256/16 keeps idempotent
        # retry naming with no realistic collision at 100 TB shard
        # counts
        tag = hashlib.sha256(blob).hexdigest()[:16]
        path = os.path.join(out_dir, f"shard-{tag}.warc")
        with open(path, "wb") as f:
            f.write(blob)
        return pa.table(
            {
                "path": pa.array([path], pa.string()),
                "n_records": pa.array([len(urls)], pa.int64()),
            }
        )

    pages.map_batches(
        write_block, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    return out_dir


def _parse_archive(blob: bytes) -> "dict[str, list]":
    out: dict[str, list] = {
        "url": [], "warc_ts_us": [], "html": [], "text": [], "lang": [],
    }
    pos, n = 0, len(blob)
    while pos < n:
        if not blob.startswith(_MAGIC, pos):
            break  # trailing garbage: degrade, never raise
        hdr_end = blob.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        fields: dict[str, str] = {}
        for line in blob[pos + len(_MAGIC) : hdr_end].split(b"\r\n"):
            k, _, v = line.partition(b": ")
            fields[k.decode("latin-1")] = v.decode("utf-8", "replace")
        try:
            clen = int(fields["Content-Length"])
            tlen = int(fields["X-Extracted-Text-Length"])
            ts = int(fields["WARC-Date-US"])
            url = fields["WARC-Target-URI"]
            lang = fields.get("X-Lang", "")
        except (KeyError, ValueError):
            break
        body = hdr_end + 4
        if body + clen + 2 + tlen + 4 > n:
            break  # truncated final record: drop it
        payload = blob[body : body + clen]
        text = blob[body + clen + 2 : body + clen + 2 + tlen]
        out["url"].append(url)
        out["warc_ts_us"].append(ts)
        out["html"].append(payload)
        out["text"].append(text.decode("utf-8", "replace"))
        out["lang"].append(lang)
        pos = body + clen + 2 + tlen + 4
    return out


def read_pages_warc(paths: "str | list[str]", **read_kwargs: Any) -> rd.Dataset:
    """A pages Dataset from WARC shard archives, schema-identical to
    ``extract.read_pages`` — one read task per archive, byte-offset
    framing, truncation-tolerant."""

    def decode(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {
            "url": [], "warc_ts_us": [], "html": [], "text": [], "lang": [],
        }
        for blob in batch.column("bytes").to_pylist():
            rec = _parse_archive(blob)
            for k in cols:
                cols[k].extend(rec[k])
        return pa.table(
            {
                "url": pa.array(cols["url"], pa.string()),
                "warc_ts": pa.array(cols["warc_ts_us"], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "html": pa.array(cols["html"], pa.binary()),
                "text": pa.array(cols["text"], pa.string()),
                "lang": pa.array(cols["lang"], pa.string()),
            }
        )

    return rd.read_binary_files(paths, **read_kwargs).map_batches(
        decode, batch_format="pyarrow", zero_copy_batch=True
    )
