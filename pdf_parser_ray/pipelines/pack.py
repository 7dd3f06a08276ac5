"""Sequence packing: assign documents to fixed-length training packs.

The final stage of a pre-training data pipeline concatenates tokenized
documents into fixed-length sequences ("packs").  This operator computes
the pack assignment — which pack a document starts in and at what token
offset — without materializing token streams: only (doc_id, n_tokens)
narrow rows move.

Scale shape: packing is per-bucket (``bucket = doc_id % PACK_BUCKETS``),
the single-node analogue of packing per input shard, which is what real
pipelines do (a global token order would serialize the corpus).  The
shuffle carries two ints per document; the per-bucket cumulative sum is
one vectorized pandas pass inside ``map_groups``.  At cluster scale
raise ``buckets`` with the corpus so a bucket's rows stay
group-sized — the assignment stays deterministic for any bucket count.

Token counts use the whitespace convention shared with
``analysis.token_counts``, so the DuckDB oracle mirrors the arithmetic
exactly (window cumulative sum partitioned by bucket).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .analysis import _docs

PACK_SEQ_LEN = 512
PACK_BUCKETS = 64


def pack_sequences(
    sf_dir: str, seq_len: int = PACK_SEQ_LEN, buckets: int = PACK_BUCKETS
) -> rd.Dataset:
    """(doc_id, bucket, n_tokens, pack_id, pack_offset): the pack a
    document's first token lands in and the offset within it, under
    greedy in-order concatenation of each bucket's documents (ascending
    doc_id) into ``seq_len``-token sequences."""

    def narrow(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok = np.fromiter(
            (len(t.split()) for t in batch.column("text").to_pylist()),
            np.int64,
            count=len(ids),
        )
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "bucket": pa.array(ids % buckets),
                "n_tokens": pa.array(n_tok),
            }
        )

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        n = g["n_tokens"].to_numpy()
        start = np.cumsum(n) - n  # first-token offset of each doc
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy().astype(np.int64),
                "bucket": g["bucket"].to_numpy().astype(np.int64),
                "n_tokens": n.astype(np.int64),
                "pack_id": (start // seq_len).astype(np.int64),
                "pack_offset": (start % seq_len).astype(np.int64),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(pack, batch_format="pandas")
    )


CHUNK_TOKENS = 32


def chunk_documents(sf_dir: str, chunk_tokens: int = CHUNK_TOKENS) -> rd.Dataset:
    """(doc_id, chunk_idx, n_chunk_tokens, chunk_text): fixed-context
    splitting — each document cut into consecutive ``chunk_tokens``-word
    chunks (last chunk short; an empty document yields one empty chunk)
    — the embedding-/RAG-side dual of :func:`pack_sequences`.

    Scale shape: a pure per-batch flat-map — no shuffle at all; output
    rows inherit the input partitioning.  The whitespace token
    convention is shared with ``pack_sequences`` so the DuckDB oracle
    (unnest over an integer range) mirrors the cuts exactly."""

    def chunks(batch: pa.Table) -> pa.Table:
        out_id: list[int] = []
        out_idx: list[int] = []
        out_n: list[int] = []
        out_text: list[str] = []
        texts = batch.column("text").to_pylist()
        for doc_id, text in zip(batch.column("doc_id").to_pylist(), texts):
            words = text.split()
            if not words:
                out_id.append(doc_id)
                out_idx.append(0)
                out_n.append(0)
                out_text.append("")
                continue
            for k, s in enumerate(range(0, len(words), chunk_tokens)):
                piece = words[s : s + chunk_tokens]
                out_id.append(doc_id)
                out_idx.append(k)
                out_n.append(len(piece))
                out_text.append(" ".join(piece))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "chunk_idx": pa.array(out_idx, pa.int64()),
                "n_chunk_tokens": pa.array(out_n, pa.int64()),
                "chunk_text": pa.array(out_text, pa.string()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        chunks, batch_format="pyarrow", zero_copy_batch=True
    )
