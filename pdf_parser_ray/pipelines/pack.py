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
from .io_util import arrow_udf

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

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(
            arrow_udf(lambda g: _pack_cumsum(g, seq_len)),
            batch_format="pandas",
        )
    )


def _pack_cumsum(g: "pd.DataFrame", seq_len: int) -> "pd.DataFrame":
    """One bucket's greedy in-order pack assignment (ascending doc_id):
    the cumulative-sum kernel shared by pack_sequences and
    curate_and_pack."""
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


SAMPLE_K = 100


def uniform_sample_k(sf_dir: str, k: int = SAMPLE_K) -> rd.Dataset:
    """(doc_id, key): EXACTLY-k uniform sample without replacement —
    the k smallest :func:`shuffle_key` values (ties by doc_id).  The
    deterministic complement of filter.sample_documents' Bernoulli
    sampler: that one keeps a random *fraction* (size varies run to
    run at small k); this one returns a fixed-size panel, reproducible
    across runs and engines.

    Scale shape: per-batch local bottom-k (k rows survive each block),
    then one ≤ k·num_blocks-row sort — the same selection shape as
    knn_cosine; nothing corpus-sized moves."""

    def local_bottomk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        key = shuffle_key(ids)
        if len(ids) > k:
            keep = np.lexsort((ids, key))[:k]  # same key as the sort
            ids, key = ids[keep], key[keep]
        return pa.table({"doc_id": pa.array(ids), "key": pa.array(key)})

    return (
        _docs(sf_dir, ["doc_id"])
        .map_batches(local_bottomk, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["key", "doc_id"])
        .limit(k)
    )


def curate_and_pack(
    sf_dir: str, seq_len: int = PACK_SEQ_LEN, buckets: int = PACK_BUCKETS
) -> rd.Dataset:
    """(doc_id, bucket, n_tokens, pack_id, pack_offset): the end-to-end
    training-export COMPOSITION — quality gate → exact dedup → greedy
    per-bucket packing, built as one lazy Dataset so a user sees how
    the engine's stages chain (each stage is also exposed standalone:
    quality_filter / exact_dedup / pack_sequences).

    Scale shape: ONE text pass computes the quality verdict (the shared
    vectorized word_stats_arrays kernel), the md5 (kept rows only) and
    the token count; from there only narrow rows move — an md5-keyed
    winner co-shuffle (min doc_id per digest, companions ride the row),
    then the bucket-keyed pack cumsum.  Two exchanges total, text read
    once and never shuffled."""
    import hashlib

    from .filter import quality_verdict
    from .io_util import coarse_key

    def narrow(batch: pa.Table) -> pa.Table:
        from .analysis import word_stats_arrays

        texts = batch.column("text")
        stats = word_stats_arrays(texts)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.fromiter(
            (
                quality_verdict(int(w), int(d), int(t), int(s)) == "ok"
                for w, d, t, s in zip(*stats)
            ),
            bool,
            count=len(ids),
        )
        kept_ids = ids[keep]
        n_tok = stats[0][keep]
        # materialize only the surviving texts (the gate can drop most
        # of a crawl batch; dropped rows never become Python strings)
        import pyarrow.compute as pc

        hashes = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in pc.filter(texts, pa.array(keep)).to_pylist()
        ]
        return pa.table(
            {
                "coarse": pa.array(coarse_key(hashes, 256)),
                "text_hash": pa.array(hashes, pa.string()),
                "doc_id": pa.array(kept_ids),
                "bucket": pa.array(kept_ids % buckets),
                "n_tokens": pa.array(n_tok.astype(np.int64)),
            }
        )

    def winners(g: pd.DataFrame) -> pd.DataFrame:
        w = g.sort_values("doc_id").drop_duplicates("text_hash", keep="first")
        return w[["doc_id", "bucket", "n_tokens"]].reset_index(drop=True)

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse")
        .map_groups(arrow_udf(winners), batch_format="pandas")
        .groupby("bucket")
        .map_groups(
            arrow_udf(lambda g: _pack_cumsum(g, seq_len)),
            batch_format="pandas",
        )
    )


# -- deterministic global shuffle + shard export ------------------------------

# Mersenne prime 2^31-1: with multipliers < 2^31 every product stays
# below 2^62, so the key arithmetic is EXACT in both numpy int64 and
# DuckDB BIGINT — the whole permutation is SQL-mirrorable.
SHUF_P = (1 << 31) - 1
SHUF_A1, SHUF_B1 = 1_103_515_245, 12_345  # affine round 1 (classic LCG)
SHUF_A2, SHUF_B2 = 48_271, 11  # affine round 2 (Lehmer) after the fold
SHUF_SHARDS = 16
SHUF_RANGE_BUCKETS = 64


def shuffle_key(doc_ids: np.ndarray) -> np.ndarray:
    """Pseudorandom int64 shuffle key per doc_id: two affine rounds mod
    SHUF_P with an xor-shift fold between them.  The fold breaks the
    affinity of the composition (a pure affine chain would map
    consecutive ids onto an arithmetic progression — striped, not
    shuffled).  NOT injective: besides the mod-SHUF_P wrap of the
    input, the fold itself can emit SHUF_P (k1 = 0x7FFDFFFF class),
    which reduces to 0 — so two ids below SHUF_P can (rarely) share a
    key.  Both sort orders tie-break on doc_id, so collisions cost
    determinism nothing."""
    x = doc_ids.astype(np.int64) % SHUF_P
    k1 = (SHUF_A1 * x + SHUF_B1) % SHUF_P
    k2 = (k1 ^ (k1 >> 17)) % SHUF_P
    return (SHUF_A2 * k2 + SHUF_B2) % SHUF_P


def shuffle_shards(
    sf_dir: str,
    shards: int = SHUF_SHARDS,
    range_buckets: int = SHUF_RANGE_BUCKETS,
) -> rd.Dataset:
    """(doc_id, shard, pos): the final training-export step — a seeded
    deterministic global shuffle.  Docs are hash-assigned to ``shards``
    output shards (``shard = key % shards``) and ``pos`` is the doc's
    0-based rank within its shard under the shuffled order
    (key ASC, doc_id ASC) — i.e. reading each shard by ``pos`` streams
    the corpus in a reproducible pseudorandom permutation.

    Scale shape (distributed rank, two narrow passes over the int64 id
    column only — the text never moves):

    1. count pass — per-batch ``np.bincount`` partials over
       ``sb = shard·B + range_bucket`` (``range_bucket = key·B // P`` is
       monotone in key), combined through a coarse-bucket map_groups;
       the driver holds only the ``shards × range_buckets`` count grid
       (a few KiB, CONSTANT in corpus size) and turns it into per-sb
       starting offsets.
    2. rank pass — co-shuffle rows on ``sb``; inside each group one
       vectorized sort by (key, doc_id) plus the broadcast offset gives
       the global in-shard position.  A group holds ~corpus/(S·B) rows;
       raise ``range_buckets`` with the corpus to keep groups
       task-sized."""
    import ray

    n_sb = shards * range_buckets

    def narrow(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        key = shuffle_key(ids)
        sb = (key % shards) * range_buckets + key * range_buckets // SHUF_P
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "key": pa.array(key),
                "sb": pa.array(sb),
            }
        )

    def count_partials(batch: pa.Table) -> pa.Table:
        counts = np.bincount(
            batch.column("sb").to_numpy(zero_copy_only=False), minlength=n_sb
        )
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                "coarse": pa.array((nz % 64).astype(np.int64)),
                "sb": pa.array(nz.astype(np.int64)),
                "n": pa.array(counts[nz].astype(np.int64)),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("sb", sort=True)["n"].sum().reset_index()
        return agg.astype({"sb": np.int64, "n": np.int64})

    narrowed = _docs(sf_dir, ["doc_id"]).map_batches(
        narrow, batch_format="pyarrow", zero_copy_batch=True
    )
    grid = (
        narrowed.map_batches(
            count_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("coarse")
        .map_groups(arrow_udf(combine), batch_format="pandas")
        .to_pandas()  # <= shards*range_buckets rows, constant in corpus
    )
    counts = np.zeros(n_sb, np.int64)
    counts[grid["sb"].to_numpy()] = grid["n"].to_numpy()
    # offset of each sb = docs in LOWER range buckets of the same shard
    per_shard = counts.reshape(shards, range_buckets)
    offsets = (np.cumsum(per_shard, axis=1) - per_shard).reshape(-1)
    offsets_ref = ray.put(offsets)

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(offsets_ref)
        g = g.sort_values(["key", "doc_id"])
        sb = int(g["sb"].iloc[0])
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy().astype(np.int64),
                "shard": np.full(len(g), sb // range_buckets, np.int64),
                "pos": offs[sb] + np.arange(len(g), dtype=np.int64),
            }
        )

    return narrowed.groupby("sb").map_groups(arrow_udf(rank), batch_format="pandas")


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


WPS_K = 100


def weighted_priority_sample(sf_dir: str, k: int = WPS_K) -> rd.Dataset:
    """(doc_id, n_chars, priority): deterministic weighted priority
    sample (Duffield-Lund-Thorup 2007) — the top-k documents by
    priority w/u, where w = n_chars and u is the document's
    deterministic uniform from :func:`shuffle_key`.  Inclusion
    probability grows with weight (long documents are favored ∝ w),
    the fixed-size weighted counterpart of :func:`uniform_sample_k`
    and of filter.temperature_sample's fractional mixture.

    Exact integers on both sides: priority = (w·SHUF_P) // (key + 1)
    — the +1 keeps the divisor in 1..SHUF_P, and the product stays
    under 2^62 for any n_chars < 2^31, so Ray and the DuckDB oracle
    rank identically (ties broken by doc_id ASC).

    Scale shape: per-batch local top-k pruned on the SAME
    (priority DESC, doc_id ASC) key the global sort uses, then one
    ≤ k·num_blocks-row sort — the knn_cosine selection shape; nothing
    corpus-sized moves."""

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        pri = (w * SHUF_P) // (shuffle_key(ids) + 1)
        if len(ids) > k:
            keep = np.lexsort((ids, -pri))[:k]
            ids, w, pri = ids[keep], w[keep], pri[keep]
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_chars": pa.array(w),
                "priority": pa.array(pri),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "n_chars"])
        .map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["priority", "doc_id"], descending=[True, False])
        .limit(k)
    )


def shard_balance_report(
    sf_dir: str, shards: int = SHUF_SHARDS
) -> rd.Dataset:
    """(shard, n_docs, n_chars, load_micros): per-shard doc and
    character load of the :func:`shuffle_shards` hash assignment, with
    each shard's character share of a perfectly-even split in micros
    (1e6 = exactly even) — the export-balance check a training job
    reads before writing shards: a hot shard slows every epoch.

    Scale shape: map-only per-batch (shard, n, chars) bincount
    partials — constant ``shards``-row output per batch — then one
    ``shards``-key combine; the grand total folds inside the final
    constant-key pass, so nothing leaves the cluster but
    2·shards rows."""
    import pandas as pd

    def partials(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        nch = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        shard = shuffle_key(ids) % shards
        n = np.bincount(shard, minlength=shards).astype(np.int64)
        # int64 accumulator (np.add.at), not float64 bincount weights —
        # exact to 2^63 per shard per batch
        ch = np.zeros(shards, np.int64)
        np.add.at(ch, shard, nch)
        return pa.table(
            {
                "fin": pa.array(np.zeros(shards, np.int8)),
                "shard": pa.array(np.arange(shards, dtype=np.int64)),
                "n": pa.array(n),
                "ch": pa.array(ch),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("shard", as_index=False)[["n", "ch"]].sum()
        total = int(agg["ch"].sum())
        # ch·shards·1e6 wraps int64 once total corpus chars exceed
        # ~1.4e11 at 64 shards — well under the design point; Python
        # ints in the (bounded, shards-row) combine are overflow-free,
        # mirrored by HUGEINT widening in the SQL
        load = np.array(
            [int(c) * shards * 1_000_000 // total for c in agg["ch"]],
            np.int64,
        )
        return pd.DataFrame(
            {
                "shard": agg["shard"].to_numpy(np.int64),
                "n_docs": agg["n"].to_numpy(np.int64),
                "n_chars": agg["ch"].to_numpy(np.int64),
                "load_micros": load,
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "n_chars"])
        .map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("fin")
        .map_groups(arrow_udf(combine), batch_format="pandas")
    )
