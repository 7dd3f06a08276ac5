"""Mergeable sketches as custom Ray Data aggregates.

At 100 TB an exact grouped distinct count (relational.py::
distinct_users_per_type) still shuffles every distinct pair; when the
per-group cardinality itself is huge, the scale path is a MERGEABLE
SKETCH: constant-size per-group state that accumulates vectorized per
block and merges associatively across blocks — exactly the contract of
``ray.data.aggregate.AggregateFn`` (init / accumulate_block / merge /
finalize).  The shuffle then carries one ~2^p-byte register array per
group per block instead of the data.

HyperLogLog here is the textbook Flajolet–Fuhr–Gandouet–Meunier
construction (public algorithm): register index = top ``p`` bits of a
64-bit hash, rank = leading-zero count of the rest + 1, estimate =
alpha * m^2 / sum(2^-reg) with the standard small-range (linear
counting) correction.  Deterministic: the hash is a fixed multiply-
xorshift mix, so reruns and retries produce identical sketches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from .io_util import read_parquet_clean
from ray.data.aggregate import AggregateFn

_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)


def _mix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64-style finalizer: uniform 64-bit hash of int64 keys."""
    with np.errstate(over="ignore"):
        x = x.astype(np.uint64)
        x ^= x >> np.uint64(33)
        x *= _MIX1
        x ^= x >> np.uint64(33)
        x *= _MIX2
        x ^= x >> np.uint64(33)
    return x


def hll_accumulate(regs: np.ndarray, keys: np.ndarray, p: int) -> np.ndarray:
    """Fold a key batch into the register array (vectorized)."""
    if len(keys) == 0:
        return regs
    h = _mix64(keys)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining 64-p bits, left-aligned
    # rank = leading zeros of `rest` + 1, capped at 64-p+1 (rest == 0)
    # bit_length via float log2 is unsafe; use a descending bit probe
    probe = rest
    # leading-zero count by halving steps (6 vector ops for 64 bits)
    shift = 32
    lz = np.zeros(len(h), np.uint8)
    while shift >= 1:
        mask = probe < (np.uint64(1) << np.uint64(64 - shift))
        lz = np.where(mask, lz + shift, lz).astype(np.uint8)
        probe = np.where(mask, probe << np.uint64(shift), probe)
        shift //= 2
    rank = np.minimum(lz + 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> int:
    """Bias-corrected HLL estimate with linear-counting small range."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting
    return int(round(est))


def hll_distinct(on: str, p: int = 12, alias_name: str | None = None) -> AggregateFn:
    """A mergeable approximate-distinct aggregate over column ``on``
    (~1.04/sqrt(2^p) relative error; p=12 -> ~1.6%).  Drop-in for
    ``ds.groupby(...).aggregate(...)``."""
    m = 1 << p

    def accumulate(regs: np.ndarray, block) -> np.ndarray:
        if isinstance(block, pa.Table):
            keys = block.column(on).to_numpy(zero_copy_only=False)
        else:  # pandas
            keys = block[on].to_numpy()
        return hll_accumulate(regs, keys.astype(np.int64), p)

    return AggregateFn(
        init=lambda k: np.zeros(m, np.uint8),
        accumulate_block=accumulate,
        merge=lambda a, b: np.maximum(a, b),
        finalize=lambda regs: hll_estimate(regs),
        name=alias_name or f"hll_{on}",
    )


def approx_distinct_users(sf_dir: str) -> rd.Dataset:
    """(event_type, n_users_approx): HLL distinct users per event type —
    the sketch counterpart of relational.distinct_users_per_type.
    Accuracy is pinned against the exact counts in tests (rows-only for
    the driver: approximate results have no SQL hash mirror)."""
    import os

    from .dedup import _blocks_for

    path = os.path.join(sf_dir, "events.parquet")
    ds = read_parquet_clean(
        path, columns=["event_type", "user_id"], override_num_blocks=_blocks_for(path)
    )
    return ds.groupby("event_type").aggregate(
        hll_distinct("user_id", alias_name="n_users_approx")
    )
