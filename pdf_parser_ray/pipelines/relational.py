"""Relational operators beyond the reference (the reference has no
joins or aggregations — SURVEY.md §2.4-2.5); these demonstrate the
engine's grouped-aggregate, broadcast-join and windowed-aggregate
machinery on the TPC-H-ish driver tables.

Float discipline: money sums use integer cents (``round(value*100)``)
so Ray and the DuckDB oracle hash identically regardless of summation
order.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def _t(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def lineitem_agg(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1-shaped pricing summary in integer cents:
    (l_returnflag, l_linestatus, sum_qty_cents, sum_price_cents, n)."""

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty_cents": pc.cast(
                    pc.round(pc.multiply(batch.column("l_quantity"), 100.0)), pa.int64()
                ),
                "price_cents": pc.cast(
                    pc.round(pc.multiply(batch.column("l_extendedprice"), 100.0)),
                    pa.int64(),
                ),
            }
        )

    return (
        _t(sf_dir, "lineitem",
           ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])
        .map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_cents", alias_name="sum_qty_cents"),
            Sum("price_cents", alias_name="sum_price_cents"),
            Count(alias_name="n"),
        )
    )


def orders_by_nation(sf_dir: str) -> rd.Dataset:
    """(n_name, n_orders, total_cents): orders joined to their customer's
    nation via a **broadcast join** — customer→nation is the small side,
    shipped once with ``ray.put`` and probed per batch (no shuffle join;
    at 100 TB only the orders side streams)."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    nation_name = dict(
        zip(nation.column("n_nationkey").to_pylist(), nation.column("n_name").to_pylist())
    )
    cust_nation = {
        ck: nation_name.get(nk, "UNKNOWN")
        for ck, nk in zip(
            cust.column("c_custkey").to_pylist(), cust.column("c_nationkey").to_pylist()
        )
    }
    lookup_ref = ray.put(cust_nation)

    class JoinNation:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            names = [
                self.lookup.get(ck, "UNKNOWN")
                for ck in batch.column("o_custkey").to_pylist()
            ]
            cents = pc.cast(
                pc.round(pc.multiply(batch.column("o_totalprice"), 100.0)), pa.int64()
            )
            return pa.table(
                {"n_name": pa.array(names, pa.string()), "price_cents": cents}
            )

    return (
        _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(JoinNation, batch_format="pyarrow", zero_copy_batch=True,
                     concurrency=2)
        .groupby("n_name")
        .aggregate(Count(alias_name="n_orders"), Sum("price_cents", alias_name="total_cents"))
    )


def events_hourly(sf_dir: str) -> rd.Dataset:
    """(event_type, hour_start, n, total_cents, min_cents, max_cents):
    tumbling 1-hour windowed aggregate over the events stream table —
    the window key is computed per batch (no per-row python), then one
    grouped aggregate."""

    def window_key(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        cents = pc.cast(
            pc.round(pc.multiply(batch.column("value"), 100.0)), pa.int64()
        )
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "hour_start": hour,
                "cents": cents,
            }
        )

    return (
        _t(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(window_key, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "hour_start"])
        .aggregate(
            Count(alias_name="n"),
            Sum("cents", alias_name="total_cents"),
            Min("cents", alias_name="min_cents"),
            Max("cents", alias_name="max_cents"),
        )
    )


def orders_filtered(sf_dir: str, min_price: float = 150_000.0) -> rd.Dataset:
    """(o_orderpriority, n): big-order count per priority with the
    predicate pushed into the parquet read (row-group pruning + filter at
    the scan — "prune at the read"; only two columns leave storage)."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderpriority", "o_totalprice"],
        filter=(pc.field("o_totalprice") > min_price),
    )
    return (
        ds.select_columns(["o_orderpriority"])
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="n"))
    )


def sessionize_events(sf_dir: str, gap_minutes: int = 30) -> rd.Dataset:
    """(user_id, n_sessions, n_events): session windows per user — a
    groupby(user).map_groups stage that sorts each user's events by ts
    and splits sessions at >gap_minutes silences.  Partitioning
    assumption: one user's events fit in one group (true by construction
    of user-keyed data)."""
    import pandas as pd

    gap = np.timedelta64(gap_minutes * 60, "s")

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["ts"].to_numpy())
        breaks = int((np.diff(ts) > gap).sum()) if len(ts) > 1 else 0
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_sessions": [breaks + 1],
                "n_events": [len(ts)],
            }
        )

    return (
        _t(sf_dir, "events", ["user_id", "ts"])
        .groupby("user_id")
        .map_groups(sessions, batch_format="pandas")
    )
