"""Invariant tests for relational operators beyond the oracle gate
(the SQL-equality check itself lives in test_oracle)."""


class TestCohortRetention:
    def test_matrix_invariants(self, ray_session, quiet_data_context):
        import duckdb

        from pdf_parser_ray.pipelines.relational import cohort_retention

        sf = "/root/testdata/sf0.001"
        df = cohort_retention(sf).to_pandas()
        assert (df["offset_day"] >= 0).all()
        # day-0 cell exists for every cohort and is its largest cell:
        # every cohort member is by definition active on day 0
        base = df[df["offset_day"] == 0].set_index("cohort_day")["n_users"]
        assert set(df["cohort_day"]) == set(base.index)
        merged = df.join(base.rename("cohort_size"), on="cohort_day")
        assert (merged["n_users"] <= merged["cohort_size"]).all()
        # cohort sizes partition the user base
        n_users = duckdb.sql(
            "SELECT count(DISTINCT user_id) FROM"
            f" read_parquet('{sf}/events.parquet')"
        ).fetchone()[0]
        assert int(base.sum()) == n_users


class TestEventsHourlyDelta:
    def test_deltas_telescope(self, ray_session, quiet_data_context):
        from pdf_parser_ray.pipelines.relational import events_hourly_delta

        df = events_hourly_delta("/root/testdata/sf0.001").to_pandas()
        # deltas telescope back to the final count per type
        for etype, grp in df.groupby("event_type"):
            grp = grp.sort_values("hour_us")
            assert grp["delta_n"].sum() == grp["n"].iloc[-1]
            # n = prefix-sum of deltas at every step
            assert (grp["delta_n"].cumsum() == grp["n"]).all()
        assert (df["n"] > 0).all()


class TestEventFunnel:
    def test_counts_monotone_and_window_sensitive(
        self, ray_session, quiet_data_context
    ):
        from pdf_parser_ray.pipelines.relational import FUNNEL_STEPS, event_funnel

        sf = "/root/testdata/sf0.001"
        df = (
            event_funnel(sf).to_pandas().sort_values("step_idx")
        ).reset_index(drop=True)
        assert list(df["step"]) == list(FUNNEL_STEPS)
        # conversion can only shrink down the funnel
        assert (df["n_users"].diff().dropna() <= 0).all()
        assert df["n_users"].iloc[0] > df["n_users"].iloc[-1] >= 0
        # a zero window forbids any step-2+ conversion (strict >)
        tight = (
            event_funnel(sf, window_min=0).to_pandas().sort_values("step_idx")
        )
        assert (tight["n_users"].iloc[1:] == 0).all()
        assert tight["n_users"].iloc[0] == df["n_users"].iloc[0]
        # widening the window can only add conversions
        wide = (
            event_funnel(sf, window_min=10**6)
            .to_pandas()
            .sort_values("step_idx")
            .reset_index(drop=True)
        )
        assert (wide["n_users"] >= df["n_users"]).all()


class TestSalesOpportunity:
    def test_matches_bruteforce(self, ray_session, quiet_data_context):
        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.relational import (
            OPPORTUNITY_PRIORITY, sales_opportunity,
        )

        sf = "/root/testdata/sf0.001"
        got = (
            sales_opportunity(sf)
            .to_pandas()
            .sort_values("c_mktsegment")
            .reset_index(drop=True)
        )
        cust = pq.read_table(sf + "/customer.parquet").to_pandas()
        orders = pq.read_table(sf + "/orders.parquet").to_pandas()
        cents = np.round(cust["c_acctbal"] * 100).astype(np.int64)
        pos = cents[cents > 0]
        urgent = set(
            orders.loc[
                orders["o_orderpriority"] == OPPORTUNITY_PRIORITY, "o_custkey"
            ]
        )
        keep = (cents * len(pos) > pos.sum()) & ~cust["c_custkey"].isin(urgent)
        want = (
            pd.DataFrame(
                {"c_mktsegment": cust["c_mktsegment"][keep], "cents": cents[keep]}
            )
            .groupby("c_mktsegment", as_index=False)
            .agg(n_customers=("cents", "size"), sum_acctbal_cents=("cents", "sum"))
            .sort_values("c_mktsegment")
            .reset_index(drop=True)
        )
        assert len(got) > 0  # the anti-join actually keeps someone
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
