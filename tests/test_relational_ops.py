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
