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
