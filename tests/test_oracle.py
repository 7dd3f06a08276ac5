"""Driver-shaped correctness check: every oracle_sql() entry must match
its queries() pipeline on sf0.01 — row count, column names, and
order-insensitive values (the same comparison the graft driver runs)."""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.sql(sql).df()


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    try:
        import pyarrow as pa

        if isinstance(result, pa.Table):
            return result.to_pandas()
    except ImportError:
        pass
    return result.to_pandas()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def oracle_cases():
    import __ray_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    qs = entrymod.queries()
    assert set(oracles) <= set(qs), "oracle keys must be a subset of queries"
    return sorted(oracles)


@pytest.mark.parametrize("name", oracle_cases())
def test_oracle_match(ray_session, quiet_data_context, name):
    import __ray_entry__ as entrymod

    ray_df = _canon(_to_df(entrymod.queries()[name](SF_DIR)))
    sql_df = _canon(_duck(entrymod.oracle_sql()[name]))
    assert list(ray_df.columns) == list(sql_df.columns), name
    assert len(ray_df) == len(sql_df), name
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False, check_like=True)


def test_entry_smoke(ray_session, quiet_data_context):
    import __ray_entry__ as entrymod

    ds = entrymod.entry()
    df = _to_df(ds)
    assert len(df) >= 0
    assert "url" in df.columns and "content_sha256" in df.columns


@pytest.mark.parametrize(
    "name",
    [
        "extract_pages",
        "extract_records",
        "extract_dedup",
        "records_by_direction",
        "langid",
        "fingerprints",
        "approx_distinct_users",
        "heavy_hitters",
        "approx_event_quantiles",
        "pca_embeddings",
        "media_features",
        "frame_sample",
        "audio_features",
        "image_dedup",
        "audio_dedup",
    ],
)
def test_rows_only_queries_run(ray_session, quiet_data_context, name):
    import __ray_entry__ as entrymod

    df = _to_df(entrymod.queries()[name]("/root/testdata/sf0.001"))
    assert len(df) >= 0
    if name == "extract_records":
        assert len(df) > 0  # provably fires on the test corpus
