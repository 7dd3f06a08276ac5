"""Skew machinery tests: byte-size routing and bucketed output."""

import os

import pyarrow as pa


def _pages_with_giants():
    from pdf_parser_ray.fixtures.gen import synthesize_pages
    import pyarrow.parquet as pq

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text", "lang"]
    ).slice(0, 40)
    pages, _ = synthesize_pages(docs)
    # append two giant HTML rows (> threshold)
    body = ("<p>" + "giant content words here repeated " * 40 + "</p>") * 800
    giant_html = ("<html><body>" + body + "</body></html>").encode()
    giants = pa.table(
        {
            "url": pa.array([f"https://giant{i}.example/p" for i in range(2)], pa.string()),
            "warc_ts": pa.array([1_704_067_200_000_000] * 2, pa.timestamp("us")),
            "html": pa.array([giant_html] * 2, pa.binary()),
            "text": pa.array(["giant"] * 2, pa.string()),
            "lang": pa.array(["en"] * 2, pa.string()),
        },
        schema=pages.schema,
    )
    return pa.concat_tables([pages, giants]), len(giant_html)


class TestSizeRouting:
    def test_split_and_union_complete(self, ray_session, quiet_data_context):
        import ray.data as rd

        from pdf_parser_ray.stages.skew import (
            extract_with_size_routing,
            split_batch_by_size,
        )

        pages, giant_size = _pages_with_giants()
        threshold = giant_size - 1
        ds = rd.from_arrow(pages)

        small, giant = split_batch_by_size(pages, threshold)
        assert small.num_rows == pages.num_rows - 2
        assert giant.num_rows == 2

        out = extract_with_size_routing(ds, threshold_bytes=threshold)
        table = out.to_pandas()
        assert len(table) == pages.num_rows
        assert set(table["url"]) == set(pages.column("url").to_pylist())
        giant_rows = table[table["url"].str.startswith("https://giant")]
        assert (giant_rows["content_type"] == "html").all()
        assert (giant_rows["n_records"] == 0).all()

    def test_routing_output_matches_plain_pipeline(self, ray_session, quiet_data_context):
        import ray.data as rd

        from pdf_parser_ray.pipelines.extract import build_extraction_pipeline
        from pdf_parser_ray.stages.skew import extract_with_size_routing

        pages, giant_size = _pages_with_giants()
        ds = rd.from_arrow(pages)
        a = (
            build_extraction_pipeline(rd.from_arrow(pages))
            .to_pandas()
            .set_index("url")["content_sha256"]
            .sort_index()
        )
        b = (
            extract_with_size_routing(ds, threshold_bytes=giant_size - 1)
            .to_pandas()
            .set_index("url")["content_sha256"]
            .sort_index()
        )
        assert a.equals(b)

    def test_single_input_pass(self, ray_session, quiet_data_context, tmp_path):
        """Size routing must read the input exactly once (the old
        two-branch design scanned the wide payload column twice)."""
        import pyarrow.parquet as pq
        import ray.data as rd

        from pdf_parser_ray.stages.skew import extract_with_size_routing

        pages, giant_size = _pages_with_giants()
        path = str(tmp_path / "pages.parquet")
        pq.write_table(pages, path)
        out = extract_with_size_routing(
            rd.read_parquet(path), threshold_bytes=giant_size - 1
        ).materialize()
        assert out.count() == pages.num_rows
        stats = out.stats()
        assert stats.count("ReadParquet") == 1, stats

    def test_payload_size_column(self, ray_session, quiet_data_context):
        import ray.data as rd

        from pdf_parser_ray.stages.skew import with_payload_size

        pages, _ = _pages_with_giants()
        out = with_payload_size(rd.from_arrow(pages)).to_pandas()
        lens = [len(h) for h in pages.column("html").to_pylist()]
        assert list(out["payload_bytes"]) == lens


class TestBucketedOutput:
    def test_partitioned_layout(self, ray_session, quiet_data_context, tmp_path):
        import ray.data as rd

        from pdf_parser_ray.pipelines.extract import build_extraction_pipeline
        from pdf_parser_ray.stages.skew import bucketed_output

        pages, _ = _pages_with_giants()
        extracted = build_extraction_pipeline(rd.from_arrow(pages))
        out_dir = str(tmp_path / "bucketed")
        bucketed_output(extracted, out_dir)
        buckets = [d for d in os.listdir(out_dir) if d.startswith("bucket=")]
        assert len(buckets) > 4  # spread across many bucket dirs
