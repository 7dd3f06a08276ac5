"""End-to-end pipeline tests: synthesize the pages corpus from the
driver's sf0.001 documents table, run the Ray Data extraction pipeline,
and check byte-identical extracted text per url against the generator
goldens (the north-rule invariant)."""

import os

import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from pdf_parser_ray.fixtures.gen import synthesize_to_dir

    out = str(tmp_path_factory.mktemp("corpus"))
    pages_dir, golden_path = synthesize_to_dir(SF_DIR, out, shards=4)
    return pages_dir, golden_path


@pytest.fixture(scope="module")
def extracted(ray_session, quiet_data_context, corpus):
    from pdf_parser_ray.pipelines.extract import extract_dir

    pages_dir, golden_path = corpus
    ds = extract_dir(pages_dir, batch_size=32)
    table = ds.to_arrow_refs()
    import pyarrow as pa
    import ray

    out = pa.concat_tables([ray.get(r) for r in table])
    golden = pq.read_table(golden_path)
    return out, golden


class TestGeneration:
    def test_pages_schema_and_shards(self, corpus):
        pages_dir, _ = corpus
        parts = sorted(p for p in os.listdir(pages_dir) if p.endswith(".parquet"))
        assert len(parts) == 4
        schema = pq.read_schema(os.path.join(pages_dir, parts[0]))
        assert schema.names == ["url", "warc_ts", "html", "text", "lang"]

    def test_generation_deterministic(self, corpus, tmp_path):
        from pdf_parser_ray.fixtures.gen import synthesize_pages

        docs = pq.read_table(
            os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text", "lang"]
        )
        p1, g1 = synthesize_pages(docs)
        p2, g2 = synthesize_pages(docs)
        assert p1.equals(p2) and g1.equals(g2)

    def test_mix_of_kinds(self, corpus):
        _, golden_path = corpus
        kinds = pq.read_table(golden_path).column("content_type").to_pylist()
        assert kinds.count("pdf") > 10
        assert kinds.count("html") > kinds.count("pdf")


class TestExtraction:
    def test_row_count(self, extracted):
        out, golden = extracted
        assert out.num_rows == golden.num_rows

    def test_byte_identical_text_per_url(self, extracted):
        out, golden = extracted
        got = dict(zip(out.column("url").to_pylist(), out.column("extracted_text").to_pylist()))
        exp = dict(zip(golden.column("url").to_pylist(), golden.column("extracted_text").to_pylist()))
        mismatches = [u for u in exp if got.get(u) != exp[u]]
        if mismatches:
            u = mismatches[0]
            assert got.get(u) == exp[u], f"url={u} ({len(mismatches)} mismatched)"
        assert not mismatches

    def test_parser_keys_match(self, extracted):
        out, golden = extracted
        got = dict(zip(out.column("url").to_pylist(), out.column("parser_key").to_pylist()))
        exp = dict(zip(golden.column("url").to_pylist(), golden.column("parser_key").to_pylist()))
        assert got == exp
        assert set(exp.values()) >= {"generic", "chase", "bofa", "wf", "citi", "truist"}

    def test_records_match(self, extracted):
        out, golden = extracted
        got = dict(zip(out.column("url").to_pylist(), out.column("records").to_pylist()))
        exp = dict(zip(golden.column("url").to_pylist(), golden.column("records").to_pylist()))
        assert got == exp
        n_with_records = sum(1 for v in exp.values() if v)
        assert n_with_records > 10  # every statement page yields records

    def test_records_invariants(self, extracted):
        out, _ = extracted
        for recs in out.column("records").to_pylist():
            dates = [r["date"] for r in recs]
            assert dates == sorted(dates)
            for r in recs:
                assert r["amount"] >= 0
                assert r["direction"] in ("in", "out", "unknown")

    def test_spans_offsets_valid(self, extracted):
        out, _ = extracted
        for text, spans in zip(
            out.column("extracted_text").to_pylist(), out.column("spans").to_pylist()
        ):
            for s in spans:
                assert 0 <= s["start"] <= s["end"] <= len(text)

    def test_spans_match_golden(self, extracted):
        # golden spans come from generator knowledge (FIXTURES.md §2)
        out, golden = extracted
        got = dict(zip(out.column("url").to_pylist(), out.column("spans").to_pylist()))
        exp = dict(zip(golden.column("url").to_pylist(), golden.column("spans").to_pylist()))
        assert got == exp

    def test_bucket_range(self, extracted):
        out, _ = extracted
        from pdf_parser_ray.schemas import NUM_BUCKETS

        buckets = set(out.column("bucket").to_pylist())
        assert all(0 <= b < NUM_BUCKETS for b in buckets)
        assert len(buckets) > 16  # spread over many buckets


class TestActorPoolVariant:
    def test_actor_pool_matches_stateless(self, ray_session, quiet_data_context, corpus):
        import ray.data as rd

        from pdf_parser_ray.pipelines.extract import build_extraction_pipeline, read_pages

        pages_dir, _ = corpus
        a = (
            build_extraction_pipeline(read_pages(pages_dir))
            .to_pandas()
            .set_index("url")["content_sha256"]
            .sort_index()
        )
        b = (
            build_extraction_pipeline(read_pages(pages_dir), concurrency=2)
            .to_pandas()
            .set_index("url")["content_sha256"]
            .sort_index()
        )
        assert a.equals(b)


class TestReadGranularity:
    """read_pages must split a modest file set into row-sized tasks
    (~4k pages each): Ray's byte-based default left the 640k-page bench
    corpus at ~1 task per core at 32 CPUs, capping 8->32 scaling."""

    def test_blocks_sized_by_rows(self, ray_session, corpus):
        import ray

        from pdf_parser_ray.pipelines.extract import _pages_num_blocks

        pages_dir, _ = corpus
        rows = sum(
            pq.ParquetFile(os.path.join(pages_dir, f)).metadata.num_rows
            for f in os.listdir(pages_dir)
            if f.endswith(".parquet")
        )
        cpus = int(ray.cluster_resources().get("CPU", 0))
        want = max(-(-rows // 4000), min(3 * cpus, -(-rows // 500)))
        assert _pages_num_blocks(pages_dir) == max(8, min(4096, want))

    def test_stands_down_on_many_shards(self):
        from pdf_parser_ray.pipelines.extract import _pages_num_blocks

        # at real scale the file count already provides parallelism
        assert _pages_num_blocks([f"s{i}.parquet" for i in range(513)]) is None

    def test_explicit_override_wins(self, ray_session, quiet_data_context, corpus):
        from pdf_parser_ray.pipelines.extract import read_pages

        pages_dir, _ = corpus
        ds = read_pages(pages_dir, override_num_blocks=3)
        assert ds.count() > 0


class TestLineDedupBound:
    """The boilerplate broadcast set must be bounded independent of
    corpus size (VERDICT r02 'What's wrong' #3): |frequent| <=
    total_line_occurrences / eff_min <= pages_per_boiler * avg lines
    per page."""

    def test_effective_min_count_scales(self):
        from pdf_parser_ray.pipelines.extract import effective_min_count

        # floor at min_count on small corpora (test scale: unchanged)
        assert effective_min_count(500, 5, 1000) == 5
        # scales with the corpus: 10M pages -> threshold 10k
        assert effective_min_count(10_000_000, 5, 1000) == 10_000
        # ceil, not floor
        assert effective_min_count(1001, 1, 1000) == 2

    def test_frequent_set_bound_holds(
        self, ray_session, quiet_data_context, corpus
    ):
        from pdf_parser_ray.pipelines.extract import (
            extract_dir,
            frequent_line_hashes,
        )

        pages_dir, _ = corpus
        extracted = (
            extract_dir(pages_dir, batch_size=32)
            .select_columns(["url", "extracted_text"])
            .materialize()
        )
        total_lines = sum(
            len(t.split("\n"))
            for t in extracted.to_pandas()["extracted_text"]
        )
        for eff_min in (5, 20):
            freq = frequent_line_hashes(extracted, eff_min)
            assert len(freq) <= total_lines // eff_min
        # a higher threshold can only shrink the set
        assert len(frequent_line_hashes(extracted, 20)) <= len(
            frequent_line_hashes(extracted, 5)
        )


class TestJsonlPagesSource:
    def test_roundtrip_extraction_identical(
        self, ray_session, quiet_data_context, tmp_path
    ):
        """pages -> JSONL -> pages -> extraction must equal the parquet
        path byte-for-byte (schema and content_sha256 multiset)."""
        import os

        from pdf_parser_ray.fixtures.gen import synthesize_to_dir
        from pdf_parser_ray.pipelines.extract import (
            build_extraction_pipeline,
            read_pages,
            read_pages_jsonl,
            write_pages_jsonl,
        )

        cache = "/tmp/pdf_parser_ray_cache/sf0.001"
        os.makedirs(cache, exist_ok=True)
        pages_dir, _ = synthesize_to_dir("/root/testdata/sf0.001", cache)
        out = str(tmp_path / "pages_jsonl")
        write_pages_jsonl(read_pages(pages_dir), out)

        via_parquet = (
            build_extraction_pipeline(read_pages(pages_dir))
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        via_jsonl = (
            build_extraction_pipeline(read_pages_jsonl(out))
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        assert list(via_parquet.columns) == list(via_jsonl.columns)
        import pandas as pd

        pd.testing.assert_frame_equal(via_parquet, via_jsonl)
