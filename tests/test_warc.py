"""WARC-style crawl-archive source/sink: exact roundtrip against the
parquet path, header-lookalike payload safety, and truncation
degrade."""

import numpy as np
import pyarrow as pa


def _mini_pages() -> pa.Table:
    # payloads deliberately contain CRLF and header-lookalike bytes:
    # the length-driven framing must never be confused by content
    htmls = [
        b"<html>plain</html>",
        b"evil\r\nWARC/1.0\r\nContent-Length: 3\r\n\r\nxyz",
        b"\x00\xff binary \r\n\r\n soup" * 20,
        b"",
    ]
    return pa.table(
        {
            "url": pa.array(
                [f"https://ex{i}.com/p" for i in range(len(htmls))], pa.string()
            ),
            "warc_ts": pa.array(
                [1_600_000_000_000_000 + i for i in range(len(htmls))],
                pa.timestamp("us"),
            ),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(
                ["plain text", "tricky\r\ntext", "unicode é text", ""],
                pa.string(),
            ),
            "lang": pa.array(["en", "en", "fr", ""], pa.string()),
        }
    )


class TestWarcRoundtrip:
    def test_exact_roundtrip(self, ray_session, quiet_data_context, tmp_path):
        import ray.data as rd

        from pdf_parser_ray.pipelines.warc import (
            read_pages_warc, write_pages_warc,
        )

        t = _mini_pages()
        out = write_pages_warc(rd.from_arrow(t), str(tmp_path / "warc"))
        back = (
            read_pages_warc(out)
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        want = t.to_pandas().sort_values("url").reset_index(drop=True)
        assert back["url"].tolist() == want["url"].tolist()
        assert back["warc_ts"].tolist() == want["warc_ts"].tolist()
        assert [bytes(b) for b in back["html"]] == [
            bytes(b) for b in want["html"]
        ]  # byte-exact incl. the header-lookalike payload
        assert back["text"].tolist() == want["text"].tolist()
        assert back["lang"].tolist() == want["lang"].tolist()

    def test_pipeline_equivalence_on_fixture_corpus(
        self, ray_session, quiet_data_context, tmp_path
    ):
        """WARC roundtrip of a real fixture-pages slice feeds the
        extraction pipeline identically to the parquet path."""
        from pdf_parser_ray.fixtures.gen import synthesize_to_dir
        from pdf_parser_ray.pipelines.extract import read_pages
        from pdf_parser_ray.pipelines.warc import (
            read_pages_warc, write_pages_warc,
        )

        src, _ = synthesize_to_dir(
            "/root/testdata/sf0.001", str(tmp_path / "corpus"), shards=2
        )
        # materialize the slice: a lazy limit() can pick different
        # blocks per execution, and the test runs the plan twice
        pages = read_pages(src).limit(64).materialize()
        out = write_pages_warc(pages, str(tmp_path / "warc"))
        a = (
            pages.to_pandas().sort_values("url").reset_index(drop=True)
        )
        b = (
            read_pages_warc(out)
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        assert a["url"].tolist() == b["url"].tolist()
        assert [bytes(x) for x in a["html"]] == [bytes(x) for x in b["html"]]
        assert a["text"].tolist() == b["text"].tolist()

    def test_truncated_tail_degrades(self, ray_session, quiet_data_context, tmp_path):
        import os

        import ray.data as rd

        from pdf_parser_ray.pipelines.warc import (
            read_pages_warc, write_pages_warc,
        )

        t = _mini_pages()
        out = write_pages_warc(rd.from_arrow(t), str(tmp_path / "warc"))
        shard = sorted(
            os.path.join(out, f) for f in os.listdir(out)
        )[0]
        blob = open(shard, "rb").read()
        open(shard, "wb").write(blob[: len(blob) - 7])  # truncate mid-record
        back = read_pages_warc(out).to_pandas()
        # all but the truncated final record survive; nothing raises
        assert len(back) == len(t) - 1


class TestWarcFramingProperty:
    def test_roundtrip_any_payload(self, ray_session, quiet_data_context, tmp_path):
        """Property: _encode_record ∘ _parse_archive is the identity
        for arbitrary payload bytes and unicode texts — including
        payloads embedding complete fake records."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from pdf_parser_ray.pipelines.warc import (
            _encode_record, _parse_archive,
        )

        @given(
            payloads=st.lists(
                st.binary(min_size=0, max_size=400), min_size=1, max_size=6
            ),
            texts=st.lists(
                st.text(min_size=0, max_size=120), min_size=6, max_size=6
            ),
        )
        @settings(max_examples=120, deadline=None)
        def prop(payloads, texts):
            blob = b"".join(
                _encode_record(f"https://h/{i}", 1_000_000 + i, p, t, "xx")
                for i, (p, t) in enumerate(zip(payloads, texts))
            )
            rec = _parse_archive(blob)
            assert rec["url"] == [f"https://h/{i}" for i in range(len(payloads))]
            assert rec["html"] == list(payloads)
            assert rec["text"] == [
                t for t, _ in zip(texts, payloads)
            ]

        prop()

    def test_payload_embedding_full_fake_record(self):
        from pdf_parser_ray.pipelines.warc import _encode_record, _parse_archive

        fake = _encode_record("https://fake/", 1, b"inner", "inner text", "zz")
        blob = _encode_record("https://real/", 2, fake, "outer", "en")
        rec = _parse_archive(blob)
        assert rec["url"] == ["https://real/"]
        assert rec["html"] == [fake]  # the embedded record stays payload
