"""HTML boilerplate-stripping tests (the north-star's DOM
text-density/link-density block scoring)."""

from pdf_parser_ray.functions.charset import decode_payload, sniff_declared_charset
from pdf_parser_ray.html.extract import extract_main_text, segment_blocks

PAGE = """<!doctype html>
<html><head><title>T</title><style>p{color:red}</style>
<script>var x = "nav home about";</script></head>
<body>
<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>
<header><div>Site name and tagline words words words</div></header>
<main>
<h1>The Article Title</h1>
<p>This is the first real paragraph with enough words to count.</p>
<p>Second paragraph also has plenty of words to be kept here.</p>
<div><a href="/x">link</a> <a href="/y">farm</a> <a href="/z">of</a> <a href="/w">links</a></div>
</main>
<aside><p>Related stories with many words that should still be dropped</p></aside>
<footer><p>Copyright words words words words words words</p></footer>
</body></html>"""


class TestExtraction:
    def test_main_content_kept_boilerplate_dropped(self):
        text, spans = extract_main_text(PAGE)
        lines = text.split("\n")
        assert lines == [
            "The Article Title",
            "This is the first real paragraph with enough words to count.",
            "Second paragraph also has plenty of words to be kept here.",
        ]
        assert [s["kind"] for s in spans] == ["h1", "p", "p"]

    def test_spans_offsets_roundtrip(self):
        text, spans = extract_main_text(PAGE)
        for s in spans:
            assert "\n" not in text[s["start"] : s["end"]]
        assert text[spans[0]["start"] : spans[0]["end"]] == "The Article Title"

    def test_script_style_invisible(self):
        assert "color:red" not in extract_main_text(PAGE)[0]
        assert "var x" not in extract_main_text(PAGE)[0]

    def test_link_density_drops_link_farm(self):
        text, _ = extract_main_text(PAGE)
        assert "farm" not in text

    def test_nbsp_preserved(self):
        html = "<p>keep the nbsp inside this long enough sentence</p>"
        text, _ = extract_main_text(html)
        assert " " in text

    def test_entities_decoded(self):
        html = "<p>Fish &amp; chips &#8211; the very best around here</p>"
        text, _ = extract_main_text(html)
        assert "Fish & chips – the very best" in text

    def test_whitespace_collapsed(self):
        html = "<p>many    spaces\n and \t tabs collapse into single spaces</p>"
        text, _ = extract_main_text(html)
        assert "many spaces and tabs collapse into single spaces" == text

    def test_short_non_heading_dropped(self):
        html = "<p>too short</p><p>this paragraph is long enough to be content</p>"
        text, _ = extract_main_text(html)
        assert text == "this paragraph is long enough to be content"

    def test_malformed_html_tolerated(self):
        html = "<div><p>unclosed paragraph with enough words to keep it<div>another " \
               "block with plenty of words to be kept as well"
        text, _ = extract_main_text(html)
        assert "unclosed paragraph" in text
        assert "another block" in text

    def test_deterministic(self):
        assert extract_main_text(PAGE) == extract_main_text(PAGE)

    def test_empty(self):
        assert extract_main_text("") == ("", [])


class TestSegmentation:
    def test_blocks_have_density_features(self):
        blocks = segment_blocks("<nav><a href='/'>one two three four five six</a></nav>")
        assert len(blocks) == 1
        b = blocks[0]
        assert b.boilerplate_container
        assert b.link_density == 1.0


class TestCharset:
    def test_utf8_plain(self):
        text, enc = decode_payload("héllo".encode("utf-8"))
        assert text == "héllo" and enc == "utf-8"

    def test_bom(self):
        text, enc = decode_payload("﻿hi".encode("utf-8-sig") )
        # utf-8-sig BOM path strips the BOM
        assert enc == "utf-8-sig"

    def test_declared_meta_charset(self):
        raw = '<meta charset="windows-1252"><p>caf\xe9</p>'.encode("cp1252")
        assert sniff_declared_charset(raw) == "windows-1252"
        text, enc = decode_payload(raw)
        assert "café" in text and enc == "windows-1252"

    def test_http_equiv_form(self):
        raw = ('<meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">'
               "<p>na\xefve</p>").encode("latin-1")
        text, enc = decode_payload(raw)
        assert "naïve" in text and enc == "iso-8859-1"

    def test_invalid_utf8_statistical_fallback(self):
        # no BOM and no declared charset: the statistical path must still
        # produce a deterministic, non-empty decode (exact recovery is not
        # guaranteed on short inputs — fixtures always declare a charset)
        raw = "déjà vu all over again, encore déjà".encode("cp1252")
        text, enc = decode_payload(raw)
        assert text and enc not in ("utf-8", "empty")

    def test_empty(self):
        assert decode_payload(b"") == ("", "empty")

    def test_deterministic(self):
        raw = "déjà vu".encode("cp1252")
        assert decode_payload(raw) == decode_payload(raw)


class TestExtractLinks:
    def test_document_order_and_edge_cases(self):
        from pdf_parser_ray.html.extract import extract_links

        html = (
            '<nav><a href="/a">One  two</a><a href="/b">B</a></nav>'
            '<a name="x">no href skipped</a>'
            '<p><a href="/c"><b>nested</b> text</a></p>'
            '<a href="/d">unclosed anchor at EOF'
        )
        assert extract_links(html) == [
            ("/a", "One two"),
            ("/b", "B"),
            ("/c", "nested text"),
            ("/d", "unclosed anchor at EOF"),
        ]

    def test_misnested_anchor_closes_previous(self):
        from pdf_parser_ray.html.extract import extract_links

        html = '<a href="/x">first <a href="/y">second</a>'
        assert extract_links(html) == [("/x", "first"), ("/y", "second")]

    def test_matches_planted_goldens(
        self, ray_session, quiet_data_context, tmp_path
    ):
        """extract_links_dir over a synthesized corpus reproduces the
        generator's golden link pairs in document order."""
        import os

        import pandas as pd
        import pyarrow.parquet as pq

        from pdf_parser_ray.fixtures.gen import (
            explode_golden_links, synthesize_pages,
        )
        from pdf_parser_ray.pipelines.extract import extract_links_dir

        docs = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text", "lang"],
        )
        pages, golden = synthesize_pages(docs)
        pages_dir = str(tmp_path / "pages")
        os.makedirs(pages_dir)
        pq.write_table(pages, os.path.join(pages_dir, "part-0.parquet"))
        key = ["url", "link_idx"]
        got = (
            extract_links_dir(pages_dir)
            .to_pandas()
            .sort_values(key)
            .reset_index(drop=True)
        )
        want = (
            explode_golden_links(golden)
            .to_pandas()
            .sort_values(key)
            .reset_index(drop=True)
        )
        assert len(want) > 0
        pd.testing.assert_frame_equal(got, want)


class TestOutlinkStats:
    def test_matches_golden_aggregation(
        self, ray_session, quiet_data_context, tmp_path
    ):
        import os

        import pandas as pd
        import pyarrow.parquet as pq

        from pdf_parser_ray.fixtures.gen import (
            explode_golden_links, synthesize_pages,
        )
        from pdf_parser_ray.pipelines.extract import outlink_stats

        docs = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text", "lang"],
        )
        pages, golden = synthesize_pages(docs)
        pages_dir = str(tmp_path / "pages")
        os.makedirs(pages_dir)
        pq.write_table(pages, os.path.join(pages_dir, "part-0.parquet"))
        got = (
            outlink_stats(pages_dir)
            .to_pandas()
            .sort_values("host")
            .reset_index(drop=True)
        )
        gl = explode_golden_links(golden).to_pandas()
        gl["host"] = gl["url"].str.split("/").str[2]
        want = (
            gl.groupby("host")
            .agg(
                n_pages=("url", "nunique"),
                n_links=("url", "size"),
                n_nav=("href", lambda s: int(s.str.startswith("/s").sum())),
                n_tag=("href", lambda s: int(s.str.startswith("/t/").sum())),
            )
            .reset_index()
            .sort_values("host")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert (got["n_tag"] > 0).any()
