"""Differential tests: the fast HTML tokenizer must produce the same
blocks as the stdlib-html.parser reference path on the whole fixture
corpus and on crafted edge cases."""

import pyarrow.parquet as pq
import pytest

from pdf_parser_ray.functions.charset import decode_payload
from pdf_parser_ray.html.extract import (
    segment_blocks_fast,
    segment_blocks_stdlib,
)


def _same(html_text: str):
    fast = segment_blocks_fast(html_text)
    ref = segment_blocks_stdlib(html_text)
    assert [
        (b.text, b.tag, b.link_chars, b.total_chars, b.boilerplate_container)
        for b in fast
    ] == [
        (b.text, b.tag, b.link_chars, b.total_chars, b.boilerplate_container)
        for b in ref
    ]


class TestDifferential:
    def test_whole_fixture_corpus(self):
        from pdf_parser_ray.fixtures.gen import synthesize_pages

        docs = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text", "lang"],
        )
        pages, _ = synthesize_pages(docs)
        n_html = 0
        for payload in pages.column("html").to_pylist():
            if payload[:5] == b"%PDF-":
                continue
            text, _enc = decode_payload(payload)
            _same(text)
            n_html += 1
        assert n_html > 300

    @pytest.mark.parametrize(
        "html",
        [
            "<p>plain paragraph with enough words here</p>",
            "<!doctype html><!-- comment <p>not text</p> --><p>real words here now ok</p>",
            "<script>var x = '<p>fake</p>';</script><p>after script words here now</p>",
            "<style>p { color: red }</style><div>styled text words here now ok</div>",
            '<a href="/x?a=1&amp;b>2">link text</a><p>entities &amp; more words here</p>',
            "<p>unclosed <div>nested words in here now ok",
            "<br><hr><p>voids before words here now ok</p>",
            "<P>UPPERCASE TAGS with words here now ok</P>",
            "<p>self-closing<br/>inside words here now ok</p>",
            "<textarea><p>not content</p></textarea><p>after textarea words here ok</p>",
            "",
            "no tags at all just plain text words",
            "<p>truncated tag at end <",
            # crawl-hostile forms (all probed SAME before pinning):
            "<p>before words here ok</p><![CDATA[<p>hidden</p>]]>"
            "<p>after words here now ok</p>",
            "<!--[if IE]><p>ie only</p><![endif]-->"
            "<p>real words here now ok</p>",
            "<svg><text>svg label</text><desc>x</desc></svg>"
            "<p>real words here now ok</p>",
            "<math><mi>x</mi></math><p>math follows words here now ok</p>",
            "<p>bad &#x110000; surrogate &#xD800; bare & undefined"
            " &notareal; words here</p>",
            '<a title="a>b" href="/x">link words</a>'
            "<p>after attr words here now ok</p>",
            "<p>null\x00byte words here now ok</p>",
            "<?php echo 'x'; ?><p>after pi words here now ok</p>",
            "<b>bold <p>para words here now ok</b> tail</p>",
            "<div>" * 300 + "deep words here now ok" + "</div>" * 300,
            "<p>before words here ok</p><!-- never closed <p>x</p>",
            "<!weird thing><p>after bang words here now ok</p>",
        ],
    )
    def test_edge_cases(self, html):
        _same(html)

    def test_rawtext_without_closer(self):
        # unterminated script swallows the rest in both paths
        _same("<p>before words here now ok</p><script>var x = 1;")


class TestControlCharWhitespace:
    """\\x1c-\\x1f (FS/GS/RS/US) are whitespace to Python's str.split(),
    so the ASCII fast path collapsed them; the regex path must agree
    (ADVICE r02 — the shared-_flush differential can't see this, so pin
    the two branches against each other directly)."""

    def test_fast_and_regex_branch_agree_on_fs_gs_rs_us(self):
        body = "alpha\x1cbeta\x1dgamma\x1edelta\x1fepsilon"
        ascii_html = f"<html><body><p>{body}</p></body></html>"
        # the same text with one non-ASCII char forces the regex branch
        uni_html = f"<html><body><p>{body} café</p></body></html>"
        a = segment_blocks_fast(ascii_html)
        u = segment_blocks_fast(uni_html)
        assert a[0].text == "alpha beta gamma delta epsilon"
        assert u[0].text == "alpha beta gamma delta epsilon café"
