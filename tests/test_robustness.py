"""Edge-case robustness: hostile payloads must never crash the fused
extraction stage, and exotic-but-valid inputs must decode correctly."""

import zlib

import pyarrow as pa

from pdf_parser_ray.functions.charset import decode_payload
from pdf_parser_ray.stages.extract import extract_one
from pdf_parser_ray.pdf.build import build_pdf
from pdf_parser_ray.pdf.parse import extract_text


class TestHostilePayloads:
    def test_never_raises(self):
        payloads = [
            b"",
            b"\x00" * 64,
            b"%PDF-1.4 garbage after magic",
            b"%PDF-",
            b"<html><body>" + b"<div>" * 5000,  # deep nesting
            b"<p>" + b"x" * 100_000 + b"</p>",
            bytes(range(256)) * 16,
            "<p>ok words here for a real block</p>".encode("utf-16"),
            b"<script>" + b"a" * 10_000,  # unterminated rawtext
            zlib.compress(b"not a pdf, not html"),
        ]
        for p in payloads:
            out = extract_one(p, 2024)
            assert set(out) == {
                "content_type", "encoding", "parser_key", "extracted_text",
                "spans", "records",
            }
            assert isinstance(out["extracted_text"], str)

    def test_utf16_page_via_bom(self):
        html = "<p>unicode content words here for the block</p>"
        payload = html.encode("utf-16")  # includes BOM
        out = extract_one(payload, 2024)
        assert out["content_type"] == "html"
        assert "unicode content words" in out["extracted_text"]
        assert out["encoding"].startswith("utf-16")

    def test_truncated_pdf_payload(self):
        pdf = build_pdf([["content line words here now ok"]])
        out = extract_one(pdf[: len(pdf) // 2], 2024)
        assert out["content_type"] == "pdf"  # magic still detected

    def test_pdf_with_ascii_hex_stream(self):
        # hand-built single-page PDF using ASCIIHexDecode
        content = b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (hex encoded line) Tj ET"
        hexed = content.hex().encode()
        stream_obj = (
            b"4 0 obj\n<< /Length " + str(len(hexed)).encode()
            + b" /Filter /ASCIIHexDecode >>\nstream\n" + hexed
            + b">\nendstream\nendobj\n"
        )
        raw = (
            b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Contents 4 0 R >>\nendobj\n"
            + stream_obj
            + b"trailer\n<< /Root 1 0 R >>\n"
        )
        assert extract_text(raw) == "hex encoded line"

    def test_charset_mislabeled_meta(self):
        # declared charset that fails to decode falls through to utf-8
        payload = '<meta charset="utf-16"><p>plain ascii body</p>'.encode("ascii")
        text, enc = decode_payload(payload)
        assert "plain ascii" in text

    def test_batch_with_null_payload(self):
        from pdf_parser_ray.stages.extract import extract_batch

        batch = pa.table(
            {
                "url": pa.array(["https://a", "https://b"], pa.string()),
                "warc_ts": pa.array([0, None], pa.timestamp("us")),
                "html": pa.array([None, b"<p>some words in this block here</p>"],
                                 pa.binary()),
                "text": pa.array(["", ""], pa.string()),
                "lang": pa.array(["en", None], pa.string()),
            }
        )
        out = extract_batch(batch)
        assert out.num_rows == 2
        assert out.column("content_type").to_pylist() == ["empty", "html"]


class TestCorruptionFuzz:
    """Seeded byte-level corruption of every writer form must never
    crash the fused extraction stage — real crawls contain truncated
    and bit-rotted PDFs, and the reference's pdfplumber survives them
    by raising inside a caught path.  Extraction degrades to partial
    or empty text, never an exception."""

    def test_mutated_pdfs_never_raise(self):
        import random

        from pdf_parser_ray.fixtures.gen import _PDF_FORMS

        lines = [
            "Community Credit Union statement 2024",
            "1/05 ACH CREDIT ACME PAYROLL REF 123 1,500.00 2,000.00",
            "1/07 CHECK 1234 250.00 1,750.00",
        ]
        for fi, form in enumerate(_PDF_FORMS):
            pdf = build_pdf([lines], **form)
            rng = random.Random(fi)
            for trial in range(12):
                data = bytearray(pdf)
                mode = trial % 4
                if mode == 0:  # flip a few bytes
                    for _ in range(3):
                        data[rng.randrange(len(data))] ^= 1 << rng.randrange(8)
                elif mode == 1:  # truncate
                    data = data[: rng.randrange(16, len(data))]
                elif mode == 2:  # delete a chunk
                    a = rng.randrange(len(data) // 2)
                    b = a + rng.randrange(1, 200)
                    del data[a:b]
                else:  # duplicate a chunk (shifts offsets)
                    a = rng.randrange(len(data) // 2)
                    b = a + rng.randrange(1, 120)
                    data[a:a] = data[a:b]
                out = extract_one(bytes(data), 2024)
                assert isinstance(out["extracted_text"], str), (fi, trial)
                assert isinstance(out["records"], list), (fi, trial)


class TestHtmlCorruptionFuzz:
    """Seeded corruption of HTML payloads (byte flips, truncation,
    chunk shuffling, charset damage) must never crash extraction —
    the fast tokenizer either survives or bails to the stdlib parser,
    and both degrade to partial text."""

    def test_mutated_html_never_raises(self):
        import random

        base = (
            '<html><head><meta charset="utf-8"><title>t</title></head>'
            "<body><header><div>nav words</div></header>"
            "<p>Main content paragraph with enough words to score as a "
            "real block of extracted text here.</p>"
            '<div class="sidebar"><a href="/x">link</a><a href="/y">links'
            "</a></div><p>Second paragraph – café &amp; more words here "
            "for density scoring purposes.</p></body></html>"
        ).encode("utf-8")
        rng = random.Random(20240817)
        for trial in range(120):
            data = bytearray(base)
            mode = trial % 4
            if mode == 0:
                for _ in range(4):
                    data[rng.randrange(len(data))] ^= 1 << rng.randrange(8)
            elif mode == 1:
                data = data[: rng.randrange(8, len(data))]
            elif mode == 2:
                a = rng.randrange(len(data) // 2)
                del data[a : a + rng.randrange(1, 80)]
            else:
                a = rng.randrange(len(data))
                b = rng.randrange(len(data))
                data[a], data[b] = data[b], data[a]
            out = extract_one(bytes(data), 2024)
            assert isinstance(out["extracted_text"], str), trial
            assert isinstance(out["spans"], list), trial


class TestMojibakeRepair:
    """fix_mojibake (charset.py): repair accepts a pass only when the
    strict cp1252/latin-1 → UTF-8 round trip reduces the artifact
    score, so clean text is never altered.  The pipeline-level
    invariant (every corrupted doc restored byte-for-byte) is
    oracle-gated in test_oracle[mojibake_repair]."""

    def test_single_and_double_encode_repair(self):
        from pdf_parser_ray.functions.charset import fix_mojibake

        clean = "résumé café – ½ øre naïve"
        once = clean.encode("utf-8").decode("cp1252")
        twice = once.encode("utf-8").decode("cp1252")
        assert once != clean and "Ã" in once
        assert fix_mojibake(once) == (clean, 1)
        assert fix_mojibake(twice) == (clean, 2)

    def test_clean_text_untouched(self):
        from pdf_parser_ray.functions.charset import fix_mojibake

        for s in ("plain ascii text", "real accents: café naïve – ½"):
            assert fix_mojibake(s) == (s, 0)

    def test_legit_marker_char_untouched(self):
        from pdf_parser_ray.functions.charset import fix_mojibake

        # 'Ã' used legitimately (Portuguese): the round trip decodes to
        # garbage-free UTF-8 only if the score drops — here cp1252
        # bytes 0xC3 0x6F aren't valid UTF-8, so the pass is rejected
        s = "SÃO PAULO in caps stays as written"
        assert fix_mojibake(s) == (s, 0)

    def test_latin1_hole_fallback(self):
        from pdf_parser_ray.functions.charset import fix_mojibake

        # a latin-1 mis-decode leaves C1 controls (e.g. U+0081) that
        # cp1252 cannot encode — the latin-1 fallback must take over
        clean = "emoji-free but wide: āЀ"
        once = clean.encode("utf-8").decode("latin-1")
        assert any(0x80 <= ord(c) <= 0x9F for c in once)
        assert fix_mojibake(once) == (clean, 1)
