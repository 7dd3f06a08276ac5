"""Content-stream interpreter coverage for operators the fixture
builder doesn't emit: Td/TD/TL/T*, ' and ", TJ arrays, q/Q/cm CTM
tracking (reference semantics: layout-ordered lines, base.py:27-33)."""

from pdf_parser_ray.pdf.parse import _ContentInterpreter, assemble_lines


def interpret(content: bytes) -> str:
    interp = _ContentInterpreter()
    interp.run(content)
    return assemble_lines(interp.runs)


class TestTextPositioning:
    def test_td_moves_lines(self):
        out = interpret(
            b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (first) Tj 0 -20 Td (second) Tj ET"
        )
        assert out == "first\nsecond"

    def test_TD_sets_leading_and_t_star(self):
        out = interpret(
            b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (a) Tj 0 -16 TD (b) Tj T* (c) Tj ET"
        )
        assert out == "a\nb\nc"

    def test_TL_with_quote_op(self):
        out = interpret(b"BT /F1 12 Tf 16 TL 1 0 0 1 72 720 Tm (one) Tj (two) ' ET")
        assert out == "one\ntwo"

    def test_double_quote_op(self):
        out = interpret(b'BT /F1 12 Tf 16 TL 1 0 0 1 72 720 Tm (one) Tj 0 1 (two) " ET')
        assert out == "one\ntwo"

    def test_tj_array_concatenates(self):
        out = interpret(b"BT /F1 12 Tf 1 0 0 1 72 720 Tm [(con) -20 (cat)] TJ ET")
        assert out == "concat"

    def test_tj_word_space_kerning(self):
        # real producers encode inter-word gaps as large negative TJ
        # adjustments (-600/1000 * 12pt = 7.2pt > x_tolerance -> space)
        out = interpret(
            b"BT /F1 12 Tf 1 0 0 1 72 720 Tm [(Hello) -600 (World)] TJ ET"
        )
        assert out == "Hello World"

    def test_tj_positive_kerning_tightens(self):
        # positive adjustments move the pen LEFT (tighter); still no space
        out = interpret(b"BT /F1 12 Tf 1 0 0 1 72 720 Tm [(A) 40 (B)] TJ ET")
        assert out == "AB"

    def test_consecutive_tj_same_line_ordered(self):
        # pen advance keeps x-order without explicit positioning
        out = interpret(b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (left ) Tj (right) Tj ET")
        assert out == "left right" or out == "left  right" or out == "left right".replace("  ", " ")
        assert out.startswith("left")
        assert out.endswith("right")

    def test_cm_translation_applies(self):
        # CTM shifts the whole text space down -> still one line, y moved
        out = interpret(b"q 1 0 0 1 0 -100 cm BT /F1 12 Tf 1 0 0 1 72 720 Tm (moved) Tj ET Q")
        assert out == "moved"

    def test_q_Q_restores_ctm(self):
        content = (
            b"q 1 0 0 1 0 -300 cm "
            b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (low) Tj ET Q "
            b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (high) Tj ET"
        )
        # after Q the second text is back at y=720 (above y=420)
        assert interpret(content) == "high\nlow"

    def test_hex_string_show(self):
        out = interpret(b"BT /F1 12 Tf 1 0 0 1 72 720 Tm <68656C6C6F> Tj ET")
        assert out == "hello"

    def test_inline_image_skipped(self):
        out = interpret(
            b"BI /W 2 /H 2 ID \x00\x01\x02\x03 EI BT /F1 12 Tf 1 0 0 1 72 720 Tm (after) Tj ET"
        )
        assert out == "after"

    def test_malformed_operands_tolerated(self):
        out = interpret(b"BT (noTf) Tj 1 0 0 Tm (bad) garbage ET BT /F1 9 Tf 1 0 0 1 10 10 Tm (ok) Tj ET")
        assert "ok" in out


class TestTextState:
    def test_tw_word_spacing_separates_shows(self):
        # Tw widens the advance of space-bearing shows; the next show on
        # the same baseline lands farther right but stays ordered
        out = interpret(
            b"BT /F1 12 Tf 8 Tw 1 0 0 1 72 720 Tm (a b ) Tj (c) Tj ET"
        )
        assert out.startswith("a b") and out.endswith("c")

    def test_tz_scales_kerning(self):
        # at 50% horizontal scale the same -600 kerning is only 3.6pt
        # -> above x_tolerance still (space), but -300 gives 0.9pt (none)
        wide = interpret(
            b"BT /F1 12 Tf 50 Tz 1 0 0 1 72 720 Tm [(Hello) -600 (World)] TJ ET"
        )
        tight = interpret(
            b"BT /F1 12 Tf 50 Tz 1 0 0 1 72 720 Tm [(Hello) -300 (World)] TJ ET"
        )
        assert wide == "Hello World"
        assert tight == "HelloWorld"

    def test_tc_only_affects_advance_not_text(self):
        out = interpret(b"BT /F1 12 Tf 2 Tc 1 0 0 1 72 720 Tm (abc) Tj ET")
        assert out == "abc"


class TestReviewRegressions:
    """Pinned fixes from the round-2 code review."""

    def test_double_quote_sets_spacing_before_show(self):
        # " must apply aw/ac (PDF §9.4.3) so the shown run's width and
        # the pen advance reflect the new spacing
        interp = _ContentInterpreter()
        interp.run(b'BT /F1 12 Tf 16 TL 1 0 0 1 72 720 Tm 5 2 (a b) " ET')
        assert interp.word_spacing == 5.0
        assert interp.char_spacing == 2.0

    def test_form_stray_Q_does_not_corrupt_page_stack(self):
        from pdf_parser_ray.pdf.parse import FormXObject

        interp = _ContentInterpreter()
        # page pushes one state; the form pops TWO (one stray) —
        # after Do the page's Q must still restore its own push
        interp.xobjects = {
            "Fm1": FormXObject(
                content=b"Q Q BT /F1 12 Tf (inner) Tj ET",
                fonts={},
                xobjects={},
                matrix=None,
            )
        }
        interp.run(
            b"q 2 0 0 2 0 0 cm /Fm1 Do Q BT /F1 12 Tf 1 0 0 1 72 720 Tm (after) Tj ET"
        )
        # the Q after Do restored the identity CTM saved by q
        assert interp.ctm == (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)

    def test_tiff_predictor2_multicomponent_stride(self):
        import zlib as z

        from pdf_parser_ray.pdf.parse import Stream

        # 2 pixels x 3 components, row of 6 bytes, differenced per
        # component: raw [1,2,3, 1,1,1] -> pixels (1,2,3), (2,3,4)
        body = z.compress(bytes([1, 2, 3, 1, 1, 1]))
        s = Stream(
            attrs={
                "Filter": "FlateDecode",
                "DecodeParms": {
                    "Predictor": 2, "Colors": 3,
                    "BitsPerComponent": 8, "Columns": 2,
                },
            },
            raw=body,
        )
        assert s.data(None) == bytes([1, 2, 3, 2, 3, 4])
