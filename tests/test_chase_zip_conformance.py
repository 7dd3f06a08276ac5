"""CHASE_ZIP conformance catalog (VERDICT r04 ask #5).

The reference ships a fix report (CHASE_ZIP_FIXES.md) describing four
ZIP-code-disambiguation behaviors, but the snapshot's parsers/chase.py
only CONTAINS two of them — and SURVEY pins parity to the code, not the
doc.  This module is the closing of that known-issue loop: one test per
behavior, asserting exactly what the code-parity extractor does against
the doc's golden Book Transfer table (CHASE_ZIP_FIXES.md:283-295), with
strict xfail on the two doc-only behaviors so any drift (either an
accidental "fix" here, or a reference upgrade) surfaces loudly.

In the snapshot (and therefore here):
- `_extract_amount_from_block_improved` (chase.py:186-215) — $-prefixed
  tokens win, then max value; phone-shaped digit runs excluded.  IN THE
  CODE: the golden amounts are reproduced whenever the real amount sits
  on the dated line (the realistic Chase layout).
- blank-tolerant block collection (chase.py:44-58, up to two
  content-free lines) — IN THE CODE: long wire descriptions spanning a
  blank line are captured whole.
- `_appears_in_zip_code` (doc §1) and `_select_best_amount` (doc §2)
  — NOT in the snapshot: a block whose only money-shaped token is the
  "-631" fragment of "82801-6317" still yields a 631-magnitude record
  (the doc's "Antes" column), and a bare real-amount LINE is skipped as
  noise (`_is_basic_noise`, chase.py:94-118) so the doc's described
  failing layout stays failing.
"""

import pytest

from pdf_parser_ray.extractors.chase import extract_chase

# CHASE_ZIP_FIXES.md:283-295 — the Book Transfer golden table
GOLDEN_BOOK_TRANSFERS = [
    ("12/03", 68795.00),
    ("12/11", 73345.00),
    ("12/13", 90900.00),
    ("12/16", 38415.00),
    ("12/19", 85760.00),
    ("12/20", 115225.00),
    ("12/23", 125140.00),
    ("12/24", 122095.00),
    ("12/26", 87900.00),
]

_ZIP_DESC = (
    "Book Transfer Credit B/O: Celio Business Services Corp"
    " Sheridan WY 82801-6317 US Trn: 3340774338Es"
)


def _run(lines):
    return extract_chase(lines, "\n".join(lines), 2024)


class TestGoldenTableCodeParity:
    """Behaviors the snapshot DOES implement."""

    @pytest.mark.parametrize("date,amount", GOLDEN_BOOK_TRANSFERS)
    def test_dollar_amount_on_dated_line_beats_zip_fragment(
        self, date, amount
    ):
        """$-prefer/max (chase.py:212-215) reproduces every golden
        "Después" amount when the real amount rides the dated line —
        no ZIP-rejection method needed for this layout."""
        line = f"{date} {_ZIP_DESC} ${amount:,.2f}"
        recs = _run([line])
        assert len(recs) == 1
        assert recs[0]["amount"] == amount
        assert recs[0]["direction"] == "in"

    def test_undollared_amount_still_beats_zip_fragment(self):
        """Even without the $ sign, max-value selection wins because
        the "-631" fragment lexes NEGATIVE (chase.py:187-194)."""
        line = f"12/03 {_ZIP_DESC} 68,795.00"
        recs = _run([line])
        assert len(recs) == 1
        assert recs[0]["amount"] == 68795.00

    def test_wire_description_spans_blank_line(self):
        """Blank-tolerant block collection (chase.py:44-58): the
        24/12 wire's IMAD/Trn continuation after an empty line is
        captured — the doc's §3 behavior, present in the snapshot."""
        lines = [
            "12/24 Online Domestic Wire Transfer Via: Lead"
            " Bk/101019644 A/C: Avantux Global Solutions $1,701.10",
            "",
            "Inc Kalispell MT 59901 US Imad: 1224Mmqfmp2K017677"
            " Trn: 3326984359Es",
        ]
        recs = _run(lines)
        assert len(recs) == 1
        assert "Imad: 1224Mmqfmp2K017677" in recs[0]["description"]
        assert recs[0]["amount"] == 1701.10
        assert recs[0]["direction"] == "out"

    def test_zip_fragment_only_block_emits_631(self):
        """The "Antes" column IS code parity: with no other money
        token, the "-631" lexed out of "82801-6317" becomes the
        record amount (magnitude 631) — pinning that the snapshot has
        no `_appears_in_zip_code` rejection."""
        recs = _run([f"12/03 {_ZIP_DESC}"])
        assert len(recs) == 1
        assert abs(recs[0]["amount"]) == 631.0


class TestDocOnlyBehaviors:
    """Behaviors ONLY in CHASE_ZIP_FIXES.md — strict xfail: if either
    starts passing, the extractor drifted from snapshot parity (or the
    catalog needs re-adjudication against a newer reference)."""

    @pytest.mark.xfail(
        strict=True,
        reason="doc-only: _appears_in_zip_code (CHASE_ZIP_FIXES.md §1)"
        " would reject the ZIP fragment; snapshot chase.py has no such"
        " method",
    )
    def test_zip_fragment_rejected_when_sole_candidate(self):
        recs = _run([f"12/03 {_ZIP_DESC}"])
        assert recs == []  # fixed parser: no franken-record

    @pytest.mark.xfail(
        strict=True,
        reason="doc-only: the golden layout puts the real amount on its"
        " own line, which _is_basic_noise (chase.py:94-118) skips as a"
        " bare-amount line — _select_best_amount never sees it",
    )
    @pytest.mark.parametrize("date,amount", GOLDEN_BOOK_TRANSFERS[:3])
    def test_bare_amount_line_layout_recovers_golden_amount(
        self, date, amount
    ):
        recs = _run([f"{date} {_ZIP_DESC}", f"${amount:,.2f}"])
        assert len(recs) == 1 and recs[0]["amount"] == amount
