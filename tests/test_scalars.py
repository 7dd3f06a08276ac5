"""Conformance tests for the scalar parity kernel (SURVEY.md §2.8,
reference parsers/base.py:7-88 semantics)."""

import pytest

from pdf_parser_ray.functions.scalars import (
    AMOUNT_RE,
    amount_token_to_float,
    norm_line,
    parse_long_date,
    parse_mon_dd,
    parse_slash_date,
    pick_amount,
    strip_trailing_amount,
    text_to_lines,
    year_from_text,
)


class TestNorm:
    def test_nbsp_and_dashes(self):
        assert norm_line("a b – c — d − e") == "a b - c - d - e"

    def test_strip(self):
        assert norm_line("  x  ") == "x"

    def test_empty_and_none(self):
        assert norm_line("") == ""
        assert norm_line(None) == ""


class TestTextToLines:
    def test_drops_empty_and_normalizes(self):
        assert text_to_lines("a\n\n  \nb c\n") == ["a", "b c"]

    def test_preserves_order(self):
        assert text_to_lines("3\n1\n2") == ["3", "1", "2"]


class TestAmountLexer:
    @pytest.mark.parametrize(
        "text,tokens",
        [
            ("pay $1,234.56 now", ["$1,234.56"]),
            ("(−ignored) (-123.45)", ["(-123.45)"]),
            ("bare 1,234.56 and 99.10", ["1,234.56", "99.10"]),
            ("no cents 1234 not a token", []),  # needs $, '-' or decimals
            ("dollar no cents $1,234", ["$1,234"]),
            ("neg -1,234 ok", ["-1,234"]),
            ("two $5.00 $6.00", ["$5.00", "$6.00"]),
        ],
    )
    def test_tokens(self, text, tokens):
        assert AMOUNT_RE.findall(text) == tokens

    @pytest.mark.parametrize(
        "tok,val",
        [
            ("$1,234.56", 1234.56),
            ("(-123.45)", -123.45),
            ("-1,234", -1234.0),
            ("63.43-", -63.43),  # PNB trailing-minus debit
            ("$0.01", 0.01),
        ],
    )
    def test_token_value(self, tok, val):
        assert amount_token_to_float(tok) == val

    def test_pick_first(self):
        assert pick_amount(["$5.00", "-9.00"], prefer_first=True) == 5.0

    def test_pick_first_negative(self):
        assert pick_amount(["$5.00", "-9.00"], prefer_first=False) == -9.0
        assert pick_amount(["$5.00", "$7.00"], prefer_first=False) == 5.0

    def test_pick_empty(self):
        assert pick_amount([]) is None

    def test_strip_trailing_amount(self):
        assert strip_trailing_amount("ACH PAYMENT 1,500.00") == "ACH PAYMENT"
        assert strip_trailing_amount("mid $5.00 text") == "mid $5.00 text"


class TestDates:
    def test_slash_with_4digit_year(self):
        assert parse_slash_date("12/03/2024 desc", 2020) == "2024-12-03"

    def test_slash_with_2digit_year(self):
        assert parse_slash_date("1/5/24 x", 2020) == "2024-01-05"

    def test_slash_no_year_uses_fallback(self):
        assert parse_slash_date("7/4 BBQ", 2023) == "2023-07-04"

    def test_slash_no_bounds_check(self):
        # parity: the shared lexer accepts out-of-range month/day
        assert parse_slash_date("13/40 weird", 2023) == "2023-13-40"

    def test_slash_must_anchor(self):
        assert parse_slash_date("on 7/4 BBQ", 2023) is None

    def test_long_date_anywhere(self):
        assert parse_long_date("paid on March 5, 2024 ok") == "2024-03-05"
        assert parse_long_date("Sept 7, 2024") == "2024-09-07"

    def test_long_date_bad_month(self):
        assert parse_long_date("Blarch 5, 2024") is None

    def test_mon_dd(self):
        assert parse_mon_dd("Feb 01 stripe payout", 2024) == "2024-02-01"
        assert parse_mon_dd("Sept 3 x", 2024) == "2024-09-03"

    def test_mon_dd_must_anchor(self):
        assert parse_mon_dd("on Feb 01", 2024) is None

    def test_year_from_text(self):
        assert year_from_text("statement for 2024 period", 1999) == 2024
        assert year_from_text("no year here", 2021) == 2021
        assert year_from_text("1999 too old", 2021) == 2021  # only 20XX matches
