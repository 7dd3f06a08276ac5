"""Conformance tests for the global direction table + normalizer
(reference parsers/common.py:5-57 semantics; rule list doubles as the
rules/parser_rules.json checklist)."""

import pytest

from pdf_parser_ray.functions.directions import classify_direction, normalize_records


class TestDirectionRules:
    @pytest.mark.parametrize(
        "desc,expected",
        [
            ("WIRE OUT international", "out"),
            ("WIRE FEE", "out"),
            ("WIRE TRANS SVC CHARGE", "out"),
            ("ACH DEBIT vendor", "out"),
            ("ACH PULL", "out"),
            ("BILL PAID electric", "out"),
            ("BILLPMT water", "out"),
            ("DEBIT MEMO", "out"),
            ("SERVICE CHARGE", "out"),
            ("SERVICE CHARGES", "out"),
            ("DBT CRD 1234", "out"),
            ("POS DEB store", "out"),
            ("DEBIT CARD PURCH", "out"),
            ("ZELLE BUSINESS PAYMENT TO JOHN", "out"),
            ("PAYPAL TRANSFER 1234", "out"),  # PAYPAL without CREDIT -> out
            ("CHECK 1021", "out"),
            ("WITHDRAWAL branch", "out"),
            ("MONTHLY FEE", "out"),
            ("WIRE IN from acme", "in"),
            ("ACH CREDIT payroll", "in"),
            ("ACH IN", "in"),
            ("ELECTRONIC CREDIT", "in"),
            ("DEBIT CARD CREDIT refund", "in"),
            ("ZELLE PAYMENT FROM JANE", "in"),
            ("INTEREST PAYMENT", "in"),
            ("WT 24-1234 INBOUND", "in"),  # WF inbound wire shorthand
            ("PAYPAL INST XFER CREDIT", "in"),
            ("coffee shop", "unknown"),  # explicit unknown over a bad guess
        ],
    )
    def test_rules(self, desc, expected):
        assert classify_direction(desc) == expected

    def test_order_wire_fee_before_generic_fee(self):
        # WIRE FEE hits the specific out rule, not the generic FEE rule —
        # same result, but ordering matters for e.g. WT ... FEE
        assert classify_direction("WT REF FEE") == "out"

    def test_case_insensitive(self):
        assert classify_direction("ach credit payroll") == "in"


class TestNormalize:
    def test_abs_amount_and_inferred_direction(self):
        out = normalize_records(
            [{"date": "2024-01-02", "description": " ACH DEBIT X ", "amount": -12.5}]
        )
        assert out == [
            {
                "date": "2024-01-02",
                "description": "ACH DEBIT X",
                "amount": 12.5,
                "direction": "out",
            }
        ]

    def test_extractor_direction_wins(self):
        out = normalize_records(
            [
                {
                    "date": "2024-01-02",
                    "description": "ACH DEBIT X",
                    "amount": 5.0,
                    "direction": "in",
                }
            ]
        )
        assert out[0]["direction"] == "in"

    def test_stable_date_sort(self):
        recs = [
            {"date": "2024-02-01", "description": "b", "amount": 1.0},
            {"date": "2024-01-01", "description": "a", "amount": 1.0},
            {"date": "2024-02-01", "description": "c", "amount": 1.0},
        ]
        out = normalize_records(recs)
        assert [r["description"] for r in out] == ["a", "b", "c"]

    def test_empty_direction_string_triggers_inference(self):
        out = normalize_records(
            [{"date": "2024-01-01", "description": "WIRE IN", "amount": 1.0, "direction": ""}]
        )
        assert out[0]["direction"] == "in"


class TestSqlMirrorLookaheadParity:
    """The RE2-safe rewrite of the two lookahead rules must agree with
    Python on multi-occurrence descriptions (ADVICE r01: the old AND NOT
    conjunction diverged when an early occurrence was followed by the
    negative token but a later one was clean)."""

    CASES = [
        "WT 123 FEE THEN WT 456 SETTLEMENT",   # early WT poisoned, late clean
        "WT 1 CLEAN THEN WT 2 FEE",            # all WT poisoned
        "WT 9 SETTLEMENT",                     # single clean WT
        "WT CHARGE",                           # single poisoned WT
        "PAYPAL CREDIT X PAYPAL TRANSFER",     # early poisoned, late clean
        "PAYPAL TRANSFER X PAYPAL CREDIT",     # all poisoned
        "PAYPAL TRANSFER ONLY",
        "PAYPAL CREDIT ONLY",
        "WIRE FEE WT LAST",                    # other rules may fire first
    ]

    def test_python_vs_duckdb(self):
        import duckdb

        import __ray_entry__ as entrymod

        case = entrymod._direction_case_sql("description")
        con = duckdb.connect()
        values = ", ".join(f"('{d}')" for d in self.CASES)
        got = [
            r[0]
            for r in con.execute(
                f"SELECT {case} FROM (VALUES {values}) t(description)"
            ).fetchall()
        ]
        want = [classify_direction(d) for d in self.CASES]
        assert got == want
