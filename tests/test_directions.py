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
