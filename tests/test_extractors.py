"""Rule-set conformance tests: statement-style line streams in, records
out — exercising the per-source semantics catalogued in SURVEY.md §2.2
(P1-P11)."""

from pdf_parser_ray.extractors import REGISTRY, detect_source, get_extractor
from pdf_parser_ray.functions.directions import normalize_records


def run(key, lines, full_text="statement 2024", year=2024):
    return REGISTRY[key](lines, full_text, year)


class TestDetection:
    def test_order_bofa_before_chase(self):
        text = "Bank of America ... wire to JPMorgan Chase Bank NA ... chase.com"
        assert detect_source(text) == "bofa"

    def test_chase_statement_patterns(self):
        assert detect_source("visit chase.com for help") == "chase"
        assert detect_source("Chase Mobile banking") == "chase"

    def test_generic_fallback(self):
        assert detect_source("no bank mentioned here") == "generic"
        assert detect_source("") == "generic"

    def test_each_bank(self):
        cases = {
            "ifb": "International Finance Bank",
            "valley": "Valley National Bank",
            "mercury": "help@mercury.com",
            "pnb": "Pacific National Bank",
            "wf": "Wells Fargo statement",
            "citi": "CitiBusiness account",
            "truist": "truist.com",
        }
        for key, text in cases.items():
            assert detect_source(text) == key, key

    def test_cap_at_20k(self):
        text = " " * 25_000 + "Wells Fargo"
        assert detect_source(text) == "generic"

    def test_registry_fallback(self):
        assert get_extractor("nope") is REGISTRY["generic"]


class TestGenericFamily:
    def test_generic_block_grouping(self):
        lines = [
            "Account statement 2024",
            "1/5 ACH CREDIT ACME PAYROLL",
            "REF 123 1,500.00 2,500.00",
            "1/7 CHECK 1021 200.00",
        ]
        recs = run("generic", lines)
        # parity quirks: the description keeps the leading date token and
        # every amount except the *trailing* one (clean_desc_remove_amount
        # strips only a terminal money token)
        assert recs == [
            {
                "date": "2024-01-05",
                "description": "1/5 ACH CREDIT ACME PAYROLL REF 123 1,500.00",
                "amount": 1500.0,
            },
            {"date": "2024-01-07", "description": "1/7 CHECK 1021", "amount": 200.0},
        ]
        norm = normalize_records(recs)
        assert [r["direction"] for r in norm] == ["in", "out"]

    def test_generic_no_amount_no_record(self):
        recs = run("generic", ["1/5 no amounts here at all"])
        assert recs == []

    def test_mercury_prefers_mon_dd(self):
        lines = ["Feb 01 Stripe payout 4,000.00 10,000.00"]
        recs = run("mercury", lines, "February 1–February 29, 2024")
        assert recs[0]["date"] == "2024-02-01"
        assert recs[0]["amount"] == 4000.0

    def test_pnb_trailing_minus_not_lexed(self):
        # parity quirk: the shared money lexer (base.py:7) never captures a
        # trailing '-', so PNB's "63.43-" debit lexes as positive 63.43;
        # the trailing-minus path in pick_amount only fires for tokens that
        # carry the sign (e.g. "-63.43")
        lines = ["3/4 WIRE OUT ACME", "63.43- 1,000.00"]
        recs = run("pnb", lines)
        assert recs[0]["amount"] == 63.43

    def test_valley_sign_direction_and_cap(self):
        long_line = "x" * 260
        lines = [
            "2/3 POS DEB STORE -45.10 900.00",
            long_line,
            "2/4 DEPOSIT 100.00 1,000.00",
        ]
        recs = run("valley", lines)
        assert recs[0] == {
            "date": "2024-02-03",
            "description": "2/3 POS DEB STORE -45.10",
            "amount": 45.10,
            "direction": "out",
        }
        # the >250-char line terminated the first block and is not included
        assert recs[1]["date"] == "2024-02-04"
        assert recs[1]["direction"] == "in"

    def test_valley_only_slash_dates(self):
        recs = run("valley", ["Feb 01 payout 4,000.00"])
        assert recs == []


class TestTruist:
    def test_section_machine(self):
        lines = [
            "Deposits, credits and interest",
            "1/5 MOBILE DEPOSIT 500.00",
            "Other withdrawals, debits and service charges",
            "1/6 ZELLE BUSINESS PAYMENT 25.00",
        ]
        recs = run("truist", lines)
        assert [(r["direction"], r["amount"]) for r in recs] == [("in", 500.0), ("out", 25.0)]

    def test_keyword_fallback_without_section(self):
        recs = run("truist", ["1/5 zelle to bob 25.00"])
        assert recs[0]["direction"] == "out"
        recs = run("truist", ["1/5 interest earned 1.00"])
        assert recs[0]["direction"] == "in"

    def test_sign_fallback(self):
        recs = run("truist", ["1/5 mystery item xy -10.00"])
        assert recs[0]["direction"] == "out"
        assert recs[0]["amount"] == 10.0

    def test_single_line_records_only(self):
        # a dateless continuation line is ignored, not appended
        recs = run("truist", ["1/5 thing one 10.00", "continuation without date 99.00"])
        assert len(recs) == 1
        assert recs[0]["amount"] == 10.0


class TestWF:
    def test_date_fragment_rejected(self):
        # "11.8" inside "11.8.24" must not be chosen as the amount
        lines = ["1/3 Purchase authorized on 11.8.24 Card 1234 55.20 1,000.00"]
        recs = run("wf", lines)
        assert recs[0]["amount"] == 55.20

    def test_interest_payment_small_amount_kept(self):
        lines = ["1/31 Interest Payment 1.97 5,000.00"]
        recs = run("wf", lines)
        assert recs[0]["amount"] == 1.97
        assert recs[0]["direction"] == "in"

    def test_desc_cut_before_balance(self):
        lines = ["1/3 Zelle to Bob Ref ABC 120.00 4,880.00"]
        recs = run("wf", lines)
        assert recs[0]["description"].endswith("120.00")
        assert "4,880.00" not in recs[0]["description"]
        assert recs[0]["direction"] == "out"

    def test_wire_org_in_bnf_out(self):
        lines_in = ["1/3 WT Fed#012 Acme Bank /Org=Acme Global LLC Srf#99 750.00 9,000.00"]
        lines_out = ["1/4 WT Fed#013 Acme Bank /Bnf=Supplier Inc Srf#98 320.00 8,680.00"]
        assert run("wf", lines_in)[0]["direction"] == "in"
        assert run("wf", lines_out)[0]["direction"] == "out"

    def test_noise_lines_skipped(self):
        lines = [
            "Statement period activity summary",
            "1/3 Purchase authorized Walmart 19.99 980.01",
        ]
        recs = run("wf", lines)
        assert len(recs) == 1

    def test_short_lines_rejected(self):
        assert run("wf", ["1/3 5.00"]) == []

    def test_default_out(self):
        recs = run("wf", ["1/3 Recurring payment Spotify AB 9.99 970.02"])
        assert recs[0]["direction"] == "out"


class TestChase:
    def test_section_context(self):
        lines = [
            "DEPOSITS AND ADDITIONS",
            "1/5 Remote Online Deposit $1,000.00",
            "ELECTRONIC WITHDRAWALS",
            "1/7 Orig CO Name:Utility Co Pymt $250.00",
        ]
        recs = run("chase", lines)
        assert [r["direction"] for r in recs] == ["in", "out"]

    def test_spanish_sections(self):
        lines = [
            "DEPÓSITOS Y ADICIONES",
            "1/5 Deposito movil $500.00",
        ]
        recs = run("chase", lines)
        assert recs[0]["direction"] == "in"

    def test_phone_number_not_amount(self):
        # the Latitude regression (CHASE_PARSER_BUG_FIXES.md): phone digits
        # must not win over the $-prefixed amount
        lines = ["1/5 Latitude Llc 786-623-5544 Web ID: 123 $1,254.81"]
        recs = run("chase", lines)
        assert recs[0]["amount"] == 1254.81

    def test_dollar_preferred_then_max(self):
        lines = ["1/5 Payment 55.00 $80.00 100.00"]
        recs = run("chase", lines)
        assert recs[0]["amount"] == 80.0

    def test_trn_ssn_normalized(self):
        lines = ["1/5 Online Wire Transfer A2B trn:12345 $99.00"]
        recs = run("chase", lines)
        assert "Trn: 12345" in recs[0]["description"]

    def test_noise_and_markup_skipped(self):
        lines = [
            "*start*dre portrait disclosure message area",
            "1/5 Chase deposit $10.00",
        ]
        recs = run("chase", lines)
        assert len(recs) == 1

    def test_daily_balance_block_rejected(self):
        recs = run("chase", ["1/5 DAILY ENDING BALANCE $4,000.00"])
        # noise prefix catches the header; a residual balance block yields nothing
        assert recs == []

    def test_reversal_is_in(self):
        recs = run("chase", ["1/5 Reversal of online payment $45.00"])
        assert recs[0]["direction"] == "in"

    # golden cases from the reference's own regression docs
    # (CHASE_PARSER_BUG_FIXES.md — the snapshot code's behavior)

    def test_waste_mgmt_transaction_recovered(self):
        # "Problema 2": the ACH row must produce a record at the real amount
        lines = [
            "ELECTRONIC WITHDRAWALS",
            "3/6 Orig CO Name:Waste Mgmt Wm Ezpay Orig ID:1912078863 "
            "Desc Date:240306 CO Entry Descr:Ach Sec:Tel $2,487.82",
        ]
        recs = run("chase", lines)
        assert len(recs) == 1
        assert recs[0]["amount"] == 2487.82
        assert recs[0]["direction"] == "out"

    def test_ach_in_deposits_section_is_in(self):
        # "Problema 3": Orig CO Name rows inside DEPOSITS AND ADDITIONS
        # classify as inflows via section context
        lines = [
            "DEPOSITS AND ADDITIONS",
            "3/6 Orig CO Name:Sanaa Debs Orig ID:123 Desc Date:240306 "
            "CO Entry Descr:Sender $1,000.00",
        ]
        recs = run("chase", lines)
        assert recs[0]["direction"] == "in"


class TestCiti:
    def test_checking_two_amounts(self):
        lines = [
            "CitiBusiness Checking Activity",
            "1/9 Debit Card Purch Staples 45.00 9,955.00",
        ]
        recs = run("citi", lines)
        assert recs[0]["amount"] == 45.0
        assert recs[0]["direction"] == "out"
        assert "9,955.00" not in recs[0]["description"]

    def test_savings_two_column(self):
        lines = [
            "Citi® Savings Account Activity",
            "Savings Activity",
            "1/9 Withdrawal Transfer 250.00 0.00 4,750.00",
        ]
        recs = run("citi", lines)
        assert recs[0]["amount"] == 250.0
        assert recs[0]["direction"] == "out"

    def test_savings_added_column(self):
        lines = [
            "Savings Activity",
            "1/9 Interest Credit 0.00 1.25 4,751.25",
        ]
        recs = run("citi", lines)
        assert recs[0]["amount"] == 1.25
        assert recs[0]["direction"] == "in"

    def test_debit_card_credit_is_in(self):
        lines = [
            "Checking Activity",
            "1/9 Debit Card Credit Amazon Refund 30.00 9,985.00",
        ]
        recs = run("citi", lines)
        assert recs[0]["direction"] == "in"

    def test_metadata_company_line_rejected(self):
        lines = ["Checking Activity", "1/9 ACME HOLDINGS LLC 100.00 5,000.00"]
        recs = run("citi", lines)
        assert recs == []

    def test_noise_inside_block_skipped_not_boundary(self):
        lines = [
            "Checking Activity",
            "1/9 Wire From Acme Global",
            "Page 2",
            "Ref 555 1,000.00 6,000.00",
        ]
        recs = run("citi", lines)
        assert len(recs) == 1
        assert recs[0]["amount"] == 1000.0


class TestBofa:
    def test_full_date_anchor_and_last_amount(self):
        lines = ["01/05/24 Zelle payment from JANE DOE Conf# abc123 250.00"]
        recs = run("bofa", lines)
        assert recs[0] == {
            "date": "2024-01-05",
            "description": "Zelle payment from JANE DOE Conf# abc123",
            "amount": 250.0,
            "direction": "in",
        }

    def test_two_digit_year_pivot(self):
        recs = run("bofa", ["01/05/49 Zelle payment to X Conf# 1 10.00"])
        assert recs[0]["date"] == "2049-01-05"
        recs = run("bofa", ["01/05/50 Zelle payment to X Conf# 1 10.00"])
        assert recs[0]["date"] == "1950-01-05"

    def test_wire_fee_expansion(self):
        lines = ["01/08/24 Wire Transfer Fee 30.00 15.00"]
        recs = run("bofa", lines)
        assert [(r["amount"], r["direction"]) for r in recs] == [(30.0, "out"), (15.0, "out")]
        assert all(r["description"] == "Wire Transfer Fee" for r in recs)

    def test_daily_balance_suppression(self):
        lines = [
            "Daily ledger balances",
            "01/05/24 look-like-tx inside balances 99.00",
            "Deposits and other additions",
            "01/06/24 Counter credit received 500.00",
        ]
        recs = run("bofa", lines)
        assert len(recs) == 1
        assert recs[0]["direction"] == "in"

    def test_wire_type_rules(self):
        recs = run("bofa", ["01/05/24 WIRE TYPE:WIRE IN DATE:0105 Acme 1,000.00"])
        assert recs[0]["direction"] == "in"
        recs = run("bofa", ["01/05/24 WIRE TYPE:INTL OUT DATE:0105 Acme 1,000.00"])
        assert recs[0]["direction"] == "out"

    def test_amount_bounds(self):
        assert run("bofa", ["01/05/24 Zelle payment to X Conf 11,000,000.00"]) == []

    def test_split_concatenated_lines(self):
        merged = (
            "01/05/24 Zelle payment from A Conf# 1 "
            + "x" * 160
            + " 100.00 01/06/24 Zelle payment to B Conf# 2 50.00"
        )
        recs = run("bofa", [merged])
        assert [r["date"] for r in recs] == ["2024-01-05", "2024-01-06"]

    def test_section_fallback(self):
        lines = [
            "Withdrawals and other debits",
            "01/07/24 Mystery transfer item Conf# 9 75.00",
        ]
        recs = run("bofa", lines)
        assert recs[0]["direction"] == "out"


class TestBofaRelationship:
    def test_section_scoped_records(self):
        lines = [
            "Deposits and other credits",
            "Date Description Amount",
            "01/05/24 Counter credit 1,000.00",
            "Total deposits and other credits",
            "01/06/24 outside any section 50.00",
        ]
        recs = run("bofa_relationship", lines)
        # parity quirk: "Total deposits and other credits" re-matches the
        # deposits-section regex *before* the Total check (the reference
        # tests IS_SECTION_DEPOSITS first), so the section never closes
        # and the post-total record is still "in"
        assert len(recs) == 2
        assert recs[0]["direction"] == "in"
        assert recs[0]["amount"] == 1000.0
        assert recs[0]["description"] == "Counter credit"
        assert recs[1]["direction"] == "in"


class TestChaseZipRegressionGoldens:
    """The nine Book-Transfer amounts from the reference's
    CHASE_ZIP_FIXES.md comparison table (283-295): rows whose text
    carries a ZIP+4 fragment (82801-6317) next to the real $-amount.
    The snapshot code's $-prefer/max selection must pick the documented
    amount, never the ZIP fragment."""

    GOLDENS = [
        ("12/03", 68_795.00),
        ("12/11", 73_345.00),
        ("12/13", 90_900.00),
        ("12/16", 38_415.00),
        ("12/19", 85_760.00),
        ("12/20", 115_225.00),
        ("12/23", 125_140.00),
        ("12/24", 122_095.00),
        ("12/26", 87_900.00),
    ]

    def test_book_transfer_amounts(self):
        lines = ["DEPOSITS AND ADDITIONS"] + [
            f"{date} Book Transfer Credit B/O Sheridan Lodging Llc "
            f"Sheridan WY 82801-6317 Trn: 0371908338Es "
            f"${amt:,.2f}"
            for date, amt in self.GOLDENS
        ]
        recs = run("chase", lines)
        assert [r["amount"] for r in recs] == [a for _, a in self.GOLDENS]
        assert all(r["direction"] == "in" for r in recs)


class TestChaseImprovementsDocGoldens:
    """The before/after comparison table from the reference's
    CHASE_PARSER_IMPROVEMENTS.md (83-90), re-expressed against the
    snapshot code's ladder (reference chase.py:235-258): wire fees in
    CARGOS classify out via the 'cargo' pattern, the fee reversal
    classifies in because the reversal rule precedes the fee rule,
    wires follow pattern-then-section, and *end* markup (the
    dailyendingbalance row) is filtered as noise, never a $196k
    transaction."""

    def test_comparison_table_rows(self):
        lines = [
            "CARGOS",
            "12/05 Cargo por transferencia electrónica bancaria"
            " internacional entrante $15.00",
            "12/06 Cargo por transferencia electrónica bancaria"
            " nacional $15.00",
            "DEPÓSITOS Y ADICIONES",
            "12/07 Reversión de cargo misceláneo. Fee reversal $40.00",
            "12/08 Transferencia electrónica entrante de Acme Corp"
            " $16,236.00",
            "*end*dailyendingbalance2 $196,453.06",
            "RETIROS ELECTRÓNICOS",
            "12/09 Online International Wire Transfer A/C: Acme Gmbh"
            " $43,572.00",
        ]
        recs = run("chase", lines)
        got = [(r["amount"], r["direction"]) for r in recs]
        assert got == [
            (15.00, "out"),       # wire fee (international) — CARGOS
            (15.00, "out"),       # wire fee (domestic) — CARGOS
            (40.00, "in"),        # fee reversal — reversal rule wins
            (16_236.00, "in"),    # wire in — deposits section
            (43_572.00, "out"),   # wire out — wire-transfer pattern
        ]
        # the $196,453.06 markup row must not survive as a transaction
        assert all(abs(r["amount"] - 196_453.06) > 1e-9 for r in recs)


class TestDetectionScreen:
    """The literal trigger pre-screen must be a SUPERSET of the ordered
    regex table: any text matching any detection pattern must also hit
    a trigger, or the screen would misroute that source to generic."""

    @staticmethod
    def _representative(pat: str) -> str:
        # the detection patterns are literals modulo \b, \s+ and escapes
        import re as _re

        rep = _re.sub(r"\\b", "", pat)
        rep = rep.replace("\\s+", " ").replace("\\.", ".")
        return rep

    def test_every_pattern_hits_a_trigger(self):
        from pdf_parser_ray.extractors import (
            _DETECTION_SPECS,
            _TRIGGER_LITS,
            detect_source,
        )

        for key, pats in _DETECTION_SPECS:
            for pat in pats:
                rep = self._representative(pat)
                low = rep.lower()
                assert any(lit in low for lit in _TRIGGER_LITS), (key, pat)
                # end-to-end: a page whose head contains the pattern
                # still classifies to its source through the screen
                assert detect_source(f"page header {rep} trailing text") == key

    def test_generic_text_screened_out(self):
        from pdf_parser_ray.extractors import detect_source

        assert detect_source("spark table join filter group sort " * 50) == "generic"

    def test_non_ascii_text_takes_full_loop(self):
        from pdf_parser_ray.extractors import detect_source

        # unicode text must still detect (screen bypassed, not misapplied)
        assert detect_source("Überweisung — Wells Fargo статья") == "wf"
