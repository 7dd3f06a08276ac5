"""Deterministic per-bank statement fixtures.

Each generator returns the *line list* of a synthetic statement whose
head matches exactly one entry of the ordered detection table and whose
body exercises that rule-set's distinctive machinery (sections, column
models, wire rules, …).  Amount/date variation is drawn from the caller
seeded RNG so every statement is unique but reproducible.
"""

from __future__ import annotations

import random


def _amt(rng: random.Random, lo: int = 100, hi: int = 500_000) -> str:
    cents = rng.randint(lo, hi)
    return f"{cents // 100:,}.{cents % 100:02d}"


def _day(rng: random.Random) -> str:
    return f"{rng.randint(1, 12)}/{rng.randint(1, 28)}"


def generic_statement(rng: random.Random, year: int) -> list[str]:
    return [
        f"Community Credit Union statement {year}",
        f"{_day(rng)} ACH CREDIT ACME PAYROLL REF {rng.randint(100,999)} {_amt(rng)} {_amt(rng)}",
        f"{_day(rng)} CHECK {rng.randint(1000,9999)} {_amt(rng)} {_amt(rng)}",
        f"{_day(rng)} POS DEB GROCERY STORE {_amt(rng, 100, 20000)} {_amt(rng)}",
    ]


def ifb_statement(rng: random.Random, year: int) -> list[str]:
    return [
        f"International Finance Bank - IFB Bus Checking {year}",
        f"{_day(rng)} WIRE IN ORDER REF {rng.randint(10,99)} {_amt(rng)}",
        f"{_day(rng)} SERVICE CHARGE {_amt(rng, 100, 9900)} {_amt(rng)}",
    ]


def valley_statement(rng: random.Random, year: int) -> list[str]:
    return [
        f"Valley National Bank business statement {year}",
        f"{_day(rng)} DEPOSIT BRANCH {_amt(rng)} {_amt(rng)}",
        f"{_day(rng)} DBT CRD {rng.randint(1000,9999)} STORE -{_amt(rng, 100, 30000)} {_amt(rng)}",
    ]


def mercury_statement(rng: random.Random, year: int) -> list[str]:
    mon = rng.choice(["Jan", "Feb", "Mar", "Apr", "Jun", "Jul"])
    return [
        f"Mercury - Choice Financial Group {year} help@mercury.com",
        f"{mon} {rng.randint(1,28):02d} Stripe payout {_amt(rng)} {_amt(rng)}",
        f"{mon} {rng.randint(1,28):02d} AWS BILL PAID {_amt(rng, 1000, 90000)} {_amt(rng)}",
    ]


def pnb_statement(rng: random.Random, year: int) -> list[str]:
    return [
        f"Pacific National Bank ACCT ENDING {rng.randint(1000,9999)} {year}",
        f"{_day(rng)} WIRE OUT INTL SUPPLIER",
        f"{_amt(rng, 1000, 90000)} {_amt(rng)}",
        f"{_day(rng)} ELECTRONIC CREDIT CLIENT {_amt(rng)} {_amt(rng)}",
    ]


def truist_statement(rng: random.Random, year: int) -> list[str]:
    return [
        f"Truist business banking statement {year} truist.com",
        "Deposits, credits and interest",
        f"{_day(rng)} MOBILE DEPOSIT {_amt(rng)}",
        f"{_day(rng)} INTEREST PAYMENT {_amt(rng, 10, 999)}",
        "Other withdrawals, debits and service charges",
        f"{_day(rng)} ZELLE BUSINESS PAYMENT {_amt(rng, 500, 50000)}",
    ]


def wf_statement(rng: random.Random, year: int) -> list[str]:
    return [
        f"Wells Fargo Navigate Business Checking {year} wellsfargo.com",
        # noise the WF filter stack must drop (wf.py:35-42,139-174)
        "Statement period activity summary",
        f"Beginning balance {_amt(rng)}",
        "Page 1 of 4",
        f"{_day(rng)} Purchase authorized on {rng.randint(1,12)}.{rng.randint(1,28)}.{year % 100} Card 1234 {_amt(rng, 500, 40000)} {_amt(rng)}",
        f"{_day(rng)} WT Fed#{rng.randint(100,999)} Acme Bank /Org=Global Exports LLC Srf#{rng.randint(10,99)} {_amt(rng)} {_amt(rng)}",
        f"{_day(rng)} WT Fed#{rng.randint(100,999)} Acme Bank /Bnf=Supplier Inc Srf#{rng.randint(10,99)} {_amt(rng)} {_amt(rng)}",
        f"{_day(rng)} Interest Payment {_amt(rng, 10, 500)} {_amt(rng)}",
        f"{_day(rng)} Zelle to Jane Doe Ref {rng.randint(100,999)} {_amt(rng, 500, 40000)} {_amt(rng)}",
    ]


def chase_statement(rng: random.Random, year: int) -> list[str]:
    return [
        f"Chase Total Checking statement {year} chase.com",
        # markup + summary noise (chase.py:94-118)
        "*start*dre portrait disclosure message area*end*",
        f"Beginning Balance ${_amt(rng)}",
        "CHECKING SUMMARY",
        "DEPOSITS AND ADDITIONS",
        f"{_day(rng)} Remote Online Deposit ${_amt(rng)}",
        f"{_day(rng)} Zelle Payment From Acme Conf# {rng.randint(10**8, 10**9-1)} ${_amt(rng)}",
        "ELECTRONIC WITHDRAWALS",
        f"{_day(rng)} Orig CO Name:Utility Co Pymt Trn:{rng.randint(10**6,10**7-1)} ${_amt(rng, 1000, 90000)}",
        f"{_day(rng)} Online Domestic Wire Transfer Via:Acme Bank ${_amt(rng)}",
        f"Total Deposits and Additions ${_amt(rng)}",
        "DAILY ENDING BALANCE",
    ]


def chase_es_statement(rng: random.Random, year: int) -> list[str]:
    """Spanish-layout Chase statement — exercises the bilingual section
    detection (chase.py:70-89) end-to-end."""
    return [
        f"Chase Total Checking estado de cuenta {year} chase.com",
        "DEPÓSITOS Y ADICIONES",
        f"{_day(rng)} Deposito movil ${_amt(rng)}",
        "RETIROS ELECTRÓNICOS",
        f"{_day(rng)} Débito de cámara compensadora Utility Co ${_amt(rng, 1000, 90000)}",
        f"{_day(rng)} Compra con tarjeta Supermercado ${_amt(rng, 500, 30000)}",
    ]


def citi_statement(rng: random.Random, year: int) -> list[str]:
    return [
        f"CitiBusiness statement {year}",
        "Page 1",
        "Date Description Debits Credits Balance",
        "CitiBusiness Checking Activity",
        f"{_day(rng)} Wire From Global Exports Ref {rng.randint(100,999)} {_amt(rng)} {_amt(rng)}",
        f"{_day(rng)} Debit Card Purch Staples {_amt(rng, 500, 30000)} {_amt(rng)}",
        "Savings Activity",
        f"{_day(rng)} Withdrawal Transfer {_amt(rng, 1000, 50000)} 0.00 {_amt(rng)}",
        f"{_day(rng)} Interest Credit 0.00 {_amt(rng, 10, 500)} {_amt(rng)}",
    ]


def bofa_statement(rng: random.Random, year: int) -> list[str]:
    yy = year % 100
    return [
        f"Bank of America Business Advantage statement {year}",
        "Page 1 of 3",
        # daily-balance section must be suppressed until the next section
        # header (bofa.py:28-36,147-153)
        "Daily ledger balances",
        f"{rng.randint(1,12)}/{rng.randint(1,28)} {_amt(rng)}",
        "Deposits and other additions",
        f"{rng.randint(1,12):02d}/{rng.randint(1,28):02d}/{yy:02d} Zelle payment from JANE DOE Conf# {rng.randint(10**6,10**7-1)} {_amt(rng)}",
        f"{rng.randint(1,12):02d}/{rng.randint(1,28):02d}/{yy:02d} WIRE TYPE:WIRE IN DATE:{rng.randint(1000,9999)} Global Exports {_amt(rng)}",
        "Withdrawals and other debits",
        f"{rng.randint(1,12):02d}/{rng.randint(1,28):02d}/{yy:02d} Online Banking transfer to CHK Confirmation# {rng.randint(10**8,10**9-1)} {_amt(rng, 1000, 90000)}",
        f"{rng.randint(1,12):02d}/{rng.randint(1,28):02d}/{yy:02d} Wire Transfer Fee {_amt(rng, 1500, 4500)}",
    ]


STATEMENT_BUILDERS = {
    "generic": generic_statement,
    "ifb": ifb_statement,
    "valley": valley_statement,
    "mercury": mercury_statement,
    "pnb": pnb_statement,
    "truist": truist_statement,
    "wf": wf_statement,
    "chase": chase_statement,
    "chase_es": chase_es_statement,
    "citi": citi_statement,
    "bofa": bofa_statement,
}

BANK_CYCLE = tuple(STATEMENT_BUILDERS)
