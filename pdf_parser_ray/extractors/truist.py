"""Truist rule-set: single-line records driven by a section state machine
with keyword and sign fallbacks (reference parsers/truist.py:13-74)."""

from __future__ import annotations

import re
from typing import Any

from ..functions.scalars import (
    AMOUNT_RE,
    parse_slash_date,
    pick_amount,
    strip_trailing_amount,
    year_from_text,
)

_SEC_IN = re.compile(r"Deposits.*credits", re.I)
_SEC_OUT = re.compile(r"(Other withdrawals|Debits|Service charges)", re.I)
_KW_OUT = re.compile(r"(zelle|payment to|iat|debit|withdrawal|ach|bill pay)", re.I)
_KW_IN = re.compile(r"(deposit|credit|interest|paypal\s+\d+)", re.I)


def extract_truist(
    lines: list[str], full_text: str, fallback_year: int
) -> list[dict[str, Any]]:
    """Linear scan holding a section flag: a 'Deposits … credits' header
    flips to inflow context, withdrawal/debit/service-charge headers to
    outflow (truist.py:30-36).  Only slash-dated single lines become
    records; direction = section, else keyword tables, else amount sign
    (truist.py:51-65)."""
    year = year_from_text(full_text, fallback_year)
    records: list[dict[str, Any]] = []
    section: str | None = None

    for line in lines:
        if _SEC_IN.search(line):
            section = "in"
            continue
        if _SEC_OUT.search(line):
            section = "out"
            continue

        date = parse_slash_date(line, year)
        if not date:
            continue
        amount = pick_amount(AMOUNT_RE.findall(line), prefer_first=True)
        if amount is None:
            continue
        desc = strip_trailing_amount(line)

        if section == "in":
            direction = "in"
        elif section == "out":
            direction = "out"
        elif _KW_OUT.search(desc):
            direction = "out"
        elif _KW_IN.search(desc):
            direction = "in"
        elif amount < 0:
            direction = "out"
        elif amount > 0:
            direction = "in"
        else:
            direction = "unknown"

        records.append(
            {
                "date": date,
                "description": desc,
                "amount": abs(amount),
                "direction": direction,
            }
        )
    return records
