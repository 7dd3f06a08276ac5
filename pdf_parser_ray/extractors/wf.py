"""Wells Fargo rule-set (reference parsers/wf.py:14-313).

The richest filter stack of the family: heavy noise/header rejection,
date-fragment disambiguation (an "11.8" inside "11.8.24" is a date, not
$11.80), first-valid-amount selection with the description cut before
the trailing balance token, and an 8-priority direction ladder topped by
the wire ``/Org=`` (inbound) vs ``/Bnf=`` (outbound) rule.
"""

from __future__ import annotations

import re
from typing import Any

from ..functions.scalars import (
    AMOUNT_RE,
    parse_long_date,
    parse_mon_dd,
    parse_slash_date,
    year_from_text,
)

_WIRE_ORG = re.compile(r"/org=", re.I)  # wires coming in (wf.py:14)
_WIRE_BNF = re.compile(r"/bnf=", re.I)  # wires going out (wf.py:15)

# Headers / summary rows that must never become transactions (wf.py:35-42).
_NOISE = re.compile(
    r"(?:totals\b|ending daily balance|important account information|service fee summary|"
    r"statement period|beginning balance|deposits/credits|withdrawals/debits|ending balance|"
    r"account number|page \d+ of \d+|account transaction fees|units used|units included|excess units|"
    r"service charge description|cash deposited|transactions|total service charges|"
    r"fee period|how to avoid|minimum required|this fee period|average ledger balance|minimum daily balance)",
    re.I,
)

_HEADER_SNIPPETS = (
    "wells fargo",
    "questions?",
    "available by phone",
    "online:",
    "write:",
    "your business and wells fargo",
    "account options",
    "business online banking",
    "overdraft protection",
    "important account information",
    "new york city customers",
    "updated limits",
    "effective october",
    "this notice",
    "watch for debit card scams",
)
_SUMMARY_SNIPPETS = (
    "statement period activity",
    "beginning balance",
    "ending balance",
    "deposits/credits",
    "withdrawals/debits",
    "totals",
    "account transaction fees",
    "service charge description",
    "units used",
    "units included",
    "excess units",
    "total service",
    "fee period",
    "how to avoid",
    "minimum required",
    "average ledger",
    "minimum daily balance",
    "standard monthly service fee",
)
_METADATA_RE = re.compile(
    r"page \d+ of \d+|account number:|for direct deposit|for wire transfers|routing number"
)

_FULL_DATE_RE = re.compile(r"\b\d{1,2}\.\d{1,2}\.\d{2,4}\b")
_MON_DAY_RE = re.compile(
    r"\b(jan|feb|mar|apr|may|jun|jul|aug|sep|oct|nov|dec)\s+\d{1,2}\b", re.I
)
_NOT_DATE_CONTEXT = (
    "interest payment",
    "interest credit",
    "fee",
    "charge",
    "payment",
    "credit",
    "debit",
    "service",
)


def _looks_like_date_fragment(token: str, context: str) -> bool:
    """True when a lexed money token is really a piece of a dotted date
    (wf.py:44-87): value in 1..31, ≤2 decimals, no transaction keyword
    nearby, and the surrounding text shows a full date pattern."""
    bare = (
        token.replace("$", "")
        .replace(",", "")
        .replace("(", "")
        .replace(")", "")
        .replace("-", "")
    )
    if "." in bare and len(bare.split(".")[1]) > 2:
        return False
    try:
        val = float(bare)
    except ValueError:
        return False
    if val > 31 or val < 1:
        return False
    low = context.lower()
    if any(k in low for k in _NOT_DATE_CONTEXT):
        return False
    if _FULL_DATE_RE.search(context) or _MON_DAY_RE.search(context):
        return True
    return False


def _select_amount_and_cut(text: str) -> tuple[float, str] | None:
    """First money token that is not a date fragment -> signed value; the
    description is cut just before the *next* token (typically the running
    balance) (wf.py:89-137)."""
    matches = list(AMOUNT_RE.finditer(text))
    if not matches:
        return None

    chosen, chosen_idx = None, 0
    for idx, m in enumerate(matches):
        if _looks_like_date_fragment(m.group(), text):
            continue
        chosen, chosen_idx = m, idx
        break
    if chosen is None:
        chosen, chosen_idx = matches[0], 0

    if chosen_idx + 1 < len(matches):
        desc = text[: matches[chosen_idx + 1].start()].rstrip()
    else:
        desc = text

    raw = chosen.group()
    neg = raw.startswith("-") or raw.endswith("-") or raw.startswith("(")
    bare = (
        raw.replace("$", "")
        .replace(",", "")
        .replace("(", "")
        .replace(")", "")
        .replace("-", "")
    )
    try:
        val = float(bare)
    except ValueError:
        return None
    return (-val if neg else val, desc)


def _is_transaction_line(line: str) -> bool:
    """Reject headers, summary rows, metadata, and sub-10-char fragments
    (wf.py:139-174)."""
    low = line.lower()
    if any(s in low for s in _HEADER_SNIPPETS):
        return False
    if any(s in low for s in _SUMMARY_SNIPPETS):
        return False
    if _METADATA_RE.search(low):
        return False
    if len(line.strip()) < 10:
        return False
    return True


_FROM_RE = re.compile(r"\bfrom\s+\w+")
_COMPANY_PAYMENT_RE = re.compile(r"\w+\s+company\s+payment")
_PAYMENT_NUM_RE = re.compile(r"\bpayment\s+\w+\s+\d+")
_WT_RE = re.compile(r"\bwt\s+\w+")


def direction_for_wf(description: str) -> str:
    """The 8-priority direction ladder (wf.py:176-227); anything that is
    not an explicit inbound pattern defaults to an outflow."""
    low = description.lower()
    if _WIRE_ORG.search(low) and not _WIRE_BNF.search(low):
        return "in"
    if _WIRE_BNF.search(low) and not _WIRE_ORG.search(low):
        return "out"
    if any(p in low for p in ("online transfer from", "transfer from", "llc sender", "sender")):
        return "in"
    if _FROM_RE.search(low):
        return "in"
    if _COMPANY_PAYMENT_RE.search(low) or _PAYMENT_NUM_RE.search(low):
        return "in"
    if "zelle from" in low:
        return "in"
    if "zelle to" in low:
        return "out"
    if _WT_RE.search(low) and "morgan stanley" in low:
        return "in"
    if (
        any(p in low for p in ("interest payment", "interest credit", "deposit", "credit"))
        and "credit card" not in low
    ):
        return "in"
    return "out"


def _any_date(line: str, year: int) -> str | None:
    return (
        parse_slash_date(line, year)
        or parse_long_date(line)
        or parse_mon_dd(line, year)
    )


def extract_wf(
    lines: list[str], full_text: str, fallback_year: int
) -> list[dict[str, Any]]:
    """Block extraction with the WF filter stack (wf.py:232-313): skip
    noise/invalid lines, anchor on any date form, accumulate until the
    next date or a noise/invalid boundary, validate the joined block,
    then amount-select + direction-classify."""
    year = year_from_text(full_text, fallback_year)
    records: list[dict[str, Any]] = []
    i, n = 0, len(lines)

    while i < n:
        line = lines[i]
        if not line.strip() or not _is_transaction_line(line):
            i += 1
            continue
        if _NOISE.search(line):
            i += 1
            continue
        date = _any_date(line, year)
        if not date:
            i += 1
            continue

        block = [line]
        j = i + 1
        while j < n:
            nxt = lines[j]
            if not nxt.strip():
                j += 1
                continue
            if _any_date(nxt, year):
                break
            if _NOISE.search(nxt) or not _is_transaction_line(nxt):
                break
            block.append(nxt)
            j += 1

        joined = " ".join(block)
        if not _is_transaction_line(joined):
            i = j
            continue
        picked = _select_amount_and_cut(joined)
        if not picked:
            i = j
            continue
        amount, desc = picked
        records.append(
            {
                "date": date,
                "description": desc,
                "amount": abs(amount),
                "direction": direction_for_wf(desc),
            }
        )
        i = j

    return records
