"""BofA "Business Advantage Relationship" rule-set
(reference parsers/bofa_relationship.py:21-181 — registered but disabled
in the reference's registry, parsers/__init__.py:12-13,26; kept here as
the registry-extensibility example and selectable by explicit key).

Purely section-driven: records exist only *inside* a Deposits or
Withdrawals section, direction comes from the section, a ``Total …`` row
closes it, and the amount is the last money token (the Amount column).
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

_DATE_LINE = re.compile(r"^\s*\d{1,2}/\d{1,2}/\d{2}\b")
_HEADER_ROW = re.compile(r"^\s*Date\s+Description\s+Amount\s*$", re.I)
_SEC_DEPOSITS = re.compile(r"\bDeposits and other credits\b", re.I)
_SEC_WITHDRAWALS = re.compile(r"\bWithdrawals and other debits\b", re.I)
_SEC_TOTAL = re.compile(r"^Total (deposits.*|withdrawals.*)$", re.I)
_CONTINUED = re.compile(r"continued on the next page", re.I)
_LEADING_DATE_RE = re.compile(r"^\s*\d{1,2}/\d{1,2}/\d{2}\s+")
_DATE_TOKEN_SPLIT = re.compile(r"(?=(\d{1,2}/\d{1,2}/\d{2}\s))")
_DATE_IN_LONG_LINE = re.compile(r"\d{1,2}/\d{1,2}/\d{2}\s+\S")


def _is_noise(line: str) -> bool:
    if not line:
        return True
    if _HEADER_ROW.match(line) or _CONTINUED.search(line):
        return True
    if line.startswith(("Daily ledger balances", "Important Messages", "Your checking account")):
        return True
    return False


def _split_long_lines(lines: list[str]) -> list[str]:
    """Concatenated-row splitting at >220 chars on MM/DD/YY boundaries
    (bofa_relationship.py:153-171)."""
    out: list[str] = []
    for ln in lines:
        if len(ln) > 220 and _DATE_IN_LONG_LINE.search(ln):
            buf = ""
            for piece in _DATE_TOKEN_SPLIT.split(ln):
                if _DATE_LINE.match(piece.strip()):
                    if buf.strip():
                        out.append(buf.strip())
                    buf = piece.strip()
                else:
                    buf += " " + piece.strip()
            if buf.strip():
                out.append(buf.strip())
        else:
            out.append(ln)
    return out


def _header_year(full_text: str) -> int | None:
    """Statement-period header year: 'for October 1, 2024 to …'
    (bofa_relationship.py:173-181)."""
    m = re.search(
        r"\b(?:for|to)\s+[A-Za-z]{3,9}\s+\d{1,2},\s*(\d{4})\b", full_text, flags=re.I
    )
    return int(m.group(1)) if m else None


def _any_date(line: str, year: int) -> str | None:
    return (
        parse_slash_date(line, year)
        or parse_long_date(line)
        or parse_mon_dd(line, year)
    )


def extract_bofa_relationship(
    lines: list[str], full_text: str, fallback_year: int
) -> list[dict[str, Any]]:
    year = year_from_text(full_text, fallback_year) or _header_year(full_text) or fallback_year
    lines = _split_long_lines(lines)
    records: list[dict[str, Any]] = []
    section: str | None = None

    i, n = 0, len(lines)
    while i < n:
        ln = lines[i]
        if _SEC_DEPOSITS.search(ln):
            section = "in"
            i += 1
            continue
        if _SEC_WITHDRAWALS.search(ln):
            section = "out"
            i += 1
            continue
        if section and _SEC_TOTAL.search(ln):
            section = None
            i += 1
            continue
        if _is_noise(ln):
            i += 1
            continue

        if section and _DATE_LINE.match(ln):
            date = _any_date(ln, year)
            block = [ln]
            i += 1
            while i < n:
                nxt = lines[i]
                if (
                    _DATE_LINE.match(nxt)
                    or _SEC_TOTAL.search(nxt)
                    or _SEC_DEPOSITS.search(nxt)
                    or _SEC_WITHDRAWALS.search(nxt)
                ):
                    break
                if not _is_noise(nxt):
                    block.append(nxt)
                i += 1

            rec = _block_record(block, date, section)
            if rec:
                records.append(rec)
            continue

        i += 1

    return records


def _block_record(
    block: list[str], date: str | None, section: str
) -> dict[str, Any] | None:
    """Last money token = the Amount column; strip it from the tail of the
    description (bofa_relationship.py:118-151)."""
    text = " ".join(block)
    text_wo_date = _LEADING_DATE_RE.sub("", text).strip()
    tokens = AMOUNT_RE.findall(text)
    if not tokens:
        return None
    last = tokens[-1]
    bare = (
        last.replace("$", "")
        .replace(",", "")
        .replace("(", "")
        .replace(")", "")
        .replace("-", "")
        .strip()
    )
    try:
        amount = float(bare)
    except ValueError:
        return None
    desc = re.sub(re.escape(last) + r"\s*$", "", text_wo_date).strip()
    return {
        "date": date,
        "description": desc,
        "amount": amount,
        "direction": section,
    }
