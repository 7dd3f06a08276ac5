"""Citi rule-set (reference parsers/citi.py:10-518).

Two distinct column models behind one section state machine:

* checking — ``Date  Description  Debits  Credits  Balance``: positional
  amount-vs-balance disambiguation over 1 / 2 / 3+ lexed tokens,
* savings — ``Date  Description  Amount Subtracted  Amount Added
  Balance``: compare the two leading tokens to pick value + direction.

Plus a long noise-pattern list, metadata rejection for company-name
lines without transaction keywords, and a 3-tier direction keyword
ladder with the ``DEBIT CARD CREDIT`` (refund ⇒ inflow) special case.
"""

from __future__ import annotations

import re
from typing import Any

from ..functions.scalars import AMOUNT_RE, year_from_text

_NOISE_PATTERNS = [
    re.compile(p)
    for p in (
        r"^citibank",
        r"^citibusiness",
        r"relationship summary",
        r"checking summary",
        r"customer service information",
        r"^page \d+",
        r"^account \d+",
        r"^statement period",
        r"service charge summary from",
        r"^important notice",
        r"^important disclosures",
        r"^fdic insurance",
        r"^apy and interest rate",
        r"billing rights summary",
        r"in case of errors",
        r"^messages from citi",
        r"value of accounts this period",
        r"earnings summary",
        r"we are notifying",
        r"^effective",
        r"^account as of",
        r"citibusiness® account as of",
        r"^\w+ \d+,? - \w+ \d+,? \d{4}",  # statement-period date ranges
        r"^\d{4} de citi",
    )
]
_COLUMN_HEADERS = (
    "date description debits credits balance",
    "date description amount subtracted amount added balance",
    "beginning balance:",
    "ending balance:",
    "balance subject",
    "average daily collected balance",
    "type of charge",
    "charges debited from account",
    "total charges for services",
    "net service charge",
    "total debits/credits",
    "total subtracted/added",
)
_BARE_AMOUNT_LINE = re.compile(r"^\s*\$[\d,]+\.\d{2}\s*$")
_LONG_DIGIT_LINE = re.compile(r"^\s*\d{12,}\s*$")
_DATE_ANCHOR = re.compile(r"^(\d{1,2})/(\d{1,2})(?:\s|[A-Za-z])")
_COMPANY_LINE = re.compile(r"^\d{1,2}/\d{1,2}\s+[A-Z\s]+(?:LLC|INC|CORP|COMPANY)")
_MONTH_THROUGH_RE = re.compile(
    r"\b(january|february|march|april|may|june|july|august|september|october|november|december)"
    r"\s+\d{1,2},\s+\d{4}\s+through\s+"
)
_MMDD_INLINE_RE = re.compile(r"\b\d{1,2}/\d{1,2}\b")
_WS_RE = re.compile(r"\s+")

_METADATA_SNIPPETS = (
    "account as of",
    "statement period",
    "service charge summary",
    "average daily collected balance",
    "relationship summary",
    "checking summary",
)
_TX_KEYWORDS = (
    "deposit",
    "credit",
    "debit",
    "wire",
    "transfer",
    "payment",
    "purchase",
    "withdrawal",
    "fee",
    "charge",
    "interest",
)
_LEGAL_SNIPPETS = (
    "in case of errors",
    "customer service",
    "important disclosures",
    "fdic insurance",
    "apy and interest rate",
    "billing rights summary",
)
_BALANCE_KEYWORDS = (
    "deposit",
    "credit",
    "debit",
    "purchase",
    "withdrawal",
    "wire",
    "fee",
    "interest",
)


def detect_section(line: str) -> str | None:
    """Checking vs savings activity headers (citi.py:74-88)."""
    low = line.lower().strip()
    if (
        "checking activity" in low
        or "checking account activity" in low
        or "citibusiness checking activity" in low
        or "streamlined checking" in low
    ):
        return "checking"
    if "savings activity" in low:
        return "savings"
    if "citi® savings" in low and "account activity" in low:
        return "savings"
    if "citibank® savings" in low and "account activity" in low:
        return "savings"
    if "account activity" in low and "amount subtracted" in low and "amount added" in low:
        return "savings"
    return None


def _is_noise(line: str) -> bool:
    """Header/metadata rejection (citi.py:90-145)."""
    low = line.lower().strip()
    for rx in _NOISE_PATTERNS:
        if rx.search(low):
            return True
    if any(h in low for h in _COLUMN_HEADERS):
        return True
    if _BARE_AMOUNT_LINE.match(line) or _LONG_DIGIT_LINE.match(line):
        return True
    return False


def _line_date(line: str, year: int) -> str | None:
    """MM/DD followed by a space or a letter, with bounds (citi.py:149-157)."""
    m = _DATE_ANCHOR.match(line.strip())
    if not m:
        return None
    mm, dd = int(m.group(1)), int(m.group(2))
    if 1 <= mm <= 12 and 1 <= dd <= 31:
        return f"{year:04d}-{mm:02d}-{dd:02d}"
    return None


def _token_value(tok: str) -> float | None:
    t = tok.strip()
    neg = (t.startswith("(") and t.endswith(")")) or t.startswith("-")
    bare = t.replace("$", "").replace(",", "").replace("(", "").replace(")", "").strip()
    try:
        v = float(bare)
    except ValueError:
        return None
    return -v if neg else v


def _is_metadata(text: str) -> bool:
    """Company-name rows without transaction vocabulary are headers, not
    records (citi.py:202-230)."""
    low = text.lower()
    if any(s in low for s in _METADATA_SNIPPETS):
        return True
    if _COMPANY_LINE.match(text) and not any(k in low for k in _TX_KEYWORDS):
        return True
    return False


def _is_balance_block(text: str) -> bool:
    low = text.lower()
    if "daily ending balance" in low:
        return True
    if _MONTH_THROUGH_RE.search(low) and not any(k in low for k in _BALANCE_KEYWORDS):
        return True
    return False


def _is_legal(text: str) -> bool:
    low = text.lower()
    return any(s in low for s in _LEGAL_SNIPPETS)


def clean_description(text: str) -> str:
    """Strip money tokens, inline dates, column-header residue; collapse
    whitespace; capitalize (citi.py:464-472)."""
    out = AMOUNT_RE.sub("", text)
    out = _MMDD_INLINE_RE.sub("", out)
    out = re.sub(r"\bDATE\s+DESCRIPTION\s+.*BALANCE\b", "", out, flags=re.I)
    out = re.sub(r"\bBEGINNING BALANCE\b|\bENDING BALANCE\b", "", out, flags=re.I)
    out = _WS_RE.sub(" ", out).strip()
    if out:
        out = out[0].upper() + out[1:]
    return out


def _checking_amount_and_desc(text: str) -> tuple[float, str] | None:
    """Checking column model (citi.py:354-440): the trailing token is the
    balance; 1 token = the value itself, 2 tokens = (value, balance),
    3+ tokens = first non-trivial value with the description cut before
    the following token."""
    matches = list(AMOUNT_RE.finditer(text))
    amounts = [
        (v, m.start(), m.end())
        for m in matches
        if (v := _token_value(m.group())) is not None
    ]
    if not amounts:
        return None

    if len(amounts) == 1:
        return amounts[0][0], text
    if len(amounts) == 2:
        return amounts[0][0], text[: amounts[1][1]].rstrip()

    value, cut = None, None
    for k in range(len(amounts) - 1):  # the last token is the balance
        if abs(amounts[k][0]) >= 0.01:
            value = amounts[k][0]
            if k + 1 < len(amounts):
                cut = amounts[k + 1][1]
            break
    if value is None:
        value = amounts[0][0]
        if len(amounts) > 1:
            cut = amounts[1][1]
    desc = text[:cut].rstrip() if cut else text
    return value, desc


def _savings_record(text: str) -> dict[str, Any] | None:
    """Savings column model (citi.py:258-352): drop the trailing balance
    token, then compare Amount-Subtracted vs Amount-Added to choose the
    value and direction; single-token rows fall back to keywords then
    sign."""
    matches = list(AMOUNT_RE.finditer(text))
    amounts = [
        (v, m.start()) for m in matches if (v := _token_value(m.group())) is not None
    ]
    if not amounts:
        return None

    tx = amounts[:-1] if len(amounts) >= 2 else amounts
    low = text.lower()

    if len(tx) >= 2:
        sub_amt, add_amt = tx[0][0], tx[1][0]
        if abs(sub_amt) > 0.01 and abs(add_amt) < 0.01:
            amount, direction = abs(sub_amt), "out"
        elif abs(add_amt) > 0.01 and abs(sub_amt) < 0.01:
            amount, direction = abs(add_amt), "in"
        elif abs(add_amt) > abs(sub_amt):
            amount, direction = abs(add_amt), "in"
        else:
            amount, direction = abs(sub_amt), "out"
    elif len(tx) == 1:
        amount = abs(tx[0][0])
        if any(k in low for k in ("interest", "deposit", "credit", "reversal")):
            direction = "in"
        elif any(k in low for k in ("fee", "withdrawal", "debit", "withholding")):
            direction = "out"
        else:
            direction = "in" if tx[0][0] > 0 else "out"
    else:
        return None

    desc = text
    for m in matches:
        desc = desc.replace(m.group(), " ")
    desc = clean_description(_WS_RE.sub(" ", desc).strip())
    if not desc or len(desc) < 3:
        return None
    return {"amount": amount, "direction": direction, "desc": desc}


def direction_for_citi(description: str, section: str, amount: float) -> str:
    """3-tier keyword ladder; ``debit card credit`` is a refund ⇒ inflow
    (citi.py:476-518)."""
    d = description.lower()
    if "debit card credit" in d or "debit card credi" in d:
        return "in"
    if any(
        k in d
        for k in (
            "electronic credit",
            "deposit",
            "interest paid",
            "interest credit",
            "wire from",
            "funds transfer from",
            "misc deposit",
            "reversal",
        )
    ):
        return "in"
    if any(
        k in d
        for k in (
            "service charge",
            "fee for",
            "incoming wire fee",
            "monthly maintenance fee",
            "foreign transaction fee",
            "acct analysis direct db",
            "federal withholding tax",
        )
    ):
        return "out"
    if any(
        k in d
        for k in (
            "debit card purch",
            "ach debit",
            "funds trn out",
            "int'l wire out",
            "international wire out",
            "cbusol transfer debit",
            "cbusol international wire out",
            "cbol wire to",
            "cbusol wire to",
            "withdrawal",
            "instant payment debit",
            "other/withdrawal",
        )
    ):
        return "out"
    if "wire to" in d:
        return "out"
    return "in" if amount > 0 else "out"


def extract_citi(
    lines: list[str], full_text: str, fallback_year: int
) -> list[dict[str, Any]]:
    """Sectioned scan (citi.py:13-70): noise lines inside a block are
    skipped (not boundaries), blanks tolerate one gap, and the block
    finisher routes to the checking or savings column model."""
    year = year_from_text(full_text, fallback_year)
    records: list[dict[str, Any]] = []
    section: str | None = None

    i, n = 0, len(lines)
    while i < n:
        line = lines[i]
        if not line or not line.strip():
            i += 1
            continue
        sec = detect_section(line)
        if sec:
            section = sec
            i += 1
            continue
        if _is_noise(line):
            i += 1
            continue
        date = _line_date(line, year)
        if not date:
            i += 1
            continue

        block = [line]
        j = i + 1
        blanks = 0
        while j < n:
            nxt = lines[j]
            if not nxt or not nxt.strip():
                blanks += 1
                if blanks >= 2:
                    break
                j += 1
                continue
            if _line_date(nxt, year):
                break
            if detect_section(nxt):
                break
            if _is_noise(nxt):
                j += 1
                continue
            block.append(nxt)
            blanks = 0
            j += 1

        rec = _finish_block(block, date, section)
        if rec:
            records.append(rec)
        i = j

    return records


def _finish_block(
    block: list[str], date: str, section: str | None
) -> dict[str, Any] | None:
    if not block:
        return None
    joined = " ".join(x.strip() for x in block if x).strip()
    if not joined:
        return None
    if _is_legal(joined) or _is_balance_block(joined) or _is_metadata(joined):
        return None

    if section == "savings":
        got = _savings_record(" ".join(block))
        if not got:
            return None
        return {
            "date": date,
            "description": got["desc"],
            "amount": got["amount"],
            "direction": got["direction"],
        }

    picked = _checking_amount_and_desc(joined)
    if picked is None:
        return None
    amount, raw_desc = picked
    desc = clean_description(raw_desc)
    if not desc or len(desc) < 3:
        return None
    return {
        "date": date,
        "description": desc,
        "amount": abs(amount),
        "direction": direction_for_citi(desc, section or "", amount),
    }
