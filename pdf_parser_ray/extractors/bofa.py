"""Bank of America rule-set (reference parsers/bofa.py:10-310).

Single-line records with a full MM/DD/YY date anchor, a pre-tokenizer
that re-splits concatenated lines >200 chars on date boundaries, a
daily-balance-section suppression flag, wire-transfer-fee multi-amount
expansion (one line may yield several fee records), amount = the *last*
money token bounds-checked to 0.01..10,000,000, and a ~15-rule direction
ladder ending in a default outflow.
"""

from __future__ import annotations

import re
from typing import Any

from ..functions.scalars import AMOUNT_RE

_FULL_DATE_ANCHOR = re.compile(r"(\d{1,2})/(\d{1,2})/(\d{2})\b")
_DATE_SPLIT_RE = re.compile(r"(\d{1,2}/\d{1,2}/\d{2}\s+)")
_DATE_PIECE_RE = re.compile(r"^\d{1,2}/\d{1,2}/\d{2}\s+$")
_MMDD_NO_YEAR_RE = re.compile(r"\b\d{1,2}/\d{1,2}\b(?!/\d{2})")

_HEADER_PHRASES = (
    "this page intentionally left blank",
    "your checking account",
    "business advantage relationship",
    "business advantage fundamentals",
    "preferred rewards for bus",
    "account summary",
    "important information",
    "daily ledger balances",
)
_ACCOUNT_NO_RE = re.compile(r"account\s*#\s*\d{4}\s+\d{4}\s+\d{4}")

_EXACT_NOISE = (
    "bank of america",
    "your checking account",
    "account summary",
    "deposits and other credits",
    "withdrawals and other debits",
    "service fees",
    "daily ledger balances",
    "preferred rewards",
    "important information",
    "customer service",
    "date description amount",
    "total deposits",
    "total withdrawals",
    "total service fees",
    "beginning balance",
    "ending balance",
    "average ledger",
    "business advantage",
    "this page intentionally",
)

_TX_INDICATORS = (
    "wire type:",
    "online banking",
    "zelle",
    "transfer",
    "payment",
    "checkcard",
    "purchase",
    "fee",
    "deposit",
    "withdrawal",
    "ca tlr",
    "bkofamerica",
)

_WIRE_IN_RE = re.compile(r"wire type:\s*(wire|intl|book|fx) in")
_WIRE_OUT_RE = re.compile(r"wire type:\s*(wire|intl|book|fx) out")


def split_concatenated_lines(lines: list[str]) -> list[str]:
    """Re-split lines over 200 chars on MM/DD/YY boundaries — a PDF
    extraction artifact where several records land on one visual line
    (bofa.py:109-126)."""
    out: list[str] = []
    for line in lines:
        if len(line) <= 200:
            out.append(line)
            continue
        acc = ""
        for piece in _DATE_SPLIT_RE.split(line):
            if _DATE_PIECE_RE.match(piece):
                if acc.strip():
                    out.append(acc.strip())
                acc = piece
            else:
                acc += piece
        if acc.strip():
            out.append(acc.strip())
    return out


def _is_daily_balance_header(line: str) -> bool:
    low = line.lower().strip()
    if "daily ledger balances" in low:
        return True
    return bool(re.match(r"^\s*date\s+balance\s*\(\s*\$\s*\)", low))


def detect_section(line: str) -> str | None:
    low = line.lower().strip()
    if "deposits and other additions" in low or "deposits and other credits" in low:
        return "deposits"
    if "withdrawals and other debits" in low or "other subtractions" in low:
        return "withdrawals"
    if "atm and debit card subtractions" in low:
        return "withdrawals"
    if "service fees" in low:
        return "withdrawals"
    return None


def _is_noise(line: str) -> bool:
    low = line.lower()
    stripped = low.strip()
    for phrase in _EXACT_NOISE:
        if stripped == phrase or stripped.startswith(phrase + " "):
            return True
    if re.match(r"^\s*page\s+\d+\s+of\s+\d+\s*$", low):
        return True
    if "continued on" in low and "next page" in low:
        return True
    if re.match(r"^\s*date\s+description\s+amount\s*$", low):
        return True
    # bare "MM/DD balance" rows from the daily-balance table
    if re.match(r"^\s*\d{1,2}/\d{1,2}\s+[\d,]+\.\d{2}\s*$", line):
        return True
    if re.match(r"^\s*\d{1,2}/\d{1,2}\s+[\d,]+\.\d{2}\s+\d{1,2}/\d{1,2}", line):
        return True
    return False


def _line_date(line: str) -> str | None:
    """MM/DD/YY at line start; two-digit years pivot at 50
    (bofa.py:214-220)."""
    m = _FULL_DATE_ANCHOR.match(line.strip())
    if not m:
        return None
    mm, dd, yy = m.groups()
    year = int(yy) + 2000 if int(yy) < 50 else int(yy) + 1900
    return f"{year:04d}-{int(mm):02d}-{int(dd):02d}"


def _last_amount(line: str) -> float | None:
    """The value column is last on the line; bounds-check to the
    plausible 0.01..10,000,000 range (bofa.py:222-234)."""
    tokens = AMOUNT_RE.findall(line)
    if not tokens:
        return None
    bare = (
        tokens[-1]
        .replace("$", "")
        .replace(",", "")
        .replace("(", "")
        .replace(")", "")
        .replace("-", "")
    )
    try:
        val = float(bare)
    except ValueError:
        return None
    if val < 0.01 or val > 10000000:
        return None
    return val


def clean_description(line: str) -> str:
    out = re.sub(r"^\s*\d{1,2}/\d{1,2}/\d{2}\s+", "", line)
    out = AMOUNT_RE.sub("", out)
    out = re.sub(r"\s*continued\s+on\s+the\s+next\s+page\s*$", "", out, flags=re.I)
    out = re.sub(r"\s+", " ", out)
    return out.strip()


def _has_header_phrase(text: str) -> bool:
    low = text.lower()
    if any(p in low for p in _HEADER_PHRASES):
        return True
    return bool(_ACCOUNT_NO_RE.search(low))


def _looks_like_balance_entry(text: str) -> bool:
    """Rows carrying year-less MM/DD dates without transaction vocabulary
    are daily-balance residue (bofa.py:95-107)."""
    low = text.lower()
    if len(_MMDD_NO_YEAR_RE.findall(text)) >= 2:
        return True
    if _MMDD_NO_YEAR_RE.search(text) and not any(t in low for t in _TX_INDICATORS):
        return True
    return False


def direction_for_bofa(description: str, section: str | None) -> str | None:
    """Wire-type rules → zelle from/to → Wise inbound → fee/purchase
    keywords → credit keywords → section-scoped transfer rules → section
    default → residual heuristics → default outflow (bofa.py:243-310)."""
    d = description.lower()
    if _WIRE_IN_RE.search(d):
        return "in"
    if _WIRE_OUT_RE.search(d):
        return "out"
    if "zelle payment from" in d:
        return "in"
    if "zelle payment to" in d:
        return "out"
    if "transfer" in d and "from" in d and "via wise" in d:
        return "in"
    if any(k in d for k in ("fee", "charge", "svc charge")):
        return "out"
    if any(k in d for k in ("checkcard", "purchase")):
        return "out"
    if any(k in d for k in ("deposit", "credit", "received", "cashreward")):
        return "in"
    if ("preferred rewards" in d or "prfd rwds" in d) and "waiver" in d:
        return "out"
    if "online banking transfer" in d or "online transfer" in d:
        if section:
            return "in" if section == "deposits" else "out"
    if "ca tlr transfer" in d:
        if section:
            return "in" if section == "deposits" else "out"
    if "bkofamerica bc" in d:
        if section:
            return "in" if section == "deposits" else "out"
    if section == "deposits":
        return "in"
    if section == "withdrawals":
        return "out"
    if "transfer" in d and "confirmation#" in d:
        return "out"
    if "online banking" in d and any(k in d for k in ("payment", "transfer")):
        return "out"
    if "wise inc" in d:
        return "out" if "-" in description else "in"
    if "ontop holdings" in d:
        return "in"
    if "bnf:" in d:
        return "out"
    return "out"


def extract_bofa(
    lines: list[str], full_text: str, fallback_year: int
) -> list[dict[str, Any]]:
    """Linear scan with daily-balance suppression and wire-fee expansion
    (bofa.py:14-93).  ``fallback_year`` is unused — BofA dates always
    carry their own two-digit year — but kept for the uniform contract."""
    del fallback_year  # dates are self-contained (bofa.py:214-219)
    lines = split_concatenated_lines(lines)
    records: list[dict[str, Any]] = []
    section: str | None = None
    in_daily_balances = False

    for line in lines:
        if not line.strip():
            continue
        if _is_daily_balance_header(line):
            in_daily_balances = True
            continue
        if in_daily_balances:
            sec = detect_section(line)
            if sec:
                in_daily_balances = False
                section = sec
            continue
        sec = detect_section(line)
        if sec:
            section = sec
            continue
        if _is_noise(line):
            continue

        if "wire transfer fee" in line.lower():
            date = _line_date(line)
            if not date:
                continue
            for tok in AMOUNT_RE.findall(line):
                bare = (
                    tok.replace("$", "")
                    .replace(",", "")
                    .replace("(", "")
                    .replace(")", "")
                    .replace("-", "")
                )
                try:
                    val = float(bare)
                except ValueError:
                    continue
                if val > 0.01:
                    records.append(
                        {
                            "date": date,
                            "description": "Wire Transfer Fee",
                            "amount": val,
                            "direction": "out",
                        }
                    )
            continue

        date = _line_date(line)
        if not date:
            continue
        amount = _last_amount(line)
        if amount is None or amount == 0:
            continue
        desc = clean_description(line)
        if not desc or len(desc) < 5:
            continue
        if _has_header_phrase(desc) or _looks_like_balance_entry(desc):
            continue
        direction = direction_for_bofa(desc, section)
        if not direction:
            continue
        records.append(
            {
                "date": date,
                "description": desc,
                "amount": amount,
                "direction": direction,
            }
        )

    return records
