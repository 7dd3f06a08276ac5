"""Chase rule-set (reference parsers/chase.py:13-258).

Bilingual (EN/ES) section detection, PDF-markup noise filtering,
legal-text and daily-balance block rejection, blank-tolerant block
accumulation (≤2 content-free lines), amount selection that excludes
phone-number digit runs and prefers $-prefixed tokens then the maximum
value, description cleanup with ``Trn:``/``Ssn:`` normalization, and a
direction ladder of patterns → section context → amount sign.
"""

from __future__ import annotations

import re
from typing import Any

from ..functions.scalars import AMOUNT_RE, year_from_text

_DEPOSIT_HEADERS = ("depósitos y adiciones", "deposits and additions")
_WITHDRAWAL_HEADERS = (
    "retiros electrónicos",
    "electronic withdrawals",
    "retiros electrÃ³nicos",  # mojibake variant the reference tolerates
)
_FEE_HEADERS = ("cargos", "charges")
_CARD_HEADERS = (
    "atm & debit card withdrawals",
    "atm and debit card withdrawals",
    "card purchases",
)

_NOISE_PREFIXES = (
    "jpmorgan chase bank",
    "página",
    "page",
    "número de cuenta",
    "account number",
    "total de depósitos",
    "total deposits",
    "total de retiros",
    "total withdrawals",
    "total comisiones",
    "total fees",
    "saldo inicial",
    "beginning balance",
    "saldo final",
    "ending balance",
    "duplicate statement",
    "customer service information",
    "checking summary",
    "how to avoid the monthly service fee",
    "daily ending balance",
)

_BARE_AMOUNT_LINE = re.compile(r"^\s*\$[\d,]+\.\d{2}\s*$")
_LONG_DIGIT_LINE = re.compile(r"^\s*\d{12,}\s*$")
_MMDD_ANCHOR = re.compile(r"^(\d{1,2})/(\d{1,2})(?:\s|$)")

_LEGAL_MARKERS = (
    "llámenos al",
    "call us at",
    "en caso de errores",
    "in case of errors",
    "prepárese",
    "prepare to provide",
)
_LEGAL_INDICATORS = (
    "llámenos al 1-866-564-2262",
    "call us at 1-866-564-2262",
    "en caso de errores o preguntas",
    "in case of errors or questions",
    "prepárese para proporcionarnos",
    "be prepared to give us",
)
_PHONE_RE = re.compile(r"1-\d{3}-\d{3}-\d{4}")
_PHONE_SHAPE_RE = re.compile(r"\d{3}[-.\s]\d{3}[-.\s]\d{4}")
_MONTH_THROUGH_RE = re.compile(
    r"\b(january|february|march|april|may|june|july|august|september|october|november|december)"
    r"\s+\d{1,2},\s+\d{4}\s+through\s+"
)
_ACTIVITY_WORDS = ("payment", "deposit", "transfer", "purchase", "withdrawal", "fee")

_MMDD_INLINE_RE = re.compile(r"\b\d{1,2}/\d{1,2}\b")
_WS_RE = re.compile(r"\s+")


def detect_section(line: str) -> str | None:
    """Bilingual section headers -> deposits / withdrawals / fees
    (chase.py:70-89)."""
    low = line.lower().strip()
    if any(h in low for h in _DEPOSIT_HEADERS):
        return "deposits"
    if any(h in low for h in _WITHDRAWAL_HEADERS):
        return "withdrawals"
    if low in _FEE_HEADERS:
        return "fees"
    if any(h in low for h in _CARD_HEADERS):
        return "withdrawals"
    return None


def _is_noise(line: str) -> bool:
    """PDF markup, summary prefixes, bare amounts, long digit runs, legal
    openers (chase.py:94-118)."""
    low = line.lower().strip()
    if "*start*" in low or "*end*" in low:
        return True
    if any(low.startswith(p) for p in _NOISE_PREFIXES):
        return True
    if _BARE_AMOUNT_LINE.match(line) or _LONG_DIGIT_LINE.match(line):
        return True
    if low.startswith("en caso de errores") or low.startswith("in case of errors"):
        return True
    return False


def _line_date(line: str, year: int) -> str | None:
    """MM/DD at line start, with month/day bounds and a legal-marker
    guard (chase.py:120-136)."""
    stripped = line.strip()
    low = stripped.lower()
    if any(m in low for m in _LEGAL_MARKERS):
        return None
    m = _MMDD_ANCHOR.match(stripped)
    if not m:
        return None
    mm, dd = int(m.group(1)), int(m.group(2))
    if 1 <= mm <= 12 and 1 <= dd <= 31:
        return f"{year:04d}-{mm:02d}-{dd:02d}"
    return None


def _is_daily_balance(text: str) -> bool:
    low = text.lower()
    if "daily ending balance" in low:
        return True
    if _MONTH_THROUGH_RE.search(low) and not any(w in low for w in _ACTIVITY_WORDS):
        return True
    return False


def _is_legal(text: str) -> bool:
    low = text.lower()
    if any(s in low for s in _LEGAL_INDICATORS):
        return True
    if len(text) > 500 and _PHONE_RE.search(text):
        return True
    return False


def _token_value(tok: str) -> float | None:
    bare = tok.replace("$", "").replace(",", "").replace("(", "").replace(")", "")
    negative = "-" in tok or tok.strip().startswith("(")
    try:
        val = float(bare)
    except ValueError:
        return None
    return -val if negative else val


def _in_phone_context(tok: str, text: str) -> bool:
    """A digit run that also appears in a phone-shaped sequence is not
    money (chase.py:196-198 — the Latitude $1,254.81 vs phone bug)."""
    digits = tok.replace(",", "").replace(".", "")
    return bool(_PHONE_SHAPE_RE.search(text)) and digits in text


def _block_amount(block: list[str], joined: str) -> float | None:
    """$-prefixed tokens win; otherwise the maximum value among non-phone
    tokens (chase.py:186-215)."""
    tokens: list[str] = []
    for line in block:
        tokens.extend(AMOUNT_RE.findall(line))
    valued = [
        (t, _token_value(t))
        for t in tokens
        if _token_value(t) is not None and not _in_phone_context(t, joined)
    ]
    if not valued:
        return None
    dollar = [v for v in valued if "$" in v[0]]
    pool = dollar if dollar else valued
    return max(pool, key=lambda v: v[1])[1]


def clean_description(text: str) -> str:
    """Strip money tokens, inline MM/DD dates, residual column headers;
    normalize ``Trn:``/``Ssn:``; collapse whitespace; capitalize
    (chase.py:219-230)."""
    out = AMOUNT_RE.sub("", text)
    out = _MMDD_INLINE_RE.sub("", out)
    out = re.sub(r"\bDAILY ENDING BALANCE\b", "", out, flags=re.I)
    out = re.sub(r"\bFECHA\s+CANTIDAD\b", "", out, flags=re.I)
    out = re.sub(r"\bDATE\s+AMOUNT\b", "", out, flags=re.I)
    out = re.sub(r"\btrn:\s*", " Trn: ", out, flags=re.I)
    out = re.sub(r"\bssn:\s*", " Ssn: ", out, flags=re.I)
    out = _WS_RE.sub(" ", out).strip()
    if out:
        out = out[0].upper() + out[1:]
    return out


def direction_for_chase(description: str, section: str, amount: float) -> str:
    """Pattern rules first, then section context, then amount sign
    (chase.py:234-258)."""
    d = description.lower()
    if re.search(r"\b(reversal|reversi[oó]n)\b", d):
        return "in"
    if any(x in d for x in (" fee", "charge", "cargo", "comisión", "service charge")):
        return "out"
    if re.search(r"\b(deposit|credit|incoming|ach credit|wire credit|zelle payment from)\b", d):
        return "in"
    if "card purchase" in d or "compra con tarjeta" in d or "recurring card purchase" in d:
        return "out"
    if "wise us inc" in d or " trnwise " in f" {d} " or re.search(r"\bwise\b", d):
        return "out"
    if any(
        x in d
        for x in (
            "payment to",
            "zelle payment to",
            "online payment",
            "transferencia a",
            "wire transfer",
            "online domestic wire transfer",
            "online international wire transfer",
        )
    ):
        return "out"
    if re.search(r"d[eé]bito de c[aá]mara", d):
        return "out"
    if section == "deposits":
        return "in"
    if section in ("withdrawals", "fees"):
        return "out"
    return "in" if amount > 0 else "out"


def extract_chase(
    lines: list[str], full_text: str, fallback_year: int
) -> list[dict[str, Any]]:
    """Sectioned scan with blank-tolerant block accumulation
    (chase.py:16-68): a section header updates state and is consumed; a
    dated line opens a block that grows until the next date/section
    header, tolerating up to two content-free lines."""
    year = year_from_text(full_text, fallback_year)
    records: list[dict[str, Any]] = []
    section: str | None = None

    i, n = 0, len(lines)
    while i < n:
        line = lines[i]
        if not line.strip():
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
        gap = 0
        while j < n:
            nxt = lines[j]
            if _line_date(nxt, year) or detect_section(nxt):
                break
            if nxt.strip() and not _is_noise(nxt):
                block.append(nxt)
                gap = 0
            else:
                gap += 1
                if gap >= 2:
                    break
            j += 1

        rec = _finish_block(block, date, section)
        if rec:
            records.append(rec)
        i = j

    return records


def _finish_block(
    block: list[str], date: str, section: str | None
) -> dict[str, Any] | None:
    """Reject legal / daily-balance content, pick the amount, clean the
    description, classify the direction (chase.py:138-160)."""
    if not block:
        return None
    joined = " ".join(s.strip() for s in block if s).strip()
    if not joined:
        return None
    if _is_legal(joined) or _is_daily_balance(joined):
        return None
    amount = _block_amount(block, joined)
    if amount is None:
        return None
    desc = clean_description(joined)
    if not desc or len(desc) < 3:
        return None
    return {
        "date": date,
        "description": desc,
        "amount": amount,
        "direction": direction_for_chase(desc, section or "", amount),
    }
