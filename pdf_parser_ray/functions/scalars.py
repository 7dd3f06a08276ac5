"""Scalar parity kernel: unicode cleanup, date parsing, amount lexing.

These reproduce — bit for bit — the scalar semantics of the reference's
shared library (reference parsers/base.py:7-88).  They are pure and
stateless; every regex is compiled once at import so Ray workers pay the
cost once per process, and the hot pipeline calls them from inside
``map_batches`` UDFs (never per-row from the driver).

One deliberate divergence: the reference's year fallback uses the wall
clock (``datetime.utcnow().year``, base.py:54) which is non-deterministic
and breaks Ray lineage re-execution.  Here the fallback year is an
explicit argument derived from the row's ``warc_ts`` (see
``year_from_text``), making every UDF a pure function of its inputs.
"""

from __future__ import annotations

import re

# Money token lexer — must match reference base.py:7 exactly: a token is
# (a) $-prefixed with optional cents, (b) parenthesised/bare negative with
# optional cents, or (c) a comma-grouped number *with* cents.
AMOUNT_RE = re.compile(
    r"(?:\$\d{1,3}(?:,\d{3})*(?:\.\d{2})?"
    r"|\(?-\d{1,3}(?:,\d{3})*(?:\.\d{2})?\)?"
    r"|\d{1,3}(?:,\d{3})*\.\d{2})"
)

# Date lexers (reference base.py:8-10).  Note: the slash form is anchored
# at line start and does NOT validate month/day ranges — parity requires
# accepting e.g. 13/40 here; per-source rule-sets add their own bounds.
SLASH_DATE_RE = re.compile(r"^\s*(\d{1,2})/(\d{1,2})(?:/(\d{2,4}))?\b")
LONG_DATE_RE = re.compile(r"\b([A-Za-z]{3,9})\s+(\d{1,2}),\s*(\d{4})\b", re.I)
MON_DD_RE = re.compile(
    r"^\s*(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Sept|Oct|Nov|Dec)\s+(\d{1,2})\b", re.I
)

YEAR_RE = re.compile(r"\b(20\d{2})\b")

_MONTH_NUM = {
    name: idx
    for idx, names in enumerate(
        [
            ("january", "jan"),
            ("february", "feb"),
            ("march", "mar"),
            ("april", "apr"),
            ("may",),
            ("june", "jun"),
            ("july", "jul"),
            ("august", "aug"),
            ("september", "sep", "sept"),
            ("october", "oct"),
            ("november", "nov"),
            ("december", "dec"),
        ],
        start=1,
    )
    for name in names
}


def norm_line(s: str) -> str:
    """Unicode cleanup applied to every extracted line (base.py:18-19):
    NBSP becomes a plain space, en/em/minus dashes become '-', then strip."""
    if not s:
        return ""
    return (
        s.replace("\u00a0", " ")
        .replace("–", "-")
        .replace("—", "-")
        .replace("−", "-")
        .strip()
    )


def text_to_lines(text: str) -> list[str]:
    """Extracted text -> ordered non-empty normalized lines.

    The line-stream contract every record extractor consumes
    (base.py:35-44, with the PDF re-parse replaced by a split of the
    already-extracted text — the reference parses each PDF twice per
    request, see SURVEY.md §3.1; we parse once)."""
    out = []
    for raw in text.split("\n"):
        ln = norm_line(raw)
        if ln:
            out.append(ln)
    return out


def year_from_text(text: str, fallback_year: int) -> int:
    """First ``20XX`` year in the text, else the caller's fallback
    (base.py:52-54; fallback = warc_ts year instead of wall clock)."""
    m = YEAR_RE.search(text or "")
    return int(m.group(1)) if m else fallback_year


def parse_slash_date(s: str, fallback_year: int) -> str | None:
    """``M/D[/YY(YY)]`` at line start -> ISO string (base.py:56-62).
    Two-digit years map to 2000+YY; missing year uses the fallback."""
    m = SLASH_DATE_RE.match(s)
    if not m:
        return None
    mm, dd = int(m.group(1)), int(m.group(2))
    y = int(m.group(3)) if m.group(3) else fallback_year
    if y < 100:
        y += 2000
    return f"{y:04d}-{mm:02d}-{dd:02d}"


def parse_long_date(s: str) -> str | None:
    """``Month D, YYYY`` anywhere in the line -> ISO (base.py:64-68)."""
    m = LONG_DATE_RE.search(s)
    if not m:
        return None
    mon = _MONTH_NUM.get(m.group(1).lower())
    if not mon:
        return None
    return f"{int(m.group(3)):04d}-{mon:02d}-{int(m.group(2)):02d}"


def parse_mon_dd(s: str, fallback_year: int) -> str | None:
    """``Mmm D`` at line start -> ISO with the fallback year (base.py:70-74)."""
    m = MON_DD_RE.match(s)
    if not m:
        return None
    mon = _MONTH_NUM.get(m.group(1).lower())
    if not mon:
        return None
    return f"{fallback_year:04d}-{mon:02d}-{int(m.group(2)):02d}"


def amount_token_to_float(tok: str) -> float | None:
    """One lexed money token -> signed float.  Negative when the token
    starts with '-' or '(' or ends with '-'; strips ``$ , ( ) -``
    (the shared cleaning idiom, base.py:79-85)."""
    neg = tok.endswith("-") or tok.startswith("-") or tok.startswith("(")
    bare = (
        tok.replace("(", "")
        .replace(")", "")
        .replace("-", "")
        .replace("$", "")
        .replace(",", "")
    )
    try:
        val = float(bare)
    except ValueError:
        return None
    return -val if neg else val


def pick_amount(tokens: list[str], prefer_first: bool = True) -> float | None:
    """Select the value token from a block's lexed amounts (base.py:76-85):
    the first token, or with ``prefer_first=False`` the first negative-
    looking one (falling back to the first)."""
    if not tokens:
        return None
    if prefer_first:
        tok = tokens[0]
    else:
        tok = next((t for t in tokens if "-" in t or "(" in t), tokens[0])
    return amount_token_to_float(tok)


_TRAILING_AMOUNT_RE = re.compile(r"\s*" + AMOUNT_RE.pattern + r"\s*$")


def strip_trailing_amount(desc: str) -> str:
    """Drop a money token hanging off the end of a description
    (base.py:87-88)."""
    return _TRAILING_AMOUNT_RE.sub("", desc).strip()
