"""Global direction classifier + record normalizer.

Parity with the reference's output-normalization layer
(reference parsers/common.py:5-57): an ordered, first-match-wins regex
rule table mapping a transaction description to ``in``/``out``, with an
explicit ``unknown`` fallback, and a per-document normalizer that takes
absolute amounts, fills in missing directions, and sorts the document's
records by date (a *local* sort — never a distributed shuffle).

The rule table is data, compiled once per worker at import.
"""

from __future__ import annotations

import re
from typing import Any

# Ordered (pattern, direction) rules — first match on the uppercased
# description wins (common.py:5-34).  Order is semantic: e.g. the generic
# FEE rule must come after the specific WIRE FEE rules.
_RULE_SPECS: list[tuple[str, str]] = [
    # outflows
    (r"\bWIRE\s+OUT\b", "out"),
    (r"\bWIRE\s+FEE\b", "out"),
    (r"\bWIRE\s+TRANS\s+SVC\s+CHARGE\b", "out"),
    (r"\bACH\s+DEBIT\b", "out"),
    (r"\bACH\s+PULL\b", "out"),
    (r"\bBILL\s*(PAID|PMT)\b", "out"),
    (r"\bDEBIT\s+MEMO\b", "out"),
    (r"\bSERVICE CHARGE(S)?\b", "out"),
    (r"\bDBT\s+CRD\b", "out"),
    (r"\bPOS\s+DEB\b", "out"),
    (r"\bDEBIT\s+CARD\s+PURCH\b", "out"),
    (r"\bZELLE.*PAYMENT\s+TO\b", "out"),
    (r"\bPAYPAL\s+(?!.*CREDIT)", "out"),
    (r"\bCHECK\b", "out"),
    (r"\bWITHDRAWAL\b", "out"),
    (r"\bFEE\b", "out"),
    # inflows
    (r"\bWIRE\s+IN\b", "in"),
    (r"\bACH\s+CREDIT\b", "in"),
    (r"\bACH\s+IN\b", "in"),
    (r"\bELECTRONIC\s+CREDIT\b", "in"),
    (r"\bDEBIT\s+CARD\s+CREDIT\b", "in"),
    (r"\bZELLE.*PAYMENT\s+FROM\b", "in"),
    (r"\bINTEREST\s+PAYMENT\b", "in"),
    (r"\bWT\b(?!.*(CHARGE|FEE))", "in"),  # inbound wires (WF style)
    (r"\bPAYPAL.*CREDIT\b", "in"),
]

DIRECTION_RULES: list[tuple[re.Pattern[str], str]] = [
    (re.compile(pat, re.I), d) for pat, d in _RULE_SPECS
]


def classify_direction(description: str) -> str:
    """First matching rule over the uppercased description, else
    ``unknown`` — the reference deliberately prefers 'unknown' over a
    wrong guess (common.py:36-41)."""
    d = (description or "").upper()
    for rx, direction in DIRECTION_RULES:
        if rx.search(d):
            return direction
    return "unknown"


def normalize_records(records: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """Per-document record normalization (common.py:43-57):

    * ``amount`` -> abs(amount) (sign lives in ``direction``),
    * ``direction`` -> extractor-provided value, else the global rule
      table above,
    * ``description`` stripped,
    * records sorted by date ascending with a *stable* sort, preserving
      input order among equal dates (Python list.sort stability, matching
      common.py:56).
    """
    out: list[dict[str, Any]] = []
    for rec in records:
        amt = float(rec["amount"])
        desc = rec.get("description", "")
        direction = rec.get("direction") or classify_direction(desc)
        out.append(
            {
                "date": rec["date"],
                "description": desc.strip(),
                "amount": abs(amt),
                "direction": direction,
            }
        )
    out.sort(key=lambda r: r["date"])
    return out
