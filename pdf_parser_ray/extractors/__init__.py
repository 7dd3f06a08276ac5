"""Extractor registry + ordered source detection.

Mirrors the reference's plugin surface (parsers/__init__.py:16-106):
a key -> extractor-callable registry with a ``generic`` fallback, and an
*ordered* first-match regex table classifying a document's extracted
text (first 20k chars).  Order is semantic — e.g. BofA precedes Chase so
wire descriptions mentioning "JPMorgan Chase" don't misroute.

Every extractor follows one contract::

    extract(lines: list[str], full_text: str, fallback_year: int)
        -> list[{date, description, amount[, direction]}]

User extensions register a callable under a new key and prepend patterns
to ``DETECTION`` (SURVEY.md §2.10).
"""

from __future__ import annotations

import re
from typing import Any, Callable

from .base import (
    GENERIC_RULES,
    IFB_RULES,
    MERCURY_RULES,
    PNB_RULES,
    TRUIST_RULES,
    VALLEY_RULES,
    make_block_extractor,
)
from .bofa import extract_bofa
from .bofa_relationship import extract_bofa_relationship
from .chase import extract_chase
from .citi import extract_citi
from .wf import extract_wf

Extractor = Callable[[list[str], str, int], list[dict[str, Any]]]

REGISTRY: dict[str, Extractor] = {
    "generic": make_block_extractor(GENERIC_RULES),
    "ifb": make_block_extractor(IFB_RULES),
    "valley": make_block_extractor(VALLEY_RULES),
    "mercury": make_block_extractor(MERCURY_RULES),
    "pnb": make_block_extractor(PNB_RULES),
    "wf": extract_wf,
    "citi": extract_citi,
    "truist": make_block_extractor(TRUIST_RULES),
    "bofa": extract_bofa,
    "chase": extract_chase,
    # selectable by key only — not auto-detected, like the reference's
    # commented-out registration (parsers/__init__.py:12-13,26)
    "bofa_relationship": extract_bofa_relationship,
}

# Ordered detection table (parsers/__init__.py:31-96).  Patterns are
# compiled once per worker at import; first key with any match wins.
_DETECTION_SPECS: list[tuple[str, list[str]]] = [
    (
        "bofa",
        [
            r"\bBank of America\b",
            r"bankofamerica\.com",
            r"\bBOFA\b",
            r"\bBusiness Advantage\b",
            r"1\.888\.BUSINESS",
        ],
    ),
    (
        "chase",
        [
            # statement-specific patterns only: generic "JPMorgan Chase
            # Bank" appears inside other banks' wire descriptions
            r"chase\.com",
            r"\bChase Mobile\b",
            r"\bChase Debit Card\b",
            r"\bChase Total Checking\b",
            r"\bChase Savings\b",
        ],
    ),
    (
        "ifb",
        [
            r"International\s+Finance\s+Bank",
            r"\bIFB Bus Checking\b",
            r"\bifbbank\.com\b",
        ],
    ),
    ("valley", [r"\bValley\b", r"Valley National Bank", r"\bvalley\.com\b"]),
    ("mercury", [r"\bMercury\b", r"Choice Financial Group", r"help@mercury\.com"]),
    (
        "pnb",
        [
            r"Pacific National Bank",
            r"\bP\.O\. Box 012620, Miami\b",
            r"\bACCT ENDING\b",
        ],
    ),
    (
        "wf",
        [
            r"\bWells Fargo\b",
            r"wellsfargo\.com",
            r"\bNavigate Business Checking\b",
            r"\bInitiate Business Checking\b",
        ],
    ),
    ("citi", [r"\bCitiBusiness\b", r"\bCitibank\b", r"\bCiti\b"]),
    ("truist", [r"\bTruist\b", r"truist\.com", r"\bZELLE BUSINESS PAYMENT\b"]),
]

DETECTION: list[tuple[str, list[re.Pattern[str]]]] = [
    (key, [re.compile(p, re.I) for p in pats]) for key, pats in _DETECTION_SPECS
]

# hot-path variant: one alternation per source ("any pattern matches" ==
# the union regex matches), 9 searches per document instead of ~40
_DETECTION_FUSED: list[tuple[str, re.Pattern[str]]] = [
    (key, re.compile("|".join(f"(?:{p})" for p in pats), re.I))
    for key, pats in _DETECTION_SPECS
]

# pre-screen: the overwhelming majority of a web corpus matches no bank
# at all, and Python-regex alternations cost ~0.2 ms even on short
# texts.  Every detection pattern contains one of these lowercase
# literals, so `any(lit in head.lower())` (C-speed substring scans) is a
# SUPERSET screen: a miss settles "generic"; a hit falls through to the
# ordered regex loop, which alone decides priority.  Applied only to
# ASCII heads — exotic-unicode case folding could differ from re.I, so
# non-ASCII text always takes the full loop.  test_extractors pins the
# superset property against the pattern table.
_TRIGGER_LITS: tuple[str, ...] = (
    "bank of america", "bankofamerica", "bofa", "business advantage",
    "1.888.business",                      # bofa
    "chase",                               # chase (all five patterns)
    "international", "ifb",                # ifb
    "valley",                              # valley
    "mercury", "choice financial",         # mercury
    "pacific national", "012620", "acct ending",  # pnb
    "wells fargo", "wellsfargo",
    "navigate business checking", "initiate business checking",  # wf
    "citi",                                # citi (citibusiness/citibank/citi)
    "truist", "zelle business payment",    # truist
)

# The reference caps classification input "para performance"
# (parsers/__init__.py:102); same constant here.
DETECT_TEXT_CAP = 20_000


def detect_source(full_text: str) -> str:
    """Ordered first-match classification over the head of the document's
    extracted text (parsers/__init__.py:98-106)."""
    if not full_text:
        return "generic"
    head = full_text[:DETECT_TEXT_CAP]
    if head.isascii():
        low = head.lower()
        if not any(lit in low for lit in _TRIGGER_LITS):
            return "generic"
    for key, fused in _DETECTION_FUSED:
        if fused.search(head):
            return key
    return "generic"


def get_extractor(key: str) -> Extractor:
    """Registry lookup with the generic fallback (app.py:19-23)."""
    return REGISTRY.get(key, REGISTRY["generic"])
