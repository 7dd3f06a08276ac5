"""Date-anchored block extraction — the shared record-extraction core.

The reference implements five near-identical "simple" parsers
(GenericParser base.py:100-122, IFBParser ifb.py:8-37, MercuryParser
mercury.py:8-35, PNBParser pnb.py:7-33, ValleyParser valley.py:8-46)
that differ only in configuration: which date formats anchor a record
and in which priority order, whether an over-long continuation line
terminates the block, and whether the amount's sign is converted into a
direction.  Here that family is one algorithm + a frozen rule-set.

Contract: ``extract(lines, full_text, fallback_year) -> list[record]``
where ``lines`` is the normalized line stream (scalars.text_to_lines)
and ``record`` is ``{date, description, amount[, direction]}`` with a
*signed* amount unless the rule-set maps sign to direction.  The global
normalizer (functions.directions) owns abs() and the fallback direction.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

from ..functions.scalars import (
    AMOUNT_RE,
    parse_long_date,
    parse_mon_dd,
    parse_slash_date,
    pick_amount,
    strip_trailing_amount,
    year_from_text,
)

# Date-format dispatch by short name; order of application is per rule-set.
_DATE_FNS = {
    "slash": lambda s, y: parse_slash_date(s, y),
    "long": lambda s, y: parse_long_date(s),
    "mon": lambda s, y: parse_mon_dd(s, y),
}


@dataclass(frozen=True)
class BlockRules:
    """Configuration for the date-anchored block extractor."""

    key: str
    # date parsers tried in order, for both the anchor line and the
    # "next record starts here" continuation test
    date_order: tuple[str, ...] = ("slash", "long", "mon")
    # terminate the block when a continuation line exceeds this length
    # (Valley's 250-char guard, valley.py:26-27); None = unlimited
    continuation_char_cap: int | None = None
    # emit abs(amount) plus a sign-derived direction instead of a signed
    # amount with direction deferred to the normalizer (valley.py:38-42)
    sign_gives_direction: bool = False
    # single-line records: a non-date line never joins a block
    # (truist.py:40-44 — only slash-dated lines become records)
    single_line: bool = False
    # section state machine (truist.py:30-36): a header line matching a
    # pattern flips a sticky direction context and is consumed without
    # emitting; patterns are case-insensitive, first match wins
    section_headers: tuple[tuple[str, str], ...] = ()
    # description keyword fallbacks tried in order when no section is
    # active (truist.py:56-62); implies the section/keyword/sign
    # direction resolution with abs(amount)
    keyword_directions: tuple[tuple[str, str], ...] = ()


def _any_date(line: str, year: int, order: tuple[str, ...]) -> str | None:
    for name in order:
        iso = _DATE_FNS[name](line, year)
        if iso:
            return iso
    return None


# compiled-pattern memo — warm module state shared across tasks (the
# house rule: no per-call regex compilation in the hot path)
_RX_CACHE: dict[str, "re.Pattern[str]"] = {}


def _rx(pattern: str) -> "re.Pattern[str]":
    p = _RX_CACHE.get(pattern)
    if p is None:
        p = _RX_CACHE[pattern] = re.compile(pattern, re.I)
    return p


def extract_blocks(
    lines: list[str], full_text: str, fallback_year: int, rules: BlockRules
) -> list[dict[str, Any]]:
    """One pass over the line stream: a date-bearing line opens a block,
    following non-date lines join it, the joined text is lexed for money
    tokens, and the first token becomes the record's amount with the
    trailing balance token stripped from the description
    (base.py:106-122 and its four configuration variants)."""
    year = year_from_text(full_text, fallback_year)
    records: list[dict[str, Any]] = []
    section: str | None = None
    i, n = 0, len(lines)
    while i < n:
        if rules.section_headers:
            header = next(
                (
                    d
                    for pat, d in rules.section_headers
                    if _rx(pat).search(lines[i])
                ),
                None,
            )
            if header is not None:
                section = header
                i += 1
                continue
        anchor = _any_date(lines[i], year, rules.date_order)
        if not anchor:
            i += 1
            continue
        block = [lines[i]]
        j = i + 1
        while (
            not rules.single_line
            and j < n
            and not _any_date(lines[j], year, rules.date_order)
        ):
            if (
                rules.continuation_char_cap is not None
                and len(lines[j]) > rules.continuation_char_cap
            ):
                break
            block.append(lines[j])
            j += 1
        joined = " ".join(block)
        amount = pick_amount(AMOUNT_RE.findall(joined), prefer_first=True)
        if amount is not None:
            desc = strip_trailing_amount(joined)
            rec: dict[str, Any] = {
                "date": anchor,
                "description": desc,
                "amount": amount,
            }
            if rules.section_headers or rules.keyword_directions:
                # section > keyword table > amount sign (truist.py:51-65)
                direction = section
                if direction is None:
                    direction = next(
                        (
                            d
                            for pat, d in rules.keyword_directions
                            if _rx(pat).search(desc)
                        ),
                        None,
                    )
                if direction is None:
                    if amount < 0:
                        direction = "out"
                    elif amount > 0:
                        direction = "in"
                    else:
                        direction = "unknown"
                rec["direction"] = direction
                rec["amount"] = abs(amount)
            elif rules.sign_gives_direction:
                rec["direction"] = "out" if amount < 0 else "in"
                rec["amount"] = abs(amount)
            records.append(rec)
        i = j
    return records


# The simple rule-set family (SURVEY.md §2.2 P1-P5).
GENERIC_RULES = BlockRules(key="generic")
IFB_RULES = BlockRules(key="ifb")  # first money token = value, balance trails (ifb.py:30-31)
PNB_RULES = BlockRules(key="pnb")  # multiline desc, trailing-'-' debits (pnb.py:19-27)
MERCURY_RULES = BlockRules(key="mercury", date_order=("mon", "slash", "long"))  # mercury.py:18
VALLEY_RULES = BlockRules(
    key="valley",
    date_order=("slash",),
    continuation_char_cap=250,
    sign_gives_direction=True,
)
# P6 (reference parsers/truist.py:13-74): single slash-dated lines, a
# sticky section state machine ('Deposits … credits' ⇒ in;
# withdrawals/debits/service charges ⇒ out) with keyword- and
# sign-fallback direction — the same one-algorithm family, one more
# configuration
TRUIST_RULES = BlockRules(
    key="truist",
    date_order=("slash",),
    single_line=True,
    section_headers=(
        (r"Deposits.*credits", "in"),
        (r"(Other withdrawals|Debits|Service charges)", "out"),
    ),
    keyword_directions=(
        (r"(zelle|payment to|iat|debit|withdrawal|ach|bill pay)", "out"),
        (r"(deposit|credit|interest|paypal\s+\d+)", "in"),
    ),
)


def make_block_extractor(rules: BlockRules):
    def extract(
        lines: list[str], full_text: str, fallback_year: int
    ) -> list[dict[str, Any]]:
        return extract_blocks(lines, full_text, fallback_year, rules)

    extract.__name__ = f"extract_{rules.key}"
    return extract
