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


def _any_date(line: str, year: int, order: tuple[str, ...]) -> str | None:
    for name in order:
        iso = _DATE_FNS[name](line, year)
        if iso:
            return iso
    return None


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
    i, n = 0, len(lines)
    while i < n:
        anchor = _any_date(lines[i], year, rules.date_order)
        if not anchor:
            i += 1
            continue
        block = [lines[i]]
        j = i + 1
        while j < n and not _any_date(lines[j], year, rules.date_order):
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
            rec: dict[str, Any] = {
                "date": anchor,
                "description": strip_trailing_amount(joined),
                "amount": amount,
            }
            if rules.sign_gives_direction:
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


def make_block_extractor(rules: BlockRules):
    def extract(
        lines: list[str], full_text: str, fallback_year: int
    ) -> list[dict[str, Any]]:
        return extract_blocks(lines, full_text, fallback_year, rules)

    extract.__name__ = f"extract_{rules.key}"
    return extract
