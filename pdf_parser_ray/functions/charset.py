"""Deterministic charset/encoding normalization for raw fetched bytes.

Decode priority (every step a pure function of the bytes, so Ray task
retries reproduce identical output):

1. Unicode BOM (UTF-8-sig / UTF-16 / UTF-32),
2. charset declared in the document head (``<meta charset=…>`` or the
   ``http-equiv`` Content-Type form) within the first 4 KiB,
3. statistical best guess via ``charset_normalizer``,
4. UTF-8 with ``errors="ignore"`` — the reference's last-resort path
   (reference parsers/base.py:21-25, its ``ensure_utf8``).

Returns (text, encoding_label) so lineage manifests can record the
decision.
"""

from __future__ import annotations

import codecs
import re

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""", re.I
)

_BOMS: list[tuple[bytes, str]] = [
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
]


def sniff_declared_charset(data: bytes) -> str | None:
    """Charset label declared in the first 4 KiB of markup, if any."""
    m = _META_CHARSET_RE.search(data[:4096])
    if not m:
        return None
    label = m.group(1).decode("ascii", "ignore").strip().lower()
    try:
        codecs.lookup(label)
    except LookupError:
        return None
    return label


def decode_payload(data: bytes) -> tuple[str, str]:
    """bytes -> (text, encoding_used), deterministic."""
    if not data:
        return "", "empty"

    for bom, enc in _BOMS:
        if data.startswith(bom):
            try:
                return data.decode(enc), enc
            except UnicodeDecodeError:
                break

    declared = sniff_declared_charset(data)
    if declared:
        try:
            text = data.decode(declared)
            # plausibility gate: a mislabeled wide charset (e.g. ascii
            # bytes declared utf-16) "succeeds" but yields mojibake in
            # which the markup's '<' disappears — fall through instead
            if b"<" not in data[:4096] or "<" in text[:8192]:
                return text, declared
        except (UnicodeDecodeError, LookupError):
            pass

    try:
        return data.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        pass

    try:
        from charset_normalizer import from_bytes

        best = from_bytes(data).best()
        if best is not None:
            return str(best), best.encoding
    except Exception:
        pass

    return data.decode("utf-8", errors="ignore"), "utf-8-lossy"


# -- mojibake repair (ftfy-style, deterministic subset) -----------------------

# chars a UTF-8 CONTINUATION byte (0x80-0xBF) becomes under a cp1252 or
# latin-1 mis-decode — the second half of every two-char artifact
_CONT_CHARS = frozenset(
    {chr(b) for b in range(0x80, 0xC0)}  # latin-1 view
    | {
        bytes([b]).decode("cp1252")
        for b in range(0x80, 0xC0)
        if b not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)  # cp1252 holes
    }
)


def mojibake_score(text: str) -> int:
    """Count of two-char artifact sequences: a char that reads as a
    UTF-8 LEAD byte (U+00C2–U+00F4: 'Â', 'Ã', 'Ä' … 'ô') immediately
    followed by one that reads as a CONTINUATION byte — the signature
    of UTF-8 bytes decoded as cp1252/latin-1.  Requiring the pair (not
    just the lead) keeps legitimate accented text at score 0 ('é'
    before an ASCII char never counts) and lets a repaired single
    artifact ('ÃŸ' → 'ß') strictly decrease the score even though 'ß'
    itself sits in the lead range."""
    return sum(
        1
        for a, b in zip(text, text[1:])
        if 0xC2 <= ord(a) <= 0xF4 and b in _CONT_CHARS
    )


def fix_mojibake(text: str, max_passes: int = 2) -> tuple[str, int]:
    """Repair UTF-8-bytes-decoded-as-cp1252/latin-1 mojibake ('café' →
    'cafÃ©') by re-encoding through cp1252 (latin-1 fallback for the
    five cp1252 holes) and strict-decoding as UTF-8.  A pass is
    accepted only when it strictly reduces :func:`mojibake_score`, so
    clean text — including text that legitimately contains 'Ã' — is
    never altered unless the round trip both succeeds AND removes
    artifacts.  ``max_passes=2`` covers the double-encoded case.
    Returns (repaired_text, passes_applied); pure function, safe under
    Ray task retries."""
    passes = 0
    for _ in range(max_passes):
        score = mojibake_score(text)
        if score == 0:
            break
        try:
            raw = text.encode("cp1252")
        except UnicodeEncodeError:
            try:
                raw = text.encode("latin-1")
            except UnicodeEncodeError:
                break
        try:
            cand = raw.decode("utf-8")
        except UnicodeDecodeError:
            break
        if mojibake_score(cand) >= score:
            break
        text = cand
        passes += 1
    return text, passes
