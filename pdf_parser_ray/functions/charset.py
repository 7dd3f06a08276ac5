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
