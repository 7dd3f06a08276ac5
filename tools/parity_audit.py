"""Offline differential parity audit against the reference implementation.

Runs the REFERENCE parser classes (from the read-only snapshot at
/root/reference, with pdfplumber stubbed so statement text passes
straight through ``extract_lines``) and OUR extractors over thousands of
generated, mutation-fuzzed, and token-soup statement texts, comparing
the normalized record lists field by field.

This is a development/audit tool, NOT part of the package or test suite:
the library itself never imports the reference, and this script exits
cleanly when the snapshot is absent.  The only expected behavioral
difference is the deterministic year fallback (SURVEY M6): for texts
with no ``20XX`` year the reference falls back to ``utcnow().year``
while the pipeline uses the page's ``warc_ts`` year — the harness
aligns the fallback before comparing.

Usage:  python tools/parity_audit.py [seeds-per-source]
"""

from __future__ import annotations

import datetime
import random
import sys
import types

REFERENCE = "/root/reference"


def _install_pdfplumber_stub() -> None:
    class _FakePage:
        def __init__(self, t: str):
            self._t = t

        def extract_text(self, **kw):
            return self._t

    class _FakePdf:
        def __init__(self, t: str):
            self.pages = [_FakePage(t)]

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def _fake_open(file_like):
        data = file_like.read() if hasattr(file_like, "read") else file_like
        if isinstance(data, bytes):
            data = data.decode("utf-8", errors="ignore")
        return _FakePdf(data)

    fake = types.ModuleType("pdfplumber")
    fake.open = _fake_open
    sys.modules["pdfplumber"] = fake


def main() -> int:
    import os

    if not os.path.isdir(REFERENCE):
        print(f"reference snapshot not found at {REFERENCE}; nothing to audit")
        return 0

    _install_pdfplumber_stub()
    sys.path.insert(0, REFERENCE)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import parsers as ref
    from parsers import common as ref_common

    from pdf_parser_ray.extractors import REGISTRY as OURS
    from pdf_parser_ray.extractors import detect_source
    from pdf_parser_ray.fixtures.statements import STATEMENT_BUILDERS
    from pdf_parser_ray.functions.directions import normalize_records
    from pdf_parser_ray.functions.scalars import text_to_lines, year_from_text

    fallback_year = datetime.datetime.utcnow().year  # align with reference
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 200

    def ref_records(key: str, text: str):
        txs = ref.REGISTRY[key]().parse(text.encode("utf-8"), text)
        return ref_common.normalize_transactions(txs)

    def our_records(key: str, text: str):
        recs = OURS[key](
            text_to_lines(text), text, year_from_text(text, fallback_year)
        )
        return normalize_records(recs)

    def compare(key: str, text: str, label: str) -> int:
        try:
            r = ref_records(key, text)
        except Exception as ex:  # noqa: BLE001 - reference crash is a finding
            print(f"REF RAISED {label}/{key}: {ex!r}")
            return 1
        o = our_records(key, text)
        if r != o:
            print(f"MISMATCH {label}/{key}\n  text: {text!r}\n  ref : {r}\n  ours: {o}")
            return 1
        return 0

    checked = mismatches = 0

    # pass 1: clean + mutation-fuzzed generated statements, routed through
    # detection exactly as the pipeline would
    for name, builder in STATEMENT_BUILDERS.items():
        others = [b for n2, b in STATEMENT_BUILDERS.items() if n2 != name]
        for seed in range(n_seeds):
            rng = random.Random(hash((name, seed)) & 0xFFFFFFFF)
            lines = builder(rng, 2020 + seed % 6)
            mut = rng.randrange(6)
            if mut == 0 and others:
                donor = rng.choice(others)(rng, 2024)
                pos = rng.randrange(1, len(lines) + 1)
                lines = lines[:pos] + [rng.choice(donor[1:])] + lines[pos:]
            elif mut == 1:
                pos = rng.randrange(1, len(lines) + 1)
                lines = (
                    lines[:pos]
                    + ["*end*dailyendingbalance2 $196,453.06", "Page 2 of 9"]
                    + lines[pos:]
                )
            elif mut == 2 and len(lines) > 2:
                k = rng.randrange(1, len(lines))
                lines = lines[:k] + [lines[k][: max(3, len(lines[k]) // 2)]] + lines[k + 1:]
            elif mut == 3:
                lines = lines + [lines[rng.randrange(len(lines))]]
            text = "\n".join(lines)
            key = detect_source(text)
            if key not in ref.REGISTRY:
                continue
            checked += 1
            mismatches += compare(key, text, f"{name}#{seed}")

    # pass 2: token-soup texts run through EVERY parser key explicitly
    vocab = [
        "ACH", "WIRE", "FEE", "12/05", "Jan 3", "$1,234.56", "1,234.56-",
        "(45.00)", "payment", "to", "from", "REF", "deposit",
        "DEPOSITS AND ADDITIONS", "ELECTRONIC WITHDRAWALS", "CARGOS",
        "Total", "balance", "2/30", "13/13", "card", "purchase", "zelle",
        "Trn:", "0371908338Es", "Feb 29, 2023", "December 31, 2024", "-",
        "--", "$", "0.00", "999,999,999.99", "*start*", "*end*", "Page",
        "4", "of", "9", "WT", "CHARGE", "reversal", "cargo", "Beginning",
        "Ending", "Daily", "12/31/24", "1/1/2025", "Sept 5", "checking",
        "savings", "Total deposits", "Total withdrawals",
    ]
    for seed in range(6 * n_seeds):
        rng = random.Random(seed)
        lines = [
            " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 12)))
            for _ in range(rng.randrange(1, 12))
        ]
        text = "\n".join(lines)
        for key in OURS:
            if key not in ref.REGISTRY:
                continue
            checked += 1
            mismatches += compare(key, text, f"soup#{seed}")

    print(f"checked={checked} mismatches={mismatches}")
    return 1 if mismatches else 0


if __name__ == "__main__":
    raise SystemExit(main())
