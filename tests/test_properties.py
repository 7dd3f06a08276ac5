"""Property-based tests (hypothesis): invariants of the scalar kernel,
the normalizer, the PDF round trip, and the HTML fast/stdlib paths."""

import re
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_ray.functions.directions import normalize_records
from pdf_parser_ray.functions.scalars import (
    AMOUNT_RE,
    amount_token_to_float,
    norm_line,
    parse_slash_date,
    pick_amount,
    text_to_lines,
)

# -- amount lexer/parser ----------------------------------------------------


@given(
    dollars=st.integers(0, 9_999_999),
    cents=st.integers(0, 99),
    style=st.sampled_from(["dollar", "paren", "bare_neg", "plain"]),
)
def test_amount_format_lex_parse_roundtrip(dollars, cents, style):
    """format -> lex -> parse recovers the value for every token style
    the reference's money regex understands."""
    grouped = f"{dollars:,}"
    if style == "dollar":
        tok, expected = f"${grouped}.{cents:02d}", dollars + cents / 100
    elif style == "paren":
        tok, expected = f"(-{grouped}.{cents:02d})", -(dollars + cents / 100)
    elif style == "bare_neg":
        tok, expected = f"-{grouped}.{cents:02d}", -(dollars + cents / 100)
    else:
        tok, expected = f"{grouped}.{cents:02d}", dollars + cents / 100
    found = AMOUNT_RE.findall(f"desc {tok} trailing")
    assert tok in found
    assert abs(amount_token_to_float(tok) - expected) < 1e-9


@given(st.lists(st.sampled_from(["$5.00", "-9.10", "(123.45)", "1,000.00"]), max_size=6))
def test_pick_amount_total(tokens):
    got = pick_amount(tokens, prefer_first=True)
    if tokens:
        assert got == amount_token_to_float(tokens[0])
    else:
        assert got is None


# -- normalizer invariants --------------------------------------------------

_REC = st.fixed_dictionaries(
    {
        "date": st.dates().map(lambda d: d.isoformat()),
        "description": st.text(string.ascii_letters + " ", max_size=30),
        "amount": st.floats(-1e6, 1e6, allow_nan=False),
    }
)


@given(st.lists(_REC, max_size=20))
def test_normalize_invariants(records):
    out = normalize_records(records)
    assert len(out) == len(records)
    dates = [r["date"] for r in out]
    assert dates == sorted(dates)  # sorted ascending
    for r in out:
        assert r["amount"] >= 0
        assert r["direction"] in ("in", "out", "unknown")
        assert r["description"] == r["description"].strip()


@given(st.lists(_REC, max_size=12))
def test_normalize_stable_within_date(records):
    """Equal dates keep input order (list.sort stability, common.py:56)."""
    for r in records:
        r = dict(r)
    tagged = [dict(r, description=f"{i}") for i, r in enumerate(records)]
    out = normalize_records(tagged)
    for d in {r["date"] for r in out}:
        idxs = [int(r["description"]) for r in out if r["date"] == d]
        assert idxs == sorted(idxs)


# -- line normalization -----------------------------------------------------


@given(st.text(max_size=200))
def test_norm_line_idempotent(s):
    assert norm_line(norm_line(s)) == norm_line(s)


@given(st.text(max_size=300))
def test_text_to_lines_no_empties_and_order(s):
    lines = text_to_lines(s)
    assert all(lines)
    assert all("\n" not in ln for ln in lines)


# -- generic extractor invariant --------------------------------------------


@given(
    st.lists(
        st.one_of(
            st.text(string.ascii_letters + " ", min_size=1, max_size=40),
            st.builds(
                lambda m, d, amt: f"{m}/{d} PAYMENT {amt:,}.00 9,999.99",
                st.integers(1, 12),
                st.integers(1, 28),
                st.integers(1, 99999),
            ),
        ),
        max_size=25,
    )
)
@settings(max_examples=60)
def test_generic_records_bounded_by_date_lines(lines):
    """Σ records ≤ Σ date-anchored lines (SURVEY §5.2-3)."""
    from pdf_parser_ray.extractors import REGISTRY

    lines = [ln.strip() for ln in lines if ln.strip()]
    recs = REGISTRY["generic"](lines, " ".join(lines), 2024)
    n_date_lines = sum(1 for ln in lines if parse_slash_date(ln, 2024))
    assert len(recs) <= max(n_date_lines, 0) + sum(
        1 for ln in lines if re.match(r"^[A-Za-z]{3,9}\s+\d", ln)
    )


# -- PDF builder/parser round trip ------------------------------------------

_PDF_LINE = st.text(
    string.ascii_letters + string.digits + " ,.$()-/", min_size=1, max_size=60
).map(str.strip).filter(bool)


@given(st.lists(st.lists(_PDF_LINE, min_size=1, max_size=8), min_size=1, max_size=3))
@settings(max_examples=40, deadline=2000)
def test_pdf_roundtrip_property(pages):
    from pdf_parser_ray.pdf.build import build_pdf
    from pdf_parser_ray.pdf.parse import extract_page_texts

    pdf = build_pdf(pages)
    got = extract_page_texts(pdf)
    expected = ["\n".join(ln for ln in page) for page in pages]
    assert got == expected


# -- HTML fast path vs stdlib path ------------------------------------------

_HTML_CHUNK = st.one_of(
    st.text(string.ascii_letters + " &<>;", max_size=30),
    st.sampled_from(
        [
            "<p>", "</p>", "<div>", "</div>", "<a href='/x'>", "</a>", "<br>",
            "<nav>", "</nav>", "<script>x<y</script>", "<!-- c -->", "&amp;",
            "<h1>", "</h1>", "<span>", "</span>", "<li>", "</li>",
        ]
    ),
)


@given(st.lists(_HTML_CHUNK, max_size=30).map("".join))
@settings(max_examples=150, deadline=2000)
def test_html_fast_matches_stdlib(markup):
    from pdf_parser_ray.html.extract import segment_blocks_fast, segment_blocks_stdlib

    fast = [(b.text, b.tag, b.link_chars, b.total_chars, b.boilerplate_container)
            for b in segment_blocks_fast(markup)]
    ref = [(b.text, b.tag, b.link_chars, b.total_chars, b.boilerplate_container)
           for b in segment_blocks_stdlib(markup)]
    assert fast == ref


class TestWordStatsVectorizedEquivalence:
    """word_stats_arrays (Arrow list kernels) must agree with
    word_counter_stats (per-text Counter) on arbitrary unicode text —
    the quality/repetition oracles pin values computed through both."""

    @given(
        st.lists(
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",), max_codepoint=0x2FFF
                ),
                max_size=60,
            ),
            max_size=8,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_matches_counter(self, texts):
        import pyarrow as pa

        from pdf_parser_ray.pipelines.analysis import (
            word_counter_stats, word_stats_arrays,
        )

        arrs = word_stats_arrays(pa.array(texts, pa.string()))
        for k, text in enumerate(texts):
            assert (
                int(arrs[0][k]), int(arrs[1][k]), int(arrs[2][k]), int(arrs[3][k])
            ) == word_counter_stats(text), repr(text)


# -- shuffle key / quantizer kernels ------------------------------------------


@given(ids=st.lists(st.integers(0, 2**62), min_size=1, max_size=200))
@settings(max_examples=50, deadline=None)
def test_shuffle_key_range_and_determinism(ids):
    import numpy as np

    from pdf_parser_ray.pipelines.pack import SHUF_P, shuffle_key

    arr = np.array(ids, dtype=np.int64)
    k1 = shuffle_key(arr)
    k2 = shuffle_key(arr)
    assert (k1 == k2).all()
    assert k1.dtype == np.int64
    assert (k1 >= 0).all() and (k1 < SHUF_P).all()
    # near-injective on ids below P (the xor fold CAN wrap to 0 mod P —
    # e.g. ids 1802502889 and 1871412062 collide — so only a bound, not
    # equality, is a true invariant; order ties break on doc_id)
    small = arr[arr < SHUF_P]
    uniq_in = len(set(small.tolist()))
    uniq_out = len(set(shuffle_key(small).tolist()))
    assert uniq_out >= uniq_in - 1


@given(
    vals=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False, width=32),
        min_size=1,
        max_size=100,
    )
)
@settings(max_examples=50, deadline=None)
def test_quantizer_bounds_for_any_input(vals):
    import numpy as np

    from pdf_parser_ray.pipelines.similarity import QUANT_LEVELS, _quantize

    x = np.array(vals, np.float64)
    a = float(np.abs(x).max())
    if a == 0.0:
        return  # all-zero corpus has no scale; the pipeline never hits it
    q = _quantize(x[None, :], a)[0]
    assert (q >= -QUANT_LEVELS).all() and (q <= QUANT_LEVELS).all()
    # monotone: quantization preserves (weak) order within a vector
    order = np.argsort(x, kind="stable")
    assert (np.diff(q[order]) >= 0).all()


@given(
    h=st.integers(8, 24),
    w=st.integers(8, 24),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_jpeg_q100_roundtrip_bounded_for_any_image(h, w, seed):
    """Baseline-JPEG q=100 (all-ones quant tables) must round-trip ANY
    uint8 RGB image within ±4 counts — the only loss left is float DCT
    rounding compounded with the forward+inverse YCbCr color transform
    (grayscale, which skips the color matrix, stays within ±2)."""
    import numpy as np

    from pdf_parser_ray.pipelines.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=100))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4
    gray = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    dgray = decode_jpeg(encode_jpeg(gray, quality=100))
    assert np.abs(dgray[..., 0].astype(int) - gray.astype(int)).max() <= 2


# NO continuation-range char (U+0080-U+00BF) in this alphabet: with one
# ('½', U+00BD) Hypothesis found 'ß½' — whose cp1252 bytes DF BD are a
# VALID UTF-8 sequence — i.e. a clean original that is itself shaped
# like mojibake, where repair is inherently ambiguous (ftfy shares this
# blind spot); the restore guarantee below only holds on texts that
# cannot encode to valid UTF-8 byte patterns.
_MOJI_ALPHABET = string.ascii_letters + string.digits + " .,!?-" + "éàüñçøß–€"


@given(
    text=st.text(alphabet=_MOJI_ALPHABET, min_size=1, max_size=200),
    double=st.booleans(),
)
@settings(max_examples=150, deadline=None)
def test_mojibake_repair_restores_any_corruption(text, double):
    """fix_mojibake must restore ANY text over a hole-free alphabet
    after one or two cp1252 mis-decodes, and must not touch the clean
    original (unless the original is itself shaped like mojibake, which
    this alphabet cannot produce: it has no continuation-range char, so
    no lead byte is ever followed by a valid continuation)."""
    from pdf_parser_ray.functions.charset import fix_mojibake, mojibake_score

    corrupted = text.encode("utf-8").decode("cp1252")
    if double:
        corrupted = corrupted.encode("utf-8").decode("cp1252")
    expected_passes = (2 if double else 1) if corrupted != text else 0
    repaired, n = fix_mojibake(corrupted)
    assert repaired == text
    assert n == expected_passes


def test_mojibake_ambiguous_original_is_reencoded():
    """Pinned blind spot: a CLEAN original whose cp1252 bytes form
    valid UTF-8 ('ß½' → DF BD → U+07FD) is indistinguishable from
    mojibake and gets "repaired" — the documented inherent ambiguity
    of double-decode repair, not a regression."""
    from pdf_parser_ray.functions.charset import fix_mojibake

    repaired, n = fix_mojibake("ß½")
    assert repaired == "߽" and n == 1


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=40)
)
def test_anomaly_integer_gate_equals_exact_sigma_test(counts):
    """hourly_anomalies' division-free inequality (H·x−S)² > 4·(Q·H−S²)
    must agree with the exact |x−μ| > 2σ test for EVERY count vector —
    verified against Fraction arithmetic (no float error on either
    side), including the 100-TB-scale magnitudes int64 would overflow."""
    from fractions import Fraction

    hh = len(counts)
    s = sum(counts)
    q = sum(v * v for v in counts)
    mu = Fraction(s, hh)
    var = Fraction(q, hh) - mu * mu
    for x in counts:
        integer_gate = (hh * x - s) ** 2 > 4 * (q * hh - s * s)
        exact_gate = Fraction(x - mu) ** 2 > 4 * var
        assert integer_gate == exact_gate
