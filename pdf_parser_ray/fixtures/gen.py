"""Deterministic synthetic pages corpus + goldens (SURVEY.md §7.1).

Derives a Common-Crawl-style ``pages`` table — exactly the
BASELINE.json ``input_hint`` schema ``(url, warc_ts, html, text, lang)``
— from the driver-provided ``documents`` table of an sf directory, with
no external data and no wall clock:

* ~90% of rows wrap a document's text in generated HTML boilerplate
  (nav/header/footer/aside/link farms) under one of several charsets
  declared via ``<meta charset=…>``, with NBSP / en-dash cases mixed in;
* ~10% of rows are generator-built PDFs (valid xref, FlateDecode
  content streams) carrying bank-statement line streams cycling through
  every registered rule-set;

and the matching ``golden`` table of expected per-url output.  Golden
``extracted_text`` for HTML rows is *constructed from generator
knowledge* (the known content paragraphs), independent of the extractor
code, so the byte-identity test is a real oracle.  PDF golden text is the
known statement lines; golden ``parser_key``/``records`` are produced by
the (separately unit-tested) detection + rule-set layer at build time.

Everything is keyed on (seed, doc_id, replica) so any subset of rows can
be regenerated independently — the property that makes resumable,
retry-safe generation possible at scale.
"""

from __future__ import annotations

import html as html_mod
import random
import re

import pyarrow as pa

from ..extractors import detect_source, get_extractor
from ..schemas import RECORD_TYPE, SPAN_TYPE
from ..functions.directions import normalize_records
from ..functions.scalars import text_to_lines
from ..pdf.build import build_pdf
from .statements import BANK_CYCLE, STATEMENT_BUILDERS

_ASCII_WS_RE = re.compile(r"[ \t\r\n\f\v\x1c-\x1f]+")  # mirror html/extract.py
_ENCODINGS = ("utf-8", "cp1252", "latin-1", "utf-8")

_EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

LINK_TYPE = pa.struct([("href", pa.string()), ("anchor", pa.string())])

# bump when generator/statement content changes so cached corpora regenerate
CORPUS_VERSION = 21  # v21: golden outlinks (every HTML page's nav +
# tag-farm <a href> pairs recorded in the `links` column + exploded
# golden_links parquet — the extract_links fixture);
# v20: planted summary-table pages (every 3rd PDF
# doc carries a title + aligned 3-column cell grid page, golden grids
# in the `tables` column + exploded golden_tables parquet — the
# extract_tables fixture); v19: 28 PDF writer forms (+type1_program:
# symbolic Type1 whose embedded font program's cleartext /Encoding is
# the only decode source); v18: +inline images with "EI" bytes in the
# sample data — with and without /L — and +broken_xref garbage-offset
# tables exercising object-scan recovery; v17: +symbolic TrueType with
# a real embedded sfnt ((3,0) format-4 cmap + post-2.0 names); v16:
# +cid_cmap mixed-width embedded-CMap encoding, +Type3
# CharProcs/Differences fonts; v14: \x1c-\x1f joined the ws class


def _spans_for_lines(lines: list[str], kinds: list[str]) -> list[dict]:
    """Golden spans from generator knowledge: offsets of each line inside
    the '\\n'-joined golden text."""
    spans = []
    pos = 0
    for text, kind in zip(lines, kinds):
        spans.append({"start": pos, "end": pos + len(text), "kind": kind})
        pos += len(text) + 1
    return spans


def _norm_ws(s: str) -> str:
    """The generator-side mirror of the HTML extractor's whitespace rule:
    collapse ASCII whitespace runs, strip (NBSP untouched)."""
    return _ASCII_WS_RE.sub(" ", s).strip()


def _paragraphs(words: list[str], rng: random.Random) -> list[str]:
    """Chunk a word list into paragraphs of >=5 words (the content
    threshold) with seeded sizes."""
    paras: list[str] = []
    i = 0
    while i < len(words):
        size = rng.randint(8, 18)
        chunk = words[i : i + size]
        i += size
        if len(chunk) < 5 and paras:
            paras[-1] = paras[-1] + " " + " ".join(chunk)
        elif len(chunk) >= 5:
            paras.append(" ".join(chunk))
    return paras or ["fallback content paragraph with enough words here"]


def _html_page(
    doc_text: str, doc_id: int, replica: int, rng: random.Random,
    page_scale: int = 1,
) -> tuple[bytes, str, list[str], str]:
    """-> (payload_bytes, encoding, golden_lines, title, link_pairs).

    ``page_scale`` repeats the content words N times to emulate realistic
    Common-Crawl page sizes in benchmarks (1 = fixture size ~2 KB,
    10 ≈ 20 KB) without changing determinism."""
    words = doc_text.split() * max(1, page_scale)
    title = " ".join(words[:3]) or f"untitled {doc_id}"
    paras = _paragraphs(words[3:], rng)

    # NBSP / dash cases for the charset+normalization path
    if rng.random() < 0.3 and paras:
        paras[-1] = paras[-1] + " extra – dashed text here"

    golden_lines = [_norm_ws(title)] + [_norm_ws(p) for p in paras]

    # planted outlinks, recorded as goldens (v21: the extract_links
    # fixture) — nav first, tag farm second, document order
    link_pairs = [
        (f"/s{doc_id}/{k}", w)
        for k, w in enumerate(
            ["home", "about", "contact", "archive"][: rng.randint(2, 4)]
        )
    ] + [(f"/t/{k}", f"tag{k}") for k in range(rng.randint(4, 9))]
    n_nav = sum(1 for h, _ in link_pairs if h.startswith("/s"))
    nav_links = " ".join(
        f'<a href="{h}">{a}</a>' for h, a in link_pairs[:n_nav]
    )
    farm = " ".join(
        f'<a href="{h}">{a}</a>' for h, a in link_pairs[n_nav:]
    )
    enc = _ENCODINGS[(doc_id + replica) % len(_ENCODINGS)]
    body_paras = "\n".join(f"<p>{html_mod.escape(p)}</p>" for p in paras)
    page = f"""<!doctype html>
<html><head><meta charset="{enc}"><title>site{doc_id}</title>
<style>p {{ margin: 0 }}</style><script>var nav = "home about";</script></head>
<body>
<nav>{nav_links}</nav>
<header><div>site{doc_id} tagline words and more words</div></header>
<main>
<h1>{html_mod.escape(title)}</h1>
{body_paras}
<div>{farm}</div>
</main>
<aside><p>related links and many promotional words that are dropped</p></aside>
<footer><p>copyright words words words words words footer</p></footer>
</body></html>"""
    try:
        payload = page.encode(enc)
    except UnicodeEncodeError:
        enc = "utf-8"
        page = page.replace('charset="cp1252"', 'charset="utf-8"').replace(
            'charset="latin-1"', 'charset="utf-8"'
        )
        payload = page.encode("utf-8")
    return payload, enc, golden_lines, title, link_pairs


# cycle of 28 writer forms — classic PDF 1.4, bare xref stream,
# ObjStm-packed, ObjStm+PNG-predictor, CID/Type0 font,
# CID+ObjStm+predictor combined, RC4/AES-128/AES-256 encryption,
# LZW / RunLength / ASCII85+LZW content filters, form XObjects,
# /Rotate 90/270 pages, incremental-update files (/Prev xref chain,
# latest object version wins), non-Identity embedded-CMap composite
# fonts (mixed 1/2-byte codespaces), and Type3 CharProcs fonts — so the
# fixture corpus exercises every cross-reference, text-encoding,
# filter, security-handler and page-orientation form the parser
# supports, end-to-end through the Ray pipeline and the driver oracle
_PDF_FORMS = (
    {},
    {"xref_stream": True},
    {"objstm": True},
    {"objstm": True, "predictor": True},
    {"cid_font": True},
    {"cid_font": True, "objstm": True, "predictor": True},
    {"encrypt": True},
    {"encrypt": True, "objstm": True, "cid_font": True},
    {"content_filter": "lzw"},
    {"content_filter": "rle", "xref_stream": True},
    {"content_filter": "a85+lzw"},
    {"encrypt_aes": True},
    {"encrypt_aes": True, "objstm": True},
    {"encrypt_aes256": True},
    {"encrypt_aes256": True, "objstm": True, "cid_font": True},
    {"encrypt_aes": True, "content_filter": "lzw"},
    {"form_xobject": True},
    {"form_xobject": True, "objstm": True},
    {"rotate": 90},
    {"rotate": 270, "objstm": True},
    {"incremental": True},
    # non-Identity embedded /Encoding CMap (mixed 1/2-byte codespaces)
    {"cid_cmap": True},
    # Type3 font: CharProcs + non-identity /Differences code assignment
    {"type3_font": True, "objstm": True},
    # symbolic TrueType: no /Encoding — decode via the embedded sfnt's
    # (3,0) format-4 cmap + post-2.0 glyph names
    {"truetype_symbolic": True, "xref_stream": True},
    # inline images whose sample bytes contain "EI": without /L the
    # EIs are non-delimited (delimiter-aware scan required); with /L a
    # ws-delimited EI sits INSIDE the data (declared length required)
    {"inline_image": True},
    {"inline_image": "L", "objstm": True},
    # all-garbage classic xref offsets + bogus startxref: extraction
    # must survive via object-scan recovery
    {"broken_xref": True},
    # symbolic Type1 with NO /Encoding dict entry: the embedded font
    # program's cleartext `dup <code> /<glyph> put` array is the only
    # decode source
    {"type1_program": True},
)


# planted summary tables (v20): a deterministic third of the PDF docs
# carry an extra page holding a title line plus an aligned cell grid —
# the extract_tables fixture.  Columns sit ~180 pt apart (word gaps at
# 12 pt type are < 6 pt; the reconstructor's CELL_GAP is 24), cell
# vocabulary avoids dates, amount tokens, and every bank/section
# keyword so the record extractors see the page as noise.
_TABLE_COLS = (72.0, 250.0, 430.0)
_TABLE_TITLE = "Category breakdown"
_TABLE_CATEGORIES = (
    "Groceries", "Utilities", "Travel", "Dining",
    "Supplies", "Postage", "Printing", "Software",
)


def _summary_table(rng: random.Random) -> list[list[str]]:
    """Header + 2-5 data rows of (category, count, percent) cells."""
    rows = [["Category", "Items", "Share"]]
    for cat in rng.sample(_TABLE_CATEGORIES, rng.randint(2, 5)):
        rows.append([cat, str(rng.randint(1, 99)), f"{rng.randint(1, 99)}%"])
    return rows


def _pdf_page(
    doc_id: int, replica: int, year: int, rng: random.Random
) -> tuple[bytes, list[str], str, list[list[str]], list[list[list[str]]]]:
    """-> (payload_bytes, golden_lines, bank_key, page_structure,
    golden_tables)."""
    bank = BANK_CYCLE[(doc_id + replica) % len(BANK_CYCLE)]
    lines = STATEMENT_BUILDERS[bank](rng, year)
    # split across two pages sometimes; scramble stream order sometimes —
    # the extractor must reassemble by bbox either way
    if len(lines) > 4 and rng.random() < 0.5:
        pages = [lines[:3], lines[3:]]
    else:
        pages = [lines]
    form = _PDF_FORMS[(doc_id + replica) % len(_PDF_FORMS)]
    shuffle = rng.random() < 0.5
    tables: list[list[list[str]]] = []
    pdf_pages: list = list(pages)
    if (doc_id + replica) % 3 == 0:
        table = _summary_table(rng)
        tables.append(table)
        # positioned cell grid for the writer; assembled text (cells
        # joined by the single-space rule) for the goldens
        pdf_pages.append(
            [_TABLE_TITLE]
            + [
                [(_TABLE_COLS[j], c) for j, c in enumerate(row)]
                for row in table
            ]
        )
        text_page = [_TABLE_TITLE] + [" ".join(row) for row in table]
        pages = pages + [text_page]
        lines = lines + text_page
    payload = build_pdf(pdf_pages, shuffle_order=shuffle, **form)
    return payload, lines, bank, pages, tables


def synthesize_pages(
    documents: pa.Table,
    *,
    seed: int = 42,
    replicate: int = 1,
    pdf_fraction: float = 0.1,
) -> tuple[pa.Table, pa.Table]:
    """documents table -> (pages table, golden table)."""
    doc_ids = documents.column("doc_id").to_pylist()
    texts = documents.column("text").to_pylist()
    langs = documents.column("lang").to_pylist()

    urls, tss, payloads, snippets, out_langs = [], [], [], [], []
    g_urls, g_texts, g_keys, g_records, g_kinds, g_spans = [], [], [], [], [], []
    g_tables: list[list[list[list[str]]]] = []
    g_links: list[list[dict]] = []

    for replica in range(replicate):
        for doc_id, doc_text, lang in zip(doc_ids, texts, langs):
            rng = random.Random(f"{seed}:{doc_id}:{replica}")
            url = f"https://site{doc_id % 101}.example/r{replica}/p{doc_id}"
            ts = _EPOCH_2024_US + (doc_id * 86_400 + replica * 997) * 1_000_000
            year = 2024
            doc_tables: list[list[list[str]]] = []
            doc_links: list[tuple[str, str]] = []
            if rng.random() < pdf_fraction:
                payload, golden_lines, _bank, page_struct, doc_tables = (
                    _pdf_page(doc_id, replica, year, rng)
                )
                kind = "pdf"
                # one span per page over the '\n'-joined page texts
                page_texts = ["\n".join(p) for p in page_struct]
                spans = _spans_for_lines(page_texts, ["page"] * len(page_texts))
            else:
                payload, _enc, golden_lines, _title, doc_links = _html_page(
                    doc_text, doc_id, replica, rng
                )
                kind = "html"
                # one span per kept block: the h1 title then the paragraphs
                spans = _spans_for_lines(
                    golden_lines, ["h1"] + ["p"] * (len(golden_lines) - 1)
                )
            golden_text = "\n".join(golden_lines)
            parser_key = detect_source(golden_text)
            records = normalize_records(
                get_extractor(parser_key)(
                    text_to_lines(golden_text), golden_text, year
                )
            )

            urls.append(url)
            tss.append(ts)
            payloads.append(payload)
            snippets.append(doc_text[:100])
            out_langs.append(lang)
            g_urls.append(url)
            g_texts.append(golden_text)
            g_keys.append(parser_key)
            g_records.append(records)
            g_kinds.append(kind)
            g_spans.append(spans)
            g_tables.append(doc_tables)
            g_links.append(
                [{"href": h, "anchor": a} for h, a in doc_links]
            )

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array(snippets, pa.string()),
            "lang": pa.array(out_langs, pa.string()),
        }
    )
    import hashlib

    golden = pa.table(
        {
            "url": pa.array(g_urls, pa.string()),
            "content_type": pa.array(g_kinds, pa.string()),
            "extracted_text": pa.array(g_texts, pa.large_string()),
            "parser_key": pa.array(g_keys, pa.string()),
            "spans": pa.array(g_spans, pa.list_(SPAN_TYPE)),
            "records": pa.array(g_records, pa.list_(RECORD_TYPE)),
            # planted table grids (v20): tables -> rows -> cells
            "tables": pa.array(
                g_tables, pa.list_(pa.list_(pa.list_(pa.string())))
            ),
            # planted outlinks (v21): document-order (href, anchor)
            "links": pa.array(g_links, pa.list_(LINK_TYPE)),
            # plain-column goldens so a SQL oracle can SELECT them directly
            # (driver correctness gate for the extract_* flagship queries)
            "n_records": pa.array([len(r) for r in g_records], pa.int32()),
            "content_sha256": pa.array(
                [hashlib.sha256(t.encode("utf-8")).hexdigest() for t in g_texts],
                pa.string(),
            ),
        }
    )
    return pages, golden


def explode_golden_records(golden: pa.Table) -> pa.Table:
    """Exploded relational view of the golden records — the oracle side
    table for ``extract_records`` / ``records_by_direction`` (amounts in
    integer cents for float-safe value hashing)."""
    urls, dates, descs, cents, dirs = [], [], [], [], []
    for url, recs in zip(
        golden.column("url").to_pylist(), golden.column("records").to_pylist()
    ):
        for r in recs:
            urls.append(url)
            dates.append(r["date"])
            descs.append(r["description"])
            cents.append(int(round(r["amount"] * 100)))
            dirs.append(r["direction"])
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "date": pa.array(dates, pa.string()),
            "description": pa.array(descs, pa.string()),
            "amount_cents": pa.array(cents, pa.int64()),
            "direction": pa.array(dirs, pa.string()),
        }
    )


def explode_golden_tables(golden: pa.Table) -> pa.Table:
    """Exploded cell view of the golden tables — the oracle side table
    for ``extract_tables`` (url, table_idx, row_idx, col_idx, cell)."""
    urls, t_idx, r_idx, c_idx, cells = [], [], [], [], []
    for url, tabs in zip(
        golden.column("url").to_pylist(), golden.column("tables").to_pylist()
    ):
        for ti, tab in enumerate(tabs):
            for ri, row in enumerate(tab):
                for ci, cell in enumerate(row):
                    urls.append(url)
                    t_idx.append(ti)
                    r_idx.append(ri)
                    c_idx.append(ci)
                    cells.append(cell)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "table_idx": pa.array(t_idx, pa.int64()),
            "row_idx": pa.array(r_idx, pa.int64()),
            "col_idx": pa.array(c_idx, pa.int64()),
            "cell": pa.array(cells, pa.string()),
        }
    )


def explode_golden_links(golden: pa.Table) -> pa.Table:
    """Exploded link view of the goldens — the oracle side table for
    ``extract_links`` (url, link_idx, href, anchor)."""
    urls, idxs, hrefs, anchors = [], [], [], []
    for url, links in zip(
        golden.column("url").to_pylist(), golden.column("links").to_pylist()
    ):
        for i, lk in enumerate(links):
            urls.append(url)
            idxs.append(i)
            hrefs.append(lk["href"])
            anchors.append(lk["anchor"])
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "link_idx": pa.array(idxs, pa.int64()),
            "href": pa.array(hrefs, pa.string()),
            "anchor": pa.array(anchors, pa.string()),
        }
    )


def synthesize_row(
    doc_id: int, doc_text: str, lang: str, replica: int, seed: int,
    pdf_fraction: float, page_scale: int = 1,
) -> dict:
    """One pages-table row, a pure function of (seed, doc_id, replica) —
    the unit the Ray-parallel generator maps over."""
    rng = random.Random(f"{seed}:{doc_id}:{replica}")
    url = f"https://site{doc_id % 101}.example/r{replica}/p{doc_id}"
    ts = _EPOCH_2024_US + (doc_id * 86_400 + replica * 997) * 1_000_000
    if rng.random() < pdf_fraction:
        payload, _lines, _bank, _pages, _tables = _pdf_page(
            doc_id, replica, 2024, rng
        )
    else:
        payload, _enc, _lines, _title, _links = _html_page(
            doc_text, doc_id, replica, rng, page_scale
        )
    return {
        "url": url,
        "warc_ts": ts,
        "html": payload,
        "text": doc_text[:100],
        "lang": lang,
    }


def synthesize_pages_ray(
    sf_dir: str,
    out_dir: str,
    *,
    seed: int = 42,
    replicate: int = 1,
    pdf_fraction: float = 0.1,
    page_scale: int = 1,
) -> str:
    """Bench-scale corpus builder: the same deterministic rows as
    ``synthesize_pages`` but generated *in parallel* with Ray Data
    (documents -> map_batches -> parquet shards).  Cached by tag."""
    import os

    import pyarrow as pa
    import ray.data as rd

    # rg4k: fine row groups so parquet reads can split WITHIN files —
    # 16 coarse shards gave the 640k-page read only ~32 splittable
    # units, capping the extract stage at ~1 task per core at 32 CPUs
    # (the measured 8->32 ceiling); the tag encodes the layout so
    # coarse-row-group caches regenerate
    tag = (
        f"v{CORPUS_VERSION}_ray_seed{seed}_rep{replicate}"
        f"_pdf{int(pdf_fraction * 100)}_ps{page_scale}_rg4k"
    )
    pages_dir = os.path.join(out_dir, f"pages_{tag}")
    done_marker = os.path.join(pages_dir, "_DONE")
    if os.path.exists(done_marker):
        return pages_dir

    def gen(batch: pa.Table) -> pa.Table:
        rows = []
        for doc_id, text, lang in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
            batch.column("lang").to_pylist(),
        ):
            for replica in range(replicate):
                rows.append(
                    synthesize_row(
                        doc_id, text, lang, replica, seed, pdf_fraction, page_scale
                    )
                )
        return pa.table(
            {
                "url": pa.array([r["url"] for r in rows], pa.string()),
                "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
                "html": pa.array([r["html"] for r in rows], pa.binary()),
                "text": pa.array([r["text"] for r in rows], pa.string()),
                "lang": pa.array([r["lang"] for r in rows], pa.string()),
            }
        )

    tmp_dir = pages_dir + ".tmp"
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    ds.map_batches(gen, batch_format="pyarrow", zero_copy_batch=True, batch_size=256).write_parquet(
        tmp_dir, row_group_size=4096
    )
    os.replace(tmp_dir, pages_dir)
    with open(done_marker, "w") as f:
        f.write("ok")
    return pages_dir


def synthesize_to_dir(
    sf_dir: str,
    out_dir: str,
    *,
    seed: int = 42,
    replicate: int = 1,
    pdf_fraction: float = 0.1,
    shards: int = 8,
) -> tuple[str, str]:
    """Build (once) and cache the pages corpus + goldens for an sf dir.

    Pages are written as ``shards`` separate parquet files — the unit of
    read parallelism and of resume lineage downstream.
    """
    import os

    import pyarrow.parquet as pq

    tag = f"v{CORPUS_VERSION}_seed{seed}_rep{replicate}_pdf{int(pdf_fraction * 100)}"
    pages_dir = os.path.join(out_dir, f"pages_{tag}")
    golden_path = os.path.join(out_dir, f"golden_{tag}.parquet")
    records_path = os.path.join(out_dir, f"golden_records_{tag}.parquet")
    tables_path = os.path.join(out_dir, f"golden_tables_{tag}.parquet")
    links_path = os.path.join(out_dir, f"golden_links_{tag}.parquet")
    done_marker = os.path.join(pages_dir, "_DONE")
    if (
        os.path.exists(done_marker)
        and os.path.exists(golden_path)
        and os.path.exists(records_path)
        and os.path.exists(tables_path)
        and os.path.exists(links_path)
    ):
        return pages_dir, golden_path

    documents = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    pages, golden = synthesize_pages(
        documents, seed=seed, replicate=replicate, pdf_fraction=pdf_fraction
    )
    os.makedirs(pages_dir, exist_ok=True)
    n = pages.num_rows
    per = max(1, (n + shards - 1) // shards)
    for s in range(0, n, per):
        pq.write_table(
            pages.slice(s, per), os.path.join(pages_dir, f"part-{s // per:05d}.parquet")
        )
    pq.write_table(golden, golden_path)
    pq.write_table(explode_golden_records(golden), records_path)
    pq.write_table(explode_golden_tables(golden), tables_path)
    pq.write_table(explode_golden_links(golden), links_path)
    with open(done_marker, "w") as f:
        f.write("ok")
    return pages_dir, golden_path


def golden_links_path_for(sf_dir: str, out_dir: str) -> str:
    """The exploded golden-links parquet for an sf dir (synthesizing
    first if cold) — the extract_links oracle side."""
    import os

    synthesize_to_dir(sf_dir, out_dir)
    tag = f"v{CORPUS_VERSION}_seed42_rep1_pdf10"
    return os.path.join(out_dir, f"golden_links_{tag}.parquet")


def golden_tables_path_for(sf_dir: str, out_dir: str) -> str:
    """The exploded golden-tables parquet for an sf dir (synthesizing
    first if cold) — the extract_tables oracle side."""
    import os

    synthesize_to_dir(sf_dir, out_dir)
    tag = f"v{CORPUS_VERSION}_seed42_rep1_pdf10"
    return os.path.join(out_dir, f"golden_tables_{tag}.parquet")


def golden_paths_for(sf_dir: str, out_dir: str) -> tuple[str, str]:
    """(golden_path, golden_records_path) for an sf dir — synthesizing
    the corpus first if the cache is cold (pure pyarrow, no Ray)."""
    import os

    synthesize_to_dir(sf_dir, out_dir)
    tag = f"v{CORPUS_VERSION}_seed42_rep1_pdf10"
    return (
        os.path.join(out_dir, f"golden_{tag}.parquet"),
        os.path.join(out_dir, f"golden_records_{tag}.parquet"),
    )
