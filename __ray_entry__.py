"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline on sf0.001;
``queries()`` exposes every implemented operator family from
SURVEY.md §2 plus the training-data ops; ``oracle_sql()`` provides the
DuckDB-equivalent SQL for the SQL-expressible subset (same column
names, integer-cents / integer-micros discipline for float safety).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

_CACHE_ROOT = "/tmp/pdf_parser_ray_cache"


def _pages_dir_for(sf_dir: str) -> str:
    """Synthesize (once, cached) the pages corpus derived from an sf
    directory's documents table."""
    from pdf_parser_ray.fixtures.gen import synthesize_to_dir

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(_CACHE_ROOT, tag)
    os.makedirs(out, exist_ok=True)
    pages_dir, _golden = synthesize_to_dir(sf_dir, out)
    return pages_dir


def entry() -> Any:
    """Flagship: pages parquet -> fused extraction -> extracted table."""
    from pdf_parser_ray.pipelines.extract import extract_dir

    pages_dir = _pages_dir_for("/root/testdata/sf0.001")
    ds = extract_dir(pages_dir, batch_size=32)
    # drop nested columns for a stable, driver-friendly schema
    return ds.select_columns(
        ["url", "content_type", "encoding", "parser_key", "n_records",
         "content_sha256", "bucket"]
    )


def _extract_pages(sf_dir: str):
    from pdf_parser_ray.pipelines.extract import extract_dir

    ds = extract_dir(_pages_dir_for(sf_dir), batch_size=32)
    return ds.select_columns(
        ["url", "content_type", "parser_key", "n_records", "content_sha256"]
    )


def _extract_records(sf_dir: str):
    """Exploded relational view of the extracted transaction records
    (amounts in integer cents so the oracle value-hash is float-safe)."""
    import pyarrow as pa

    from pdf_parser_ray.pipelines.extract import extract_dir

    def explode(batch: pa.Table) -> pa.Table:
        # vectorized list-of-struct explode: parent indices repeat the
        # url per record, flatten exposes the struct fields as arrays —
        # no per-row Python (half_to_even rounding matches the scalar
        # path's round())
        import pyarrow.compute as pc

        recs = batch.column("records").combine_chunks()
        parent = pc.list_parent_indices(recs)
        flat = recs.flatten()
        return pa.table(
            {
                "url": pc.take(
                    batch.column("url").combine_chunks(), parent
                ).cast(pa.string()),
                "date": flat.field("date").cast(pa.string()),
                "description": flat.field("description").cast(pa.string()),
                "amount_cents": pc.cast(
                    pc.round(pc.multiply(flat.field("amount"), 100.0)),
                    pa.int64(),
                ),
                "direction": flat.field("direction").cast(pa.string()),
            }
        )

    ds = extract_dir(_pages_dir_for(sf_dir), batch_size=32)
    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def _extract_links(sf_dir: str):
    """Exploded outlink view of the HTML pages (document-order <a href>
    pairs) — oracled against the generator's planted golden links."""
    from pdf_parser_ray.pipelines.extract import extract_links_dir

    return extract_links_dir(_pages_dir_for(sf_dir), batch_size=32)


def _outlink_stats(sf_dir: str):
    """Per-host outlink profile over the extracted link stream —
    oracled against the golden links (nav = /s…, tag farm = /t/…)."""
    from pdf_parser_ray.pipelines.extract import outlink_stats

    return outlink_stats(_pages_dir_for(sf_dir))


def _extract_tables(sf_dir: str):
    """Exploded cell view of the bbox-grid table reconstruction over
    the PDF pages (SURVEY §2 M5; reference base.py:46-50) — oracled
    against the generator's planted golden grids."""
    from pdf_parser_ray.pipelines.extract import extract_tables_dir

    return extract_tables_dir(_pages_dir_for(sf_dir), batch_size=32)


def _extract_spans(sf_dir: str):
    """Exploded span table (url, span_idx, span_start, span_end, kind)
    — puts the north-star's per-url span offsets into the driver's
    value-hash gate against generator-side goldens."""
    import pyarrow as pa

    from pdf_parser_ray.pipelines.extract import extract_dir

    def explode(batch: pa.Table) -> pa.Table:
        # vectorized explode; span_idx = element position within its
        # list, computed from the flattened offsets (no Python rows)
        import numpy as np
        import pyarrow.compute as pc

        spans = batch.column("spans").combine_chunks()
        parent = pc.list_parent_indices(spans)
        flat = spans.flatten()
        lens = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
        cum_before = np.cumsum(lens) - lens
        idx = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            cum_before, lens
        )
        return pa.table(
            {
                "url": pc.take(
                    batch.column("url").combine_chunks(), parent
                ).cast(pa.string()),
                "span_idx": pa.array(idx),
                "span_start": flat.field("start").cast(pa.int64()),
                "span_end": flat.field("end").cast(pa.int64()),
                "kind": flat.field("kind").cast(pa.string()),
            }
        )

    ds = extract_dir(_pages_dir_for(sf_dir), batch_size=32)
    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def _url_domain_stats(sf_dir: str):
    """Per-domain rollup of the extraction output (host, n_pages,
    total extracted chars) — oracled against the generator goldens, so
    the driver's hash gate covers extraction volume per domain."""
    from pdf_parser_ray.pipelines.extract import domain_stats

    return domain_stats(_pages_dir_for(sf_dir), batch_size=32)


def _line_dedup(sf_dir: str):
    """Corpus-frequent-line (boilerplate) removal over the extraction
    output; hash-matched end-to-end via md5 of each cleaned page."""
    from pdf_parser_ray.pipelines.extract import line_dedup

    return line_dedup(_pages_dir_for(sf_dir), batch_size=32)


def _host_page_cap(sf_dir: str):
    """Crawl-budget sampling over the extraction output: at most 3 pages
    per host, deterministically ranked — oracled via a window rank over
    the generator goldens."""
    from pdf_parser_ray.pipelines.extract import host_page_cap

    return host_page_cap(_pages_dir_for(sf_dir), batch_size=32)


def _curate_pages(sf_dir: str):
    """End-to-end page curation composition (extract -> exact content
    dedup -> host cap -> quality gate), verdict per url, oracled via
    windows + word aggregates over the generator goldens."""
    from pdf_parser_ray.pipelines.curate import curate_pages

    return curate_pages(_pages_dir_for(sf_dir), batch_size=32)


def _canonical_urls(sf_dir: str):
    """URL canonicalization over the pages corpus (messy variant ->
    canonical form), hash-checked against a full SQL mirror of both
    transforms."""
    from pdf_parser_ray.pipelines.extract import canonical_urls

    return canonical_urls(_pages_dir_for(sf_dir))


def _records_by_direction(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["direction"]).group_by("direction").aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "direction": g.column("direction"),
                "n": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    return (
        _extract_records(sf_dir)
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("direction")
        .aggregate(Sum("n", alias_name="n"))
    )


def _extract_dedup(sf_dir: str):
    """Composition: extraction flagship -> exact content dedup (keep the
    lexicographically-first url per extracted-content hash).  Reads the
    shared extracted artifact (extraction runs once per corpus)."""
    from ray.data.aggregate import Min

    from pdf_parser_ray.pipelines.extract import read_extracted

    ds = read_extracted(
        _pages_dir_for(sf_dir), ["content_sha256", "url"], batch_size=32
    )
    return ds.groupby("content_sha256").aggregate(Min("url", alias_name="url"))


def queries() -> dict[str, Callable[[str], Any]]:
    from pdf_parser_ray.registry import queries as table_queries

    out: dict[str, Callable[[str], Any]] = {
        # -- extraction flagship (not SQL-expressible: HTML/PDF parse;
        # inputs are the synthesized fixture pages corpus) --
        "extract_pages": _extract_pages,
        "extract_records": _extract_records,
        "extract_spans": _extract_spans,
        "records_by_direction": _records_by_direction,
        "extract_dedup": _extract_dedup,
        "url_domain_stats": _url_domain_stats,
        "line_dedup": _line_dedup,
        "host_page_cap": _host_page_cap,
        "canonical_urls": _canonical_urls,
        "curate_pages": _curate_pages,
    }
    # every table operator (analysis / filter / dedup / similarity /
    # cluster / relational / sketch / multimodal) comes from the shared
    # registry — the same map `python -m pdf_parser_ray.job --query`
    # serves from the CLI
    out.update(table_queries())
    # appended AFTER the registry (r05): the gated first-50 order is a
    # contract — new extraction-family queries join the oracle-backed
    # tail, not the gate
    out["extract_tables"] = _extract_tables
    out["extract_links"] = _extract_links
    out["outlink_stats"] = _outlink_stats
    return out


def _direction_case_sql(desc_col: str) -> str:
    """SQL mirror of the ordered direction rule table (len(_RULE_SPECS)
    rules; pdf_parser_ray.functions.directions).  RE2 has no lookahead,
    so the two lookahead rules `X(?!.*Y)` are rewritten exactly:
    Python's re.search matches iff SOME occurrence of X has no Y after
    it, which holds iff the tail after the LAST occurrence of X is
    Y-free — so the SQL strips everything up to the last X with a
    greedy-prefix regexp_replace and tests the remaining tail."""
    from pdf_parser_ray.functions.directions import _RULE_SPECS

    whens = []
    for pat, d in _RULE_SPECS:
        if pat == r"\bPAYPAL\s+(?!.*CREDIT)":
            # tail after the last `\bPAYPAL\s+` must not contain CREDIT
            cond = (
                f"regexp_matches({desc_col}, '(?i)\\bPAYPAL\\s+') "
                f"AND NOT regexp_matches(regexp_replace({desc_col},"
                f" '(?i)^.*\\bPAYPAL\\s+', ''), '(?i)CREDIT')"
            )
        elif pat == r"\bWT\b(?!.*(CHARGE|FEE))":
            # tail after the last `\bWT\b` must not contain CHARGE|FEE
            cond = (
                f"regexp_matches({desc_col}, '(?i)\\bWT\\b') "
                f"AND NOT regexp_matches(regexp_replace({desc_col},"
                f" '(?i)^.*\\bWT\\b', ''), '(?i)(CHARGE|FEE)')"
            )
        else:
            sql_pat = pat.replace("'", "''")
            cond = f"regexp_matches({desc_col}, '(?i){sql_pat}')"
        whens.append(f"WHEN {cond} THEN '{d}'")
    return "CASE " + " ".join(whens) + " ELSE 'unknown' END"


_ORACLE_SF_DIR = "/root/testdata/sf0.01"  # the driver's oracle scale


def _extract_oracle_sql() -> dict[str, str]:
    """Golden-backed oracles for the extraction flagship: the generator
    writes independent per-url goldens (text built from generator
    knowledge, sha256/n_records as plain columns, records exploded to a
    side table) — the SQL just SELECTs them, so the driver's hash gate
    covers the full HTML/PDF extraction path end-to-end."""
    if not os.path.isdir(_ORACLE_SF_DIR):
        return {}
    from pdf_parser_ray.fixtures.gen import golden_paths_for

    tag = os.path.basename(os.path.normpath(_ORACLE_SF_DIR))
    out = os.path.join(_CACHE_ROOT, tag)
    os.makedirs(out, exist_ok=True)
    golden_path, records_path = golden_paths_for(_ORACLE_SF_DIR, out)
    from pdf_parser_ray.fixtures.gen import (
        golden_links_path_for, golden_tables_path_for,
    )

    tables_path = golden_tables_path_for(_ORACLE_SF_DIR, out)
    links_path = golden_links_path_for(_ORACLE_SF_DIR, out)
    from pdf_parser_ray.pipelines.filter import (
        DISTINCT_PCT, MAX_WORDS, MIN_WORDS, TOP_WORD_PCT,
    )

    # Python str.split() treats unicode whitespace (NBSP etc., present in
    # extracted HTML text) as separators; RE2's \s is ASCII-only, so the
    # class lists the unicode whitespace code points explicitly
    ext_words = (
        "list_filter(regexp_split_to_array(extracted_text,"
        " '[\\s\\x{0085}\\x{00A0}\\x{1680}\\x{2000}-\\x{200A}"
        "\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]+'), x -> x <> '')"
    )
    curate_pages_sql = (
        # mirror of curate.curate_pages (cap=3): verdict priority
        # exact_dup > host_cap > low_quality over the goldens
        f"WITH g AS (SELECT url, content_sha256, extracted_text"
        f"   FROM read_parquet('{golden_path}')),"
        f" w AS (SELECT url, unnest({ext_words}) AS word FROM g),"
        " wc AS (SELECT url, word, count(*) AS c FROM w GROUP BY url, word),"
        " agg AS (SELECT url, sum(c) AS n_words, count(*) AS n_distinct,"
        "   max(c) AS top_word_n, sum(c * length(word)) AS swc"
        "   FROM wc GROUP BY url),"
        " q AS (SELECT g.url, CASE"
        f"  WHEN coalesce(a.n_words, 0) < {MIN_WORDS} THEN 1"
        f"  WHEN a.n_words > {MAX_WORDS} THEN 1"
        "  WHEN 10 * a.swc < 20 * a.n_words THEN 1"
        "  WHEN 10 * a.swc > 120 * a.n_words THEN 1"
        f"  WHEN 100 * a.top_word_n > {TOP_WORD_PCT} * a.n_words THEN 1"
        f"  WHEN 100 * a.n_distinct < {DISTINCT_PCT} * a.n_words THEN 1"
        "  ELSE 0 END AS lowq"
        "  FROM g LEFT JOIN agg a ON g.url = a.url),"
        " dup AS (SELECT url, ROW_NUMBER() OVER ("
        "   PARTITION BY content_sha256 ORDER BY url) AS rn FROM g),"
        " h AS (SELECT url, ROW_NUMBER() OVER ("
        "   PARTITION BY regexp_extract(url, '^[a-z]+://([^/]+)', 1)"
        "   ORDER BY content_sha256, url) AS hr FROM g)"
        " SELECT g.url, CASE WHEN dup.rn > 1 THEN 'exact_dup'"
        "  WHEN h.hr > 3 THEN 'host_cap'"
        "  WHEN q.lowq = 1 THEN 'low_quality' ELSE '' END AS verdict"
        " FROM g JOIN dup USING (url) JOIN h USING (url) JOIN q USING (url)"
    )
    return {
        "curate_pages": curate_pages_sql,
        "extract_pages": (
            f"SELECT url, content_type, parser_key, n_records, content_sha256"
            f" FROM read_parquet('{golden_path}')"
        ),
        "extract_records": (
            f"SELECT url, date, description, amount_cents, direction"
            f" FROM read_parquet('{records_path}')"
        ),
        "extract_tables": (
            f"SELECT url, table_idx, row_idx, col_idx, cell"
            f" FROM read_parquet('{tables_path}')"
        ),
        "extract_links": (
            f"SELECT url, link_idx, href, anchor"
            f" FROM read_parquet('{links_path}')"
        ),
        "outlink_stats": (
            "SELECT split_part(url, '/', 3) host,"
            " CAST(count(DISTINCT url) AS BIGINT) n_pages,"
            " CAST(count(*) AS BIGINT) n_links,"
            " CAST(sum(CASE WHEN starts_with(href, '/s') THEN 1 ELSE 0 END)"
            "  AS BIGINT) n_nav,"
            " CAST(sum(CASE WHEN starts_with(href, '/t/') THEN 1 ELSE 0 END)"
            "  AS BIGINT) n_tag"
            f" FROM read_parquet('{links_path}') GROUP BY 1"
        ),
        "extract_spans": (
            "SELECT url, CAST(i - 1 AS BIGINT) AS span_idx,"
            " CAST(spans[CAST(i AS INT)].start AS BIGINT) AS span_start,"
            " CAST(spans[CAST(i AS INT)].\"end\" AS BIGINT) AS span_end,"
            " spans[CAST(i AS INT)].kind AS kind"
            " FROM (SELECT url, spans, unnest(range(1, len(spans) + 1)) AS i"
            f"       FROM read_parquet('{golden_path}'))"
        ),
        "records_by_direction": (
            f"SELECT direction, CAST(count(*) AS BIGINT) AS n"
            f" FROM read_parquet('{records_path}') GROUP BY direction"
        ),
        "extract_dedup": (
            f"SELECT content_sha256, min(url) AS url"
            f" FROM read_parquet('{golden_path}') GROUP BY content_sha256"
        ),
        "url_domain_stats": (
            "SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,"
            " CAST(count(*) AS BIGINT) AS n_pages,"
            " CAST(sum(length(extracted_text)) AS BIGINT) AS total_chars"
            f" FROM read_parquet('{golden_path}') GROUP BY host"
        ),
        "host_page_cap": (
            # mirror of extract.host_page_cap (cap=3): keep at most 3
            # pages per host, ranked by (content_sha256, url)
            "SELECT host, url, host_rank FROM ("
            " SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,"
            " url, CAST(ROW_NUMBER() OVER ("
            "   PARTITION BY regexp_extract(url, '^[a-z]+://([^/]+)', 1)"
            "   ORDER BY content_sha256, url) AS BIGINT) AS host_rank"
            f" FROM read_parquet('{golden_path}'))"
            " WHERE host_rank <= 3"
        ),
        "canonical_urls": (
            # mirror of extract.canonical_urls: the messy-variant
            # synthesis (length % 4 cases) and the canonicalization
            # (lower scheme/host, strip default port, drop utm_*,
            # sort query params)
            "WITH m AS (SELECT url, CASE length(url) % 4"
            "  WHEN 0 THEN url || '?utm_source=feed&b=2&a=1'"
            "  WHEN 1 THEN regexp_extract(url, '^([a-zA-Z]+://)', 1)"
            "    || upper(regexp_extract(url, '^[a-zA-Z]+://([^/?]+)', 1))"
            "    || regexp_extract(url, '^[a-zA-Z]+://[^/?]+(.*)$', 1)"
            "  WHEN 2 THEN regexp_replace(url, '^([a-zA-Z]+://[^/?]+)', '\\1:443')"
            "  ELSE url || '/?z=1&y=2&utm_campaign=x' END AS messy_url"
            f"  FROM read_parquet('{golden_path}')),"
            " c AS (SELECT url, messy_url,"
            "  lower(regexp_extract(messy_url, '^([a-zA-Z]+)://', 1)) AS scheme,"
            "  lower(regexp_extract(messy_url, '^[a-zA-Z]+://([^/?]+)', 1)) AS hostport,"
            "  regexp_extract(messy_url, '^[a-zA-Z]+://[^/?]+([^?]*)', 1) AS path,"
            "  CASE WHEN contains(messy_url, '?')"
            "    THEN regexp_extract(messy_url, '\\?(.*)$', 1) ELSE '' END AS query"
            "  FROM m),"
            " c2 AS (SELECT url, messy_url, scheme, path,"
            "  CASE WHEN scheme = 'https' AND hostport LIKE '%:443'"
            "    THEN substr(hostport, 1, length(hostport) - 4)"
            "   WHEN scheme = 'http' AND hostport LIKE '%:80'"
            "    THEN substr(hostport, 1, length(hostport) - 3)"
            "   ELSE hostport END AS host,"
            # coalesce: array_to_string of an empty list is NULL in DuckDB
            "  coalesce(array_to_string(list_sort(list_filter(string_split(query, '&'),"
            "    p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&'), '') AS q"
            "  FROM c)"
            " SELECT url, messy_url, scheme || '://' || host || path"
            "  || CASE WHEN q = '' THEN '' ELSE '?' || q END AS canonical_url"
            " FROM c2"
        ),
        "line_dedup": (
            # mirror of extract.line_dedup: drop lines appearing >=
            # max(min_count=5, ceil(n_pages / pages_per_boiler=1000))
            # times corpus-wide (the corpus-scaled threshold that
            # bounds the broadcast set), md5 the cleaned page
            f"WITH g AS (SELECT url, extracted_text"
            f"   FROM read_parquet('{golden_path}')),"
            " l AS (SELECT url, i, lines[CAST(i AS INT)] AS line FROM ("
            "   SELECT url, lines, unnest(range(1, len(lines) + 1)) AS i"
            "   FROM (SELECT url, string_split(extracted_text, chr(10))"
            "         AS lines FROM g))),"
            " c AS (SELECT line, count(*) AS n FROM l GROUP BY line),"
            " freq AS (SELECT line FROM c WHERE n >="
            "   greatest(5, ((SELECT count(*) FROM g) + 999) // 1000)),"
            " k AS (SELECT url, i, line FROM l"
            "   WHERE line NOT IN (SELECT line FROM freq)),"
            " agg AS (SELECT url, count(*) AS n_kept,"
            "   md5(string_agg(line, chr(10) ORDER BY i)) AS clean_md5"
            "   FROM k GROUP BY url),"
            " tot AS (SELECT url, count(*) AS n_lines FROM l GROUP BY url)"
            " SELECT g.url, CAST(tot.n_lines AS BIGINT) AS n_lines,"
            " CAST(tot.n_lines - coalesce(agg.n_kept, 0) AS BIGINT)"
            "   AS n_dropped,"
            " coalesce(agg.clean_md5, md5('')) AS clean_md5"
            " FROM g JOIN tot USING (url)"
            " LEFT JOIN agg ON g.url = agg.url"
        ),
    }


def _langid_sql() -> str:
    """SQL mirror of analysis.langid's stopword-profile scorer: per-word
    profile hits / word count, best language = alphabetically-first
    maximum (Python's max(sorted(scores))), confidence truncated to
    millis with the same divide-then-multiply float order."""
    from pdf_parser_ray.pipelines.analysis import _LANG_PROFILES

    langs = sorted(_LANG_PROFILES)
    score_exprs = ", ".join(
        "len(list_filter(words, x -> list_contains("
        + "["
        + ", ".join(f"'{w}'" for w in sorted(_LANG_PROFILES[lang]))
        + f"], x))) AS s_{lang}"
        for lang in langs
    )
    gmax = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    pick = " ".join(
        f"WHEN s_{lang} = gmax THEN '{lang}'" for lang in langs[:-1]
    ) + f" ELSE '{langs[-1]}'"
    return (
        "SELECT doc_id,"
        " CASE WHEN nw = 0 OR gmax = 0 THEN 'und'"
        f" ELSE (CASE {pick} END) END AS lang_pred,"
        " CASE WHEN nw = 0 OR gmax = 0 THEN 0"
        " ELSE CAST(trunc((CAST(gmax AS DOUBLE) / nw) * 1000) AS BIGINT)"
        " END AS confidence_millis"
        " FROM ("
        f"  SELECT doc_id, len(words) AS nw,"
        f"  {', '.join(f's_{lang}' for lang in langs)}, {gmax} AS gmax"
        "   FROM ("
        f"     SELECT doc_id, words, {score_exprs}"
        "     FROM (SELECT doc_id,"
        "       list_filter(regexp_split_to_array(lower(text), '\\s+'),"
        "         x -> x <> '') AS words FROM documents)"
        "   )"
        " )"
    )


_WORDS_EXPR = (
    "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"
)

# per-document word-count CTEs shared by repetition_stats / quality_filter
_WORD_AGG_CTE = (
    f"WITH w AS (SELECT doc_id, unnest({_WORDS_EXPR}) AS word FROM documents),"
    " wc AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY doc_id, word),"
    " agg AS (SELECT doc_id, sum(c) AS n_words, count(*) AS n_distinct,"
    "   max(c) AS top_word_n, sum(c * length(word)) AS swc"
    "   FROM wc GROUP BY doc_id)"
)


def _ngram_sql(k: int = 20) -> str:
    """Mirror of analysis.ngram_stats: corpus-wide bigram counts with
    the same (n DESC, bigram ASC) tie-break at the top-k cutoff."""
    return (
        "SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM ("
        " SELECT words[CAST(i AS INT)] || ' ' || words[CAST(i AS INT) + 1]"
        "   AS bigram"
        " FROM (SELECT words, unnest(range(1, len(words))) AS i"
        f"       FROM (SELECT {_WORDS_EXPR} AS words FROM documents)))"
        f" GROUP BY bigram ORDER BY n DESC, bigram LIMIT {k}"
    )


def _repetition_sql() -> str:
    return (
        f"{_WORD_AGG_CTE}"
        " SELECT d.doc_id,"
        " CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,"
        " CAST(coalesce(a.n_distinct, 0) AS BIGINT) AS n_distinct,"
        " CAST(coalesce(a.top_word_n, 0) AS BIGINT) AS top_word_n"
        " FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id"
    )


def _quality_filter_sql() -> str:
    """Mirror of filter.quality_verdict's ordered integer-arithmetic
    rules (thresholds inlined from pdf_parser_ray.pipelines.filter)."""
    from pdf_parser_ray.pipelines.filter import (
        DISTINCT_PCT, MAX_WORDS, MIN_WORDS, TOP_WORD_PCT,
    )

    return (
        f"{_WORD_AGG_CTE}"
        " SELECT doc_id,"
        " CAST(CASE WHEN reason = 'ok' THEN 1 ELSE 0 END AS BIGINT) AS keep,"
        " reason FROM ("
        " SELECT d.doc_id, CASE"
        f" WHEN coalesce(a.n_words, 0) < {MIN_WORDS} THEN 'too_short'"
        f" WHEN a.n_words > {MAX_WORDS} THEN 'too_long'"
        " WHEN 10 * a.swc < 20 * a.n_words THEN 'short_words'"
        " WHEN 10 * a.swc > 120 * a.n_words THEN 'long_words'"
        f" WHEN 100 * a.top_word_n > {TOP_WORD_PCT} * a.n_words THEN 'repetitive'"
        f" WHEN 100 * a.n_distinct < {DISTINCT_PCT} * a.n_words THEN 'low_diversity'"
        " ELSE 'ok' END AS reason"
        " FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id)"
    )


def _gopher_rules_sql() -> str:
    """Mirror of filter.gopher_rules: the word-level Gopher signals
    (alpha-word fraction, stopword occurrences, symbol-to-word ratio)
    with the ordered first-failing-rule verdict — thresholds AND the
    stopword list interpolated from pdf_parser_ray.pipelines.filter so
    retuning either side desyncs loudly."""
    from pdf_parser_ray.pipelines.filter import (
        ALPHA_WORD_PCT, GOPHER_STOPWORDS, MIN_STOP_HITS,
        SYMBOL_PER_WORD_PCT,
    )

    stoplist = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    return (
        f"WITH w AS (SELECT doc_id, {_WORDS_EXPR} AS words FROM documents),"
        " s AS (SELECT doc_id,"
        "   CAST(len(words) AS BIGINT) AS n_words,"
        "   CAST(len(list_filter(words,"
        "     x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha_words,"
        f"   CAST(len(list_filter(words, x -> lower(x) IN ({stoplist})))"
        "     AS BIGINT) AS stop_hits"
        "   FROM w),"
        " sym AS (SELECT doc_id,"
        "   CAST(length(text) - length(replace(text, '#', ''))"
        "     + length(text) - length(replace(text, '…', ''))"
        "     AS BIGINT) AS symbol_chars FROM documents)"
        " SELECT s.doc_id, s.n_words, s.alpha_words, s.stop_hits,"
        "  sym.symbol_chars,"
        "  CASE WHEN s.n_words = 0 THEN 'empty'"
        f"   WHEN 100 * s.alpha_words < {ALPHA_WORD_PCT} * s.n_words"
        "     THEN 'low_alpha'"
        f"   WHEN s.stop_hits < {MIN_STOP_HITS} THEN 'no_stopwords'"
        f"   WHEN 100 * sym.symbol_chars > {SYMBOL_PER_WORD_PCT} * s.n_words"
        "     THEN 'symbol_heavy'"
        "   ELSE 'ok' END AS reason,"
        "  CAST(CASE WHEN s.n_words > 0"
        f"   AND 100 * s.alpha_words >= {ALPHA_WORD_PCT} * s.n_words"
        f"   AND s.stop_hits >= {MIN_STOP_HITS}"
        f"   AND 100 * sym.symbol_chars <= {SYMBOL_PER_WORD_PCT} * s.n_words"
        "   THEN 1 ELSE 0 END AS BIGINT) AS keep"
        " FROM s JOIN sym USING (doc_id)"
    )


def _pivot_sql() -> str:
    """Mirror of analysis.pivot_source_lang: the CASE-sum pivot over
    the fixed PIVOT_LANGS domain (interpolated, so widening the corpus
    language set desyncs loudly on both sides)."""
    from pdf_parser_ray.pipelines.analysis import PIVOT_LANGS

    cols = ", ".join(
        f"CAST(sum(CASE WHEN lang = '{lang}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS n_{lang}"
        for lang in PIVOT_LANGS
    )
    return (
        f"SELECT source, {cols}, CAST(count(*) AS BIGINT) AS n_total"
        " FROM documents GROUP BY source"
    )


def _bloom_semi_join_sql() -> str:
    """Mirror of join.bloom_semi_join: the PLAIN exact semi-join — the
    Bloom filter on the Ray side is pure scan reduction whose false
    positives the verify join removes, so the oracle needs no bloom at
    all (that independence IS the property under test).  Priority and
    the cents discipline interpolated/shared with lineitem_agg."""
    from pdf_parser_ray.pipelines.join import SEMI_PRIORITY

    return (
        "SELECT l.l_orderkey, CAST(count(*) AS BIGINT) AS n_items,"
        " CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))"
        "   AS BIGINT) AS revenue_cents"
        " FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey"
        f" WHERE o.o_orderpriority = '{SEMI_PRIORITY}'"
        " GROUP BY l.l_orderkey"
    )


def _mixture_tail_sql(rel: str, target: int) -> str:
    """The sqrt-temperature mixture CTE chain over a (doc_id, source)
    relation ``rel``: Hamilton largest-remainder quotas (rem DESC,
    source ASC) and the shuffle-key hash-ring rank within each source.
    Shared by temperature_sample and web_curate; the SHUF_* hash
    constants are interpolated so retuning desyncs loudly.  SQRT/FLOOR
    are the same libm doubles on both sides (the ln-micros
    discipline).  Returns the chain WITHOUT a leading WITH."""
    from pdf_parser_ray.pipelines.pack import (
        SHUF_A1, SHUF_A2, SHUF_B1, SHUF_B2, SHUF_P,
    )

    return (
        "c AS (SELECT source, CAST(count(*) AS BIGINT) AS n"
        f"   FROM {rel} GROUP BY source),"
        " w AS (SELECT source, n,"
        "   CAST(FLOOR(SQRT(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS w"
        "   FROM c),"
        " tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w),"
        f" q0 AS (SELECT source, n, ({target} * w) // tot.tw AS base,"
        f"   ({target} * w) % tot.tw AS rem FROM w, tot),"
        f" lo AS (SELECT CAST({target} - sum(base) AS BIGINT) AS l FROM q0),"
        " q AS (SELECT source, CAST(base + CASE WHEN"
        "   row_number() OVER (ORDER BY rem DESC, source) <= lo.l"
        "   THEN 1 ELSE 0 END AS BIGINT) AS quota FROM q0, lo),"
        " h1 AS (SELECT doc_id, source,"
        f"   ({SHUF_A1} * (doc_id % {SHUF_P}) + {SHUF_B1}) % {SHUF_P} AS k1"
        f"   FROM {rel}),"
        " h2 AS (SELECT doc_id, source,"
        f"   ({SHUF_A2} * (xor(k1, k1 >> 17) % {SHUF_P}) + {SHUF_B2})"
        f"     % {SHUF_P} AS kk FROM h1),"
        " r AS (SELECT doc_id, source, row_number() OVER"
        "   (PARTITION BY source ORDER BY kk, doc_id) AS rn FROM h2)"
        " SELECT r.doc_id, r.source FROM r JOIN q USING (source)"
        " WHERE r.rn <= q.quota"
    )


def _temperature_sample_sql() -> str:
    """Mirror of filter.temperature_sample: the mixture tail over the
    whole documents table, TEMP_TARGET interpolated."""
    from pdf_parser_ray.pipelines.filter import TEMP_TARGET

    return (
        "WITH base AS (SELECT doc_id, source FROM documents), "
        + _mixture_tail_sql("base", TEMP_TARGET)
    )


def _web_curate_sql() -> str:
    """Mirror of curate.web_curate: the gopher + badwords mirrors as
    nested-WITH CTEs gate the corpus, the best-of-duplicates window
    keeps the longest serialization per normalized-md5 group, and the
    shared mixture tail draws WEB_CURATE_TARGET — every constant comes
    from the same module sources as the standalone oracles."""
    from pdf_parser_ray.pipelines.curate import WEB_CURATE_TARGET

    return (
        f"WITH gq AS ({_gopher_rules_sql()}),"
        f" bq AS ({_badwords_sql()}),"
        " surv AS (SELECT d.doc_id, d.source, d.text FROM documents d"
        "   JOIN gq ON gq.doc_id = d.doc_id"
        "   JOIN bq ON bq.doc_id = d.doc_id"
        "   WHERE gq.keep = 1 AND bq.keep = 1),"
        " nn AS (SELECT doc_id, source,"
        "   CAST(length(text) AS BIGINT) AS n_chars,"
        "   md5(trim(regexp_replace(regexp_replace(lower(text),"
        "    '[^a-z0-9 ]+', '', 'g'), ' +', ' ', 'g'), ' ')) AS th"
        "   FROM surv),"
        " win AS (SELECT doc_id, source FROM (SELECT doc_id, source,"
        "   row_number() OVER (PARTITION BY th"
        "     ORDER BY n_chars DESC, doc_id) AS rn FROM nn)"
        "   WHERE rn = 1), "
        + _mixture_tail_sql("win", WEB_CURATE_TARGET)
    )


def _event_funnel_sql() -> str:
    """Mirror of relational.event_funnel: the first-touch conversion
    cascade — min 'view' per user, then min later-step timestamp
    strictly after and within the window of the previous step's anchor.
    FUNNEL_STEPS and FUNNEL_WINDOW_MIN are interpolated so retuning
    either side desyncs loudly; timestamps compare as epoch micros on
    both sides."""
    from pdf_parser_ray.pipelines.relational import (
        FUNNEL_STEPS, FUNNEL_WINDOW_MIN,
    )

    w = FUNNEL_WINDOW_MIN * 60_000_000
    ctes = [
        "s1 AS (SELECT user_id, min(tm) AS t FROM e"
        f" WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id)"
    ]
    for i in range(1, len(FUNNEL_STEPS)):
        ctes.append(
            f"s{i + 1} AS (SELECT e.user_id, min(e.tm) AS t FROM e"
            f" JOIN s{i} ON s{i}.user_id = e.user_id"
            f" AND e.tm > s{i}.t AND e.tm <= s{i}.t + {w}"
            f" WHERE e.event_type = '{FUNNEL_STEPS[i]}' GROUP BY e.user_id)"
        )
    selects = " UNION ALL ".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS step_idx, '{s}' AS step,"
        f" CAST(count(*) AS BIGINT) AS n_users FROM s{i + 1}"
        for i, s in enumerate(FUNNEL_STEPS)
    )
    return (
        "WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tm"
        " FROM events), " + ", ".join(ctes) + " " + selects
    )


def _sales_opportunity_sql() -> str:
    """Mirror of relational.sales_opportunity: cents via the same
    round(×100) cast, the above-mean gate as the same integer
    cross-multiplication (never a float AVG), and the anti-join as
    NOT EXISTS.  OPPORTUNITY_PRIORITY is interpolated."""
    from pdf_parser_ray.pipelines.relational import OPPORTUNITY_PRIORITY

    return (
        "WITH cc AS (SELECT c_custkey, c_mktsegment,"
        "   CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer),"
        " pos AS (SELECT CAST(sum(cents) AS BIGINT) AS s,"
        "   CAST(count(*) AS BIGINT) AS n FROM cc WHERE cents > 0),"
        " el AS (SELECT cc.* FROM cc, pos WHERE cents * pos.n > pos.s"
        "   AND NOT EXISTS (SELECT 1 FROM orders o"
        "     WHERE o.o_custkey = cc.c_custkey"
        f"     AND o.o_orderpriority = '{OPPORTUNITY_PRIORITY}'))"
        " SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,"
        "  CAST(sum(cents) AS BIGINT) AS sum_acctbal_cents"
        " FROM el GROUP BY c_mktsegment"
    )


def _hourly_anomalies_sql() -> str:
    """Mirror of relational.hourly_anomalies: hourly counts per type,
    then the division-free |x−μ|>2σ integer inequality
    (H·x − S)² > 4·(Q·H − S²) — identical integer algebra, no float
    mean/stddev on either side."""
    return (
        "WITH h AS (SELECT event_type,"
        "   epoch_us(date_trunc('hour', ts)) AS hour_us,"
        "   CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),"
        " s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS hh,"
        "   CAST(sum(n) AS BIGINT) AS s,"
        "   CAST(sum(n * n) AS BIGINT) AS q FROM h GROUP BY 1)"
        " SELECT h.event_type, h.hour_us, h.n"
        " FROM h JOIN s USING (event_type)"
        " WHERE (s.hh * h.n - s.s) * (s.hh * h.n - s.s)"
        "   > 4 * (s.q * s.hh - s.s * s.s)"
    )


def _part_affinity_sql() -> str:
    """Mirror of relational.part_affinity: distinct (order, part) lines,
    the self-join pair count, and the deterministic
    (n DESC, part_a, part_b) top-k cut — PART_AFFINITY_K interpolated."""
    from pdf_parser_ray.pipelines.relational import PART_AFFINITY_K

    return (
        "WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),"
        " p AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,"
        "   CAST(count(*) AS BIGINT) AS n_orders"
        "   FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey"
        "   AND a.l_partkey < b.l_partkey GROUP BY 1, 2)"
        " SELECT * FROM p ORDER BY n_orders DESC, part_a, part_b"
        f" LIMIT {PART_AFFINITY_K}"
    )


def _large_orders_sql() -> str:
    """Mirror of relational.large_orders (TPC-H Q18 shape): per-line
    round(×100) quantity cents summed per order, the strict > threshold
    gate (LARGE_ORDER_MIN_QTY_CENTS interpolated), customer name via
    the same inner joins."""
    from pdf_parser_ray.pipelines.relational import LARGE_ORDER_MIN_QTY_CENTS

    return (
        "WITH q AS (SELECT l_orderkey,"
        "   CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)"
        "     AS sum_qty_cents FROM lineitem GROUP BY 1)"
        " SELECT o.o_orderkey, c.c_custkey, c.c_name,"
        "  CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,"
        "  q.sum_qty_cents"
        " FROM q JOIN orders o ON o.o_orderkey = q.l_orderkey"
        " JOIN customer c ON c.c_custkey = o.o_custkey"
        f" WHERE q.sum_qty_cents > {LARGE_ORDER_MIN_QTY_CENTS}"
    )


def _promo_revenue_share_sql() -> str:
    """Mirror of relational.promo_revenue_share (TPC-H Q14 shape):
    identical integer rev_cc = price_cents × (100 − disc_pct), yyyymm
    ship month, inner join to part, and the share as HUGEINT
    floor-division micros (the pipeline uses Python ints — both exact)."""
    return (
        "WITH l AS (SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate)"
        "     AS BIGINT) AS ship_month, l_partkey,"
        "   CAST(round(l_extendedprice * 100) AS BIGINT)"
        "     * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_cc"
        "   FROM lineitem),"
        " m AS (SELECT ship_month,"
        "   CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%' THEN rev_cc"
        "     ELSE 0 END) AS BIGINT) AS promo_rev_cc,"
        "   CAST(sum(rev_cc) AS BIGINT) AS total_rev_cc"
        "   FROM l JOIN part p ON p.p_partkey = l.l_partkey GROUP BY 1)"
        " SELECT ship_month, promo_rev_cc, total_rev_cc,"
        "  CAST((CAST(promo_rev_cc AS HUGEINT) * 1000000)"
        "    // total_rev_cc AS BIGINT) AS promo_share_micros FROM m"
    )


def _returned_items_sql() -> str:
    """Mirror of relational.returned_items (TPC-H Q10 shape): the same
    integer rev_cc on the 'R' slice, customer totals via the same inner
    joins, and the deterministic (revenue DESC, custkey ASC) top-k cut
    — RETURNED_TOP_K interpolated."""
    from pdf_parser_ray.pipelines.relational import RETURNED_TOP_K

    return (
        "WITH r AS (SELECT l_orderkey,"
        "   CAST(round(l_extendedprice * 100) AS BIGINT)"
        "     * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_cc"
        "   FROM lineitem WHERE l_returnflag = 'R'),"
        " t AS (SELECT o.o_custkey,"
        "   CAST(sum(rev_cc) AS BIGINT) AS revenue_cc"
        "   FROM r JOIN orders o ON o.o_orderkey = r.l_orderkey GROUP BY 1)"
        " SELECT c.c_custkey, c.c_name, n.n_name, t.revenue_cc"
        " FROM t JOIN customer c ON c.c_custkey = t.o_custkey"
        " JOIN nation n ON n.n_nationkey = c.c_nationkey"
        " ORDER BY t.revenue_cc DESC, c.c_custkey"
        f" LIMIT {RETURNED_TOP_K}"
    )


def _top_words_sql() -> str:
    """Mirror of analysis.top_words: corpus-wide word counts over the
    shared _WORDS_EXPR split and the same (n DESC, word ASC)
    deterministic cut — TOP_WORDS_K interpolated."""
    from pdf_parser_ray.pipelines.analysis import TOP_WORDS_K

    return (
        f"WITH w AS (SELECT unnest({_WORDS_EXPR}) AS word FROM documents),"
        " c AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM w"
        "   GROUP BY 1)"
        " SELECT word, n FROM c ORDER BY n DESC, word"
        f" LIMIT {TOP_WORDS_K}"
    )


def _rrf_fusion_sql() -> str:
    """Mirror of analysis.rrf_fusion: the _bm25_sql integer BM25 form
    plus the plain tf·idf score from the SAME tf/df CTEs, row_number
    rankings on (score DESC, doc_id), the top-R cut, FULL OUTER fusion
    with 10⁶ // (K + r), and the deterministic (rrf DESC, doc_id)
    LIMIT — RRF_K / RRF_TOPR / RRF_OUT_K and the query terms all
    interpolated so retuning desyncs loudly."""
    from pdf_parser_ray.pipelines.analysis import (
        BM25_QUERY, RRF_K, RRF_OUT_K, RRF_TOPR,
    )

    tf_cols = ", ".join(
        f"CAST(len(list_filter(words, x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(BM25_QUERY)
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df{i}"
        for i in range(len(BM25_QUERY))
    )
    bm25_terms = " + ".join(
        f"(CAST(FLOOR(LN(1 + (g.N - g.df{i} + 0.5) / (g.df{i} + 0.5))"
        f" * 1000000) AS BIGINT) * tf{i} * 20000)"
        f" // (8000 * tf{i} + 3000"
        " + 9 * ((dl * 1000000) // ((1000 * g.W) // g.N)))"
        for i in range(len(BM25_QUERY))
    )
    plain_terms = " + ".join(
        f"CAST(FLOOR(LN(g.N / GREATEST(g.df{i}, 1)) * 1000000) AS BIGINT)"
        f" * tf{i}"
        for i in range(len(BM25_QUERY))
    )
    return (
        f"WITH w AS (SELECT doc_id, {_WORDS_EXPR} AS words FROM documents),"
        f" d AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS dl, {tf_cols}"
        "   FROM w),"
        " g AS (SELECT CAST(sum(dl) AS BIGINT) AS W,"
        f"  CAST(count(*) AS BIGINT) AS N, {df_cols} FROM d),"
        f" s AS (SELECT d.doc_id, CAST({bm25_terms} AS BIGINT) AS bm25,"
        f"  CAST({plain_terms} AS BIGINT) AS plain FROM d, g),"
        " b AS (SELECT doc_id, row_number() OVER"
        "   (ORDER BY bm25 DESC, doc_id) AS r FROM s),"
        " t AS (SELECT doc_id, row_number() OVER"
        "   (ORDER BY plain DESC, doc_id) AS r FROM s),"
        f" br AS (SELECT * FROM b WHERE r <= {RRF_TOPR}),"
        f" tr AS (SELECT * FROM t WHERE r <= {RRF_TOPR}),"
        " f AS (SELECT coalesce(br.doc_id, tr.doc_id) AS doc_id,"
        "   CAST(coalesce(br.r, 0) AS BIGINT) AS bm25_rank,"
        "   CAST(coalesce(tr.r, 0) AS BIGINT) AS tfidf_rank,"
        f"   CAST(coalesce(1000000 // ({RRF_K} + br.r), 0)"
        f"    + coalesce(1000000 // ({RRF_K} + tr.r), 0) AS BIGINT)"
        "     AS rrf_micros"
        "   FROM br FULL OUTER JOIN tr ON br.doc_id = tr.doc_id)"
        " SELECT doc_id, bm25_rank, tfidf_rank, rrf_micros FROM f"
        f" ORDER BY rrf_micros DESC, doc_id LIMIT {RRF_OUT_K}"
    )


def _events_dau_wau_sql() -> str:
    """Mirror of relational.events_dau_wau: distinct (epoch-day, user)
    pairs, the trailing WAU_WINDOW_DAYS window joined over days that
    exist in the data, DAU as the own-day flag, and the stickiness
    ratio as the same integer floor division."""
    from pdf_parser_ray.pipelines.relational import WAU_WINDOW_DAYS

    day = 86_400_000_000
    back = WAU_WINDOW_DAYS - 1
    return (
        "WITH p AS (SELECT DISTINCT"
        f"   CAST(epoch_us(ts) // {day} AS BIGINT) AS d, user_id"
        "   FROM events),"
        " days AS (SELECT DISTINCT d FROM p),"
        " w AS (SELECT days.d AS w, p.user_id,"
        "   max(CASE WHEN p.d = days.d THEN 1 ELSE 0 END) AS own"
        f"   FROM days JOIN p ON p.d BETWEEN days.d - {back} AND days.d"
        "   GROUP BY 1, 2),"
        " s AS (SELECT w, CAST(sum(own) AS BIGINT) AS dau,"
        "   CAST(count(*) AS BIGINT) AS wau FROM w GROUP BY 1)"
        f" SELECT w * {day} AS day_us, dau, wau,"
        "  CAST((dau * 1000000) // wau AS BIGINT) AS stickiness_micros"
        " FROM s"
    )


def _profile_documents_sql() -> str:
    """Mirror of analysis.profile_documents: per-column null count and
    exact COUNT(DISTINCT) over the same PROFILE_COLUMNS — the
    pipeline's 64-bit value hashes never reach the output, and the
    hash-match evidences collision-free profiling at the oracle
    scale."""
    from pdf_parser_ray.pipelines.analysis import PROFILE_COLUMNS

    parts = [
        f"SELECT '{c}' AS col,"
        f" CAST(count(*) FILTER ({c} IS NULL) AS BIGINT) AS n_null,"
        f" CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct"
        " FROM documents"
        for c in PROFILE_COLUMNS
    ]
    return " UNION ALL ".join(parts)


def _gram_novelty_sql() -> str:
    """Mirror of analysis.gram_novelty: DISTINCT word-8-grams per doc
    (same inclusive-slice construction as _decontaminate_sql, n
    interpolated), gram TEXT grouped for the min-doc first-seen rule —
    the pipeline's 64-bit gram hash never reaches the output, and the
    hash-match evidences collision-free grams at the oracle scale.
    LEFT JOIN keeps gram-less short docs at (0, 0)."""
    from pdf_parser_ray.pipelines.analysis import NOVELTY_NGRAM

    n = NOVELTY_NGRAM
    return (
        f"WITH w AS (SELECT doc_id, {_WORDS_EXPR} AS w FROM documents),"
        " g AS (SELECT DISTINCT doc_id,"
        f"   array_to_string(w[CAST(i AS INT):CAST(i AS INT) + {n - 1}], ' ')"
        "     AS g"
        f"   FROM (SELECT doc_id, w, unnest(range(1, len(w) - {n - 2})) AS i"
        "         FROM w)),"
        " m AS (SELECT g, min(doc_id) AS first_doc FROM g GROUP BY 1),"
        " s AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,"
        "   CAST(sum(CASE WHEN m.first_doc = g.doc_id THEN 1 ELSE 0 END)"
        "     AS BIGINT) AS n_novel"
        "   FROM g JOIN m USING (g) GROUP BY 1)"
        " SELECT d.doc_id, CAST(coalesce(s.n_grams, 0) AS BIGINT) AS n_grams,"
        "  CAST(coalesce(s.n_novel, 0) AS BIGINT) AS n_novel"
        " FROM documents d LEFT JOIN s USING (doc_id)"
    )


def _source_vocab_overlap_sql() -> str:
    """Mirror of analysis.source_vocab_overlap: per-(source, word)
    counts, shared-mass sum(least) per pair, and the union-mass
    identity n_a + n_b − sum_min as the Ruzicka denominator — the
    same integer floor-division micros as the pipeline.  The word
    split is the shared _WORDS_EXPR (≡ Python str.split)."""
    return (
        f"WITH w AS (SELECT source, unnest({_WORDS_EXPR}) AS w"
        "   FROM documents),"
        " f AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c"
        "   FROM w GROUP BY 1, 2),"
        " n AS (SELECT source, CAST(sum(c) AS BIGINT) AS c FROM f"
        "   GROUP BY 1),"
        " p AS (SELECT a.source AS sa, b.source AS sb,"
        "   CAST(sum(least(a.c, b.c)) AS BIGINT) AS smin"
        "   FROM f a JOIN f b ON a.w = b.w AND a.source < b.source"
        "   GROUP BY 1, 2)"
        " SELECT p.sa AS source_a, p.sb AS source_b, p.smin AS sum_min,"
        "  na.c AS n_a, nb.c AS n_b,"
        "  (1000000 * p.smin) // (na.c + nb.c - p.smin) AS ruzicka_micros"
        " FROM p JOIN n na ON na.source = p.sa"
        " JOIN n nb ON nb.source = p.sb"
    )


def _host_edges_expr() -> str:
    """Shared edge-synthesis CTE body for the host-graph mirrors: the
    same integer formula graph.py::_edge_partials computes."""
    from pdf_parser_ray.pipelines.graph import PR_FANOUT, PR_NODES

    ks = ", ".join(str(k) for k in range(1, PR_FANOUT + 1))
    return (
        f"e0 AS (SELECT (doc_id % {PR_NODES}) AS src,"
        f" ((doc_id // {PR_NODES} + k.k * (doc_id % {PR_NODES})"
        f"   + k.k * k.k) % {PR_NODES}) AS dst"
        f" FROM documents CROSS JOIN (SELECT unnest([{ks}]) AS k) k),"
        " e AS (SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT)"
        "   AS dst, CAST(count(*) AS BIGINT) AS w FROM e0"
        "   GROUP BY src, dst)"
    )


def _host_graph_edges_sql() -> str:
    """Mirror of graph.host_graph_edges: the deterministic doc_id →
    (src, dst) host-edge formula aggregated to weights."""
    return f"WITH {_host_edges_expr()} SELECT src, dst, w FROM e"


def _host_degree_sql() -> str:
    """Mirror of graph.host_degree_stats: distinct undirected simple
    edges (least/greatest, self-loops dropped), per-node degree with
    isolated hosts at 0, grouped to a histogram."""
    from pdf_parser_ray.pipelines.graph import PR_NODES

    return (
        f"WITH {_host_edges_expr()},"
        " u AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst)"
        "   AS b FROM e WHERE src <> dst),"
        " d AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM"
        "   (SELECT a AS node FROM u UNION ALL SELECT b FROM u)"
        "   GROUP BY node),"
        f" nodes AS (SELECT CAST(unnest(range({PR_NODES})) AS BIGINT)"
        "   AS node),"
        " dd AS (SELECT coalesce(d.deg, 0) AS degree FROM nodes"
        "   LEFT JOIN d USING (node))"
        " SELECT degree, CAST(count(*) AS BIGINT) AS n_hosts"
        " FROM dd GROUP BY degree"
    )


def _host_clustering_sql() -> str:
    """Mirror of graph.host_clustering: ordered wedge join
    (n1.y < n2.y) closed against the low-high edge set counts each
    triangle at v exactly once; cc = (2·tri·1e6) // (deg·(deg−1))
    floored, 0 below degree 2."""
    from pdf_parser_ray.pipelines.graph import PR_NODES

    return (
        f"WITH {_host_edges_expr()},"
        " u AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst)"
        "   AS b FROM e WHERE src <> dst),"
        " adj AS (SELECT a AS x, b AS y FROM u"
        "   UNION ALL SELECT b, a FROM u),"
        " d AS (SELECT x AS node, CAST(count(*) AS BIGINT) AS deg"
        "   FROM adj GROUP BY x),"
        " t AS (SELECT n1.x AS node, CAST(count(*) AS BIGINT) AS tri"
        "   FROM adj n1 JOIN adj n2 ON n1.x = n2.x AND n1.y < n2.y"
        "   JOIN u ON u.a = n1.y AND u.b = n2.y GROUP BY n1.x),"
        f" nodes AS (SELECT CAST(unnest(range({PR_NODES})) AS BIGINT)"
        "   AS node)"
        " SELECT node, CAST(coalesce(d.deg, 0) AS BIGINT) AS degree,"
        "  CAST(coalesce(t.tri, 0) AS BIGINT) AS n_tri,"
        "  CAST(CASE WHEN coalesce(d.deg, 0) >= 2 THEN"
        "   (2 * coalesce(t.tri, 0) * 1000000)"
        "     // (d.deg * (d.deg - 1)) ELSE 0 END AS BIGINT) AS cc_micros"
        " FROM nodes LEFT JOIN d USING (node) LEFT JOIN t USING (node)"
    )


def _pagerank_sql() -> str:
    """Mirror of graph.pagerank_hosts: the SAME integer power iteration
    unrolled as PR_ITERS chained CTEs — per-edge floored contribution
    (products via HUGEINT, division by 20·out(u)), teleport base added
    per node, dangling mass leaked.  Every constant is interpolated
    from pdf_parser_ray.pipelines.graph so retuning desyncs loudly."""
    from pdf_parser_ray.pipelines.graph import (
        PR_DAMP_DEN, PR_DAMP_NUM, PR_ITERS, PR_NODES, PR_SCALE,
    )

    base = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // (PR_DAMP_DEN * PR_NODES)
    r0 = PR_SCALE // PR_NODES
    sql = (
        f"WITH {_host_edges_expr()},"
        " o AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM e"
        "   GROUP BY src),"
        f" nodes AS (SELECT CAST(unnest(range({PR_NODES})) AS BIGINT)"
        "   AS node),"
        f" r0 AS (SELECT node, CAST({r0} AS BIGINT) AS pr FROM nodes)"
    )
    for i in range(PR_ITERS):
        sql += (
            f", c{i + 1} AS (SELECT e.dst AS node,"
            f" CAST(SUM((CAST({PR_DAMP_NUM} AS HUGEINT) * r{i}.pr * e.w)"
            f" // (CAST({PR_DAMP_DEN} AS HUGEINT) * o.outw)) AS BIGINT)"
            " AS c"
            f" FROM e JOIN o USING (src) JOIN r{i} ON r{i}.node = e.src"
            " GROUP BY e.dst)"
            f", r{i + 1} AS (SELECT n.node,"
            f" CAST({base} + coalesce(c{i + 1}.c, 0) AS BIGINT) AS pr"
            f" FROM nodes n LEFT JOIN c{i + 1} ON c{i + 1}.node = n.node)"
        )
    return sql + (
        " SELECT n.node, CAST(coalesce(o.outw, 0) AS BIGINT) AS out_w,"
        f" r{PR_ITERS}.pr AS rank_scaled"
        " FROM nodes n LEFT JOIN o ON o.src = n.node"
        f" JOIN r{PR_ITERS} ON r{PR_ITERS}.node = n.node"
    )


def _doc_host_rank_sql() -> str:
    """Mirror of graph.doc_host_rank: the full pagerank mirror as a
    nested-WITH CTE, joined back onto documents on the host formula."""
    from pdf_parser_ray.pipelines.graph import PR_NODES

    return (
        f"WITH pr AS ({_pagerank_sql()})"
        " SELECT d.doc_id, pr.node, pr.rank_scaled FROM documents d"
        f" JOIN pr ON pr.node = d.doc_id % {PR_NODES}"
    )


def _host_triangles_sql() -> str:
    """Mirror of graph.host_triangles: undirect + dedupe the edge
    formula, then the oriented wedge join — e1 = (a, b1), e2 = (a, b2)
    with b1 < b2, closed by e3 = (b1, b2) — counts each triangle once
    at its smallest vertex; wedges from the degree counts."""
    return (
        f"WITH {_host_edges_expr()},"
        " u AS (SELECT DISTINCT least(src, dst) AS a,"
        "   greatest(src, dst) AS b FROM e WHERE src <> dst),"
        " d AS (SELECT node, count(*) AS deg FROM"
        "   (SELECT a AS node FROM u UNION ALL SELECT b FROM u)"
        "   GROUP BY 1),"
        " t AS (SELECT count(*) AS tri FROM u e1"
        "   JOIN u e2 ON e2.a = e1.a AND e2.b > e1.b"
        "   JOIN u e3 ON e3.a = e1.b AND e3.b = e2.b),"
        " s AS (SELECT (SELECT count(*) FROM d) AS n_nodes,"
        "   (SELECT count(*) FROM u) AS n_edges,"
        "   (SELECT sum(deg * (deg - 1) // 2) FROM d) AS n_wedges,"
        "   (SELECT tri FROM t) AS n_triangles)"
        " SELECT CAST(n_nodes AS BIGINT) AS n_nodes,"
        "  CAST(n_edges AS BIGINT) AS n_edges,"
        "  CAST(n_wedges AS BIGINT) AS n_wedges,"
        "  CAST(n_triangles AS BIGINT) AS n_triangles,"
        "  CAST(CASE WHEN n_wedges = 0 THEN 0 ELSE"
        "   (3 * n_triangles * 1000000) // n_wedges END AS BIGINT)"
        "   AS transitivity_micros FROM s"
    )


def _knn_mmr_sql() -> str:
    """Mirror of similarity.knn_mmr: the greedy MMR selection unrolled
    as K chained CTEs — pool by trunc-millis relevance (same ORDER BY
    r DESC, vec_id LIMIT pool boundary as the Ray sort), pairwise
    trunc-millis sims, then step i picks argmax(7·r − 3·max sim to the
    already-selected set) with a vec_id tie-break.  Every constant
    interpolated from pdf_parser_ray.pipelines.similarity so retuning
    desyncs loudly."""
    from pdf_parser_ray.pipelines.similarity import (
        MMR_K, MMR_LAMBDA_COMP, MMR_LAMBDA_NUM, MMR_POOL,
    )

    parts = [
        "WITH vv AS (SELECT vec_id,"
        " list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e"
        " FROM embeddings),"
        " qv AS (SELECT e FROM vv WHERE vec_id = 0),"
        " rel AS (SELECT vv.vec_id,"
        "   CAST(trunc(list_cosine_similarity(vv.e, qv.e) * 1000)"
        "     AS BIGINT) AS r"
        "   FROM vv, qv WHERE vv.vec_id <> 0),"
        " pool AS MATERIALIZED (SELECT rel.vec_id, rel.r, vv.e"
        "   FROM rel JOIN vv USING (vec_id)"
        f"   ORDER BY rel.r DESC, rel.vec_id LIMIT {MMR_POOL}),"
        " p AS MATERIALIZED (SELECT a.vec_id AS ia, b.vec_id AS ib,"
        "   CAST(trunc(list_cosine_similarity(a.e, b.e) * 1000)"
        "     AS BIGINT) AS s"
        "   FROM pool a JOIN pool b ON a.vec_id <> b.vec_id),"
        f" sel1 AS MATERIALIZED (SELECT vec_id, 1 AS sel_rank, {MMR_LAMBDA_NUM} * r"
        "   AS score FROM pool"
        f"   ORDER BY {MMR_LAMBDA_NUM} * r DESC, vec_id LIMIT 1),"
        " selall1 AS MATERIALIZED (SELECT vec_id FROM sel1)",
    ]
    for i in range(2, MMR_K + 1):
        parts.append(
            f", sel{i} AS MATERIALIZED (SELECT c.vec_id, {i} AS sel_rank,"
            f"   {MMR_LAMBDA_NUM} * c.r - {MMR_LAMBDA_COMP} * max(p.s)"
            "    AS score"
            "   FROM pool c JOIN p ON p.ia = c.vec_id"
            f"   JOIN selall{i - 1} sa ON p.ib = sa.vec_id"
            "   WHERE c.vec_id NOT IN"
            f"     (SELECT vec_id FROM selall{i - 1})"
            "   GROUP BY c.vec_id, c.r"
            "   ORDER BY score DESC, c.vec_id LIMIT 1),"
            f" selall{i} AS MATERIALIZED (SELECT vec_id FROM selall{i - 1}"
            f"   UNION ALL SELECT vec_id FROM sel{i})"
        )
    union = " UNION ALL ".join(
        f"SELECT * FROM sel{i}" for i in range(1, MMR_K + 1)
    )
    return "".join(parts) + (
        f" SELECT CAST(sel_rank AS BIGINT) AS rank, vec_id,"
        f" CAST(score AS BIGINT) AS mmr_score FROM ({union})"
    )


def _bm25_sql() -> str:
    """Mirror of analysis.bm25_scores: the all-integer Okapi BM25 form
    (k1=3/2, b=3/4 multiplied through by 8000, milli-quantized
    dl/avgdl, Lucene idf floored to micros) with the query terms
    interpolated from pdf_parser_ray.pipelines.analysis.BM25_QUERY so
    retuning the query desyncs loudly.  Every intermediate is positive,
    so DuckDB's truncating // is a true floor, matching numpy."""
    from pdf_parser_ray.pipelines.analysis import BM25_QUERY

    tf_cols = ", ".join(
        f"CAST(len(list_filter(words, x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(BM25_QUERY)
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df{i}"
        for i in range(len(BM25_QUERY))
    )
    # tf = 0 zeroes the numerator, so no CASE is needed (same as the
    # np.where on the Ray side, which is equally redundant but explicit)
    terms = " + ".join(
        f"(CAST(FLOOR(LN(1 + (g.N - g.df{i} + 0.5) / (g.df{i} + 0.5))"
        f" * 1000000) AS BIGINT) * tf{i} * 20000)"
        f" // (8000 * tf{i} + 3000"
        " + 9 * ((dl * 1000000) // ((1000 * g.W) // g.N)))"
        for i in range(len(BM25_QUERY))
    )
    return (
        f"WITH w AS (SELECT doc_id, {_WORDS_EXPR} AS words FROM documents),"
        f" d AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS dl, {tf_cols}"
        "   FROM w),"
        " g AS (SELECT CAST(sum(dl) AS BIGINT) AS W,"
        f"  CAST(count(*) AS BIGINT) AS N, {df_cols} FROM d)"
        " SELECT d.doc_id, d.dl AS n_words,"
        f" CAST({terms} AS BIGINT) AS bm25_micros"
        " FROM d, g"
    )


def _badwords_sql() -> str:
    """Mirror of filter.badwords_filter: hard/soft flagged-word counts
    over the whitespace word split with the ordered verdict — both word
    lists and the percentage threshold interpolated from
    pdf_parser_ray.pipelines.filter so retuning either side desyncs
    loudly."""
    from pdf_parser_ray.pipelines.filter import (
        BAD_WORD_PCT, BADWORDS_HARD, BADWORDS_SOFT,
    )

    hard = ", ".join(f"'{w}'" for w in BADWORDS_HARD)
    soft = ", ".join(f"'{w}'" for w in BADWORDS_SOFT)
    return (
        f"WITH w AS (SELECT doc_id, {_WORDS_EXPR} AS words FROM documents),"
        " s AS (SELECT doc_id,"
        "   CAST(len(words) AS BIGINT) AS n_words,"
        f"   CAST(len(list_filter(words, x -> lower(x) IN ({hard})))"
        "     AS BIGINT) AS hard_hits,"
        f"   CAST(len(list_filter(words, x -> lower(x) IN ({soft})))"
        "     AS BIGINT) AS soft_hits"
        "   FROM w)"
        " SELECT doc_id, n_words, hard_hits, soft_hits,"
        "  CASE WHEN n_words = 0 THEN 'empty'"
        "   WHEN hard_hits > 0 THEN 'hard_bad'"
        f"   WHEN 100 * soft_hits > {BAD_WORD_PCT} * n_words"
        "     THEN 'bad_fraction'"
        "   ELSE 'ok' END AS reason,"
        "  CAST(CASE WHEN n_words > 0 AND hard_hits = 0"
        f"   AND 100 * soft_hits <= {BAD_WORD_PCT} * n_words"
        "   THEN 1 ELSE 0 END AS BIGINT) AS keep"
        " FROM s"
    )


def _length_outlier_sql() -> str:
    """Mirror of filter.length_outlier_filter: DuckDB's quantile_disc
    uses the same 1-based max(1, ceil(q*n)) rank rule as
    filter.length_quantile_bounds (the event_quantiles contract,
    relational.py:448), so the [lo, hi] band agrees exactly."""
    from pdf_parser_ray.pipelines.filter import LEN_Q_HI_PCT, LEN_Q_LO_PCT

    return (
        f"WITH n AS (SELECT doc_id, CAST(len({_WORDS_EXPR}) AS BIGINT)"
        "   AS n_words FROM documents),"
        " b AS (SELECT"
        f"   quantile_disc(n_words, {LEN_Q_LO_PCT / 100}) AS lo,"
        f"   quantile_disc(n_words, {LEN_Q_HI_PCT / 100}) AS hi FROM n)"
        " SELECT doc_id, n_words,"
        "  CAST(CASE WHEN n_words BETWEEN b.lo AND b.hi THEN 1 ELSE 0 END"
        "    AS BIGINT) AS keep"
        " FROM n, b"
    )


def _best_of_dup_sql() -> str:
    """Mirror of dedup.best_of_duplicates over the same deterministic
    re-serialization variant corpus (dedup.BEST_OF_VARIANT_OFFSET, the
    %3 upper-cased clones with the %9 same-length tie case):
    normalized-md5 groups keep the LONGEST raw text, doc_id ascending
    breaking ties."""
    from pdf_parser_ray.pipelines.dedup import BEST_OF_VARIANT_OFFSET

    return (
        "WITH corpus AS ("
        "  SELECT doc_id, text FROM documents"
        "  UNION ALL"
        f"  SELECT doc_id + {BEST_OF_VARIANT_OFFSET},"
        "   CASE WHEN doc_id % 9 = 0 THEN upper(text)"
        "    ELSE upper(text) || ' !!' END"
        "  FROM documents WHERE doc_id % 3 = 0),"
        " n AS (SELECT doc_id,"
        "   CAST(length(text) AS BIGINT) AS n_chars,"
        "   md5(trim(regexp_replace(regexp_replace(lower(text),"
        "    '[^a-z0-9 ]+', '', 'g'), ' +', ' ', 'g'), ' ')) AS text_hash"
        "   FROM corpus),"
        " r AS (SELECT text_hash, doc_id, n_chars,"
        "   CAST(count(*) OVER (PARTITION BY text_hash) AS BIGINT)"
        "     AS n_members,"
        "   row_number() OVER (PARTITION BY text_hash"
        "     ORDER BY n_chars DESC, doc_id) AS rn FROM n)"
        " SELECT text_hash, doc_id, n_chars, n_members FROM r WHERE rn = 1"
    )


def _source_quality_sql() -> str:
    """Mirror of filter.source_quality_filter: the per-document rule
    CASE aggregated per source, integer ok-rate threshold."""
    from pdf_parser_ray.pipelines.filter import SOURCE_MIN_OK_PCT

    return (
        f"WITH q AS ({_quality_filter_sql()})"
        " SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,"
        "  CAST(sum(q.keep) AS BIGINT) AS n_ok,"
        f"  CAST(CASE WHEN 100 * sum(q.keep) >= {SOURCE_MIN_OK_PCT}"
        "    * count(*) THEN 1 ELSE 0 END AS BIGINT) AS keep"
        " FROM documents d JOIN q ON d.doc_id = q.doc_id"
        " GROUP BY d.source"
    )


def _pii_sql() -> str:
    """Mirror of filter.pii_scrub over the same synthesized contact
    lines; counts on the original, then SSN -> phone -> email
    replacement (left-to-right non-overlapping in both re and RE2)."""
    ssn = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
    phone = "\\b\\d{3}-\\d{4}\\b"
    email = "[A-Za-z0-9_.]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    synth = (
        "concat_ws(' ',"
        " CASE WHEN doc_id % 2 = 0 THEN 'EMAIL user' || doc_id || '@mail'"
        "   || (doc_id % 7) || '.example' END,"
        " CASE WHEN doc_id % 3 = 0 THEN 'CALL ' || (200 + doc_id % 800)"
        "   || '-' || (1000 + doc_id % 9000) END,"
        " CASE WHEN doc_id % 5 = 0 THEN 'SSN ' || (100 + doc_id % 900)"
        "   || '-' || (10 + doc_id % 90) || '-' || (1000 + doc_id % 9000) END,"
        " substr(text, 1, 40))"
    )
    return (
        "SELECT doc_id,"
        f" CAST(len(regexp_extract_all(s, '{email}')) AS BIGINT) AS n_emails,"
        f" CAST(len(regexp_extract_all(s, '{phone}')) AS BIGINT) AS n_phones,"
        f" CAST(len(regexp_extract_all(s, '{ssn}')) AS BIGINT) AS n_ssn,"
        " regexp_replace(regexp_replace(regexp_replace(s,"
        f" '{ssn}', '[SSN]', 'g'),"
        f" '{phone}', '[PHONE]', 'g'),"
        f" '{email}', '[EMAIL]', 'g') AS redacted"
        f" FROM (SELECT doc_id, {synth} AS s FROM documents)"
    )


def _bpe_token_sql() -> str:
    """Mirror of analysis.bpe_token_counts: DuckDB's RE2 and Arrow's RE2
    scan the same pattern leftmost-first, so the match counts agree."""
    from pdf_parser_ray.pipelines.analysis import BPE_TOKEN_PATTERN

    # standard SQL literals pass backslashes through untouched; only the
    # quote needs doubling
    pat = BPE_TOKEN_PATTERN.replace("'", "''")
    return (
        "SELECT doc_id,"
        f" CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT)"
        " AS n_bpe_tokens FROM documents"
    )


def _fingerprint_sql() -> str:
    """Mirror of analysis.rolling_fingerprint: min over all 8-char
    windows of the polynomial hash sum_k ord(char_{i+k}) * BASE^(7-k)
    mod M, with the eight powers precomputed here.  Char-wise ord ==
    byte-wise value only for ASCII corpora (the synthetic documents
    tables are all-ASCII; asserted in tests)."""
    from pdf_parser_ray.pipelines.analysis import _FP_BASE, _FP_MOD, _FP_WINDOW

    powers = [pow(_FP_BASE, _FP_WINDOW - 1 - k, _FP_MOD) for k in range(_FP_WINDOW)]
    terms = " + ".join(
        f"CAST({p} AS HUGEINT) * ord(substr(text, CAST(i AS INT) + {k}, 1))"
        for k, p in enumerate(powers)
    )
    return (
        "WITH pos AS (SELECT doc_id, text,"
        f" unnest(range(1, length(text) - {_FP_WINDOW - 2})) AS i"
        f" FROM documents WHERE length(text) >= {_FP_WINDOW}),"
        f" h AS (SELECT doc_id, CAST(({terms}) % {_FP_MOD} AS BIGINT) AS hv"
        "   FROM pos),"
        " m AS (SELECT doc_id, min(hv) AS fp FROM h GROUP BY doc_id)"
        " SELECT d.doc_id, CAST(coalesce(m.fp, 0) AS BIGINT) AS fingerprint"
        " FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id"
    )


def _winnow_sql() -> str:
    """Mirror of analysis.winnow_fingerprints: per-position k-gram
    polynomial hashes (the _fingerprint_sql machinery at the smaller
    WIN_MOD), packed (hash, rightmost-position) keys, a w-row window
    min restricted to FULL windows (cnt = w), and DISTINCT selections.
    Char-wise ord == byte-wise value only for ASCII corpora (asserted
    in tests, same caveat as _fingerprint_sql)."""
    from pdf_parser_ray.pipelines.analysis import (
        WIN_BASE, WIN_K, WIN_MOD, WIN_POS, WIN_W,
    )

    powers = [pow(WIN_BASE, WIN_K - 1 - j, WIN_MOD) for j in range(WIN_K)]
    terms = " + ".join(
        f"CAST({p} AS HUGEINT) * ord(substr(text, CAST(i AS INT) + {j}, 1))"
        for j, p in enumerate(powers)
    )
    return (
        "WITH pos AS (SELECT doc_id, text,"
        f" unnest(range(1, length(text) - {WIN_K - 2})) AS i"
        f" FROM documents WHERE length(text) >= {WIN_K + WIN_W - 1}),"
        " h AS (SELECT doc_id, CAST(i AS BIGINT) AS i,"
        f"  CAST(({terms}) % {WIN_MOD} AS BIGINT) AS hv FROM pos),"
        f" a AS (SELECT doc_id, i, hv * {WIN_POS} + ({WIN_POS} - 1 - i)"
        "   AS arg FROM h),"
        " wmin AS (SELECT doc_id,"
        "  min(arg) OVER (PARTITION BY doc_id ORDER BY i"
        f"   ROWS BETWEEN CURRENT ROW AND {WIN_W - 1} FOLLOWING) AS sel,"
        "  count(*) OVER (PARTITION BY doc_id ORDER BY i"
        f"   ROWS BETWEEN CURRENT ROW AND {WIN_W - 1} FOLLOWING) AS cnt"
        " FROM a),"
        f" s AS (SELECT DISTINCT doc_id, sel FROM wmin WHERE cnt = {WIN_W})"
        f" SELECT doc_id, CAST({WIN_POS} - 1 - (sel % {WIN_POS}) AS BIGINT)"
        f"  AS pos, CAST(sel // {WIN_POS} AS BIGINT) AS fp FROM s"
    )


def _embedding_outliers_sql() -> str:
    """Mirror of similarity.embedding_outliers: the knn_quantized
    calibration + quantizer CTEs, per-dim sums and count, then the
    exact integer n²-scaled squared deviation Σ (qv·n − s_i)² through
    HUGEINT, top-k by (dev2 DESC, vec_id)."""
    import inspect

    from pdf_parser_ray.pipelines import similarity

    k = inspect.signature(similarity.embedding_outliers).parameters["k"].default
    levels = float(similarity.QUANT_LEVELS)
    return (
        "WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),"
        " a AS (SELECT CAST(max(abs(x)) AS DOUBLE) AS a FROM"
        "   (SELECT unnest(e) AS x FROM v)),"
        " u AS (SELECT vec_id, unnest(e) AS x,"
        "   generate_subscripts(e, 1) AS i FROM v),"
        " q AS (SELECT u.vec_id, u.i,"
        f"   CAST(floor(CAST(u.x AS DOUBLE) * {levels} / a.a) AS BIGINT)"
        "     AS qv FROM u CROSS JOIN a),"
        " n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),"
        " s AS (SELECT i, CAST(sum(qv) AS BIGINT) AS s FROM q GROUP BY i),"
        " d AS (SELECT q.vec_id,"
        "   CAST(sum(CAST(q.qv * n.n - s.s AS HUGEINT)"
        "     * CAST(q.qv * n.n - s.s AS HUGEINT)) AS BIGINT) AS dev2"
        "   FROM q JOIN s USING (i) CROSS JOIN n GROUP BY q.vec_id)"
        " SELECT vec_id, dev2 FROM d"
        f" ORDER BY dev2 DESC, vec_id LIMIT {k}"
    )


def _knn_multi_sql() -> str:
    """Mirror of similarity.knn_multi: DOUBLE-list
    list_cosine_similarity (the same float path the knn_lsh/knn_ivf
    mirror pins — sqrt-of-product association order diverges by 1
    micro), per-query row_number top-k, query ids and k
    interpolated."""
    from pdf_parser_ray.pipelines.similarity import (
        KNN_MULTI_K, KNN_MULTI_QUERIES,
    )

    qids = ", ".join(str(q) for q in KNN_MULTI_QUERIES)
    return (
        "WITH v AS (SELECT vec_id,"
        "   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e"
        "   FROM embeddings),"
        f" q AS (SELECT vec_id AS query_id, e AS qe FROM v"
        f"   WHERE vec_id IN ({qids})),"
        " s AS (SELECT q.query_id, v.vec_id,"
        "   CAST(trunc(list_cosine_similarity(v.e, q.qe) * 1000000)"
        "     AS BIGINT) AS cos_micros"
        "  FROM v CROSS JOIN q WHERE v.vec_id <> q.query_id),"
        " r AS (SELECT *, row_number() OVER (PARTITION BY query_id"
        "   ORDER BY cos_micros DESC, vec_id) rn FROM s)"
        f" SELECT query_id, vec_id, cos_micros FROM r WHERE rn <= {KNN_MULTI_K}"
    )


def _user_drawdowns_sql() -> str:
    """Mirror of relational.user_drawdowns: running MAX OVER ROWS
    UNBOUNDED PRECEDING in (ts, event_id) order, drawdown = peak −
    value, all integer cents."""
    return (
        "WITH h AS (SELECT user_id,"
        "   CAST(round(value*100) AS BIGINT) AS cents, ts, event_id"
        "   FROM events),"
        " r AS (SELECT user_id, cents,"
        "   max(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id"
        "     ROWS UNBOUNDED PRECEDING) AS runmax FROM h)"
        " SELECT user_id, CAST(max(runmax) AS BIGINT) AS peak_cents,"
        "  CAST(max(runmax - cents) AS BIGINT) AS max_drawdown_cents,"
        "  CAST(count(*) AS BIGINT) AS n_events"
        " FROM r GROUP BY user_id"
    )


def _nation_year_sql() -> str:
    """Mirror of relational.nation_year_revenue (TPC-H Q9 shape):
    SQL year() == the numpy datetime64[Y] cast on epoch-us
    timestamps; revenue in the house integer-cents discipline."""
    return (
        "SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS year,"
        " CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)"
        "   * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)"
        "   AS revenue_cc"
        " FROM lineitem JOIN supplier ON l_suppkey = s_suppkey"
        " JOIN nation ON s_nationkey = n_nationkey"
        " GROUP BY 1, 2"
    )


def _hill_sql() -> str:
    """Mirror of analysis.hill_tail_index: top-(k+1) counts by
    (n DESC, word), per-term ln-micros floors summed exactly,
    α_micros = k·1e12 // Σ."""
    from pdf_parser_ray.pipelines.analysis import HILL_K

    K = HILL_K
    return (
        f"WITH w AS (SELECT unnest({_WORDS_EXPR}) AS word FROM documents),"
        " c AS (SELECT word, CAST(count(*) AS BIGINT) n FROM w"
        "   GROUP BY word),"
        " r AS (SELECT n, row_number() OVER (ORDER BY n DESC, word) rn"
        "   FROM c),"
        f" ref AS (SELECT n AS x_ref FROM r WHERE rn = {K} + 1),"
        " s AS (SELECT CAST(sum(CAST(floor(ln(CAST(r.n AS DOUBLE)"
        "   / ref.x_ref) * 1000000) AS BIGINT)) AS BIGINT) AS tot"
        f"   FROM r, ref WHERE r.rn <= {K})"
        f" SELECT CAST({K} AS BIGINT) AS k, ref.x_ref,"
        f"  CAST(CASE WHEN s.tot > 0 THEN ({K} * 1000000000000) // s.tot"
        "   ELSE 0 END AS BIGINT) AS alpha_micros"
        " FROM s, ref"
    )


def _spearman_sql() -> str:
    """Mirror of analysis.length_vocab_spearman: marginal doubled
    midranks via 1-PRECEDING running counts, HUGEINT moments off the
    joint histogram, the shared cov/(√vx·√vy) micro floor."""
    return (
        f"WITH v AS (SELECT CAST(len({_WORDS_EXPR}) AS BIGINT) AS w,"
        f"   CAST(len(list_distinct({_WORDS_EXPR})) AS BIGINT) AS d"
        "   FROM documents),"
        " j AS (SELECT w, d, CAST(count(*) AS BIGINT) AS n FROM v"
        "   GROUP BY 1, 2),"
        " mw AS (SELECT w, CAST(sum(n) AS BIGINT) c FROM j GROUP BY w),"
        " md AS (SELECT d, CAST(sum(n) AS BIGINT) c FROM j GROUP BY d),"
        " rw AS (SELECT w, CAST(2 * coalesce(sum(c) OVER (ORDER BY w"
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
        "    + c + 1 AS BIGINT) AS r FROM mw),"
        " rdd AS (SELECT d, CAST(2 * coalesce(sum(c) OVER (ORDER BY d"
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
        "    + c + 1 AS BIGINT) AS r FROM md),"
        " m AS (SELECT CAST(sum(j.n) AS HUGEINT) N,"
        "   CAST(sum(CAST(j.n AS HUGEINT) * rw.r) AS HUGEINT) sx,"
        "   CAST(sum(CAST(j.n AS HUGEINT) * rdd.r) AS HUGEINT) sy,"
        "   CAST(sum(CAST(j.n AS HUGEINT) * rw.r * rdd.r) AS HUGEINT) sxy,"
        "   CAST(sum(CAST(j.n AS HUGEINT) * rw.r * rw.r) AS HUGEINT) sxx,"
        "   CAST(sum(CAST(j.n AS HUGEINT) * rdd.r * rdd.r) AS HUGEINT) syy"
        "  FROM j JOIN rw USING (w) JOIN rdd USING (d))"
        " SELECT CAST(N AS BIGINT) AS n,"
        "  CAST(floor(CAST(N*sxy - sx*sy AS DOUBLE)"
        "   / (sqrt(CAST(N*sxx - sx*sx AS DOUBLE))"
        "      * sqrt(CAST(N*syy - sy*sy AS DOUBLE))) * 1000000)"
        "   AS BIGINT) AS rho_micros"
        " FROM m"
    )


def _burst_sql() -> str:
    """Mirror of relational.hourly_burst_states: the two-state
    forward-cost recursion as a recursive CTE, L1 emissions and the
    switching penalty in exact integers, constants interpolated."""
    from pdf_parser_ray.pipelines.relational import (
        BURST_RATE_MULT, BURST_SWITCH_DIV,
    )

    M, G = BURST_RATE_MULT, BURST_SWITCH_DIV
    return (
        "WITH RECURSIVE h AS (SELECT"
        "   (epoch_us(ts) // 3600000000) * 3600000000 AS hour_us,"
        "   CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS c"
        "  FROM events GROUP BY 1),"
        " o AS (SELECT hour_us, c, row_number() OVER (ORDER BY hour_us) rn"
        "   FROM h),"
        " m AS (SELECT CAST(sum(c) // count(*) AS BIGINT) AS mu FROM h),"
        " r AS ("
        "   SELECT o.rn, o.hour_us, o.c,"
        "     CAST(abs(o.c - m.mu) AS BIGINT) AS c0,"
        f"     CAST(m.mu // {G} + abs(o.c - {M} * m.mu) AS BIGINT) AS c1"
        "   FROM o, m WHERE o.rn = 1"
        "   UNION ALL"
        "   SELECT o.rn, o.hour_us, o.c,"
        f"     CAST(least(r.c0, r.c1 + m.mu // {G}) + abs(o.c - m.mu)"
        "       AS BIGINT),"
        f"     CAST(least(r.c1, r.c0 + m.mu // {G})"
        f"       + abs(o.c - {M} * m.mu) AS BIGINT)"
        "   FROM r JOIN o ON o.rn = r.rn + 1 CROSS JOIN m)"
        " SELECT hour_us, c AS total_cents, c0 AS cost_base,"
        "  c1 AS cost_burst,"
        "  CAST(CASE WHEN c1 < c0 THEN 1 ELSE 0 END AS BIGINT) AS in_burst"
        " FROM r"
    )


def _benford_sql() -> str:
    """Mirror of relational.benford_orders: first digit via VARCHAR
    head (≡ the pipeline's integer decimation for positive ints), the
    frozen Benford micros table as VALUES, absent digits at 0."""
    from pdf_parser_ray.pipelines.relational import BENFORD_MICROS

    micros = ", ".join(
        f"({d + 1}, {m})" for d, m in enumerate(BENFORD_MICROS)
    )
    return (
        "WITH c AS (SELECT abs(CAST(round(o_totalprice*100) AS BIGINT))"
        "   AS v FROM orders),"
        " d AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT)"
        "   AS digit FROM c WHERE v > 0),"
        " h AS (SELECT digit, CAST(count(*) AS BIGINT) n FROM d"
        "   GROUP BY digit),"
        f" bt(digit, p) AS (VALUES {micros}),"
        " full_h AS (SELECT bt.digit, CAST(coalesce(h.n, 0) AS BIGINT)"
        "   AS n, bt.p FROM bt LEFT JOIN h USING (digit)),"
        " t AS (SELECT CAST(sum(n) AS BIGINT) nt FROM full_h)"
        " SELECT digit, n AS n_obs,"
        "  CAST((t.nt * p) // 1000000 AS BIGINT) AS n_expected,"
        "  CAST((abs(n - (t.nt * p) // 1000000) * 1000000) // t.nt"
        "   AS BIGINT) AS dev_micros"
        " FROM full_h, t"
    )


def _ks_test_sql() -> str:
    """Mirror of analysis.length_ks_test: running joint-histogram
    CDFs, cross-multiplied integer gap, argmax with the
    smallest-length tie-break."""
    from pdf_parser_ray.pipelines.analysis import (
        RANK_TEST_SRC_A, RANK_TEST_SRC_B,
    )

    a, b = RANK_TEST_SRC_A, RANK_TEST_SRC_B
    return (
        f"WITH d AS (SELECT source, CAST(len({_WORDS_EXPR}) AS BIGINT)"
        "   AS length FROM documents"
        f"   WHERE source IN ('{a}', '{b}')),"
        " h AS (SELECT length,"
        f"   CAST(sum(CASE WHEN source = '{a}' THEN 1 ELSE 0 END)"
        "     AS BIGINT) AS av,"
        f"   CAST(sum(CASE WHEN source = '{b}' THEN 1 ELSE 0 END)"
        "     AS BIGINT) AS bv"
        "  FROM d GROUP BY length),"
        " m AS (SELECT CAST(sum(av) AS BIGINT) na,"
        "   CAST(sum(bv) AS BIGINT) nb FROM h),"
        " c AS (SELECT length,"
        "   CAST(sum(av) OVER (ORDER BY length) AS BIGINT) ca,"
        "   CAST(sum(bv) OVER (ORDER BY length) AS BIGINT) cb FROM h),"
        " g AS (SELECT length, abs(ca * m.nb - cb * m.na) AS gap"
        "   FROM c, m),"
        " best AS (SELECT length, gap,"
        "   row_number() OVER (ORDER BY gap DESC, length) rn FROM g)"
        " SELECT m.na AS n_a, m.nb AS n_b,"
        "  CAST((best.gap * 1000000) // (m.na * m.nb) AS BIGINT)"
        "    AS d_micros,"
        "  best.length AS at_length"
        " FROM best, m WHERE best.rn = 1"
    )


def _chi2_sql() -> str:
    """Mirror of analysis.lang_source_chi2: the full R×C cell grid
    (absent cells at O=0 via LEFT JOIN), the per-cell
    (O·N − R·C)²·1000 // (R·C) floor through HUGEINT, sum // N."""
    return (
        "WITH m AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS o"
        "   FROM documents GROUP BY 1, 2),"
        " r AS (SELECT source, CAST(sum(o) AS BIGINT) rs FROM m GROUP BY 1),"
        " c AS (SELECT lang, CAST(sum(o) AS BIGINT) cs FROM m GROUP BY 1),"
        " t AS (SELECT CAST(sum(o) AS BIGINT) n FROM m),"
        " cells AS (SELECT coalesce(m.o, 0) AS o, r.rs, c.cs"
        "   FROM r CROSS JOIN c"
        "   LEFT JOIN m ON m.source = r.source AND m.lang = c.lang),"
        " s AS (SELECT CAST(sum((CAST(o AS HUGEINT)*t.n"
        "     - CAST(rs AS HUGEINT)*cs)"
        "     * (CAST(o AS HUGEINT)*t.n - CAST(rs AS HUGEINT)*cs) * 1000"
        "     // (CAST(rs AS HUGEINT)*cs)) AS HUGEINT) AS tot"
        "   FROM cells, t GROUP BY ALL)"
        " SELECT t.n, CAST(((SELECT count(*) FROM r) - 1)"
        "   * ((SELECT count(*) FROM c) - 1) AS BIGINT) AS df,"
        "  CAST(s.tot // t.n AS BIGINT) AS chi2_milli"
        " FROM s, t"
    )


def _rank_test_sql() -> str:
    """Mirror of analysis.length_rank_test: the joint length histogram
    with a 1-PRECEDING running count for cnt_less, doubled midranks,
    U·2 and the AUC floor — sources interpolated."""
    from pdf_parser_ray.pipelines.analysis import (
        RANK_TEST_SRC_A, RANK_TEST_SRC_B,
    )

    a, b = RANK_TEST_SRC_A, RANK_TEST_SRC_B
    return (
        f"WITH d AS (SELECT source, CAST(len({_WORDS_EXPR}) AS BIGINT)"
        "   AS length FROM documents"
        f"   WHERE source IN ('{a}', '{b}')),"
        " h AS (SELECT length,"
        f"   CAST(sum(CASE WHEN source = '{a}' THEN 1 ELSE 0 END)"
        "     AS BIGINT) AS av,"
        f"   CAST(sum(CASE WHEN source = '{b}' THEN 1 ELSE 0 END)"
        "     AS BIGINT) AS bv"
        "  FROM d GROUP BY length),"
        " r AS (SELECT length, av, bv,"
        "   CAST(coalesce(sum(av + bv) OVER (ORDER BY length"
        "     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
        "     AS BIGINT) AS cnt_less"
        "  FROM h),"
        " m AS (SELECT CAST(sum(av) AS BIGINT) na,"
        "   CAST(sum(bv) AS BIGINT) nb,"
        "   CAST(sum(av * (2*cnt_less + av + bv + 1)) AS BIGINT) ra2"
        "   FROM r)"
        " SELECT na AS n_a, nb AS n_b,"
        "  CAST(ra2 - na*(na+1) AS BIGINT) AS u_x2_a,"
        "  CAST(((ra2 - na*(na+1)) * 1000000) // (2*na*nb) AS BIGINT)"
        "    AS auc_micros FROM m"
    )


def _cusum_sql() -> str:
    """Mirror of relational.hourly_cusum: the integer CUSUM recurrence
    replayed as a recursive CTE marching rn → rn+1 over the bounded
    hour domain; allowance and alarm constants interpolated."""
    from pdf_parser_ray.pipelines.relational import (
        CUSUM_ALARM_MULT, CUSUM_ALLOW_DIV,
    )

    return (
        "WITH RECURSIVE h AS (SELECT"
        "   (epoch_us(ts) // 3600000000) * 3600000000 AS hour_us,"
        "   CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS c"
        "  FROM events GROUP BY 1),"
        " o AS (SELECT hour_us, c, row_number() OVER (ORDER BY hour_us) rn"
        "   FROM h),"
        " m AS (SELECT CAST(sum(c) // count(*) AS BIGINT) AS mu FROM h),"
        " r AS ("
        "   SELECT o.rn, o.hour_us, o.c,"
        "     CAST(greatest(0, o.c - m.mu -"
        f"      m.mu // {CUSUM_ALLOW_DIV}) AS BIGINT) AS s"
        "   FROM o, m WHERE o.rn = 1"
        "   UNION ALL"
        "   SELECT o.rn, o.hour_us, o.c,"
        "     CAST(greatest(0, r.s + o.c - m.mu -"
        f"      m.mu // {CUSUM_ALLOW_DIV}) AS BIGINT)"
        "   FROM r JOIN o ON o.rn = r.rn + 1 CROSS JOIN m)"
        " SELECT hour_us, c AS total_cents, s AS cusum_cents,"
        f"  CAST(CASE WHEN s > {CUSUM_ALARM_MULT} * (SELECT mu FROM m)"
        "   THEN 1 ELSE 0 END AS BIGINT) AS alarm"
        " FROM r"
    )


def _heaps_sql() -> str:
    """Mirror of analysis.heaps_law_curve: per-word min-first-doc, the
    even doc-rank checkpoint grid, cumulative tokens and distinct
    counts per boundary."""
    from pdf_parser_ray.pipelines.analysis import HEAPS_CHECKPOINTS

    K = HEAPS_CHECKPOINTS
    return (
        "WITH ids AS (SELECT doc_id,"
        "   row_number() OVER (ORDER BY doc_id) rn FROM documents),"
        " bnd AS (SELECT c, (SELECT doc_id FROM ids WHERE rn ="
        "   greatest(1, least((SELECT max(rn) FROM ids),"
        f"    ((c + 1) * (SELECT max(rn) FROM ids)) // {K}))) AS b"
        f"  FROM (SELECT unnest(range({K})) AS c)),"
        f" w AS (SELECT doc_id, unnest({_WORDS_EXPR}) AS word"
        "   FROM documents),"
        " f AS (SELECT word, min(doc_id) AS first FROM w GROUP BY word),"
        f" tok AS (SELECT doc_id, CAST(len({_WORDS_EXPR}) AS BIGINT) AS nt"
        "   FROM documents)"
        " SELECT bnd.c AS checkpoint, CAST(bnd.b AS BIGINT) AS last_doc_id,"
        "  CAST((SELECT sum(nt) FROM tok WHERE doc_id <= bnd.b) AS BIGINT)"
        "    AS n_tokens_cum,"
        "  CAST((SELECT count(*) FROM f WHERE first <= bnd.b) AS BIGINT)"
        "    AS n_distinct_cum"
        " FROM bnd"
    )


def _rfm_sql() -> str:
    """Mirror of relational.customer_rfm: per-customer (recency day,
    order count, lifetime cents), quartile cutoffs at the discrete
    index ceil(q·n) — written (q·n + 3) // 4 because DuckDB's //
    truncates toward zero on negatives, so the -(-x // d) ceil idiom
    is WRONG here — and 1-4 scores by strict-greater cutoff counts
    (recency inverted so 4 = most recent)."""
    return (
        "WITH pc AS (SELECT o_custkey ck,"
        "   SUM(CAST(round(o_totalprice*100) AS BIGINT)) m,"
        "   CAST(count(*) AS BIGINT) n,"
        "   CAST(max(epoch_us(o_orderdate)) // 86400000000 AS BIGINT) d"
        "  FROM orders GROUP BY 1),"
        " mx AS (SELECT max(d) AS max_day, CAST(count(*) AS BIGINT) AS nt"
        "   FROM pc),"
        " rd_ AS (SELECT ck, d, n, m,"
        "   row_number() OVER (ORDER BY d) rn_d,"
        "   row_number() OVER (ORDER BY n) rn_n,"
        "   row_number() OVER (ORDER BY m) rn_m FROM pc),"
        " cuts AS (SELECT"
        "   max(CASE WHEN rn_d = (1 * nt + 3) // 4 THEN d END) cd1,"
        "   max(CASE WHEN rn_d = (2 * nt + 3) // 4 THEN d END) cd2,"
        "   max(CASE WHEN rn_d = (3 * nt + 3) // 4 THEN d END) cd3,"
        "   max(CASE WHEN rn_n = (1 * nt + 3) // 4 THEN n END) cn1,"
        "   max(CASE WHEN rn_n = (2 * nt + 3) // 4 THEN n END) cn2,"
        "   max(CASE WHEN rn_n = (3 * nt + 3) // 4 THEN n END) cn3,"
        "   max(CASE WHEN rn_m = (1 * nt + 3) // 4 THEN m END) cm1,"
        "   max(CASE WHEN rn_m = (2 * nt + 3) // 4 THEN m END) cm2,"
        "   max(CASE WHEN rn_m = (3 * nt + 3) // 4 THEN m END) cm3"
        "  FROM rd_, mx)"
        " SELECT pc.ck, CAST(mx.max_day - pc.d AS BIGINT) r_days,"
        "  pc.n AS f_orders, pc.m AS m_cc,"
        "  CAST(1 + (pc.d > cuts.cd1)::INT + (pc.d > cuts.cd2)::INT"
        "   + (pc.d > cuts.cd3)::INT AS BIGINT) r_score,"
        "  CAST(1 + (pc.n > cuts.cn1)::INT + (pc.n > cuts.cn2)::INT"
        "   + (pc.n > cuts.cn3)::INT AS BIGINT) f_score,"
        "  CAST(1 + (pc.m > cuts.cm1)::INT + (pc.m > cuts.cm2)::INT"
        "   + (pc.m > cuts.cm3)::INT AS BIGINT) m_score"
        " FROM pc, mx, cuts"
    )


def _target_encode_sql() -> str:
    """Mirror of relational.target_encode_events: per-type (n, S)
    moments, LOO mean (S−x)·1000 // (n−1), singleton fallback to the
    global LOO mean."""
    return (
        "WITH h AS (SELECT event_id, event_type,"
        "   CAST(round(value*100) AS BIGINT) AS c FROM events),"
        " m AS (SELECT event_type, CAST(count(*) AS BIGINT) n,"
        "   CAST(sum(c) AS BIGINT) s FROM h GROUP BY 1),"
        " g AS (SELECT CAST(count(*) AS BIGINT) n_all,"
        "   CAST(sum(c) AS BIGINT) s_all FROM h)"
        " SELECT h.event_id, h.event_type,"
        "  CAST(CASE WHEN m.n <= 1 THEN"
        "   ((g.s_all - h.c) * 1000) // (g.n_all - 1)"
        "   ELSE ((m.s - h.c) * 1000) // (m.n - 1) END AS BIGINT)"
        "   AS loo_mean_milli"
        " FROM h JOIN m USING (event_type) CROSS JOIN g"
    )


def _hour_effect_sql() -> str:
    """Mirror of relational.hour_of_day_effect: the exact-integer
    η² formulation — per-group (S_g²·1000)//n_g floors through
    HUGEINT, no order-dependent float sum anywhere."""
    return (
        "WITH h AS (SELECT (epoch_us(ts) // 3600000000) % 24 AS hour,"
        "   CAST(round(value*100) AS BIGINT) AS cents FROM events),"
        " g AS (SELECT hour, CAST(count(*) AS HUGEINT) n,"
        "   CAST(sum(cents) AS HUGEINT) s,"
        "   CAST(sum(CAST(cents AS HUGEINT)*cents) AS HUGEINT) q"
        "   FROM h GROUP BY hour),"
        " m AS (SELECT CAST(sum(n) AS HUGEINT) N,"
        "   CAST(sum(s) AS HUGEINT) S, CAST(sum(q) AS HUGEINT) Q,"
        "   CAST(sum((s*s*1000) // n) AS HUGEINT) t, count(*) ng FROM g)"
        " SELECT CAST(N AS BIGINT) AS n, CAST(ng AS BIGINT) AS n_groups,"
        "  CAST(CASE WHEN 1000*(N*Q - S*S) <= 0 OR N*t <= 1000*S*S THEN 0"
        "   ELSE ((N*t - 1000*S*S) * 1000000) // (1000*(N*Q - S*S)) END"
        "   AS BIGINT) AS eta2_micros"
        " FROM m"
    )


def _ann_recall_sql() -> str:
    """Mirror of similarity.ann_recall: the _knn_lsh_sql bucket/probe
    machinery generalized to the whole query panel, exact and
    bucket-restricted top-k via per-query row_number, intersection
    counted with a LEFT JOIN — constants interpolated."""
    from pdf_parser_ray.pipelines.similarity import (
        _LSH_BITS, KNN_MULTI_QUERIES,
    )

    k = 10
    qids = ", ".join(str(q) for q in KNN_MULTI_QUERIES)
    return (
        "WITH v AS (SELECT vec_id,"
        "   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e"
        "   FROM embeddings),"
        " ed AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS d,"
        "   e[CAST(i AS INT)] AS x"
        "   FROM (SELECT vec_id, e, unnest(range(1, len(e) + 1)) AS i"
        "         FROM v)),"
        " dots AS (SELECT vec_id, pp.p AS p,"
        "   sum(x * ((((d * 131 + pp.p * 137) % 251) - 125) / 125.0)) AS dot"
        f"  FROM ed CROSS JOIN (SELECT unnest(range({_LSH_BITS})) AS p) pp"
        "   GROUP BY vec_id, pp.p),"
        " bk AS (SELECT vec_id, CAST(sum(CASE WHEN dot > 0"
        "   THEN 1 << CAST(p AS INT) ELSE 0 END) AS BIGINT) AS bucket"
        "   FROM dots GROUP BY vec_id),"
        f" q AS (SELECT vec_id AS query_id, e AS qe FROM v"
        f"   WHERE vec_id IN ({qids})),"
        " qb AS (SELECT q.query_id, bk.bucket FROM bk"
        "   JOIN q ON bk.vec_id = q.query_id),"
        " probes AS (SELECT query_id, bucket AS b FROM qb"
        "   UNION SELECT qb.query_id, xor(qb.bucket, 1 << CAST(t.p AS INT))"
        f"  FROM qb CROSS JOIN (SELECT unnest(range({_LSH_BITS})) AS p) t),"
        " sc AS (SELECT q.query_id, v.vec_id,"
        "   CAST(trunc(list_cosine_similarity(v.e, q.qe) * 1000000)"
        "     AS BIGINT) AS cm"
        "  FROM v CROSS JOIN q WHERE v.vec_id <> q.query_id),"
        " ex AS (SELECT query_id, vec_id FROM (SELECT *, row_number()"
        "   OVER (PARTITION BY query_id ORDER BY cm DESC, vec_id) rn"
        f"   FROM sc) WHERE rn <= {k}),"
        " apc AS (SELECT sc.query_id, sc.vec_id, sc.cm FROM sc"
        "   JOIN bk ON bk.vec_id = sc.vec_id"
        "   WHERE bk.bucket IN (SELECT b FROM probes p"
        "     WHERE p.query_id = sc.query_id)),"
        " ap AS (SELECT query_id, vec_id FROM (SELECT *, row_number()"
        "   OVER (PARTITION BY query_id ORDER BY cm DESC, vec_id) rn"
        f"   FROM apc) WHERE rn <= {k}),"
        " m AS (SELECT ex.query_id, count(ap.vec_id) AS inter FROM ex"
        "   LEFT JOIN ap ON ap.query_id = ex.query_id"
        "     AND ap.vec_id = ex.vec_id GROUP BY ex.query_id),"
        " ne AS (SELECT query_id, count(*) n_exact FROM ex GROUP BY 1),"
        " na AS (SELECT query_id, count(*) n_approx FROM ap GROUP BY 1)"
        " SELECT m.query_id, CAST(ne.n_exact AS BIGINT) AS n_exact,"
        "  CAST(na.n_approx AS BIGINT) AS n_approx,"
        f"  CAST((m.inter * 1000000) // {k} AS BIGINT) AS recall_micros"
        " FROM m JOIN ne USING (query_id) JOIN na USING (query_id)"
    )


def _knn_ivf_multi_sql() -> str:
    """Mirror of similarity.knn_ivf_multi: the _ann_recall_sql
    bucket/probe machinery's approx side alone — per-row hyperplane
    buckets from the shared integer-formula planes, per-query probe
    sets (signature + 1-bit flips), bucket-restricted per-query
    row_number top-k at the knn_multi panel/k."""
    from pdf_parser_ray.pipelines.similarity import (
        _LSH_BITS, KNN_MULTI_K, KNN_MULTI_QUERIES,
    )

    qids = ", ".join(str(q) for q in KNN_MULTI_QUERIES)
    return (
        "WITH v AS (SELECT vec_id,"
        "   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e"
        "   FROM embeddings),"
        " ed AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS d,"
        "   e[CAST(i AS INT)] AS x"
        "   FROM (SELECT vec_id, e, unnest(range(1, len(e) + 1)) AS i"
        "         FROM v)),"
        " dots AS (SELECT vec_id, pp.p AS p,"
        "   sum(x * ((((d * 131 + pp.p * 137) % 251) - 125) / 125.0)) AS dot"
        f"  FROM ed CROSS JOIN (SELECT unnest(range({_LSH_BITS})) AS p) pp"
        "   GROUP BY vec_id, pp.p),"
        " bk AS (SELECT vec_id, CAST(sum(CASE WHEN dot > 0"
        "   THEN 1 << CAST(p AS INT) ELSE 0 END) AS BIGINT) AS bucket"
        "   FROM dots GROUP BY vec_id),"
        f" q AS (SELECT vec_id AS query_id, e AS qe FROM v"
        f"   WHERE vec_id IN ({qids})),"
        " qb AS (SELECT q.query_id, bk.bucket FROM bk"
        "   JOIN q ON bk.vec_id = q.query_id),"
        " probes AS (SELECT query_id, bucket AS b FROM qb"
        "   UNION SELECT qb.query_id, xor(qb.bucket, 1 << CAST(t.p AS INT))"
        f"  FROM qb CROSS JOIN (SELECT unnest(range({_LSH_BITS})) AS p) t),"
        " sc AS (SELECT q.query_id, v.vec_id,"
        "   CAST(trunc(list_cosine_similarity(v.e, q.qe) * 1000000)"
        "     AS BIGINT) AS cos_micros"
        "  FROM v CROSS JOIN q WHERE v.vec_id <> q.query_id),"
        " apc AS (SELECT sc.query_id, sc.vec_id, sc.cos_micros FROM sc"
        "   JOIN bk ON bk.vec_id = sc.vec_id"
        "   WHERE bk.bucket IN (SELECT b FROM probes p"
        "     WHERE p.query_id = sc.query_id))"
        " SELECT query_id, vec_id, cos_micros FROM (SELECT *, row_number()"
        "   OVER (PARTITION BY query_id ORDER BY cos_micros DESC, vec_id) rn"
        f"   FROM apc) WHERE rn <= {KNN_MULTI_K}"
    )


def _shard_balance_sql() -> str:
    """Mirror of pack.shard_balance_report: the shuffle-key hash,
    shard = key % S, per-shard doc/char loads and the micro share of a
    perfectly even split."""
    from pdf_parser_ray.pipelines.pack import (
        SHUF_A1, SHUF_A2, SHUF_B1, SHUF_B2, SHUF_P, SHUF_SHARDS,
    )

    s = SHUF_SHARDS
    return (
        "WITH r1 AS (SELECT doc_id, n_chars,"
        f"   ({SHUF_A1} * (doc_id % {SHUF_P}) + {SHUF_B1}) % {SHUF_P} AS k1"
        "   FROM documents),"
        " r2 AS (SELECT doc_id, n_chars,"
        f"   ({SHUF_A2} * (xor(k1, k1 >> 17) % {SHUF_P}) + {SHUF_B2})"
        f"     % {SHUF_P} AS kk FROM r1),"
        f" a AS (SELECT kk % {s} AS shard, CAST(count(*) AS BIGINT) n_docs,"
        "   CAST(sum(n_chars) AS BIGINT) n_chars FROM r2 GROUP BY 1),"
        " t AS (SELECT CAST(sum(n_chars) AS BIGINT) tot FROM a)"
        " SELECT shard, n_docs, n_chars,"
        f"  CAST((CAST(n_chars AS HUGEINT) * {s} * 1000000) // t.tot"
        "    AS BIGINT) AS load_micros FROM a, t"
    )


def _bootstrap_sql() -> str:
    """Mirror of relational.bootstrap_mean_ci: the shuffle-key hash
    recomputed per (orderkey·reps + b), the Poisson(1) inverse-CDF
    ladder with the SAME integer thresholds, exact integer moment
    sums, floor-division mean."""
    from pdf_parser_ray.pipelines.pack import (
        SHUF_A1, SHUF_A2, SHUF_B1, SHUF_B2, SHUF_P,
    )
    from pdf_parser_ray.pipelines.relational import (
        BOOT_REPS, _poisson_thresholds,
    )

    w_expr = " + ".join(
        f"(CASE WHEN kk >= {t} THEN 1 ELSE 0 END)"
        for t in _poisson_thresholds()
    )
    return (
        f"WITH reps AS (SELECT unnest(range({BOOT_REPS})) AS b),"
        " r0 AS (SELECT b, CAST(round(o_totalprice*100) AS BIGINT) AS cents,"
        f"   (o_orderkey * {BOOT_REPS} + b) % {SHUF_P} AS x"
        "   FROM orders CROSS JOIN reps),"
        f" r1 AS (SELECT b, cents, ({SHUF_A1} * x + {SHUF_B1}) % {SHUF_P}"
        "   AS k1 FROM r0),"
        f" r2 AS (SELECT b, cents, ({SHUF_A2} * (xor(k1, k1 >> 17)"
        f"   % {SHUF_P}) + {SHUF_B2}) % {SHUF_P} AS kk FROM r1),"
        f" w AS (SELECT b, cents, {w_expr} AS w FROM r2)"
        " SELECT CAST(b AS BIGINT) AS b, CAST(sum(w) AS BIGINT) AS n_eff,"
        "  CAST(sum(w*cents) AS BIGINT) AS sum_cc,"
        "  CAST((sum(w*cents) * 1000) // sum(w) AS BIGINT) AS mean_milli"
        " FROM w GROUP BY b"
    )


def _join_size_sql() -> str:
    """Mirror of join.join_size_stats: per-key count join, exact
    Σ na·nb / count / max moments, integer-micros skew share."""
    return (
        "WITH a AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS na"
        "   FROM orders GROUP BY 1),"
        " b AS (SELECT c_custkey AS k, CAST(count(*) AS BIGINT) AS nb"
        "   FROM customer GROUP BY 1),"
        " p AS (SELECT a.k, na*nb AS rows FROM a JOIN b USING (k)),"
        " m AS (SELECT CAST(sum(rows) AS BIGINT) jr,"
        "   CAST(count(*) AS BIGINT) nk, CAST(max(rows) AS BIGINT) mx"
        "   FROM p)"
        " SELECT jr AS join_rows, nk AS n_keys, mx AS max_key_rows,"
        "  CAST((mx * 1000000) // jr AS BIGINT) AS skew_micros FROM m"
    )


def _cosupplier_sql() -> str:
    """Mirror of join.cosupplier_edges: distinct (part, supplier)
    self-join projection, top-k with the (n DESC, sk_a, sk_b)
    tie-break, k interpolated."""
    from pdf_parser_ray.pipelines.join import COSUPPLIER_TOP_K

    return (
        "WITH ps AS (SELECT DISTINCT l_partkey pk, l_suppkey sk"
        "   FROM lineitem),"
        " e AS (SELECT a.sk AS sk_a, b.sk AS sk_b,"
        "   CAST(count(*) AS BIGINT) AS n_shared_parts"
        "   FROM ps a JOIN ps b ON a.pk = b.pk AND a.sk < b.sk"
        "   GROUP BY 1, 2)"
        " SELECT sk_a, sk_b, n_shared_parts FROM e"
        f" ORDER BY n_shared_parts DESC, sk_a, sk_b LIMIT {COSUPPLIER_TOP_K}"
    )


def _concentration_sql() -> str:
    """Mirror of relational.revenue_concentration: window cumsum over
    (rev DESC, ck), the integer 5·cum ≥ 4·total predicate with the
    ratio constants interpolated."""
    from pdf_parser_ray.pipelines.relational import CONC_PCT_DEN, CONC_PCT_NUM

    return (
        "WITH r AS (SELECT o_custkey AS ck,"
        "   SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS rev"
        "   FROM orders GROUP BY 1),"
        " s AS (SELECT rev, sum(rev) OVER (ORDER BY rev DESC, ck) AS cum,"
        "   row_number() OVER (ORDER BY rev DESC, ck) AS rn FROM r),"
        " t AS (SELECT CAST(count(*) AS BIGINT) n,"
        "   CAST(sum(rev) AS BIGINT) tot FROM r),"
        " c AS (SELECT min(rn) AS n_top, t.n, t.tot FROM s, t"
        f"  WHERE {CONC_PCT_DEN} * cum >= {CONC_PCT_NUM} * t.tot"
        "   GROUP BY t.n, t.tot),"
        " sh AS (SELECT c.*,"
        "   (SELECT cum FROM s WHERE rn = c.n_top) AS share FROM c)"
        " SELECT n AS n_customers, n_top,"
        "  CAST((n_top * 1000000) // n AS BIGINT) AS top_share_micros,"
        "  CAST((share * 1000000) // tot AS BIGINT) AS rev_share_micros"
        " FROM sh"
    )


def _leave_last_k_sql() -> str:
    """Mirror of relational.leave_last_k: row_number descending over
    (ts, event_id) per user, k interpolated."""
    from pdf_parser_ray.pipelines.relational import LEAVE_LAST_K

    return (
        "WITH r AS (SELECT event_id, user_id,"
        "   row_number() OVER (PARTITION BY user_id"
        "     ORDER BY ts DESC, event_id DESC) AS rn FROM events)"
        f" SELECT event_id, user_id, CASE WHEN rn <= {LEAVE_LAST_K}"
        "   THEN 'test' ELSE 'train' END AS split FROM r"
    )


def _assortativity_sql() -> str:
    """Mirror of graph.host_assortativity: oriented endpoint-degree
    pairs over the undirected simple edge set, exact integer moments,
    the shared cov/(√vx·√vy) float fold floored to micros."""
    from pdf_parser_ray.pipelines.graph import PR_NODES

    return (
        f"WITH {_host_edges_expr()},"
        " u AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst)"
        "   AS b FROM e WHERE src <> dst),"
        " adj AS (SELECT a AS x, b AS y FROM u"
        "   UNION ALL SELECT b, a FROM u),"
        " d AS (SELECT x AS node, CAST(count(*) AS BIGINT) AS deg"
        "   FROM adj GROUP BY x),"
        " o AS (SELECT da.deg AS xd, db.deg AS yd FROM adj"
        "   JOIN d da ON da.node = adj.x JOIN d db ON db.node = adj.y),"
        " m AS (SELECT CAST(count(*) AS BIGINT) n,"
        "   CAST(sum(xd) AS BIGINT) sx, CAST(sum(yd) AS BIGINT) sy,"
        "   CAST(sum(xd*yd) AS BIGINT) sxy, CAST(sum(xd*xd) AS BIGINT) sxx,"
        "   CAST(sum(yd*yd) AS BIGINT) syy FROM o)"
        " SELECT CAST(n // 2 AS BIGINT) AS n_edges,"
        "  CAST(floor(CAST(n*sxy - sx*sy AS DOUBLE)"
        "   / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))"
        "      * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) * 1000000) AS BIGINT)"
        "   AS r_micros FROM m"
    )


def _dup_rate_sql() -> str:
    """Mirror of dedup.near_dup_rate_by_source: the two exact-clone
    families rebuilt as UNION ALLs (offsets interpolated), the md5
    survivor rule as a window MIN, integer-micros rate."""
    from pdf_parser_ray.pipelines.dedup import (
        MIRROR_CLONE_OFFSET, REDELIVERY_CLONE_OFFSET,
    )

    return (
        "WITH c AS ("
        "  SELECT doc_id, source, md5(text) AS th FROM documents"
        f"  UNION ALL SELECT doc_id + {MIRROR_CLONE_OFFSET}, 'mirror',"
        "    md5(text) FROM documents WHERE doc_id % 7 = 0"
        f"  UNION ALL SELECT doc_id + {REDELIVERY_CLONE_OFFSET}, source,"
        "    md5(text) FROM documents WHERE doc_id % 11 = 0),"
        " s AS (SELECT *, min(doc_id) OVER (PARTITION BY th) AS survivor"
        "   FROM c),"
        " p AS (SELECT source, count(*) AS n_docs,"
        "   sum(CASE WHEN doc_id <> survivor THEN 1 ELSE 0 END) AS n_dups"
        "   FROM s GROUP BY source)"
        " SELECT source, CAST(n_docs AS BIGINT) AS n_docs,"
        "  CAST(n_dups AS BIGINT) AS n_dups,"
        "  CAST((n_dups * 1000000) // n_docs AS BIGINT) AS dup_micros"
        " FROM p"
    )


def _cume_dist_sql() -> str:
    """Mirror of relational.value_cume_dist: peer-inclusive running
    count (RANGE window default) over cents per type — the exact
    integer (cnt_le · 1e6) // n, no float cume_dist anywhere."""
    return (
        "WITH h AS (SELECT event_id, event_type,"
        "   CAST(round(value*100) AS BIGINT) AS cents FROM events)"
        " SELECT event_id, event_type,"
        "  CAST((count(*) OVER (PARTITION BY event_type ORDER BY cents)"
        "    * 1000000) // (count(*) OVER (PARTITION BY event_type))"
        "   AS BIGINT) AS cd_micros"
        " FROM h"
    )


def _fuzzy_pairs_sql() -> str:
    """Mirror of dedup.fuzzy_name_pairs: brute-force distinct-pair
    levenshtein = 1 — valid because the deletion-neighborhood candidate
    generation is COMPLETE for edit distance 1 (every distance-1 pair
    shares a same-index deletion or an indel key by construction; the
    substitution family is exercised by the planted-synthetic unit
    test, the indel family by the real corpus)."""
    return (
        "WITH d AS (SELECT DISTINCT p_name FROM part)"
        " SELECT a.p_name AS name_a, b.p_name AS name_b"
        " FROM d a JOIN d b ON a.p_name < b.p_name"
        " WHERE levenshtein(a.p_name, b.p_name) = 1"
    )


def _gini_sql() -> str:
    """Mirror of relational.gini_customer_revenue: the sorted-rank
    identity through HUGEINT; one floor division at the end (numerator
    non-negative, so // is a true floor)."""
    return (
        "WITH r AS (SELECT o_custkey AS ck,"
        "   SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS rev"
        "   FROM orders GROUP BY 1),"
        " s AS (SELECT rev, row_number() OVER (ORDER BY rev, ck) AS rn"
        "   FROM r),"
        " m AS (SELECT CAST(count(*) AS HUGEINT) AS n,"
        "   CAST(sum(rev) AS HUGEINT) AS s0,"
        "   CAST(sum(CAST(rn AS HUGEINT) * rev) AS HUGEINT) AS s1 FROM s)"
        " SELECT CAST(n AS BIGINT) AS n_customers,"
        "  CAST(s0 AS BIGINT) AS total_cc,"
        "  CAST(((2*s1 - (n+1)*s0) * 1000000) // (n*s0) AS BIGINT)"
        "    AS gini_micros FROM m"
    )


def _autocorr_sql() -> str:
    """Mirror of relational.user_value_autocorr: LAG pairs per user,
    exact integer moment sums, the SAME IEEE expression
    cov / (sqrt(vx)·sqrt(vy)) floored to micros (the ols_residuals
    float discipline); n >= 2 pairs and positive variances on both
    sides."""
    return (
        "WITH h AS (SELECT user_id,"
        "   CAST(round(value*100) AS BIGINT) AS cents, ts, event_id"
        "   FROM events),"
        " l AS (SELECT user_id, cents AS y,"
        "   lag(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        "     AS x FROM h),"
        " p AS (SELECT user_id, x, y FROM l WHERE x IS NOT NULL),"
        " m AS (SELECT user_id, CAST(count(*) AS BIGINT) n,"
        "   CAST(sum(x) AS BIGINT) sx, CAST(sum(y) AS BIGINT) sy,"
        "   CAST(sum(x*y) AS BIGINT) sxy, CAST(sum(x*x) AS BIGINT) sxx,"
        "   CAST(sum(y*y) AS BIGINT) syy FROM p GROUP BY user_id),"
        " f AS (SELECT user_id, n, n*sxx - sx*sx AS vx,"
        "   n*syy - sy*sy AS vy, n*sxy - sx*sy AS cov FROM m WHERE n >= 2)"
        " SELECT user_id, n AS n_pairs,"
        "  CAST(floor(CAST(cov AS DOUBLE)"
        "   / (sqrt(CAST(vx AS DOUBLE)) * sqrt(CAST(vy AS DOUBLE)))"
        "   * 1000000) AS BIGINT) AS r_micros"
        " FROM f WHERE vx > 0 AND vy > 0"
    )


def _robust_outliers_sql() -> str:
    """Mirror of relational.robust_value_outliers: both discrete
    medians via the integer index rn = (n+1)//2 (the quantile_disc
    convention event_quantiles pins), the deviation histogram joined
    back, and the 3·MAD gate with the multiplier interpolated."""
    from pdf_parser_ray.pipelines.relational import MAD_OUTLIER_MULT

    return (
        "WITH h AS (SELECT event_type,"
        "   CAST(round(value*100) AS BIGINT) AS cents FROM events),"
        " r AS (SELECT event_type, cents,"
        "   row_number() OVER (PARTITION BY event_type ORDER BY cents) rn,"
        "   count(*) OVER (PARTITION BY event_type) n FROM h),"
        " med AS (SELECT event_type, cents AS med, n FROM r"
        "   WHERE rn = (n + 1) // 2),"
        " d AS (SELECT h.event_type, abs(h.cents - med.med) AS dev, med.med"
        "   FROM h JOIN med USING (event_type)),"
        " r2 AS (SELECT event_type, dev, med,"
        "   row_number() OVER (PARTITION BY event_type ORDER BY dev) rn,"
        "   count(*) OVER (PARTITION BY event_type) n FROM d),"
        " mad AS (SELECT event_type, dev AS mad, med FROM r2"
        "   WHERE rn = (n + 1) // 2)"
        " SELECT d.event_type, CAST(mad.med AS BIGINT) AS med_cents,"
        "  CAST(mad.mad AS BIGINT) AS mad_cents,"
        "  CAST(sum(CASE WHEN d.dev >"
        f"   {MAD_OUTLIER_MULT} * mad.mad THEN 1 ELSE 0 END) AS BIGINT)"
        "   AS n_outliers,"
        "  CAST(count(*) AS BIGINT) AS n"
        " FROM d JOIN mad USING (event_type) GROUP BY 1, 2, 3"
    )


def _value_deciles_sql() -> str:
    """Mirror of relational.customer_value_deciles: SQL ntile over
    (rev ASC, custkey ASC) — the pipeline reproduces ntile's
    first-tiles-take-the-remainder sizing from global ranks."""
    from pdf_parser_ray.pipelines.relational import VALUE_DECILES

    return (
        "WITH r AS (SELECT o_custkey AS ck,"
        "   SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS rev"
        "   FROM orders GROUP BY 1),"
        f" t AS (SELECT ck, rev, ntile({VALUE_DECILES})"
        "   OVER (ORDER BY rev, ck) - 1 AS decile FROM r)"
        " SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,"
        "  CAST(sum(rev) AS BIGINT) AS total_cc,"
        "  CAST(min(rev) AS BIGINT) AS min_cc,"
        "  CAST(max(rev) AS BIGINT) AS max_cc"
        " FROM t GROUP BY decile"
    )


def _event_trigrams_sql() -> str:
    """Mirror of relational.event_trigrams: two LEADs over the
    (user, ts, event_id) window, top-k by (n DESC, t1, t2, t3) with k
    interpolated from the pipeline default."""
    import inspect

    from pdf_parser_ray.pipelines import relational

    k = inspect.signature(relational.event_trigrams).parameters["k"].default
    return (
        "WITH s AS (SELECT user_id, event_type AS t1,"
        "   lead(event_type, 1) OVER w AS t2,"
        "   lead(event_type, 2) OVER w AS t3,"
        "   lead(user_id, 2) OVER w AS u3"
        "  FROM events WINDOW w AS"
        "   (PARTITION BY user_id ORDER BY ts, event_id))"
        " SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n FROM s"
        " WHERE t3 IS NOT NULL GROUP BY 1, 2, 3"
        f" ORDER BY n DESC, t1, t2, t3 LIMIT {k}"
    )


def _cosine_bands_sql() -> str:
    """Mirror of similarity.cosine_band_histogram: the quantizer CTEs,
    the deterministic (i, (i+off) mod n) ring pairs, and the
    positive-shifted floor banding — every constant interpolated."""
    from pdf_parser_ray.pipelines import similarity as sim

    offs = ", ".join(str(o) for o in sim.SIM_OFFSETS)
    levels = float(sim.QUANT_LEVELS)
    step, shift = sim.SIM_BAND_STEP, sim._SIM_BAND_SHIFT
    return (
        "WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),"
        " a AS (SELECT CAST(max(abs(x)) AS DOUBLE) AS a FROM"
        "   (SELECT unnest(e) AS x FROM v)),"
        " nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),"
        " u AS (SELECT vec_id, unnest(e) AS x,"
        "   generate_subscripts(e, 1) AS i FROM v),"
        " q AS (SELECT u.vec_id, u.i,"
        f"   CAST(floor(CAST(u.x AS DOUBLE) * {levels} / a.a) AS BIGINT)"
        "     AS qv FROM u CROSS JOIN a),"
        " pairs AS (SELECT v.vec_id AS i, (v.vec_id + o.off) % nn.n AS j"
        f"   FROM v CROSS JOIN (SELECT unnest([{offs}]) AS off) o"
        "    CROSS JOIN nn),"
        " d AS (SELECT p.i, p.j, CAST(sum(qa.qv * qb.qv) AS BIGINT) AS qdot"
        "   FROM pairs p JOIN q qa ON qa.vec_id = p.i"
        "    JOIN q qb ON qb.vec_id = p.j AND qa.i = qb.i"
        "   GROUP BY p.i, p.j)"
        f" SELECT (qdot + {shift}) // {step} - {shift // step} AS band,"
        "  CAST(count(*) AS BIGINT) AS n_pairs FROM d GROUP BY 1"
    )


def _decontaminate_sql() -> str:
    """Mirror of filter.decontaminate over the near-dup-augmented corpus:
    the clone construction (every 7th real doc, every 10th word dropped)
    is rebuilt in SQL with an indexed list_filter (DuckDB lambda ``i`` is
    1-based: ``i % 10 != 0`` == Python's 0-based ``k % 10 != 9``), word
    8-grams via inclusive list slices, and benchmark membership is the
    same every-97th-REAL-doc rule on both sides."""
    from pdf_parser_ray.pipelines.dedup import NEAR_DUP_ID_OFFSET
    from pdf_parser_ray.pipelines.filter import DECON_MOD, DECON_NGRAM

    n, off = DECON_NGRAM, NEAR_DUP_ID_OFFSET
    member = f"(doc_id % {DECON_MOD} = 0 AND doc_id < {off})"
    return (
        f"WITH corpus AS (SELECT doc_id, {_WORDS_EXPR} AS w FROM documents"
        f"   UNION ALL SELECT doc_id + {off} AS doc_id,"
        f"     list_filter({_WORDS_EXPR}, (x, i) -> i % 10 != 0) AS w"
        "     FROM documents WHERE doc_id % 7 = 0),"
        " grams AS (SELECT doc_id,"
        f"   array_to_string(w[CAST(i AS INT):CAST(i AS INT) + {n - 1}], ' ') AS g"
        f"   FROM (SELECT doc_id, w, unnest(range(1, len(w) - {n - 2})) AS i"
        "         FROM corpus)),"
        f" bench AS (SELECT DISTINCT g FROM grams WHERE {member}),"
        " hits AS (SELECT gr.doc_id, count(DISTINCT gr.g) AS n_hits"
        "   FROM grams gr JOIN bench b ON gr.g = b.g GROUP BY gr.doc_id)"
        " SELECT c.doc_id,"
        f"  CAST(CASE WHEN {member.replace('doc_id', 'c.doc_id')} THEN 1 ELSE 0 END"
        "    AS BIGINT) AS is_benchmark,"
        "  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,"
        f"  CASE WHEN {member.replace('doc_id', 'c.doc_id')} THEN 'benchmark'"
        "    WHEN coalesce(h.n_hits, 0) > 0 THEN 'contaminated' ELSE '' END"
        "    AS verdict"
        " FROM corpus c LEFT JOIN hits h ON c.doc_id = h.doc_id"
    )


def _jaccard_pairs_sql(threshold_millis: int) -> str:
    """Brute-force word-3-gram Jaccard pair mirror of the MinHash/anchor
    LSH dedup operators over the clone-augmented corpus (same clone rule
    as _decontaminate_sql).  The SQL enumerates ALL qualifying pairs;
    the pipelines enumerate LSH candidates — equality holds because the
    candidate stages are empirically complete at the oracle scales
    (pinned by tests/test_dedup_recall.py goldens and the oracle run
    itself).  Millis use the pipeline's divide-then-multiply-then-trunc
    float order."""
    from pdf_parser_ray.pipelines.dedup import NEAR_DUP_ID_OFFSET

    off = NEAR_DUP_ID_OFFSET
    return (
        f"SELECT * FROM ("
        f" WITH corpus AS (SELECT doc_id, {_WORDS_EXPR} AS w FROM documents"
        f"   UNION ALL SELECT doc_id + {off} AS doc_id,"
        f"     list_filter({_WORDS_EXPR}, (x, i) -> i % 10 != 0) AS w"
        "     FROM documents WHERE doc_id % 7 = 0),"
        " grams AS ("
        "   SELECT DISTINCT doc_id,"
        "     array_to_string(w[CAST(i AS INT):CAST(i AS INT) + 2], ' ') AS g"
        "   FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i"
        "         FROM corpus WHERE len(w) >= 3)"
        "   UNION"
        "   SELECT doc_id, array_to_string(w, ' ') AS g"
        "   FROM corpus WHERE len(w) BETWEEN 1 AND 2),"
        " sz AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),"
        " ix AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,"
        "   count(*) AS i FROM grams a JOIN grams b"
        "   ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)"
        " SELECT CAST(doc_id_a AS BIGINT) AS doc_id_a,"
        "  CAST(doc_id_b AS BIGINT) AS doc_id_b,"
        "  CAST(trunc((CAST(ix.i AS DOUBLE) / (sa.n + sb.n - ix.i)) * 1000)"
        "    AS BIGINT) AS jaccard_millis"
        " FROM ix JOIN sz sa ON ix.doc_id_a = sa.doc_id"
        " JOIN sz sb ON ix.doc_id_b = sb.doc_id"
        f") WHERE jaccard_millis >= {threshold_millis}"
    )


def _incremental_sql(threshold_millis: int) -> str:
    """Mirror of dedup.incremental_dedup: the deterministic delta
    (odd ids, exact re-crawls of every 11th base doc, word-dropped
    re-crawls of every 7th), exact verdicts by text equality (the
    pipeline's md5 digests are equality stand-ins), near verdicts by
    brute-force delta-x-base word-3-gram Jaccard — valid while the
    cross-side LSH candidate stage is complete on the test corpora
    (guarded by test_dedup_recall's brute-force equality test)."""
    from pdf_parser_ray.pipelines.dedup import (
        NEAR_DUP_ID_OFFSET,
        RECRAWL_EXACT_OFFSET,
    )

    return (
        "WITH base AS (SELECT doc_id, text FROM documents"
        "   WHERE doc_id % 2 = 0),"
        " delta AS ("
        "   SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1"
        f"  UNION ALL SELECT doc_id + {RECRAWL_EXACT_OFFSET} AS doc_id, text"
        "     FROM documents WHERE doc_id % 22 = 0"
        f"  UNION ALL SELECT doc_id + {NEAR_DUP_ID_OFFSET} AS doc_id,"
        f"    array_to_string(list_filter({_WORDS_EXPR},"
        "      (x, i) -> i % 10 != 0), ' ') AS text"
        "     FROM documents WHERE doc_id % 14 = 0),"
        " corpus AS ("
        f"  SELECT doc_id, {_WORDS_EXPR} AS w FROM base"
        f"  UNION ALL SELECT doc_id, {_WORDS_EXPR} AS w FROM delta),"
        " grams AS ("
        "   SELECT DISTINCT doc_id,"
        "     array_to_string(w[CAST(i AS INT):CAST(i AS INT) + 2], ' ') AS g"
        "   FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i"
        "         FROM corpus WHERE len(w) >= 3)"
        "   UNION"
        "   SELECT doc_id, array_to_string(w, ' ') AS g"
        "   FROM corpus WHERE len(w) BETWEEN 1 AND 2),"
        " sz AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),"
        " ix AS (SELECT d.doc_id AS doc_id_a, b.doc_id AS doc_id_b,"
        "   count(*) AS i FROM grams d JOIN grams b ON d.g = b.g"
        "   WHERE d.doc_id IN (SELECT doc_id FROM delta)"
        "     AND b.doc_id IN (SELECT doc_id FROM base)"
        "   GROUP BY 1, 2),"
        " near AS (SELECT DISTINCT doc_id_a AS doc_id FROM ix"
        "   JOIN sz sa ON ix.doc_id_a = sa.doc_id"
        "   JOIN sz sb ON ix.doc_id_b = sb.doc_id"
        "   WHERE CAST(trunc((CAST(ix.i AS DOUBLE) / (sa.n + sb.n - ix.i))"
        f"     * 1000) AS BIGINT) >= {threshold_millis}),"
        " ex AS (SELECT DISTINCT d.doc_id FROM delta d"
        "   JOIN base b ON b.text = d.text)"
        " SELECT CAST(d.doc_id AS BIGINT) AS doc_id,"
        "   CASE WHEN d.doc_id IN (SELECT doc_id FROM ex) THEN 'exact_dup'"
        "        WHEN d.doc_id IN (SELECT doc_id FROM near) THEN 'near_dup'"
        "        ELSE 'new' END AS verdict"
        " FROM delta d"
    )


def _simhash_sql() -> str:
    """Full mirror of dedup.simhash_dedup over the clone-augmented
    corpus: the char-wise polynomial token hash (Z/(2^61-1), same
    family as rolling_fingerprint — chosen so blake2b's no_oracle gap
    closes), per-bit majority-vote signatures, 4x16-bit banding,
    hamming <= 6 within band buckets, and the overflow-recovery rule
    (VERDICT r03 ask #3): a band group whose total pair count exceeds
    MAX_PAIRS_PER_GROUP is re-banded by full signature — identical-sig
    classes emit ALL their hamming-0 pairs uncapped, while cross-sig
    pairs are emitted in (a, b) order up to the cap (stop at the 50th
    qualifying pair) with the unexamined remainder reported as
    per-coarse-bucket marker rows (doc_id_a = -1, doc_id_b = coarse,
    hamming = unexamined-cross-pair count)."""
    from pdf_parser_ray.pipelines.dedup import (
        _COARSE_BUCKETS,
        _SIMHASH_HASH_BASE,
        _SIMHASH_HASH_MOD,
        MAX_PAIRS_PER_GROUP,
        NEAR_DUP_ID_OFFSET,
    )

    off = NEAR_DUP_ID_OFFSET
    cap = MAX_PAIRS_PER_GROUP
    return (
        f"WITH corpus AS (SELECT doc_id, {_WORDS_EXPR} AS w FROM documents"
        f"   UNION ALL SELECT doc_id + {off} AS doc_id,"
        f"     list_filter({_WORDS_EXPR}, (x, i) -> i % 10 != 0) AS w"
        "     FROM documents WHERE doc_id % 7 = 0),"
        " tok AS (SELECT DISTINCT doc_id, unnest(w) AS t FROM corpus),"
        " th AS (SELECT t, CAST(list_reduce(list_transform("
        "     range(1, length(t) + 1),"
        "     i -> CAST(ord(substr(t, CAST(i AS INT), 1)) AS HUGEINT)),"
        f"     (a, b) -> (a * {_SIMHASH_HASH_BASE} + b) % {_SIMHASH_HASH_MOD})"
        "     AS BIGINT) AS h"
        "   FROM (SELECT DISTINCT t FROM tok)),"
        " bit AS (SELECT t, j, CAST((CAST(h AS HUGEINT) //"
        "     (CAST(1 AS HUGEINT) << CAST(j AS INT))) % 2 AS BIGINT) AS bit"
        "   FROM th, range(0, 61) AS r(j)),"
        " v AS (SELECT tok.doc_id, j, sum(bit) AS s, count(*) AS n"
        "   FROM tok JOIN bit USING (t) GROUP BY tok.doc_id, j),"
        " sig AS (SELECT doc_id, CAST(sum(CASE WHEN 2 * s > n"
        "     THEN CAST(1 AS HUGEINT) << CAST(j AS INT) ELSE 0 END)"
        "     AS BIGINT) AS sig FROM v GROUP BY doc_id),"
        " band AS (SELECT doc_id, sig, b, CAST((CAST(sig AS HUGEINT) //"
        "     (CAST(1 AS HUGEINT) << CAST(16 * b AS INT))) % 65536"
        "     AS BIGINT) AS bh FROM sig, range(0, 4) AS rb(b)),"
        " pr AS (SELECT x.b, x.bh, x.doc_id AS ida, y.doc_id AS idb,"
        "     x.sig AS siga, y.sig AS sigb,"
        "     bit_count(xor(x.sig, y.sig)) AS ham"
        "   FROM band x JOIN band y"
        "   ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id),"
        " gsz AS (SELECT b, bh, count(*) * (count(*) - 1) // 2 AS total"
        "   FROM band GROUP BY b, bh HAVING count(*) >= 2),"
        f" ovf AS (SELECT b, bh, total FROM gsz WHERE total > {cap}),"
        " csz AS (SELECT c.b, c.bh, sum(c.k * (c.k - 1) // 2) AS nwithin"
        "   FROM (SELECT b, bh, sig, count(*) AS k FROM band"
        "         GROUP BY b, bh, sig) c"
        "   JOIN ovf USING (b, bh) GROUP BY c.b, c.bh),"
        # under the cap: every qualifying pair (truncation impossible)
        " low AS (SELECT pr.ida, pr.idb, pr.ham FROM pr"
        f"   JOIN gsz USING (b, bh) WHERE gsz.total <= {cap}"
        "   AND pr.ham <= 6),"
        # overflow recovery: identical-sig classes, all pairs, ham 0
        " winp AS (SELECT pr.ida, pr.idb, pr.ham FROM pr"
        "   JOIN ovf USING (b, bh) WHERE pr.siga = pr.sigb),"
        # overflow cross-sig pairs: sorted order, capped, accounted
        " cr AS (SELECT pr.b, pr.bh, pr.ida, pr.idb, pr.ham,"
        "     row_number() OVER (PARTITION BY pr.b, pr.bh"
        "       ORDER BY pr.ida, pr.idb) AS pos"
        "   FROM pr JOIN ovf USING (b, bh) WHERE pr.siga <> pr.sigb),"
        " qq AS (SELECT *, row_number() OVER (PARTITION BY b, bh"
        "     ORDER BY ida, idb) AS qrank FROM cr WHERE ham <= 6),"
        f" stop AS (SELECT b, bh, max(CASE WHEN qrank = {cap} THEN pos END)"
        "     AS stop_pos FROM qq GROUP BY b, bh),"
        " dropped AS (SELECT o.b, o.bh, CASE WHEN s.stop_pos IS NOT NULL"
        "     THEN (o.total - coalesce(c.nwithin, 0)) - s.stop_pos"
        "     ELSE 0 END AS d"
        "   FROM ovf o LEFT JOIN stop s ON o.b = s.b AND o.bh = s.bh"
        "   LEFT JOIN csz c ON o.b = c.b AND o.bh = c.bh)"
        " SELECT DISTINCT CAST(ida AS BIGINT) AS doc_id_a,"
        "   CAST(idb AS BIGINT) AS doc_id_b, CAST(ham AS BIGINT) AS hamming"
        " FROM (SELECT ida, idb, ham FROM low"
        "   UNION ALL SELECT ida, idb, ham FROM winp"
        f"  UNION ALL SELECT ida, idb, ham FROM qq WHERE qrank <= {cap})"
        " UNION ALL"
        f" SELECT CAST(-1 AS BIGINT), CAST(bh % {_COARSE_BUCKETS} AS BIGINT),"
        "   CAST(sum(d) AS BIGINT)"
        f" FROM dropped GROUP BY bh % {_COARSE_BUCKETS} HAVING sum(d) > 0"
    )


def _substring_dedup_sql() -> str:
    """Mirror of dedup.substring_dedup over the clone-augmented corpus:
    distinct word-8-grams per doc, a gram is 'shared' when >= 2 distinct
    docs carry it (the SQL joins on gram text; the pipeline exchanges
    64-bit gram hashes — equal absent a same-pair collision)."""
    from pdf_parser_ray.pipelines.dedup import NEAR_DUP_ID_OFFSET, SUBSTR_NGRAM

    off, n = NEAR_DUP_ID_OFFSET, SUBSTR_NGRAM
    return (
        f"WITH corpus AS (SELECT doc_id, {_WORDS_EXPR} AS w FROM documents"
        f"   UNION ALL SELECT doc_id + {off} AS doc_id,"
        f"     list_filter({_WORDS_EXPR}, (x, i) -> i % 10 != 0) AS w"
        "     FROM documents WHERE doc_id % 7 = 0),"
        " grams AS (SELECT DISTINCT doc_id,"
        f"   array_to_string(w[CAST(i AS INT):CAST(i AS INT) + {n - 1}], ' ')"
        "     AS g"
        f"  FROM (SELECT doc_id, w, unnest(range(1, len(w) - {n - 2})) AS i"
        f"        FROM corpus WHERE len(w) >= {n})),"
        " gc AS (SELECT g, count(DISTINCT doc_id) AS nd FROM grams GROUP BY g),"
        " per AS (SELECT grams.doc_id, count(*) AS n_grams,"
        "   sum(CASE WHEN gc.nd >= 2 THEN 1 ELSE 0 END) AS n_shared"
        "   FROM grams JOIN gc USING (g) GROUP BY grams.doc_id)"
        " SELECT c.doc_id,"
        "  CAST(coalesce(per.n_grams, 0) AS BIGINT) AS n_grams,"
        "  CAST(coalesce(per.n_shared, 0) AS BIGINT) AS n_shared_grams"
        " FROM corpus c LEFT JOIN per ON c.doc_id = per.doc_id"
    )


def _clusters_sql(threshold_millis: int = 500) -> str:
    """Mirror of curate.near_dup_clusters: connected components over the
    verified MinHash pair set, cluster_id = min doc_id, via a recursive
    min-label transitive closure (component sizes are tiny — planted
    clone pairs — so the closure stays linear in practice)."""
    return (
        "WITH RECURSIVE pairs AS ("
        + _jaccard_pairs_sql(threshold_millis)
        + "),"
        " edges AS (SELECT doc_id_a AS u, doc_id_b AS v FROM pairs"
        "   UNION ALL SELECT doc_id_b, doc_id_a FROM pairs),"
        " reach(node, label) AS ("
        "   SELECT u, u FROM edges"
        "   UNION"
        "   SELECT e.v, r.label FROM reach r JOIN edges e ON e.u = r.node),"
        " cc AS (SELECT node, min(label) AS cid FROM reach GROUP BY node)"
        " SELECT CAST(node AS BIGINT) AS doc_id,"
        "  CAST(cid AS BIGINT) AS cluster_id,"
        "  CAST(count(*) OVER (PARTITION BY cid) AS BIGINT) AS cluster_size"
        " FROM cc"
    )


def _curate_documents_sql(min_tokens: int = 10) -> str:
    """Mirror of curate.curate_documents over the clone-augmented corpus:
    verdict priority near_dup > exact_dup > too_short > low_quality,
    language pick and quality rules identical to the langid /
    quality_filter mirrors (exact-dup drops come from the RAW corpus
    only, matching the pipeline)."""
    from pdf_parser_ray.pipelines.analysis import _LANG_PROFILES
    from pdf_parser_ray.pipelines.dedup import NEAR_DUP_ID_OFFSET
    from pdf_parser_ray.pipelines.filter import (
        DISTINCT_PCT, MAX_WORDS, MIN_WORDS, TOP_WORD_PCT,
    )

    off = NEAR_DUP_ID_OFFSET
    langs = sorted(_LANG_PROFILES)
    score_exprs = ", ".join(
        "len(list_filter(lw, x -> list_contains(["
        + ", ".join(f"'{w}'" for w in sorted(_LANG_PROFILES[lang]))
        + f"], x))) AS s_{lang}"
        for lang in langs
    )
    gmax = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    pick = " ".join(
        f"WHEN s_{lang} = gmax THEN '{lang}'" for lang in langs[:-1]
    ) + f" ELSE '{langs[-1]}'"
    return (
        "WITH RECURSIVE pairs AS ("
        + _jaccard_pairs_sql(500)
        + "),"
        " edges AS (SELECT doc_id_a AS u, doc_id_b AS v FROM pairs"
        "   UNION ALL SELECT doc_id_b, doc_id_a FROM pairs),"
        " reach(node, label) AS ("
        "   SELECT u, u FROM edges"
        "   UNION"
        "   SELECT e.v, r.label FROM reach r JOIN edges e ON e.u = r.node),"
        " cc AS (SELECT node, min(label) AS cid FROM reach GROUP BY node),"
        " near_drops AS (SELECT node AS doc_id FROM cc WHERE node <> cid),"
        " exact_drops AS (SELECT doc_id FROM ("
        "   SELECT doc_id, ROW_NUMBER() OVER ("
        "     PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM documents)"
        "   WHERE rn > 1),"
        f" corpus AS (SELECT doc_id, {_WORDS_EXPR} AS w FROM documents"
        f"   UNION ALL SELECT doc_id + {off} AS doc_id,"
        f"     list_filter({_WORDS_EXPR}, (x, i) -> i % 10 != 0) AS w"
        "     FROM documents WHERE doc_id % 7 = 0),"
        " wx AS (SELECT doc_id, unnest(w) AS word FROM corpus),"
        " wc AS (SELECT doc_id, word, count(*) AS c FROM wx"
        "   GROUP BY doc_id, word),"
        " agg AS (SELECT doc_id, sum(c) AS n_words, count(*) AS n_distinct,"
        "   max(c) AS top_word_n, sum(c * length(word)) AS swc"
        "   FROM wc GROUP BY doc_id),"
        " lng AS (SELECT doc_id,"
        f"   CASE WHEN nw = 0 OR gmax = 0 THEN 'und' ELSE (CASE {pick} END)"
        "     END AS lang_pred"
        f"   FROM (SELECT doc_id, nw, {gmax} AS gmax,"
        f"     {', '.join(f's_{lang}' for lang in langs)}"
        f"     FROM (SELECT doc_id, len(lw) AS nw, {score_exprs}"
        "       FROM (SELECT doc_id, list_transform(w, x -> lower(x)) AS lw"
        "             FROM corpus))))"
        " SELECT c.doc_id, lng.lang_pred,"
        "  CAST(len(c.w) AS BIGINT) AS n_tokens,"
        "  CASE WHEN nd.doc_id IS NOT NULL THEN 'near_dup'"
        "   WHEN ed.doc_id IS NOT NULL THEN 'exact_dup'"
        f"  WHEN len(c.w) < {min_tokens} THEN 'too_short'"
        f"  WHEN coalesce(a.n_words, 0) < {MIN_WORDS} THEN 'low_quality'"
        f"  WHEN a.n_words > {MAX_WORDS} THEN 'low_quality'"
        "   WHEN 10 * a.swc < 20 * a.n_words THEN 'low_quality'"
        "   WHEN 10 * a.swc > 120 * a.n_words THEN 'low_quality'"
        f"  WHEN 100 * a.top_word_n > {TOP_WORD_PCT} * a.n_words"
        "     THEN 'low_quality'"
        f"  WHEN 100 * a.n_distinct < {DISTINCT_PCT} * a.n_words"
        "     THEN 'low_quality'"
        "   ELSE '' END AS drop_reason"
        " FROM corpus c"
        " LEFT JOIN near_drops nd ON c.doc_id = nd.doc_id"
        " LEFT JOIN exact_drops ed ON c.doc_id = ed.doc_id"
        " LEFT JOIN agg a ON c.doc_id = a.doc_id"
        " LEFT JOIN lng ON c.doc_id = lng.doc_id"
    )


def _kmeans_rounds_sql(vsrc: str) -> tuple[str, str]:
    """Lloyd's iterations unrolled as CTE rounds over ``vsrc`` (a
    subquery yielding (vec_id, e DOUBLE[])) — distance = per-dimension
    sum of squared differences (the same formula the numpy side
    computes), argmin ties to the lowest cluster index via ROW_NUMBER,
    empty clusters keep the previous centroid via COALESCE.  Returns
    (cte_chain, final_assignment_cte_name); the chain defines ``vv``
    (the vectors) through ``asg{iters+1}`` (vec_id, j)."""
    from pdf_parser_ray.pipelines.cluster import KM_ITERS, KM_K

    parts = [
        f"vv AS ({vsrc}),"
        " ed AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS d,"
        "   e[CAST(i AS INT)] AS x"
        "   FROM (SELECT vec_id, e, unnest(range(1, len(e) + 1)) AS i"
        "         FROM vv)),"
        " dims AS (SELECT DISTINCT d FROM ed),"
        " cent0 AS (SELECT jj.j, dims.d,"
        "   (((jj.j * 61 + dims.d * 53) % 41) - 20) / 20.0 AS c"
        f"  FROM (SELECT unnest(range({KM_K})) AS j) jj, dims)"
    ]
    for t in range(1, KM_ITERS + 2):
        parts.append(
            f", dist{t} AS (SELECT ed.vec_id, c.j,"
            "   sum((ed.x - c.c) * (ed.x - c.c)) AS dd"
            f"  FROM ed JOIN cent{t - 1} c ON ed.d = c.d"
            "   GROUP BY ed.vec_id, c.j),"
            f" asg{t} AS (SELECT vec_id, j FROM (SELECT vec_id, j,"
            "   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dd, j) AS rn"
            f"  FROM dist{t}) WHERE rn = 1)"
        )
        if t <= KM_ITERS:
            parts.append(
                f", sums{t} AS (SELECT a.j, ed.d, sum(ed.x) AS s,"
                "   count(*) AS n"
                f"  FROM asg{t} a JOIN ed ON a.vec_id = ed.vec_id"
                "   GROUP BY a.j, ed.d),"
                f" cent{t} AS (SELECT c0.j, c0.d, coalesce(s.s / s.n, c0.c) AS c"
                f"  FROM cent{t - 1} c0 LEFT JOIN sums{t} s"
                "   ON c0.j = s.j AND c0.d = s.d)"
            )
    return "".join(parts), f"asg{KM_ITERS + 1}"


_RAW_VECS_SQL = (
    "SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e"
    " FROM embeddings"
)


def _kmeans_sql() -> str:
    """Mirror of cluster.kmeans_embeddings over the raw vectors."""
    ctes, asg = _kmeans_rounds_sql(_RAW_VECS_SQL)
    return f"WITH {ctes} SELECT vec_id, CAST(j AS BIGINT) AS cluster FROM {asg}"


def _semantic_dedup_sql() -> str:
    """Mirror of cluster.semantic_dedup: k-means over the clone-augmented
    vectors (same augmentation as _embedding_dedup_sql), then keep=0 for
    a vector when a smaller-id same-cluster vector clears the
    trunc-millis cosine threshold."""
    from pdf_parser_ray.pipelines.cluster import SEMDEDUP_THRESHOLD_MILLIS
    from pdf_parser_ray.pipelines.dedup import NEAR_DUP_ID_OFFSET

    off = NEAR_DUP_ID_OFFSET
    aug = (
        "SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e"
        " FROM embeddings"
        f" UNION ALL SELECT vec_id + {off} AS vec_id,"
        " list_transform(embedding, (x, i) -> CAST(x AS DOUBLE)"
        " + ((((vec_id * 31 + (i - 1) * 17) % 97) - 48) / 4800.0)) AS e"
        " FROM embeddings WHERE vec_id % 9 = 0"
    )
    ctes, asg = _kmeans_rounds_sql(aug)
    return (
        f"WITH {ctes},"
        " sim AS (SELECT a.vec_id,"
        "   max(CASE WHEN CAST(trunc(list_cosine_similarity(va.e, vb.e)"
        f"    * 1000) AS BIGINT) >= {SEMDEDUP_THRESHOLD_MILLIS}"
        "    THEN 1 ELSE 0 END) AS has_dup"
        f"  FROM {asg} a JOIN {asg} b ON a.j = b.j AND b.vec_id < a.vec_id"
        "   JOIN vv va ON va.vec_id = a.vec_id"
        "   JOIN vv vb ON vb.vec_id = b.vec_id"
        "   GROUP BY a.vec_id)"
        f" SELECT a.vec_id, CAST(a.j AS BIGINT) AS cluster,"
        "  CAST(CASE WHEN coalesce(sim.has_dup, 0) = 1 THEN 0 ELSE 1 END"
        "    AS BIGINT) AS keep"
        f" FROM {asg} a LEFT JOIN sim ON a.vec_id = sim.vec_id"
    )


def _embedding_dedup_sql(threshold_millis: int = 990) -> str:
    """Mirror of dedup.embedding_dedup: the clone perturbation and the
    LSH hyperplanes are integer-formula-derived (dedup._clone_noise /
    dedup._hyperplanes), so the SQL recomputes the exact same float64
    values; pairs join on equal 12-bit sign buckets and keep exact
    cosine >= the trunc-millis threshold."""
    from pdf_parser_ray.pipelines.dedup import _EMB_PLANES, NEAR_DUP_ID_OFFSET

    off = NEAR_DUP_ID_OFFSET
    return (
        "WITH v AS ("
        " SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e"
        "  FROM embeddings"
        " UNION ALL"
        f" SELECT vec_id + {off} AS vec_id,"
        "  list_transform(embedding, (x, i) -> CAST(x AS DOUBLE)"
        "   + ((((vec_id * 31 + (i - 1) * 17) % 97) - 48) / 4800.0)) AS e"
        "  FROM embeddings WHERE vec_id % 9 = 0),"
        " ed AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS d,"
        "   e[CAST(i AS INT)] AS x"
        "   FROM (SELECT vec_id, e, unnest(range(1, len(e) + 1)) AS i FROM v)),"
        " dots AS (SELECT vec_id, pp.p AS p,"
        "   sum(x * ((((d * 131 + pp.p * 137) % 251) - 125) / 125.0)) AS dot"
        f"  FROM ed CROSS JOIN (SELECT unnest(range({_EMB_PLANES})) AS p) pp"
        "   GROUP BY vec_id, pp.p),"
        " bk AS (SELECT vec_id, CAST(sum(CASE WHEN dot > 0"
        "   THEN 1 << CAST(p AS INT) ELSE 0 END) AS BIGINT) AS bucket"
        "   FROM dots GROUP BY vec_id),"
        " vb AS (SELECT bk.vec_id, bk.bucket, v.e FROM bk JOIN v USING (vec_id)),"
        " pr AS (SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,"
        "   CAST(trunc(list_cosine_similarity(a.e, b.e) * 1000) AS BIGINT)"
        "     AS cos_millis"
        "   FROM vb a JOIN vb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)"
        f" SELECT * FROM pr WHERE cos_millis >= {threshold_millis}"
    )


def _knn_lsh_sql(query_vec_id: int = 0, k: int = 10) -> str:
    """Shared mirror of knn_lsh AND knn_ivf (identical planes, probe
    set, scoring, ranking — the IVF index holds the same vectors, just
    partitioned): 8 integer-formula hyperplanes bucket every vector,
    candidates are the query's bucket plus its eight 1-bit XOR flips,
    ranked by trunc-micros cosine with a vec_id tie-break (truncation
    on both sides — np.rint's half-to-even vs SQL round's half-away
    would be a latent divergence)."""
    from pdf_parser_ray.pipelines.similarity import _LSH_BITS

    return (
        "WITH v AS (SELECT vec_id,"
        "   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e"
        "   FROM embeddings),"
        " ed AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS d,"
        "   e[CAST(i AS INT)] AS x"
        "   FROM (SELECT vec_id, e, unnest(range(1, len(e) + 1)) AS i"
        "         FROM v)),"
        " dots AS (SELECT vec_id, pp.p AS p,"
        "   sum(x * ((((d * 131 + pp.p * 137) % 251) - 125) / 125.0)) AS dot"
        f"  FROM ed CROSS JOIN (SELECT unnest(range({_LSH_BITS})) AS p) pp"
        "   GROUP BY vec_id, pp.p),"
        " bk AS (SELECT vec_id, CAST(sum(CASE WHEN dot > 0"
        "   THEN 1 << CAST(p AS INT) ELSE 0 END) AS BIGINT) AS bucket"
        "   FROM dots GROUP BY vec_id),"
        f" qb AS (SELECT bucket FROM bk WHERE vec_id = {query_vec_id}),"
        " probes AS (SELECT bucket AS b FROM qb"
        "   UNION SELECT xor(qb.bucket, 1 << CAST(t.p AS INT))"
        f"  FROM qb CROSS JOIN (SELECT unnest(range({_LSH_BITS})) AS p) t),"
        f" q AS (SELECT e FROM v WHERE vec_id = {query_vec_id})"
        " SELECT v.vec_id,"
        "  CAST(trunc(list_cosine_similarity(v.e, q.e) * 1000000) AS BIGINT)"
        "    AS cos_micros"
        " FROM v JOIN bk USING (vec_id) CROSS JOIN q"
        f" WHERE bk.bucket IN (SELECT b FROM probes) AND v.vec_id <> {query_vec_id}"
        f" ORDER BY cos_micros DESC, v.vec_id LIMIT {k}"
    )


def _pack_sql() -> str:
    """Mirror of pack.pack_sequences: per-bucket window cumulative sum of
    whitespace token counts, integer-divided into seq_len packs."""
    from pdf_parser_ray.pipelines.pack import PACK_BUCKETS, PACK_SEQ_LEN

    return (
        f"WITH t AS (SELECT doc_id, doc_id % {PACK_BUCKETS} AS bucket,"
        f"   CAST(len({_WORDS_EXPR}) AS BIGINT) AS n_tokens FROM documents),"
        " c AS (SELECT doc_id, bucket, n_tokens,"
        "   CAST(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id"
        "     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens"
        "     AS BIGINT) AS s FROM t)"
        " SELECT doc_id, CAST(bucket AS BIGINT) AS bucket, n_tokens,"
        f"  CAST(s // {PACK_SEQ_LEN} AS BIGINT) AS pack_id,"
        f"  CAST(s % {PACK_SEQ_LEN} AS BIGINT) AS pack_offset FROM c"
    )


def _perplexity_sql() -> str:
    """Mirror of analysis.perplexity_scores: interpolated bigram LM
    (lambda = .75) in floored integer micros.  Unigram table capped at
    top-V by (count DESC, word ASC); bigram table restricted to
    capped-vocab pairs, then capped at top-V by (count DESC, w1, w2);
    N stays the full-corpus token total.  Unseen pair -> 0.25*c2/N
    backoff; OOV w2 -> 0.25*1/N.  ppl = floor(exp(-lp / (n*1e6)) *
    1e6), -1 for docs with < 2 words — all arithmetic orders match the
    Ray pipeline exactly so floor() agrees bit-for-bit.  Shared by the
    perplexity_scores and ccnet_buckets oracles."""
    from pdf_parser_ray.pipelines.analysis import (
        ORACLE_VOCAB_CAP as _VOCAB_CAP_SQL,
    )

    return (
        f"WITH wl AS (SELECT doc_id, {_WORDS_EXPR} AS w FROM documents),"
        " wt AS (SELECT doc_id, unnest(w) AS word FROM wl),"
        " uc AS (SELECT word, count(*) AS c FROM wt GROUP BY word),"
        " t AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM uc),"
        " top AS (SELECT word, c FROM (SELECT word, c,"
        "   row_number() OVER (ORDER BY c DESC, word) AS rk FROM uc)"
        f"   WHERE rk <= {_VOCAB_CAP_SQL}),"
        " b AS (SELECT doc_id, unnest(w[1:len(w)-1]) AS w1,"
        "   unnest(w[2:len(w)]) AS w2 FROM wl WHERE len(w) >= 2),"
        " bc AS (SELECT b.w1, b.w2, count(*) AS c12 FROM b"
        "   JOIN top t1 ON b.w1 = t1.word JOIN top t2 ON b.w2 = t2.word"
        "   GROUP BY b.w1, b.w2),"
        " btop AS (SELECT w1, w2, c12 FROM (SELECT w1, w2, c12,"
        "   row_number() OVER (ORDER BY c12 DESC, w1, w2) AS rk FROM bc)"
        f"   WHERE rk <= {_VOCAB_CAP_SQL}),"
        " bm AS (SELECT btop.w1, btop.w2, CAST(floor(ln("
        "   0.75 * (CAST(btop.c12 AS DOUBLE) / t1.c)"
        "   + 0.25 * (CAST(t2.c AS DOUBLE) / t.n)) * 1000000) AS BIGINT)"
        "   AS m FROM btop JOIN top t1 ON btop.w1 = t1.word"
        "   JOIN top t2 ON btop.w2 = t2.word CROSS JOIN t),"
        " fm AS (SELECT word, CAST(floor(ln("
        "   0.25 * (CAST(c AS DOUBLE) / t.n)) * 1000000) AS BIGINT) AS m"
        "   FROM top CROSS JOIN t),"
        " oov AS (SELECT CAST(floor(ln(0.25 * (1.0 / t.n)) * 1000000)"
        "   AS BIGINT) AS m FROM t),"
        " s AS (SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,"
        "   CAST(sum(coalesce(bm.m, fm.m, oov.m)) AS BIGINT) AS lp"
        "   FROM b LEFT JOIN bm ON b.w1 = bm.w1 AND b.w2 = bm.w2"
        "   LEFT JOIN fm ON b.w2 = fm.word CROSS JOIN oov"
        "   GROUP BY b.doc_id)"
        " SELECT d.doc_id,"
        "  CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,"
        "  CAST(coalesce(s.lp, 0) AS BIGINT) AS logprob_micros,"
        "  CASE WHEN s.n_bigrams IS NULL THEN CAST(-1 AS BIGINT)"
        "   ELSE CAST(floor(exp(-CAST(s.lp AS DOUBLE)"
        "     / (CAST(s.n_bigrams AS DOUBLE) * 1000000.0)) * 1000000)"
        "     AS BIGINT) END AS ppl_micros"
        " FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id"
    )


def _importance_sql() -> str:
    """Mirror of analysis.importance_weights: per-word unigram log-ratio
    (add-one-smoothed target / corpus) in floored integer micros, summed
    per token occurrence; ratio table capped at the top-V words by
    (n_all DESC, word ASC) with the smoothing denominator over the
    CAPPED table size; totals stay full-corpus; OOV words take
    (c_t=0, c_all=1).  Shared by the importance_weights and
    dsir_resample oracles."""
    from pdf_parser_ray.pipelines.analysis import (
        ORACLE_VOCAB_CAP as _VOCAB_CAP_SQL,
    )

    return (
        f"WITH w AS (SELECT doc_id, unnest({_WORDS_EXPR}) AS word"
        "   FROM documents),"
        " ca AS (SELECT word, count(*) AS n_all,"
        "   sum(CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END) AS n_tgt"
        "   FROM w GROUP BY word),"
        " tot AS (SELECT sum(n_all) AS na, sum(n_tgt) AS nt FROM ca),"
        " top AS (SELECT word, n_all, n_tgt FROM (SELECT word, n_all,"
        "   n_tgt, row_number() OVER (ORDER BY n_all DESC, word) AS rk"
        f"   FROM ca) WHERE rk <= {_VOCAB_CAP_SQL}),"
        " vs AS (SELECT count(*) AS v FROM top),"
        " r AS (SELECT word,"
        "   CAST(floor(ln((CAST(n_tgt AS DOUBLE) + 1) / (tot.nt + vs.v))"
        "     * 1000000) AS BIGINT)"
        "   - CAST(floor(ln(CAST(n_all AS DOUBLE) / tot.na) * 1000000)"
        "     AS BIGINT) AS m"
        "   FROM top, tot, vs),"
        " oov AS (SELECT"
        "   CAST(floor(ln(1.0 / (tot.nt + vs.v)) * 1000000) AS BIGINT)"
        "   - CAST(floor(ln(1.0 / tot.na) * 1000000) AS BIGINT) AS m"
        "   FROM tot, vs),"
        " s AS (SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_words,"
        "   CAST(sum(coalesce(r.m, oov.m)) AS BIGINT) AS weight_micros"
        "   FROM w LEFT JOIN r USING (word) CROSS JOIN oov"
        "   GROUP BY w.doc_id)"
        " SELECT d.doc_id,"
        "  CAST(coalesce(s.n_words, 0) AS BIGINT) AS n_words,"
        "  CAST(coalesce(s.weight_micros, 0) AS BIGINT) AS weight_micros"
        " FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id"
    )


def _shuffle_sql() -> str:
    """Mirror of pack.shuffle_shards: the two-affine-rounds-with-xor-fold
    key is recomputed exactly in BIGINT (every product < 2^62), then
    shard = key % S and pos = row_number over (shard, ORDER BY key,
    doc_id) — the distributed two-pass rank collapses to one window."""
    from pdf_parser_ray.pipelines.pack import (
        SHUF_A1, SHUF_A2, SHUF_B1, SHUF_B2, SHUF_P, SHUF_SHARDS,
    )

    return (
        "WITH r1 AS (SELECT doc_id,"
        f"   ({SHUF_A1} * (doc_id % {SHUF_P}) + {SHUF_B1}) % {SHUF_P} AS k1"
        "   FROM documents),"
        " r2 AS (SELECT doc_id,"
        f"   ({SHUF_A2} * (xor(k1, k1 >> 17) % {SHUF_P}) + {SHUF_B2})"
        f"     % {SHUF_P} AS kk FROM r1)"
        f" SELECT doc_id, kk % {SHUF_SHARDS} AS shard,"
        f"  row_number() OVER (PARTITION BY kk % {SHUF_SHARDS}"
        "    ORDER BY kk, doc_id) - 1 AS pos"
        " FROM r2"
    )


def _weighted_priority_sql() -> str:
    """Mirror of pack.weighted_priority_sample: the shuffle-key hash
    recomputed in BIGINT, priority = (n_chars · SHUF_P) // (key + 1)
    (every product < 2^62), top-k by (priority DESC, doc_id)."""
    from pdf_parser_ray.pipelines.pack import (
        SHUF_A1, SHUF_A2, SHUF_B1, SHUF_B2, SHUF_P, WPS_K,
    )

    return (
        "WITH r1 AS (SELECT doc_id, n_chars,"
        f"   ({SHUF_A1} * (doc_id % {SHUF_P}) + {SHUF_B1}) % {SHUF_P} AS k1"
        "   FROM documents),"
        " r2 AS (SELECT doc_id, n_chars,"
        f"   ({SHUF_A2} * (xor(k1, k1 >> 17) % {SHUF_P}) + {SHUF_B2})"
        f"     % {SHUF_P} AS kk FROM r1)"
        " SELECT doc_id, n_chars,"
        f"  CAST((n_chars * {SHUF_P}) // (kk + 1) AS BIGINT) AS priority"
        f" FROM r2 ORDER BY priority DESC, doc_id LIMIT {WPS_K}"
    )


def _readability_sql() -> str:
    """Mirror of analysis.readability_scores: RE2 count-matches on both
    engines ([.!?] marks, [aeiou]+ vowel runs over lower()), the
    shared words expression, and the Flesch fold in floor-division
    integer micros with divisors clamped to >= 1."""
    return (
        "WITH b AS (SELECT doc_id,"
        f"  CAST(len({_WORDS_EXPR}) AS BIGINT) AS n_words,"
        "  CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT) AS n_sents,"
        "  CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS BIGINT)"
        "    AS n_syll"
        " FROM documents)"
        " SELECT doc_id, n_words, n_sents, n_syll,"
        " CAST(206835000 - (1015000 * n_words) // greatest(n_sents, 1)"
        "   - (84600000 * n_syll) // greatest(n_words, 1) AS BIGINT)"
        "   AS flesch_micros"
        " FROM b"
    )


def _doc_top_terms_sql() -> str:
    """Mirror of analysis.doc_top_terms: the tfidf_scores idf CTE chain
    (top-V cap by (df DESC, word ASC), ln-floor micros, df=1 OOV
    default) followed by a per-document argmax via row_number ordered
    (score DESC, word ASC) — the pipeline's tie-break."""
    from pdf_parser_ray.pipelines.analysis import ORACLE_VOCAB_CAP

    return (
        f"WITH w AS (SELECT doc_id, unnest({_WORDS_EXPR}) AS word"
        "   FROM documents),"
        " t AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf"
        "   FROM w GROUP BY doc_id, word),"
        " df AS (SELECT word, CAST(count(*) AS BIGINT) AS df"
        "   FROM t GROUP BY word),"
        " top AS (SELECT word, df FROM (SELECT word, df,"
        "   row_number() OVER (ORDER BY df DESC, word) AS rk FROM df)"
        f"   WHERE rk <= {ORACLE_VOCAB_CAP}),"
        " n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),"
        " idf AS (SELECT word,"
        "   CAST(floor(ln(n.n / top.df) * 1000000) AS BIGINT) AS m"
        "   FROM top, n),"
        " oov AS (SELECT CAST(floor(ln(n.n / 1.0) * 1000000) AS BIGINT)"
        "   AS m FROM n),"
        " sc AS (SELECT t.doc_id, t.word, t.tf,"
        "   t.tf * coalesce(i.m, oov.m) AS s"
        "   FROM t LEFT JOIN idf i USING (word) CROSS JOIN oov),"
        " r AS (SELECT *, row_number() OVER (PARTITION BY doc_id"
        "   ORDER BY s DESC, word) AS rn FROM sc)"
        " SELECT doc_id, word AS top_word, tf,"
        "  CAST(s AS BIGINT) AS score_micros FROM r WHERE rn = 1"
    )


def _min_cost_supplier_sql() -> str:
    """Mirror of relational.min_cost_supplier (TPC-H Q2 shape): unit
    cost is the exact integer floor price_cents·10000 // qty_cents on
    both engines; the per-part argmin keeps the smallest suppkey on
    ties (row_number ties ORDER BY ucost, sk = the pipeline's
    sort_values(["pk", "u", "sk"]).drop_duplicates)."""
    from pdf_parser_ray.pipelines.relational import MIN_COST_MAX_SIZE

    return (
        "WITH u AS (SELECT l_partkey pk, l_suppkey sk,"
        "   MIN((CAST(round(l_extendedprice*100) AS BIGINT) * 10000)"
        "       // CAST(round(l_quantity*100) AS BIGINT)) AS ucost"
        "  FROM lineitem GROUP BY 1, 2),"
        " q AS (SELECT u.* FROM u JOIN part ON pk = p_partkey"
        f"  WHERE p_size <= {MIN_COST_MAX_SIZE}),"
        " r AS (SELECT pk, sk, ucost,"
        "   row_number() OVER (PARTITION BY pk ORDER BY ucost, sk) rn FROM q)"
        " SELECT pk AS p_partkey, sk AS s_suppkey, s_name,"
        "  ucost AS unit_cc"
        " FROM r JOIN supplier ON sk = s_suppkey WHERE rn = 1"
    )


def _brand_supplier_counts_sql() -> str:
    """Mirror of relational.brand_supplier_counts (TPC-H Q16 shape):
    distinct lineitem (partkey, suppkey) pairs stand in for partsupp;
    the brand/type-prefix exclusions interpolate the pipeline
    constants so retuning either side desyncs loudly."""
    from pdf_parser_ray.pipelines.relational import (
        Q16_EXCL_BRAND, Q16_EXCL_TYPE_PREFIX,
    )

    return (
        "SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,"
        "  count(DISTINCT l_suppkey) AS supplier_cnt"
        " FROM lineitem JOIN part ON l_partkey = p_partkey"
        f" WHERE p_brand <> '{Q16_EXCL_BRAND}'"
        f"  AND p_type NOT LIKE '{Q16_EXCL_TYPE_PREFIX}%'"
        " GROUP BY 1, 2"
    )


def _dominant_suppliers_sql() -> str:
    """Mirror of relational.dominant_suppliers (TPC-H Q20 shape):
    integer qty-cents sums per (part, supplier) in the date window,
    dominance = 2·q > part total with ≥ 2 suppliers on the part."""
    from pdf_parser_ray.pipelines.relational import DOM_DATE_HI, DOM_DATE_LO

    return (
        "WITH ps AS (SELECT l_partkey pk, l_suppkey sk,"
        "   SUM(CAST(round(l_quantity*100) AS BIGINT)) AS q"
        f"  FROM lineitem WHERE l_shipdate >= DATE '{DOM_DATE_LO}'"
        f"   AND l_shipdate < DATE '{DOM_DATE_HI}' GROUP BY 1, 2),"
        " tot AS (SELECT pk, SUM(q) tq, COUNT(*) nsup FROM ps GROUP BY pk),"
        " d AS (SELECT sk, count(*) AS n_parts FROM ps JOIN tot USING (pk)"
        "   WHERE 2*q > tq AND nsup >= 2 GROUP BY sk)"
        " SELECT sk AS s_suppkey, s_name, n_parts"
        " FROM d JOIN supplier ON sk = s_suppkey"
    )


def _uniform_sample_sql() -> str:
    """Mirror of pack.uniform_sample_k: the shuffle-key hash recomputed
    in BIGINT, bottom-k by (key, doc_id)."""
    from pdf_parser_ray.pipelines.pack import (
        SAMPLE_K, SHUF_A1, SHUF_A2, SHUF_B1, SHUF_B2, SHUF_P,
    )

    return (
        "WITH r1 AS (SELECT doc_id,"
        f"   ({SHUF_A1} * (doc_id % {SHUF_P}) + {SHUF_B1}) % {SHUF_P} AS k1"
        "   FROM documents),"
        " r2 AS (SELECT doc_id,"
        f"   ({SHUF_A2} * (xor(k1, k1 >> 17) % {SHUF_P}) + {SHUF_B2})"
        f"     % {SHUF_P} AS key FROM r1)"
        " SELECT doc_id, key FROM r2"
        f" ORDER BY key, doc_id LIMIT {SAMPLE_K}"
    )


def _dsir_resample_sql() -> str:
    """Mirror of analysis.dsir_resample: the importance-weights mirror
    as a CTE, Gumbel noise recomputed from the shuffle_key hash
    (u = (hash+1)/2^31 is an exact dyadic double in both engines),
    top-k by (score DESC, doc_id)."""
    from pdf_parser_ray.pipelines.analysis import DSIR_SAMPLE_K
    from pdf_parser_ray.pipelines.pack import (
        SHUF_A1, SHUF_A2, SHUF_B1, SHUF_B2, SHUF_P,
    )

    return (
        f"WITH iw AS ({_importance_sql()}),"
        " h1 AS (SELECT doc_id,"
        f"   ({SHUF_A1} * (doc_id % {SHUF_P}) + {SHUF_B1}) % {SHUF_P} AS k1"
        "   FROM documents),"
        " h2 AS (SELECT doc_id,"
        f"   ({SHUF_A2} * (xor(k1, k1 >> 17) % {SHUF_P}) + {SHUF_B2})"
        f"     % {SHUF_P} AS hk FROM h1),"
        " s AS (SELECT iw.doc_id, iw.weight_micros,"
        "   iw.weight_micros + CAST(floor(-ln(-ln((h2.hk + 1)"
        "     / 2147483648.0)) * 1000000) AS BIGINT) AS score_micros"
        "   FROM iw JOIN h2 USING (doc_id))"
        " SELECT doc_id, weight_micros, score_micros FROM s"
        f" ORDER BY score_micros DESC, doc_id LIMIT {DSIR_SAMPLE_K}"
    )


def _ccnet_buckets_sql() -> str:
    """Mirror of analysis.ccnet_buckets: the perplexity mirror as a
    CTE, then SQL ntile() per language ordered by (ppl_micros, doc_id)
    — the Ray side's distributed rank + first-rem-tiles-take-one-extra
    formula IS ntile's split.  CCNET_TILES is interpolated so retuning
    the constant can never desync the mirror (ADVICE r03 #3)."""
    from pdf_parser_ray.pipelines.analysis import CCNET_TILES

    return (
        f"WITH p AS ({_perplexity_sql()})"
        " SELECT p.doc_id, d.lang,"
        f"  CAST(ntile({CCNET_TILES}) OVER (PARTITION BY d.lang"
        "    ORDER BY p.ppl_micros, p.doc_id) - 1 AS BIGINT) AS tile"
        " FROM p JOIN documents d USING (doc_id)"
    )


def _knn_quantized_sql() -> str:
    """Mirror of similarity.knn_quantized: one global max-abs scalar
    cast to DOUBLE (float32 widens losslessly; the scale must be
    float64 in BOTH engines), the same floor(x·L/A) symmetric
    quantizer, then an exact integer dot product — no float comparison
    anywhere in the score.  QUANT_LEVELS and the query defaults are
    interpolated from the pipeline so retuning can never desync the
    mirror (ADVICE r03 #2)."""
    import inspect

    from pdf_parser_ray.pipelines import similarity

    sig = inspect.signature(similarity.knn_quantized)
    qid = sig.parameters["query_vec_id"].default
    k = sig.parameters["k"].default
    levels = float(similarity.QUANT_LEVELS)
    return (
        "WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),"
        " a AS (SELECT CAST(max(abs(x)) AS DOUBLE) AS a FROM"
        "   (SELECT unnest(e) AS x FROM v)),"
        " u AS (SELECT vec_id, unnest(e) AS x,"
        "   generate_subscripts(e, 1) AS i FROM v),"
        " q AS (SELECT u.vec_id, u.i,"
        f"   CAST(floor(CAST(u.x AS DOUBLE) * {levels} / a.a) AS BIGINT)"
        "     AS qv FROM u CROSS JOIN a),"
        f" qq AS (SELECT i, qv FROM q WHERE vec_id = {qid}),"
        " sc AS (SELECT q.vec_id,"
        "   CAST(sum(q.qv * qq.qv) AS BIGINT) AS qdot"
        f"   FROM q JOIN qq USING (i) WHERE q.vec_id <> {qid}"
        "   GROUP BY q.vec_id)"
        " SELECT vec_id, qdot FROM sc"
        f" ORDER BY qdot DESC, vec_id LIMIT {k}"
    )


def _ols_residuals_sql() -> str:
    """Mirror of analysis.ols_residuals: the moment sums are exact
    integers (HUGEINT in DuckDB, summed int64 partials in Ray) cast to
    DOUBLE once, then (a, b) and the residual use the same IEEE
    operation order as the numpy side, so floor(resid·1e6) matches."""
    return (
        f"WITH f AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS x,"
        "   CAST(len(list_distinct(w)) AS BIGINT) AS y"
        f"   FROM (SELECT doc_id, {_WORDS_EXPR} AS w FROM documents)),"
        " s AS (SELECT CAST(count(*) AS DOUBLE) AS n,"
        "   CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,"
        "   CAST(sum(x*y) AS DOUBLE) AS sxy,"
        "   CAST(sum(x*x) AS DOUBLE) AS sxx FROM f),"
        " c AS (SELECT n, sx, sy,"
        "   CASE WHEN n*sxx - sx*sx = 0 THEN 0.0"
        "     ELSE (n*sxy - sx*sy) / (n*sxx - sx*sx) END AS b FROM s),"
        " c2 AS (SELECT b, (sy - b*sx) / n AS a FROM c)"
        " SELECT f.doc_id, f.x AS n_words, f.y AS n_unique,"
        "  CAST(floor((CAST(f.y AS DOUBLE) - (c2.a + c2.b *"
        "    CAST(f.x AS DOUBLE))) * 1000000) AS BIGINT) AS resid_micros"
        " FROM f CROSS JOIN c2"
    )


def _curate_and_pack_sql() -> str:
    """Mirror of pack.curate_and_pack: the quality-filter mirror as a
    CTE, md5-winner dedup among kept docs, then the pack_sequences
    window cumsum over the survivors."""
    from pdf_parser_ray.pipelines.pack import PACK_BUCKETS, PACK_SEQ_LEN

    return (
        f"WITH q AS ({_quality_filter_sql()}),"
        " kept AS (SELECT d.doc_id, d.text FROM documents d"
        "   JOIN q USING (doc_id) WHERE q.keep = 1),"
        " winners AS (SELECT min(doc_id) AS doc_id FROM kept"
        "   GROUP BY md5(text)),"
        f" t AS (SELECT k.doc_id, k.doc_id % {PACK_BUCKETS} AS bucket,"
        f"   CAST(len({_WORDS_EXPR}) AS BIGINT) AS n_tokens"
        "   FROM kept k JOIN winners USING (doc_id)),"
        " c AS (SELECT doc_id, bucket, n_tokens,"
        "   CAST(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id"
        "     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        "     - n_tokens AS BIGINT) AS s FROM t)"
        " SELECT doc_id, CAST(bucket AS BIGINT) AS bucket, n_tokens,"
        f"  CAST(s // {PACK_SEQ_LEN} AS BIGINT) AS pack_id,"
        f"  CAST(s % {PACK_SEQ_LEN} AS BIGINT) AS pack_offset FROM c"
    )


def _c4_lines_cte() -> str:
    """Shared CTE chain rebuilding the deterministic multi-line page of
    filter.synth_page_lines: defines ``w`` (words), ``l`` (line index
    explode with per-doc line count ``nl``) and ``d`` (doc_id, nl, j,
    line) — used by the c4_line_filter and dedup_lines_within_doc
    oracles."""
    from pdf_parser_ray.pipelines.filter import C4_LINE_WORDS as LW

    def seg(hi: int) -> str:
        return (
            f"array_to_string(ws[CAST({LW}*j+1 AS INT):"
            f"CAST({LW}*j+{hi} AS INT)], ' ')"
        )

    return (
        f"w AS (SELECT doc_id, {_WORDS_EXPR} AS ws FROM documents),"
        " l AS (SELECT doc_id, ws,"
        f"   greatest(CAST(ceil(len(ws) / {LW}.0) AS BIGINT), 1) AS nl,"
        "   unnest(range(0,"
        f"   greatest(CAST(ceil(len(ws) / {LW}.0) AS BIGINT), 1), 1)) AS j"
        "   FROM w),"
        " d AS (SELECT doc_id, nl, j,"
        "   CASE CAST((doc_id + 7 * j) % 5 AS INT)"
        f"     WHEN 0 THEN {seg(LW)} || '.'"
        f"     WHEN 1 THEN {seg(LW)} || '!'"
        f"     WHEN 2 THEN {seg(LW)}"
        f"     WHEN 3 THEN {seg(2)} || '.'"
        f"     ELSE {seg(LW)} || ' javascript required.'"
        "   END"
        "   || CASE WHEN j = 0 AND doc_id % 13 = 0 THEN ' {' ELSE '' END"
        "   || CASE WHEN j = 0 AND doc_id % 17 = 3 THEN ' lorem ipsum.'"
        "      ELSE '' END AS line"
        "  FROM l)"
    )


def _c4_sql() -> str:
    """Mirror of filter.c4_line_filter: rebuild the identical
    deterministic multi-line page (shared CTE), apply the C4 line
    predicate (terminal punctuation, >= 3 words, no 'javascript') and
    the ordered page rules (curly brace, lorem ipsum, < 3 retained
    sentences)."""
    from pdf_parser_ray.pipelines.filter import (
        C4_MIN_LINE_WORDS,
        C4_MIN_SENTENCES,
    )

    return (
        f"WITH {_c4_lines_cte()},"
        " k AS (SELECT doc_id, j, line,"
        "   CASE WHEN regexp_matches(line, '[.!?\"]$')"
        "     AND len(list_filter(string_split(line, ' '), x -> x <> ''))"
        f"       >= {C4_MIN_LINE_WORDS}"
        "     AND NOT contains(lower(line), 'javascript')"
        "    THEN 1 ELSE 0 END AS kept"
        "  FROM d),"
        " agg AS (SELECT doc_id,"
        "   CAST(count(*) AS BIGINT) AS n_lines,"
        "   CAST(sum(kept) AS BIGINT) AS n_kept,"
        "   max(CASE WHEN contains(line, '{') THEN 1 ELSE 0 END) AS curly,"
        "   max(CASE WHEN contains(lower(line), 'lorem ipsum') THEN 1"
        "       ELSE 0 END) AS lorem,"
        "   coalesce(string_agg(CASE WHEN kept = 1 THEN line END, chr(10)"
        "       ORDER BY j), '') AS clean"
        "  FROM k GROUP BY doc_id)"
        " SELECT CAST(doc_id AS BIGINT) AS doc_id, n_lines, n_kept,"
        f"  CASE WHEN curly = 1 OR lorem = 1 OR n_kept < {C4_MIN_SENTENCES}"
        "    THEN 0 ELSE 1 END AS keep,"
        "  CASE WHEN curly = 1 THEN 'curly_brace'"
        "    WHEN lorem = 1 THEN 'lorem_ipsum'"
        f"    WHEN n_kept < {C4_MIN_SENTENCES} THEN 'too_few_sentences'"
        "    ELSE 'ok' END AS reason,"
        f"  CASE WHEN curly = 0 AND lorem = 0 AND n_kept >= {C4_MIN_SENTENCES}"
        "    THEN clean ELSE '' END AS clean_text"
        " FROM agg"
    )


def _withindoc_sql() -> str:
    """Mirror of filter.dedup_lines_within_doc: the shared synthesized
    page plus the planted duplicate (line doc_id % nl appended at
    j = nl), then first-occurrence dedup per (doc_id, line)."""
    return (
        f"WITH {_c4_lines_cte()},"
        " extra AS (SELECT doc_id, nl, nl AS j, line FROM d"
        "   WHERE j = doc_id % nl),"
        " allr AS (SELECT doc_id, j, line FROM d"
        "   UNION ALL SELECT doc_id, j, line FROM extra),"
        " k AS (SELECT doc_id, j, line, ROW_NUMBER() OVER"
        "   (PARTITION BY doc_id, line ORDER BY j) AS rn FROM allr)"
        " SELECT CAST(doc_id AS BIGINT) AS doc_id,"
        "  CAST(count(*) AS BIGINT) AS n_lines,"
        "  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)"
        "    AS n_unique,"
        "  string_agg(CASE WHEN rn = 1 THEN line END, chr(10) ORDER BY j)"
        "    AS clean_text"
        " FROM k GROUP BY doc_id"
    )


def _vocab_sql() -> str:
    """Mirror of analysis.vocab_coverage: top-V vocabulary by
    (count DESC, word ASC) with integer cumulative coverage."""
    from pdf_parser_ray.pipelines.analysis import VOCAB_TOP_V

    return (
        f"WITH w AS (SELECT unnest({_WORDS_EXPR}) AS word FROM documents),"
        " c AS (SELECT word, CAST(count(*) AS BIGINT) AS n"
        "   FROM w GROUP BY word),"
        " tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM c),"
        " top AS (SELECT word, n,"
        "   CAST(ROW_NUMBER() OVER (ORDER BY n DESC, word) AS BIGINT)"
        "     AS rank FROM c ORDER BY n DESC, word"
        f"   LIMIT {VOCAB_TOP_V})"
        " SELECT rank, word, n,"
        "  CAST(SUM(n) OVER (ORDER BY rank) AS BIGINT) AS cum_n,"
        "  CAST(SUM(n) OVER (ORDER BY rank) * 1000000 // tot.t AS BIGINT)"
        "    AS coverage_micros"
        " FROM top, tot"
    )


def _pmi_sql(k: int = 20) -> str:
    """Mirror of analysis.pmi_bigrams: unigram/bigram corpus counts,
    pmi = ln(((((c_xy * N_uni) * N_uni) / N_bi) / c_x) / c_y) floored
    to micros — the division/multiplication order matches the Python
    side exactly so the double rounding is identical."""
    from pdf_parser_ray.pipelines.analysis import PMI_MIN_COUNT

    return (
        f"WITH w AS (SELECT {_WORDS_EXPR} AS ws FROM documents),"
        " uni AS (SELECT unnest(ws) AS word FROM w),"
        " cu AS (SELECT word, CAST(count(*) AS BIGINT) AS c"
        "   FROM uni GROUP BY word),"
        " bi AS (SELECT ws[CAST(i AS INT)] || ' ' || ws[CAST(i + 1 AS INT)]"
        "     AS bigram"
        "   FROM (SELECT ws, unnest(range(1, len(ws), 1)) AS i FROM w)),"
        " cb AS (SELECT bigram, CAST(count(*) AS BIGINT) AS c"
        "   FROM bi GROUP BY bigram),"
        " nu AS (SELECT CAST(sum(c) AS DOUBLE) AS v FROM cu),"
        " nb AS (SELECT CAST(sum(c) AS DOUBLE) AS v FROM cb),"
        " q AS (SELECT bigram, c AS n_xy,"
        "   string_split(bigram, ' ')[1] AS w1,"
        "   string_split(bigram, ' ')[2] AS w2"
        f"  FROM cb WHERE c >= {PMI_MIN_COUNT}),"
        " j AS (SELECT q.bigram, q.n_xy, cx.c AS cx, cy.c AS cy"
        "   FROM q JOIN cu cx ON q.w1 = cx.word"
        "   JOIN cu cy ON q.w2 = cy.word)"
        " SELECT bigram, n_xy,"
        "  CAST(floor(ln(((((CAST(n_xy AS DOUBLE) * nu.v) * nu.v) / nb.v)"
        "    / CAST(cx AS DOUBLE)) / CAST(cy AS DOUBLE)) * 1000000)"
        "    AS BIGINT) AS pmi_micros"
        " FROM j, nu, nb"
        f" ORDER BY pmi_micros DESC, bigram LIMIT {k}"
    )


def _knn_ivfkm_sql(query_vec_id: int = 0, k: int = 10) -> str:
    """Mirror of similarity.knn_ivf_kmeans: the unrolled-Lloyd CTEs
    give the final centroids and assignment; the query's nprobe
    nearest centroids (ORDER BY dist, j — the same tie order as the
    numpy lexsort) define the candidate set; exact cosine micros rank
    within it."""
    from pdf_parser_ray.pipelines.cluster import KM_ITERS
    from pdf_parser_ray.pipelines.similarity import IVFKM_NPROBE

    ctes, asg = _kmeans_rounds_sql(_RAW_VECS_SQL)
    return (
        f"WITH {ctes},"
        f" qd AS (SELECT c.j, sum((q.x - c.c) * (q.x - c.c)) AS dd"
        f"  FROM (SELECT d, x FROM ed WHERE vec_id = {query_vec_id}) q"
        f"  JOIN cent{KM_ITERS} c ON q.d = c.d GROUP BY c.j),"
        " probe AS (SELECT j FROM (SELECT j,"
        "   ROW_NUMBER() OVER (ORDER BY dd, j) AS rn FROM qd)"
        f"  WHERE rn <= {IVFKM_NPROBE}),"
        f" qv AS (SELECT e FROM vv WHERE vec_id = {query_vec_id})"
        " SELECT CAST(a.vec_id AS BIGINT) AS vec_id,"
        "  CAST(trunc(list_cosine_similarity(v.e, qv.e) * 1000000)"
        "    AS BIGINT) AS cos_micros"
        f" FROM {asg} a JOIN probe p ON a.j = p.j"
        " JOIN vv v ON v.vec_id = a.vec_id, qv"
        f" WHERE a.vec_id != {query_vec_id}"
        f" ORDER BY cos_micros DESC, vec_id LIMIT {k}"
    )


def _split_sql() -> str:
    """Mirror of filter.leakage_safe_split: md5-hex-slice hash of the
    SOURCE decides the split for every doc in that source."""
    from pdf_parser_ray.pipelines.filter import VAL_PERMILLE

    h = "CAST(('0x' || substr(md5(source), 1, 15)) AS BIGINT)"
    return (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, source,"
        f" CASE WHEN {h} % 1000 < {VAL_PERMILLE} THEN 'val'"
        " ELSE 'train' END AS split"
        " FROM documents"
    )


def _bloom_sql() -> str:
    """Mirror of sketch.bloom_dedup: the set of SET BITS in a Bloom
    filter equals the set of all base-key positions, so SQL membership
    of each probe position in a DISTINCT base-positions table is
    bit-for-bit the Bloom probe.  h1/h2 are 15-hex-digit md5 slices
    (h2 forced odd), position_i = (h1 + i*h2) % M — identical integer
    arithmetic on both sides."""
    from pdf_parser_ray.pipelines.dedup import (
        NEAR_DUP_ID_OFFSET,
        RECRAWL_EXACT_OFFSET,
    )
    from pdf_parser_ray.pipelines.sketch import BLOOM_BITS, BLOOM_K

    def h(col: str) -> str:
        a = f"CAST(('0x' || substr(md5({col}), 1, 15)) AS BIGINT)"
        b = f"CAST(('0x' || substr(md5({col}), 16, 15)) AS BIGINT)"
        return f"{a} AS h1, {b} - {b} % 2 + 1 AS h2"

    return (
        "WITH base AS (SELECT doc_id, text FROM documents"
        "   WHERE doc_id % 2 = 0),"
        " delta AS ("
        "   SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1"
        f"  UNION ALL SELECT doc_id + {RECRAWL_EXACT_OFFSET} AS doc_id, text"
        "     FROM documents WHERE doc_id % 22 = 0"
        f"  UNION ALL SELECT doc_id + {NEAR_DUP_ID_OFFSET} AS doc_id,"
        f"    array_to_string(list_filter({_WORDS_EXPR},"
        "      (x, i) -> i % 10 != 0), ' ') AS text"
        "     FROM documents WHERE doc_id % 14 = 0),"
        f" ii AS (SELECT unnest(range(0, {BLOOM_K}, 1)) AS i),"
        f" bh AS (SELECT {h('text')} FROM base),"
        f" bp AS (SELECT DISTINCT (h1 + i * h2) % {BLOOM_BITS} AS p"
        "    FROM bh CROSS JOIN ii),"
        f" dh AS (SELECT doc_id, {h('text')} FROM delta),"
        f" dp AS (SELECT doc_id, (h1 + i * h2) % {BLOOM_BITS} AS p"
        "    FROM dh CROSS JOIN ii),"
        " hits AS (SELECT doc_id, count(*) AS n_hits FROM dp"
        "   WHERE p IN (SELECT p FROM bp) GROUP BY doc_id)"
        " SELECT CAST(d.doc_id AS BIGINT) AS doc_id,"
        "  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,"
        f"  CAST(CASE WHEN coalesce(h.n_hits, 0) = {BLOOM_K} THEN 1"
        "    ELSE 0 END AS BIGINT) AS maybe_dup"
        " FROM delta d LEFT JOIN hits h ON d.doc_id = h.doc_id"
    )


def _cross_source_overlap_sql() -> str:
    """Mirror of dedup.cross_source_overlap: the identical planted
    clone union (constants interpolated), distinct normalized md5 per
    source, unordered same-hash source pairs counted."""
    from pdf_parser_ray.pipelines.dedup import (
        CLONE_MOD, CLONE_SHIFT, CLONE_SOURCES,
    )

    return (
        "WITH docs2 AS ("
        "   SELECT source, text FROM documents"
        "   UNION ALL"
        "   SELECT 'src' || CAST((doc_id +"
        f"    {CLONE_SHIFT}) % {CLONE_SOURCES} AS VARCHAR) AS source,"
        f"    text FROM documents WHERE doc_id % {CLONE_MOD} = 0),"
        " h AS (SELECT DISTINCT"
        "   md5(trim(regexp_replace(regexp_replace(lower(text),"
        "   '[^a-z0-9 ]+', '', 'g'), ' +', ' ', 'g'), ' ')) AS th,"
        "   source FROM docs2)"
        " SELECT a.source AS source_a, b.source AS source_b,"
        "  CAST(count(*) AS BIGINT) AS n_shared"
        " FROM h a JOIN h b ON a.th = b.th AND a.source < b.source"
        " GROUP BY 1, 2"
    )


def _zipf_sql() -> str:
    """Mirror of analysis.zipf_fit: exact integer OLS over
    floored-micros logs of the top-V (count DESC, word ASC) words;
    HUGEINT keeps every product exact and ``//`` truncates toward zero
    on both sides."""
    from pdf_parser_ray.pipelines.analysis import ZIPF_TOP_V

    return (
        f"WITH w AS (SELECT unnest({_WORDS_EXPR}) AS word FROM documents),"
        " c AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM w"
        "   GROUP BY word),"
        " top AS (SELECT n, row_number() OVER (ORDER BY n DESC, word)"
        f"   AS rn FROM c QUALIFY rn <= {ZIPF_TOP_V}),"
        " t AS (SELECT"
        "   CAST(floor(ln(CAST(rn AS DOUBLE)) * 1000000) AS BIGINT) AS x,"
        "   CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS y"
        "   FROM top),"
        " s AS (SELECT CAST(count(*) AS HUGEINT) AS nv,"
        "   CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,"
        "   CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,"
        "   CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT)"
        "     AS sxy,"
        "   CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT)"
        "     AS sxx FROM t)"
        " SELECT CAST(nv AS BIGINT) AS n_vocab,"
        "  CAST(CASE WHEN nv * sxx - sx * sx = 0 THEN 0 ELSE"
        "   ((nv * sxy - sx * sy) * 1000000) // (nv * sxx - sx * sx)"
        "   END AS BIGINT) AS slope_micros,"
        "  CAST(CASE WHEN nv * sxx - sx * sx = 0 THEN 0 ELSE"
        "   (sy * (nv * sxx - sx * sx) - (nv * sxy - sx * sy) * sx)"
        "    // (nv * (nv * sxx - sx * sx))"
        "   END AS BIGINT) AS intercept_micros"
        " FROM s"
    )


def _stopword_sql() -> str:
    """Mirror of analysis.stopword_ratio — the IN-list interpolated
    from the pipeline's STOPWORDS tuple."""
    from pdf_parser_ray.pipelines.analysis import STOPWORDS

    in_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return (
        f"WITH w AS (SELECT doc_id, unnest({_WORDS_EXPR}) AS word"
        "   FROM documents),"
        " a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nw,"
        "   CAST(sum(CASE WHEN lower(word) IN"
        f"    ({in_list}) THEN 1 ELSE 0 END) AS BIGINT) AS ns"
        "   FROM w GROUP BY doc_id)"
        " SELECT d.doc_id,"
        "  CAST(coalesce(a.nw, 0) AS BIGINT) AS n_words,"
        "  CAST(coalesce(a.ns, 0) AS BIGINT) AS n_stop,"
        "  CAST(CASE WHEN coalesce(a.nw, 0) = 0 THEN 0"
        "   ELSE (a.ns * 1000000) // a.nw END AS BIGINT) AS stop_micros"
        " FROM documents d LEFT JOIN a USING (doc_id)"
    )


def _disjunctive_sql() -> str:
    """Mirror of relational.disjunctive_revenue (TPC-H Q19): the OR of
    the three (brand, size cap, qty band) arms, built from the same
    DISJUNCT_ARMS tuple the pipeline evaluates."""
    from pdf_parser_ray.pipelines.relational import DISJUNCT_ARMS

    arms = " OR ".join(
        f"(p.p_brand = '{b}' AND p.p_size <= {cap}"
        f" AND li.q BETWEEN {lo} AND {hi})"
        for b, cap, lo, hi in DISJUNCT_ARMS
    )
    return (
        "WITH li AS (SELECT l_partkey AS pk,"
        "   CAST(round(l_quantity) AS BIGINT) AS q,"
        "   CAST(round(l_extendedprice * 100) AS BIGINT)"
        "   * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev"
        "   FROM lineitem)"
        " SELECT CAST(coalesce(sum(li.rev), 0) AS BIGINT) AS revenue_cc,"
        "  CAST(count(*) AS BIGINT) AS n_items"
        " FROM li JOIN part p ON p.p_partkey = li.pk"
        f" WHERE {arms}"
    )


def _tpch_classic_sql() -> dict[str, str]:
    """Mirrors for the TPC-H Q3/Q5/Q6/Q15 shapes in relational.py —
    every constant interpolated from the pipeline module so retuning a
    cutoff or band can never silently desync the oracle."""
    from pdf_parser_ray.pipelines import relational as R

    rev_cc = (
        "CAST(round(l_extendedprice * 100) AS BIGINT)"
        " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
    )
    return {
        "shipping_priority": (
            # mirror of relational.shipping_priority (TPC-H Q3): same
            # integer rev_cc, both date gates, segment semi-join, and
            # the (revenue DESC, orderkey ASC) tie rule
            f"WITH l AS (SELECT l_orderkey, {rev_cc} AS rev FROM lineitem"
            f"   WHERE l_shipdate > TIMESTAMP '{R.SHIP_CUTOFF}')"
            " SELECT o.o_orderkey, CAST(sum(l.rev) AS BIGINT) AS revenue_cc,"
            "  CAST(epoch_us(o.o_orderdate) AS BIGINT) AS o_orderdate_us"
            " FROM l JOIN orders o ON o.o_orderkey = l.l_orderkey"
            " JOIN customer c ON c.c_custkey = o.o_custkey"
            f" WHERE c.c_mktsegment = '{R.SHIP_SEGMENT}'"
            f"  AND o.o_orderdate < TIMESTAMP '{R.SHIP_CUTOFF}'"
            " GROUP BY o.o_orderkey, o.o_orderdate"
            f" ORDER BY revenue_cc DESC, o.o_orderkey LIMIT {R.SHIP_TOP_K}"
        ),
        "local_supplier_volume": (
            # mirror of relational.local_supplier_volume (TPC-H Q5):
            # customer and supplier nation must MATCH, both in-region
            f"SELECT n.n_name, CAST(sum({rev_cc}) AS BIGINT) AS revenue_cc"
            " FROM lineitem l"
            " JOIN orders o ON o.o_orderkey = l.l_orderkey"
            " JOIN customer c ON c.c_custkey = o.o_custkey"
            " JOIN supplier s ON s.s_suppkey = l.l_suppkey"
            "   AND s.s_nationkey = c.c_nationkey"
            " JOIN nation n ON n.n_nationkey = s.s_nationkey"
            " JOIN region r ON r.r_regionkey = n.n_regionkey"
            f" WHERE r.r_name = '{R.LOCAL_VOLUME_REGION}'"
            f"  AND o.o_orderdate >= TIMESTAMP '{R.LOCAL_VOLUME_DATE_LO}'"
            f"  AND o.o_orderdate < TIMESTAMP '{R.LOCAL_VOLUME_DATE_HI}'"
            " GROUP BY n.n_name"
        ),
        "discount_band_revenue": (
            # mirror of relational.discount_band_revenue (TPC-H Q6):
            # price_cents x discount_pct on the banded small lineitems
            "WITH l AS (SELECT"
            "   CAST(round(l_extendedprice * 100) AS BIGINT) AS pcents,"
            "   CAST(round(l_discount * 100) AS BIGINT) AS dp,"
            "   CAST(round(l_quantity) AS BIGINT) AS q FROM lineitem"
            f"  WHERE l_shipdate >= TIMESTAMP '{R.DISCOUNT_DATE_LO}'"
            f"   AND l_shipdate < TIMESTAMP '{R.DISCOUNT_DATE_HI}')"
            " SELECT CAST(coalesce(sum(pcents * dp), 0) AS BIGINT)"
            "   AS revenue_cc,"
            "  CAST(count(*) AS BIGINT) AS n_items FROM l"
            f" WHERE dp BETWEEN {R.DISCOUNT_BAND_LO} AND {R.DISCOUNT_BAND_HI}"
            f"  AND q < {R.DISCOUNT_QTY_LT}"
        ),
        "cross_source_overlap": _cross_source_overlap_sql(),
        "events_dow_hour": (
            # mirror of relational.events_dow_hour: dow 0 = Sunday
            # (DuckDB dayofweek), hour-of-day, integer cents
            "SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,"
            " CAST(hour(ts) AS BIGINT) AS hour,"
            " CAST(count(*) AS BIGINT) AS n,"
            " CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
            "   AS total_cents"
            " FROM events GROUP BY 1, 2"
        ),
        "langid_confusion": (
            # mirror of analysis.langid_confusion: the langid scorer as
            # a CTE joined back to the labeled lang column
            f"WITH p AS ({_langid_sql()})"
            " SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n"
            " FROM documents d JOIN p USING (doc_id) GROUP BY 1, 2"
        ),
        "supplier_concentration": (
            # mirror of relational.supplier_concentration: per-supplier
            # exact revenue, per-nation total / max / integer share
            "WITH r AS (SELECT l_suppkey,"
            "   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)"
            "   * (100 - CAST(round(l_discount * 100) AS BIGINT)))"
            "     AS BIGINT) AS rev FROM lineitem GROUP BY 1),"
            " a AS (SELECT s.s_nationkey AS nk,"
            "   CAST(count(*) AS BIGINT) AS n_suppliers,"
            "   CAST(sum(r.rev) AS BIGINT) AS total_cc,"
            "   CAST(max(r.rev) AS BIGINT) AS top_cc"
            "   FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey"
            "   GROUP BY 1)"
            " SELECT n.n_name, a.n_suppliers, a.total_cc, a.top_cc,"
            "  CAST(CASE WHEN a.total_cc = 0 THEN 0 ELSE"
            "   (a.top_cc * 1000000) // a.total_cc END AS BIGINT)"
            "   AS top_micros"
            " FROM a JOIN nation n ON n.n_nationkey = a.nk"
        ),
        "inter_event_quantiles": (
            # mirror of relational.inter_event_quantiles: per-user gaps
            # over the same (ts, event_id) order, floored to seconds
            # (gaps are non-negative, so // matches numpy's floor)
            "WITH g AS (SELECT (epoch_us(ts) - lag(epoch_us(ts)) OVER ("
            "   PARTITION BY user_id ORDER BY epoch_us(ts), event_id))"
            "   // 1000000 AS gap_s FROM events)"
            " SELECT CAST(count(gap_s) AS BIGINT) AS n_gaps,"
            "  CAST(quantile_disc(gap_s, 0.25) AS BIGINT) AS p25_s,"
            "  CAST(quantile_disc(gap_s, 0.50) AS BIGINT) AS p50_s,"
            "  CAST(quantile_disc(gap_s, 0.75) AS BIGINT) AS p75_s,"
            "  CAST(quantile_disc(gap_s, 0.95) AS BIGINT) AS p95_s"
            " FROM g WHERE gap_s IS NOT NULL"
        ),
        "user_type_entropy": (
            # mirror of relational.user_type_entropy: the word_entropy
            # integer identity on (user, event_type) counts
            "WITH c AS (SELECT user_id, event_type, count(*) AS k"
            "   FROM events GROUP BY 1, 2),"
            " n AS (SELECT user_id, CAST(sum(k) AS BIGINT) AS n FROM c"
            "   GROUP BY 1)"
            " SELECT c.user_id,"
            "  CAST(any_value(n.n) AS BIGINT) AS n_events,"
            "  CAST(sum(c.k * CAST(floor(ln(CAST(n.n AS DOUBLE) / c.k)"
            "    * 1000000) AS BIGINT)) AS BIGINT) AS entropy_micros"
            " FROM c JOIN n USING (user_id) GROUP BY c.user_id"
        ),
        "ship_latency_quantiles": (
            # mirror of relational.ship_latency_quantiles: day-NUMBER
            # difference (per-side epoch-day, both non-negative) so //
            # truncation and numpy floor agree even when ship < order
            "WITH d AS (SELECT o.o_orderpriority,"
            "   epoch_us(l.l_shipdate) // 86400000000"
            "   - epoch_us(o.o_orderdate) // 86400000000 AS days"
            "   FROM lineitem l JOIN orders o"
            "   ON o.o_orderkey = l.l_orderkey)"
            " SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,"
            "  CAST(quantile_disc(days, 0.50) AS BIGINT) AS p50_days,"
            "  CAST(quantile_disc(days, 0.95) AS BIGINT) AS p95_days"
            " FROM d GROUP BY 1"
        ),
        "source_kl_divergence": (
            # mirror of analysis.source_kl_divergence: n_s·KL(p_s‖p)
            # in integer micros with the per-word ln floored — same
            # double association (k·N)/(n_s·c_w) as the Ray side
            f"WITH w AS (SELECT source, unnest({_WORDS_EXPR}) AS word"
            "   FROM documents),"
            " c AS (SELECT source, word, count(*) AS k FROM w"
            "   GROUP BY 1, 2),"
            " cw AS (SELECT word, sum(k) AS cw FROM c GROUP BY 1),"
            " ns AS (SELECT source, sum(k) AS ns FROM c GROUP BY 1),"
            " tot AS (SELECT sum(k) AS n FROM c)"
            " SELECT c.source,"
            "  CAST(any_value(ns.ns) AS BIGINT) AS n_tokens,"
            "  CAST(sum(c.k * CAST(floor(ln((CAST(c.k AS DOUBLE) * tot.n)"
            "    / (CAST(ns.ns AS DOUBLE) * cw.cw)) * 1000000) AS BIGINT))"
            "    AS BIGINT) AS kl_sum_micros"
            " FROM c JOIN cw USING (word) JOIN ns USING (source)"
            " CROSS JOIN tot GROUP BY 1"
        ),
        "sole_late_supplier": (
            # mirror of relational.sole_late_supplier (TPC-H Q21
            # shape): per-(order, supplier) max shipday, the strict
            # > late gate vs the order date, the >= 2 suppliers /
            # exactly-one-late blame predicate, supplier name attach
            "WITH ls AS (SELECT l_orderkey AS okey, l_suppkey AS skey,"
            "   max(epoch_us(l_shipdate) // 86400000000) AS shipday"
            "   FROM lineitem GROUP BY 1, 2),"
            " j AS (SELECT ls.okey, ls.skey,"
            "   CASE WHEN ls.shipday"
            "     - epoch_us(o.o_orderdate) // 86400000000"
            f"     > {R.LATE_SUPPLIER_DAYS} THEN 1 ELSE 0 END AS late"
            "   FROM ls JOIN orders o ON o.o_orderkey = ls.okey),"
            " g AS (SELECT okey, count(*) AS n_supp,"
            "   sum(late) AS n_late FROM j GROUP BY 1)"
            " SELECT s.s_name, CAST(count(*) AS BIGINT) AS n_orders"
            " FROM j JOIN g USING (okey)"
            " JOIN supplier s ON s.s_suppkey = j.skey"
            " WHERE j.late = 1 AND g.n_supp >= 2 AND g.n_late = 1"
            " GROUP BY 1"
        ),
        "latency_band_priority": (
            # mirror of relational.latency_band_priority (TPC-H Q12
            # shape): ship-latency bands play l_shipmode's role, the
            # high/low split is the Q12 CASE over o_orderpriority
            "WITH d AS (SELECT o.o_orderpriority AS pri,"
            "   epoch_us(l.l_shipdate) // 86400000000"
            "   - epoch_us(o.o_orderdate) // 86400000000 AS days"
            "   FROM lineitem l JOIN orders o"
            "   ON o.o_orderkey = l.l_orderkey)"
            " SELECT CASE WHEN days < 0 THEN 'early'"
            f"   WHEN days <= {R.LATENCY_ON_TIME_DAYS} THEN 'on_time'"
            "   ELSE 'late' END AS band,"
            "  CAST(sum(CASE WHEN pri IN"
            f"   {R.HIGH_PRIORITIES!r} THEN 1 ELSE 0 END)"
            "   AS BIGINT) AS high_n,"
            "  CAST(sum(CASE WHEN pri IN"
            f"   {R.HIGH_PRIORITIES!r} THEN 0 ELSE 1 END)"
            "   AS BIGINT) AS low_n"
            " FROM d GROUP BY 1"
        ),
        "zipf_fit": _zipf_sql(),
        "stopword_ratio": _stopword_sql(),
        "ttr_stats": (
            # mirror of analysis.ttr_stats: distinct/total word counts
            # per doc, integer-micros ratio, empty docs kept at 0
            f"WITH w AS (SELECT doc_id, unnest({_WORDS_EXPR}) AS word"
            "   FROM documents),"
            " a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nw,"
            "   CAST(count(DISTINCT word) AS BIGINT) AS nu"
            "   FROM w GROUP BY doc_id)"
            " SELECT d.doc_id,"
            "  CAST(coalesce(a.nw, 0) AS BIGINT) AS n_words,"
            "  CAST(coalesce(a.nu, 0) AS BIGINT) AS n_unique,"
            "  CAST(CASE WHEN coalesce(a.nw, 0) = 0 THEN 0"
            "   ELSE (a.nu * 1000000) // a.nw END AS BIGINT) AS ttr_micros"
            " FROM documents d LEFT JOIN a USING (doc_id)"
        ),
        "hapax_stats": (
            # mirror of analysis.hapax_stats: per-source vocabulary and
            # exactly-once word counts, integer-micros fraction
            f"WITH w AS (SELECT source, unnest({_WORDS_EXPR}) AS word"
            "   FROM documents),"
            " c AS (SELECT source, word, count(*) AS n FROM w"
            "   GROUP BY source, word),"
            " a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_vocab,"
            "   CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)"
            "     AS n_hapax FROM c GROUP BY source)"
            " SELECT source, n_vocab, n_hapax,"
            "  CAST((n_hapax * 1000000) // n_vocab AS BIGINT)"
            "    AS hapax_micros FROM a"
        ),
        "small_qty_revenue": (
            # mirror of relational.small_qty_revenue (TPC-H Q17): the
            # integer gate 5·qty·count < sum_qty ≡ qty < 0.2·avg
            "WITH li AS (SELECT l_partkey AS pk,"
            "   CAST(round(l_quantity) AS BIGINT) AS q,"
            "   CAST(round(l_extendedprice * 100) AS BIGINT) AS pcents"
            "   FROM lineitem),"
            " b AS (SELECT p_partkey AS pk FROM part"
            f"   WHERE p_brand = '{R.SMALL_QTY_BRAND}'),"
            " j AS (SELECT li.* FROM li JOIN b USING (pk)),"
            " a AS (SELECT pk, CAST(count(*) AS BIGINT) AS cnt,"
            "   CAST(sum(q) AS BIGINT) AS sumq FROM j GROUP BY pk)"
            " SELECT CAST(coalesce(sum(j.pcents), 0) AS BIGINT)"
            "   AS revenue_cc,"
            "  CAST(count(*) AS BIGINT) AS n_items"
            " FROM j JOIN a USING (pk) WHERE 5 * j.q * a.cnt < a.sumq"
        ),
        "disjunctive_revenue": _disjunctive_sql(),
        "market_share": (
            # mirror of relational.market_share (TPC-H Q8): floor
            # integer-micros share of the target nation's supply within
            # the region market for one part type, per order year
            "WITH l AS (SELECT l_partkey, l_orderkey, l_suppkey,"
            "   CAST(round(l_extendedprice * 100) AS BIGINT)"
            "   * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev"
            "   FROM lineitem),"
            " j AS (SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,"
            "   ns.n_name AS supp_nation, l.rev"
            "   FROM l"
            "   JOIN part p ON p.p_partkey = l.l_partkey"
            f"    AND p.p_type = '{R.MARKET_PART_TYPE}'"
            "   JOIN orders o ON o.o_orderkey = l.l_orderkey"
            "   JOIN customer c ON c.c_custkey = o.o_custkey"
            "   JOIN nation nc ON nc.n_nationkey = c.c_nationkey"
            "   JOIN region r ON r.r_regionkey = nc.n_regionkey"
            f"    AND r.r_name = '{R.MARKET_REGION}'"
            "   JOIN supplier s ON s.s_suppkey = l.l_suppkey"
            "   JOIN nation ns ON ns.n_nationkey = s.s_nationkey)"
            " SELECT o_year, CAST(sum(rev) AS BIGINT) AS total_cc,"
            "  CAST(sum(CASE WHEN supp_nation ="
            f"   '{R.MARKET_NATION}' THEN rev ELSE 0 END) AS BIGINT)"
            "   AS nation_cc,"
            "  CAST((sum(CASE WHEN supp_nation ="
            f"   '{R.MARKET_NATION}' THEN rev ELSE 0 END) * 1000000)"
            "   // sum(rev) AS BIGINT) AS share_micros"
            " FROM j GROUP BY o_year"
        ),
        "top_supplier": (
            # mirror of relational.top_supplier (TPC-H Q15): max-revenue
            # supplier(s) over the interval, ALL ties kept
            f"WITH r AS (SELECT l_suppkey, CAST(sum({rev_cc}) AS BIGINT)"
            "   AS rev FROM lineitem"
            f"  WHERE l_shipdate >= TIMESTAMP '{R.TOP_SUPPLIER_DATE_LO}'"
            f"   AND l_shipdate < TIMESTAMP '{R.TOP_SUPPLIER_DATE_HI}'"
            "  GROUP BY l_suppkey)"
            " SELECT s.s_suppkey, s.s_name, r.rev AS revenue_cc"
            " FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey"
            " WHERE r.rev = (SELECT max(rev) FROM r)"
        ),
    }


def oracle_sql() -> dict[str, str]:
    # the top-V broadcast-model cap the registry passes to
    # unigram_logprob / tfidf_scores / importance_weights — mirrored in
    # their oracle SQL so the cap and the OOV path are hash-verified
    # (it binds: the synthetic corpus has a 31-word vocabulary)
    from pdf_parser_ray.pipelines.analysis import (
        ORACLE_VOCAB_CAP as _VOCAB_CAP_SQL,
    )

    synth_desc = (
        "CASE doc_id % 6 "
        "WHEN 0 THEN 'ACH DEBIT ' WHEN 1 THEN 'WIRE IN ' "
        "WHEN 2 THEN 'ZELLE PAYMENT FROM ' WHEN 3 THEN 'PAYPAL TRANSFER ' "
        "WHEN 4 THEN 'WT 1234 SETTLEMENT ' ELSE '' END || upper(substr(text, 1, 20))"
    )
    out = {
        "token_counts": (
            "SELECT doc_id, CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),"
            " x -> x <> '')) AS BIGINT) AS n_tokens FROM documents"
        ),
        "quality_stats": (
            "SELECT doc_id,"
            " CAST(length(text) AS BIGINT) AS n_chars,"
            " CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))"
            "   AS BIGINT) AS n_tokens,"
            " CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digits,"
            " CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) AS BIGINT)"
            "   AS n_punct"
            " FROM documents"
        ),
        "lang_distribution": (
            "SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang"
        ),
        "top_docs_by_chars": (
            "SELECT doc_id, n_chars FROM documents"
            " ORDER BY n_chars DESC, doc_id LIMIT 10"
        ),
        "source_stats": (
            "SELECT source, CAST(count(*) AS BIGINT) AS n_docs,"
            " CAST(sum(n_chars) AS BIGINT) AS total_chars FROM documents GROUP BY source"
        ),
        "direction_classify": (
            f"SELECT doc_id, description, {_direction_case_sql('description')} AS direction "
            f"FROM (SELECT doc_id, {synth_desc} AS description FROM documents)"
        ),
        "langid": _langid_sql(),
        "fingerprints": _fingerprint_sql(),
        "sample_documents": (
            "SELECT source, CAST(count(*) AS BIGINT) AS n_sampled,"
            " CAST(sum(n_chars) AS BIGINT) AS total_chars FROM documents"
            " WHERE (doc_id * 2654435761) % 4294967296 * 1000"
            "   < 4294967296 * 200"
            " GROUP BY source"
        ),
        "blocklist_filter": (
            "SELECT doc_id, source FROM documents WHERE doc_id % 17 <> 0"
        ),
        "stratified_sample": (
            # mirror of filter.stratified_sample: expected-50-per-lang
            # keep iff hash-ring position * stratum size clears the
            # target (the pipeline's threshold form is the same
            # inequality rearranged overflow-safe)
            "WITH c AS (SELECT lang, count(*) AS cnt FROM documents"
            " GROUP BY lang)"
            " SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang"
            " FROM documents d JOIN c USING (lang)"
            " WHERE (d.doc_id * 2654435761) % 4294967296 * c.cnt"
            "   < 4294967296 * 50"
        ),
        "token_histogram": (
            "SELECT (n_tokens // 10) * 10 AS bucket_lo,"
            " CAST(count(*) AS BIGINT) AS n_docs FROM"
            " (SELECT CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),"
            "   x -> x <> '')) AS BIGINT) AS n_tokens FROM documents)"
            " GROUP BY bucket_lo"
        ),
        "decontaminate": _decontaminate_sql(),
        "pack_sequences": _pack_sql(),
        "c4_line_filter": _c4_sql(),
        "dedup_lines_within_doc": _withindoc_sql(),
        "source_quality_filter": _source_quality_sql(),
        "shuffle_shards": _shuffle_sql(),
        "dsir_resample": _dsir_resample_sql(),
        "uniform_sample_k": _uniform_sample_sql(),
        "ols_residuals": _ols_residuals_sql(),
        "knn_quantized": _knn_quantized_sql(),
        "curate_and_pack": _curate_and_pack_sql(),
        "rollup_source_lang": (
            # mirror of analysis.rollup_source_lang: GROUPING SETS with
            # '' sentinels for the margin levels and an explicit gid
            "SELECT CAST(CASE WHEN source IS NOT NULL AND lang IS NOT NULL"
            "   THEN 0 WHEN source IS NOT NULL THEN 1"
            "   WHEN lang IS NOT NULL THEN 2 ELSE 3 END AS BIGINT) AS gid,"
            "  coalesce(source, '') AS source, coalesce(lang, '') AS lang,"
            "  CAST(count(*) AS BIGINT) AS n_docs,"
            "  CAST(sum(n_chars) AS BIGINT) AS total_chars"
            " FROM documents"
            " GROUP BY GROUPING SETS ((source, lang), (source), (lang), ())"
        ),
        "word_entropy": (
            # mirror of analysis.word_entropy: per-word floored-micros
            # self-information summed per doc (associative integer)
            f"WITH w AS (SELECT doc_id, unnest({_WORDS_EXPR}) AS word"
            "   FROM documents),"
            " c AS (SELECT doc_id, word, count(*) AS k FROM w"
            "   GROUP BY doc_id, word),"
            " n AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS n FROM c"
            "   GROUP BY doc_id),"
            " s AS (SELECT c.doc_id,"
            "   CAST(sum(c.k * CAST(floor(ln(CAST(n.n AS DOUBLE) / c.k)"
            "     * 1000000) AS BIGINT)) AS BIGINT) AS surprisal_micros"
            "   FROM c JOIN n USING (doc_id) GROUP BY c.doc_id)"
            " SELECT d.doc_id,"
            "  CAST(coalesce(n.n, 0) AS BIGINT) AS n_words,"
            "  CAST(coalesce(s.surprisal_micros, 0) AS BIGINT)"
            "    AS surprisal_micros"
            " FROM documents d LEFT JOIN n ON d.doc_id = n.doc_id"
            " LEFT JOIN s ON d.doc_id = s.doc_id"
        ),
        "gopher_rules": _gopher_rules_sql(),
        "badwords_filter": _badwords_sql(),
        "length_outlier_filter": _length_outlier_sql(),
        "best_of_duplicates": _best_of_dup_sql(),
        "bm25_scores": _bm25_sql(),
        "host_graph_edges": _host_graph_edges_sql(),
        "host_triangles": _host_triangles_sql(),
        "knn_mmr": _knn_mmr_sql(),
        "weighted_priority_sample": _weighted_priority_sql(),
        "min_cost_supplier": _min_cost_supplier_sql(),
        "brand_supplier_counts": _brand_supplier_counts_sql(),
        "dominant_suppliers": _dominant_suppliers_sql(),
        "readability_scores": _readability_sql(),
        "doc_top_terms": _doc_top_terms_sql(),
        "host_degree_stats": _host_degree_sql(),
        "host_clustering": _host_clustering_sql(),
        "winnow_fingerprints": _winnow_sql(),
        "embedding_outliers": _embedding_outliers_sql(),
        "robust_value_outliers": _robust_outliers_sql(),
        "customer_value_deciles": _value_deciles_sql(),
        "event_trigrams": _event_trigrams_sql(),
        "cosine_band_histogram": _cosine_bands_sql(),
        "knn_multi": _knn_multi_sql(),
        "user_drawdowns": _user_drawdowns_sql(),
        "nation_year_revenue": _nation_year_sql(),
        "gini_customer_revenue": _gini_sql(),
        "user_value_autocorr": _autocorr_sql(),
        "fuzzy_name_pairs": _fuzzy_pairs_sql(),
        "near_dup_rate_by_source": _dup_rate_sql(),
        "value_cume_dist": _cume_dist_sql(),
        "leave_last_k": _leave_last_k_sql(),
        "host_assortativity": _assortativity_sql(),
        "revenue_concentration": _concentration_sql(),
        "join_size_stats": _join_size_sql(),
        "cosupplier_edges": _cosupplier_sql(),
        "bootstrap_mean_ci": _bootstrap_sql(),
        "shard_balance_report": _shard_balance_sql(),
        "ann_recall": _ann_recall_sql(),
        "knn_ivf_multi": _knn_ivf_multi_sql(),
        "theil_sen_hourly": _theil_sen_sql(),
        "mann_kendall_hourly": _mann_kendall_sql(),
        "fano_hourly_by_type": _fano_sql(),
        "hourly_acf_panel": _hourly_acf_sql(),
        "trimmed_mean_orders": _trimmed_mean_sql(),
        "prefix_dup_groups": _prefix_dup_sql(),
        "word_length_histogram": _word_length_sql(),
        "temporal_vocab_drift": _vocab_drift_sql(),
        "length_deciles_by_lang": _length_deciles_sql(),
        "robust_scaled_events": _robust_scaled_sql(),
        "max_repeated_ngram": _max_repeated_ngram_sql(),
        "sketch_quantile_error": _sketch_quantile_error_sql(),
        "asof_event_join": _asof_sql(),
        "storage_audit": _storage_audit_sql(),
        "sentence_stats": _sentence_stats_sql(),
        "embedding_drift": _embedding_drift_sql(),
        "hll_error_eval": _hll_error_sql(),
        "cms_error_eval": _cms_error_sql(),
        "open_order_concurrency": _open_order_sql(),
        "bigram_entropy": _bigram_entropy_sql(),
        "dedup_threshold_curve": _dedup_curve_sql(),
        "host_components": _host_components_sql(),
        "revenue_grouping_sets": _grouping_sets_sql(),
        "value_psi": _value_psi_sql(),
        "value_fivenum": _fivenum_sql(),
        "lang_token_density": _lang_density_sql(),
        "hour_of_day_effect": _hour_effect_sql(),
        "target_encode_events": _target_encode_sql(),
        "customer_rfm": _rfm_sql(),
        "heaps_law_curve": _heaps_sql(),
        "hourly_cusum": _cusum_sql(),
        "length_rank_test": _rank_test_sql(),
        "lang_source_chi2": _chi2_sql(),
        "length_ks_test": _ks_test_sql(),
        "benford_orders": _benford_sql(),
        "hourly_burst_states": _burst_sql(),
        "length_vocab_spearman": _spearman_sql(),
        "hill_tail_index": _hill_sql(),
        "pareto_orders": (
            # mirror of relational.pareto_orders: the NOT EXISTS
            # dominance definition (price >=, day <=, one strict);
            # both-axes ties survive on both sides
            "WITH o AS (SELECT o_orderkey,"
            "   CAST(round(o_totalprice * 100) AS BIGINT) AS cents,"
            "   epoch_us(o_orderdate) // 86400000000 AS day"
            "   FROM orders)"
            " SELECT a.o_orderkey, a.cents AS price_cents,"
            "  CAST(a.day AS BIGINT) AS order_day"
            " FROM o a WHERE NOT EXISTS (SELECT 1 FROM o b"
            "  WHERE b.cents >= a.cents AND b.day <= a.day"
            "   AND (b.cents > a.cents OR b.day < a.day))"
        ),
        "pagerank_hosts": _pagerank_sql(),
        "temperature_sample": _temperature_sample_sql(),
        "doc_host_rank": _doc_host_rank_sql(),
        "bloom_semi_join": _bloom_semi_join_sql(),
        "pivot_source_lang": _pivot_sql(),
        "web_curate": _web_curate_sql(),
        "event_funnel": _event_funnel_sql(),
        "sales_opportunity": _sales_opportunity_sql(),
        "source_vocab_overlap": _source_vocab_overlap_sql(),
        "hourly_anomalies": _hourly_anomalies_sql(),
        "part_affinity": _part_affinity_sql(),
        "large_orders": _large_orders_sql(),
        "customer_order_histogram": (
            # mirror of relational.customer_order_histogram (TPC-H Q13):
            # LEFT JOIN keeps zero-order customers; the pipeline appends
            # that bin from total − with-orders, so both sides emit it
            # exactly when it is non-empty
            "WITH c AS (SELECT c.c_custkey, count(o.o_orderkey) AS n"
            "   FROM customer c LEFT JOIN orders o"
            "   ON c.c_custkey = o.o_custkey GROUP BY 1)"
            " SELECT CAST(n AS BIGINT) AS n_orders,"
            "  CAST(count(*) AS BIGINT) AS n_customers FROM c GROUP BY n"
        ),
        "promo_revenue_share": _promo_revenue_share_sql(),
        "dup_group_sizes": (
            # mirror of dedup.dup_group_sizes: normalized-md5 group
            # sizes histogrammed
            "WITH h AS (SELECT md5(trim(regexp_replace(regexp_replace("
            " lower(text), '[^a-z0-9 ]+', '', 'g'), ' +', ' ', 'g'), ' '))"
            "   AS th FROM documents),"
            " s AS (SELECT th, CAST(count(*) AS BIGINT) AS n_members"
            "   FROM h GROUP BY 1)"
            " SELECT n_members, CAST(count(*) AS BIGINT) AS n_groups"
            " FROM s GROUP BY 1"
        ),
        "events_dau_wau": _events_dau_wau_sql(),
        "rrf_fusion": _rrf_fusion_sql(),
        "user_lifetimes": (
            # mirror of relational.user_lifetimes: epoch-day floor
            # division, distinct active days, totals per user
            "SELECT user_id,"
            " CAST(min(d) * 86400000000 AS BIGINT) AS first_day_us,"
            " CAST(max(d) * 86400000000 AS BIGINT) AS last_day_us,"
            " CAST(count(DISTINCT d) AS BIGINT) AS active_days,"
            " CAST(count(*) AS BIGINT) AS n_events"
            " FROM (SELECT user_id,"
            "   epoch_us(ts) // 86400000000 AS d FROM events)"
            " GROUP BY 1"
        ),
        "soft_dedup_weights": (
            # mirror of dedup.soft_dedup_weights: the normalized_dedup
            # md5 (same RE2 kernels) and floor(1e6 / group size) —
            # integer // on both sides
            "WITH h AS (SELECT doc_id,"
            " md5(trim(regexp_replace(regexp_replace(lower(text),"
            " '[^a-z0-9 ]+', '', 'g'), ' +', ' ', 'g'), ' ')) AS th"
            " FROM documents),"
            " n AS (SELECT th, CAST(count(*) AS BIGINT) AS n_members"
            "   FROM h GROUP BY 1)"
            " SELECT h.doc_id, n.n_members,"
            "  CAST(1000000 // n.n_members AS BIGINT) AS weight_micros"
            " FROM h JOIN n USING (th)"
        ),
        "event_transitions": (
            # mirror of relational.event_transitions: lead() over the
            # same deterministic (ts, event_id) order per user
            "WITH o AS (SELECT user_id, event_type,"
            "   lead(event_type) OVER (PARTITION BY user_id"
            "     ORDER BY epoch_us(ts), event_id) AS nxt FROM events)"
            " SELECT event_type AS prev_type, nxt AS next_type,"
            "  CAST(count(*) AS BIGINT) AS n FROM o"
            " WHERE nxt IS NOT NULL GROUP BY 1, 2"
        ),
        "gram_novelty": _gram_novelty_sql(),
        "returned_items": _returned_items_sql(),
        "order_priority_counts": (
            # mirror of relational.order_priority_counts (TPC-H Q4
            # shape): EXISTS lineitem shipped strictly after the order
            # date — the pipeline's max-shipdate-per-order gate is the
            # same predicate (max > date ≡ EXISTS any > date)
            "SELECT o_orderpriority,"
            " CAST(count(*) AS BIGINT) AS n_orders FROM orders o"
            " WHERE EXISTS (SELECT 1 FROM lineitem l"
            "   WHERE l.l_orderkey = o.o_orderkey"
            "   AND l.l_shipdate > o.o_orderdate)"
            " GROUP BY 1"
        ),
        "top_words": _top_words_sql(),
        "length_percentiles": (
            # mirror of analysis.length_percentiles: percent_rank as the
            # integer identity (rank-1)*1e6 // (n-1) — never the float
            # percent_rank() whose double rounding could diverge
            "SELECT doc_id, source,"
            " CAST(CASE WHEN count(*) OVER (PARTITION BY source) = 1"
            "  THEN 0 ELSE ((rank() OVER (PARTITION BY source"
            "    ORDER BY n_chars, doc_id) - 1) * 1000000)"
            "   // (count(*) OVER (PARTITION BY source) - 1) END"
            "  AS BIGINT) AS pct_micros"
            " FROM documents"
        ),
        "profile_documents": _profile_documents_sql(),
        "segment_order_quantiles": (
            # mirror of relational.segment_order_quantiles: same cents
            # rounding and quantile_disc rank rule as event_quantiles,
            # through the customer join
            "SELECT c.c_mktsegment,"
            " CAST(quantile_disc(cents, 0.25) AS BIGINT) AS p25_cents,"
            " CAST(quantile_disc(cents, 0.50) AS BIGINT) AS p50_cents,"
            " CAST(quantile_disc(cents, 0.75) AS BIGINT) AS p75_cents"
            " FROM (SELECT o_custkey,"
            "   CAST(round(o_totalprice * 100) AS BIGINT) AS cents"
            "   FROM orders) o"
            " JOIN customer c ON c.c_custkey = o.o_custkey"
            " GROUP BY 1"
        ),
        "nation_trade_balance": (
            # mirror of relational.nation_trade_balance (TPC-H Q7
            # shape, all nation pairs): identical integer rev_cc and
            # the same four inner joins
            "WITH l AS (SELECT l_orderkey, l_suppkey,"
            "   CAST(round(l_extendedprice * 100) AS BIGINT)"
            "     * (100 - CAST(round(l_discount * 100) AS BIGINT))"
            "     AS rev_cc FROM lineitem)"
            " SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,"
            "  CAST(sum(l.rev_cc) AS BIGINT) AS revenue_cc"
            " FROM l JOIN orders o ON o.o_orderkey = l.l_orderkey"
            " JOIN customer c ON c.c_custkey = o.o_custkey"
            " JOIN supplier s ON s.s_suppkey = l.l_suppkey"
            " JOIN nation nc ON nc.n_nationkey = c.c_nationkey"
            " JOIN nation ns ON ns.n_nationkey = s.s_nationkey"
            " GROUP BY 1, 2"
        ),
        "mojibake_repair": (
            # invariant oracle for filter.mojibake_repair: the repair
            # must apply exactly the corruption depth (doc_id%7: 3→one
            # pass, 5→two) and restore the original byte-for-byte —
            # any failed or spurious fix hash-mismatches
            "SELECT doc_id,"
            " CAST(CASE WHEN doc_id % 7 = 3 THEN 1"
            "  WHEN doc_id % 7 = 5 THEN 2 ELSE 0 END AS BIGINT)"
            "  AS corrupted_passes,"
            " CAST(CASE WHEN doc_id % 7 = 3 THEN 1"
            "  WHEN doc_id % 7 = 5 THEN 2 ELSE 0 END AS BIGINT) AS n_fixes,"
            " CAST(1 AS BIGINT) AS restored"
            " FROM documents"
        ),
        "events_hourly_delta": (
            # mirror of relational.events_hourly_delta: LAG over the
            # hourly rollup, epoch-micros hour key, first-hour delta = n
            "WITH h AS (SELECT event_type,"
            "   epoch_us(date_trunc('hour', ts)) AS hour_us,"
            "   CAST(count(*) AS BIGINT) AS n FROM events"
            "   GROUP BY event_type, date_trunc('hour', ts))"
            " SELECT event_type, hour_us, n,"
            "  CAST(n - coalesce(LAG(n) OVER (PARTITION BY event_type"
            "    ORDER BY hour_us), 0) AS BIGINT) AS delta_n FROM h"
        ),
        "cohort_retention": (
            # mirror of relational.cohort_retention: epoch-day cohort =
            # per-user min day; one DISTINCT (user, cohort, offset) set,
            # then the cell count
            "WITH e AS (SELECT user_id,"
            "   epoch_us(ts) // 86400000000 AS day FROM events),"
            " f AS (SELECT user_id, min(day) AS cohort FROM e"
            "   GROUP BY user_id),"
            " c AS (SELECT DISTINCT e.user_id, f.cohort,"
            "   e.day - f.cohort AS off FROM e JOIN f USING (user_id))"
            " SELECT cohort AS cohort_day, off AS offset_day,"
            "  CAST(count(*) AS BIGINT) AS n_users"
            " FROM c GROUP BY cohort, off"
        ),
        "label_centroids": (
            # mirror of cluster.label_centroids: floor-to-micros BEFORE
            # the sum keeps the aggregate order-free and exact
            "SELECT CAST(label AS BIGINT) AS label,"
            " CAST(i - 1 AS BIGINT) AS d,"
            " CAST(sum(CAST(floor(CAST(e[CAST(i AS INT)] AS DOUBLE)"
            "   * 1000000) AS BIGINT)) AS BIGINT) AS sum_micros,"
            " CAST(count(*) AS BIGINT) AS n"
            " FROM (SELECT label, embedding AS e,"
            "   unnest(range(1, len(embedding) + 1)) AS i FROM embeddings)"
            " GROUP BY label, i"
        ),
        "user_running_totals": (
            # mirror of relational.user_running_totals: the unbounded-
            # preceding running window, (ts, event_id) orders ties
            "SELECT CAST(event_id AS BIGINT) AS event_id,"
            " CAST(user_id AS BIGINT) AS user_id,"
            " CAST(ROW_NUMBER() OVER w AS BIGINT) AS run_n,"
            " CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w"
            "   AS BIGINT) AS run_cents"
            " FROM events WINDOW w AS (PARTITION BY user_id"
            "   ORDER BY ts, event_id"
            "   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        ),
        "bloom_dedup": _bloom_sql(),
        "pmi_bigrams": _pmi_sql(),
        "vocab_coverage": _vocab_sql(),
        "leakage_safe_split": _split_sql(),
        "knn_ivf_kmeans": _knn_ivfkm_sql(),
        "incremental_events_hourly": (
            # full recompute over ALL events — the incremental merge
            # must equal it exactly (merge == recompute)
            "SELECT event_type, date_trunc('hour', ts) AS hour_start,"
            " CAST(count(*) AS BIGINT) AS n,"
            " CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
            "   AS total_cents,"
            " CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
            "   AS min_cents,"
            " CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
            "   AS max_cents"
            " FROM events GROUP BY event_type, date_trunc('hour', ts)"
        ),
        "chunk_documents": (
            # mirror of pack.chunk_documents: 0-based chunk starts every
            # 32 words (greatest(...,1) gives empty docs one empty
            # chunk); DuckDB list slices are 1-based inclusive
            f"WITH w AS (SELECT doc_id, {_WORDS_EXPR} AS w FROM documents),"
            " s AS (SELECT doc_id, w,"
            "   unnest(range(0, greatest(len(w), 1), 32)) AS s FROM w)"
            " SELECT CAST(doc_id AS BIGINT) AS doc_id,"
            "  CAST(s // 32 AS BIGINT) AS chunk_idx,"
            "  CAST(least(len(w), s + 32) - s AS BIGINT) AS n_chunk_tokens,"
            "  array_to_string(w[CAST(s + 1 AS INT):CAST(s + 32 AS INT)], ' ')"
            "    AS chunk_text"
            " FROM s"
        ),
        "tfidf_scores": (
            # mirror of analysis.tfidf_scores: integer-micros floor of
            # ln(N/df) summed tf-weighted per document, idf table capped
            # at the top-V words by (df DESC, word ASC); OOV words take
            # the df=1 default — same cap the Ray pipeline broadcasts
            f"WITH w AS (SELECT doc_id, unnest({_WORDS_EXPR}) AS word"
            "   FROM documents),"
            " t AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf"
            "   FROM w GROUP BY doc_id, word),"
            " df AS (SELECT word, CAST(count(*) AS BIGINT) AS df"
            "   FROM t GROUP BY word),"
            " top AS (SELECT word, df FROM (SELECT word, df,"
            "   row_number() OVER (ORDER BY df DESC, word) AS rk FROM df)"
            f"   WHERE rk <= {_VOCAB_CAP_SQL}),"
            " n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),"
            " idf AS (SELECT word,"
            "   CAST(floor(ln(n.n / top.df) * 1000000) AS BIGINT) AS m"
            "   FROM top, n),"
            " oov AS (SELECT CAST(floor(ln(n.n / 1.0) * 1000000) AS BIGINT)"
            "   AS m FROM n),"
            " sc AS (SELECT t.doc_id,"
            "   CAST(sum(t.tf) AS BIGINT) AS n_words,"
            "   CAST(sum(t.tf * coalesce(i.m, oov.m)) AS BIGINT)"
            "     AS tfidf_micros"
            "   FROM t LEFT JOIN idf i USING (word) CROSS JOIN oov"
            "   GROUP BY t.doc_id)"
            " SELECT d.doc_id,"
            "  CAST(coalesce(sc.n_words, 0) AS BIGINT) AS n_words,"
            "  CAST(coalesce(sc.tfidf_micros, 0) AS BIGINT) AS tfidf_micros"
            " FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id"
        ),
        "ngram_stats": _ngram_sql(),
        "bpe_token_counts": _bpe_token_sql(),
        "unigram_logprob": (
            # mirror of analysis.unigram_logprob: integer-micros floor of
            # ln(count(w)/N) summed per token occurrence (associative);
            # unigram table capped at the top-V words by (count DESC,
            # word ASC), N stays the FULL corpus token total, OOV words
            # take the floor ln(1/N) — same cap the Ray pipeline
            # broadcasts
            f"WITH w AS (SELECT doc_id, unnest({_WORDS_EXPR}) AS word"
            "   FROM documents),"
            " c AS (SELECT word, count(*) AS c FROM w GROUP BY word),"
            " t AS (SELECT sum(c) AS n FROM c),"
            " top AS (SELECT word, c FROM (SELECT word, c,"
            "   row_number() OVER (ORDER BY c DESC, word) AS rk FROM c)"
            f"   WHERE rk <= {_VOCAB_CAP_SQL}),"
            " m AS (SELECT word, CAST(floor(ln(CAST(c AS DOUBLE) / t.n)"
            "   * 1000000) AS BIGINT) AS m FROM top, t),"
            " oov AS (SELECT CAST(floor(ln(1.0 / t.n) * 1000000) AS BIGINT)"
            "   AS m FROM t),"
            " s AS (SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_words,"
            "   CAST(sum(coalesce(m.m, oov.m)) AS BIGINT) AS logprob_micros"
            "   FROM w LEFT JOIN m USING (word) CROSS JOIN oov"
            "   GROUP BY w.doc_id)"
            " SELECT d.doc_id,"
            " CAST(coalesce(s.n_words, 0) AS BIGINT) AS n_words,"
            " CAST(coalesce(s.logprob_micros, 0) AS BIGINT) AS logprob_micros"
            " FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id"
        ),
        "perplexity_scores": _perplexity_sql(),
        "ccnet_buckets": _ccnet_buckets_sql(),
        "importance_weights": _importance_sql(),
        "repetition_stats": _repetition_sql(),
        "quality_filter": _quality_filter_sql(),
        "pii_scrub": _pii_sql(),
        "exact_dedup": (
            "SELECT md5(text) AS text_hash, CAST(min(doc_id) AS BIGINT) AS doc_id"
            " FROM documents GROUP BY md5(text)"
        ),
        "minhash_dedup": _jaccard_pairs_sql(500),
        "incremental_dedup": _incremental_sql(500),
        "normalized_dedup": (
            # mirror of dedup.normalized_dedup (RE2 semantics match
            # Arrow's: non-[a-z0-9 ] runs deleted, spaces collapsed)
            "SELECT md5(trim(regexp_replace(regexp_replace(lower(text),"
            " '[^a-z0-9 ]+', '', 'g'), ' +', ' ', 'g'), ' ')) AS text_hash,"
            " CAST(min(doc_id) AS BIGINT) AS doc_id,"
            " CAST(count(*) AS BIGINT) AS n_members"
            " FROM documents GROUP BY 1"
        ),
        "simhash_dedup": _simhash_sql(),
        "copartitioned_join": (
            # mirror of relational.copartitioned_order_customer: the SMB
            # layout only changes WHERE rows live, never the join result
            "SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey,"
            " CAST(c.c_custkey AS BIGINT) AS c_custkey, c.c_mktsegment,"
            " CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents"
            " FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
        ),
        "brand_revenue": (
            # mirror of relational.brand_revenue: rev_cc = price_cents x
            # (100 - disc_pct) — integer after the per-column rounding
            "WITH l AS (SELECT l_partkey,"
            "   CAST(round(l_extendedprice * 100) AS BIGINT)"
            "   * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev"
            "   FROM lineitem)"
            " SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_items,"
            "  CAST(sum(l.rev) AS BIGINT) AS revenue_cc"
            " FROM l JOIN part p ON l.l_partkey = p.p_partkey"
            " GROUP BY p.p_brand"
        ),
        "supplier_value_by_nation": (
            # mirror of relational.supplier_value_by_nation: per-suppkey
            # revenue -> supplier -> nation; suppliers without lineitems
            # drop (inner join both sides)
            "WITH l AS (SELECT l_suppkey,"
            "   CAST(round(l_extendedprice * 100) AS BIGINT)"
            "   * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev"
            "   FROM lineitem),"
            " per_s AS (SELECT l_suppkey, sum(rev) AS v FROM l"
            "   GROUP BY l_suppkey)"
            " SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_suppliers,"
            "  CAST(sum(per_s.v) AS BIGINT) AS value_cc"
            " FROM per_s JOIN supplier s ON per_s.l_suppkey = s.s_suppkey"
            " JOIN nation n ON s.s_nationkey = n.n_nationkey"
            " GROUP BY n.n_name"
        ),
        "substring_dedup": _substring_dedup_sql(),
        "ngram_jaccard_dedup": _jaccard_pairs_sql(400),
        "near_dup_clusters": _clusters_sql(),
        "curate_documents": _curate_documents_sql(),
        "embedding_dedup": _embedding_dedup_sql(),
        "kmeans_embeddings": _kmeans_sql(),
        "semantic_dedup": _semantic_dedup_sql(),
        "knn_lsh": _knn_lsh_sql(),
        "knn_ivf": _knn_lsh_sql(),
        "knn_cosine": (
            "SELECT e.vec_id FROM embeddings e,"
            " (SELECT embedding FROM embeddings WHERE vec_id = 0) q"
            " WHERE e.vec_id <> 0"
            " ORDER BY CAST(round(list_cosine_similarity(e.embedding, q.embedding)"
            " * 1000000) AS BIGINT) DESC, e.vec_id LIMIT 10"
        ),
        "embedding_norms": (
            "SELECT vec_id, CAST(round(sqrt(list_sum(list_transform(embedding,"
            " x -> CAST(x AS DOUBLE) * x))) * 1000000) AS BIGINT) AS l2_micros"
            " FROM embeddings"
        ),
        "lineitem_agg": (
            "SELECT l_returnflag, l_linestatus,"
            " CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,"
            " CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)"
            "   AS sum_price_cents,"
            " CAST(count(*) AS BIGINT) AS n"
            " FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "orders_filtered": (
            "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n"
            " FROM orders WHERE o_totalprice > 150000.0 GROUP BY o_orderpriority"
        ),
        "range_join_events": (
            # mirror of relational.range_join_events: every 'error'
            # event opens a [ts, ts+10min) window; interval-containment
            # join counts events and sums integer cents per window
            "WITH w AS (SELECT event_id AS window_id, ts AS t0 FROM events"
            "   WHERE event_type = 'error')"
            " SELECT w.window_id, CAST(count(*) AS BIGINT) AS n_events,"
            "  CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)"
            "    AS sum_cents"
            " FROM w JOIN events e"
            "   ON e.ts >= w.t0 AND e.ts < w.t0 + INTERVAL 10 MINUTE"
            " GROUP BY w.window_id"
        ),
        "orders_by_nation": (
            "SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_orders,"
            " CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)"
            "   AS total_cents"
            " FROM orders o"
            " JOIN customer c ON o.o_custkey = c.c_custkey"
            " JOIN nation n ON c.c_nationkey = n.n_nationkey"
            " GROUP BY n.n_name"
        ),
        "region_revenue": (
            "SELECT r.r_name, CAST(count(*) AS BIGINT) AS n_orders,"
            " CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)"
            "   AS total_cents"
            " FROM orders o"
            " JOIN customer c ON o.o_custkey = c.c_custkey"
            " JOIN nation n ON c.c_nationkey = n.n_nationkey"
            " JOIN region r ON n.n_regionkey = r.r_regionkey"
            " GROUP BY r.r_name"
        ),
        "events_hourly": (
            "SELECT event_type, date_trunc('hour', ts) AS hour_start,"
            " CAST(count(*) AS BIGINT) AS n,"
            " CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,"
            " CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS min_cents,"
            " CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_cents"
            " FROM events GROUP BY event_type, date_trunc('hour', ts)"
        ),
        "events_sliding": (
            "SELECT event_type, make_timestamp(ws) AS window_start,"
            " CAST(count(*) AS BIGINT) AS n,"
            " CAST(sum(cents) AS BIGINT) AS total_cents"
            " FROM (SELECT event_type,"
            "   (epoch_us(ts) // 900000000) * 900000000"
            "     - CAST(i.i AS BIGINT) * 900000000 AS ws,"
            "   CAST(round(value * 100) AS BIGINT) AS cents"
            "   FROM events, (SELECT unnest([0, 1, 2, 3]) AS i) i)"
            " GROUP BY event_type, ws"
        ),
        "distinct_users_per_type": (
            "SELECT event_type,"
            " CAST(count(DISTINCT user_id) AS BIGINT) AS n_users"
            " FROM events GROUP BY event_type"
        ),
        "event_quantiles": (
            "SELECT event_type,"
            " CAST(quantile_disc(cents, 0.5) AS BIGINT) AS p50_cents,"
            " CAST(quantile_disc(cents, 0.95) AS BIGINT) AS p95_cents"
            " FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT)"
            "       AS cents FROM events) GROUP BY event_type"
        ),
        "top_orders_per_nation": (
            "SELECT n_name, o_orderkey, price_cents, rnk FROM ("
            " SELECT n.n_name, o.o_orderkey,"
            " CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_cents,"
            " CAST(ROW_NUMBER() OVER (PARTITION BY n.n_name"
            "   ORDER BY CAST(round(o.o_totalprice * 100) AS BIGINT) DESC,"
            "   o.o_orderkey) AS BIGINT) AS rnk"
            " FROM orders o"
            " JOIN customer c ON o.o_custkey = c.c_custkey"
            " JOIN nation n ON c.c_nationkey = n.n_nationkey)"
            " WHERE rnk <= 3"
        ),
        "error_attribution": (
            "SELECT e.event_id,"
            " CAST(epoch_us(e.ts) - epoch_us(m.ts) AS BIGINT) AS gap_micros"
            " FROM (SELECT event_id, user_id, ts FROM events"
            "       WHERE event_type = 'error') e"
            " ASOF JOIN (SELECT user_id, ts FROM events"
            "            WHERE event_type <> 'error') m"
            " ON e.user_id = m.user_id AND e.ts >= m.ts"
        ),
        "sessionize_events": (
            "SELECT user_id,"
            " CAST(1 + sum(CASE WHEN gap > 1800.0 THEN 1 ELSE 0 END) AS BIGINT)"
            "   AS n_sessions,"
            " CAST(count(*) AS BIGINT) AS n_events"
            " FROM (SELECT user_id,"
            "   epoch(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS gap"
            "   FROM events)"
            " GROUP BY user_id"
        ),
    }
    out.update(_tpch_classic_sql())
    out.update(_extract_oracle_sql())
    out.update(_rows_only_golden_sql())
    return out


_HOURLY_CTE = (
    "WITH h AS (SELECT epoch_us(ts)//3600000000 AS hr,"
    "   CAST(round(value*100) AS BIGINT) c0 FROM events),"
    " t AS (SELECT hr, CAST(sum(c0) AS BIGINT) c FROM h GROUP BY hr),"
)


def _theil_sen_sql() -> str:
    """Mirror of relational.theil_sen_hourly: pairwise
    truncate-toward-zero micro slopes over the hourly cents series
    (HUGEINT products), lower median by row_number at rank (m+1)//2,
    residual-intercept lower median at that slope."""
    return (
        _HOURLY_CTE +
        " mn AS (SELECT min(hr) h0 FROM t),"
        " p AS (SELECT hr - mn.h0 AS x, c FROM t, mn),"
        " sl AS (SELECT (CASE WHEN b.c < a.c THEN -1 ELSE 1 END) *"
        "   ((abs(CAST(b.c AS HUGEINT) - a.c) * 1000000) // (b.x - a.x)) AS s"
        "   FROM p a JOIN p b ON b.x > a.x),"
        " m AS (SELECT count(*) mm FROM sl),"
        " med AS (SELECT s FROM (SELECT s, row_number() OVER (ORDER BY s) rn"
        "   FROM sl), m WHERE rn = (m.mm + 1) // 2),"
        " nn AS (SELECT count(*) n FROM p),"
        " ic AS (SELECT CAST(p.c AS HUGEINT)*1000000 - med.s * p.x AS b"
        "   FROM p, med),"
        " imed AS (SELECT b FROM (SELECT b, row_number() OVER (ORDER BY b) rn"
        "   FROM ic), nn WHERE rn = (nn.n + 1) // 2)"
        " SELECT CAST(nn.n AS BIGINT) n_hours, CAST(m.mm AS BIGINT) n_pairs,"
        "  CAST(med.s AS BIGINT) slope_micros,"
        "  CAST(imed.b AS BIGINT) intercept_micros"
        " FROM nn, m, med, imed"
    )


def _mann_kendall_sql() -> str:
    """Mirror of relational.mann_kendall_hourly: pairwise sign sum S,
    tie-corrected var18 (exact integers), continuity-corrected z
    floored to millis (same double expression both engines), and the
    sign-routed positive-operand tau division (the CLAUDE.md `//`
    discipline)."""
    return (
        _HOURLY_CTE +
        " sp AS (SELECT CAST(sum(CASE WHEN b.c > a.c THEN 1"
        "   WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) s"
        "   FROM t a JOIN t b ON b.hr > a.hr),"
        " nn AS (SELECT CAST(count(*) AS BIGINT) n FROM t),"
        " ties AS (SELECT coalesce(sum(k*(k-1)*(2*k+5)), 0) corr FROM"
        "   (SELECT CAST(count(*) AS BIGINT) k FROM t GROUP BY c"
        "    HAVING count(*) > 1)),"
        " v AS (SELECT nn.n*(nn.n-1)*(2*nn.n+5) - ties.corr AS var18"
        "   FROM nn, ties)"
        " SELECT nn.n n_hours, sp.s s_stat, CAST(v.var18 AS BIGINT) var18,"
        "  CAST(CASE WHEN sp.s = 0 THEN 0 ELSE floor((sp.s -"
        "   (CASE WHEN sp.s > 0 THEN 1 ELSE -1 END))"
        "   / sqrt(v.var18/18.0) * 1000) END AS BIGINT) z_milli,"
        "  CAST((CASE WHEN sp.s < 0 THEN -1 ELSE 1 END) *"
        "   ((abs(sp.s)*1000) // (nn.n*(nn.n-1)//2)) AS BIGINT) tau_milli"
        " FROM nn, sp, v"
    )


def _fano_sql() -> str:
    """Mirror of relational.fano_hourly_by_type: per-(type, hour)
    counts, the GLOBAL slot span, and the all-non-negative integer
    mean/fano divisions through HUGEINT."""
    return (
        "WITH h AS (SELECT event_type t, epoch_us(ts)//3600000000 hr"
        "   FROM events),"
        " g AS (SELECT t, hr, CAST(count(*) AS BIGINT) n FROM h"
        "   GROUP BY t, hr),"
        " span AS (SELECT max(hr)-min(hr)+1 AS slots FROM g),"
        " m AS (SELECT t, CAST(sum(n) AS BIGINT) tot,"
        "   CAST(sum(CAST(n AS HUGEINT)*n) AS HUGEINT) sq FROM g GROUP BY t)"
        " SELECT m.t event_type, CAST(span.slots AS BIGINT) n_slots,"
        "  m.tot n_events, CAST((1000*m.tot)//span.slots AS BIGINT)"
        "   mean_milli,"
        "  CAST((1000*(span.slots*m.sq - CAST(m.tot AS HUGEINT)*m.tot))"
        "   // (span.slots*m.tot) AS BIGINT) fano_milli"
        " FROM m, span"
    )


def _hourly_acf_sql() -> str:
    """Mirror of relational.hourly_acf_panel: the zero-filled slot
    series via generate-range + LEFT JOIN, exact HUGEINT deviations
    N·c−S, double division floored to micros."""
    from pdf_parser_ray.pipelines.relational import ACF_MAX_LAG

    return (
        _HOURLY_CTE +
        " b AS (SELECT min(hr) h0, max(hr)-min(hr)+1 slots FROM t),"
        " idx AS (SELECT unnest(range(0,"
        "   (SELECT CAST(slots AS BIGINT) FROM b))) AS i),"
        " ser AS (SELECT idx.i, coalesce(t.c, 0) c FROM idx"
        "   LEFT JOIN t ON t.hr = (SELECT h0 FROM b) + idx.i),"
        " s AS (SELECT CAST(sum(c) AS HUGEINT) tot FROM ser),"
        " d AS (SELECT i, CAST((SELECT slots FROM b) AS HUGEINT)*c - s.tot"
        "   AS dv FROM ser, s),"
        " den AS (SELECT sum(dv*dv) dd FROM d),"
        f" lags AS (SELECT unnest(range(1, {ACF_MAX_LAG + 1})) k),"
        " num AS (SELECT lags.k, sum(a.dv*b2.dv) nm FROM lags,"
        "   d a JOIN d b2 ON b2.i = a.i + lags.k GROUP BY lags.k)"
        " SELECT CAST(num.k AS BIGINT) lag,"
        "  CAST((SELECT slots FROM b) - num.k AS BIGINT) n_terms,"
        "  CAST(floor(CAST(num.nm AS DOUBLE)/CAST(den.dd AS DOUBLE)"
        "   *1000000) AS BIGINT) acf_micros"
        " FROM num, den"
    )


def _trimmed_mean_sql() -> str:
    """Mirror of relational.trimmed_mean_orders: global row_number
    rank over cents, k = (n·pct)//100 row cuts, HUGEINT range sum and
    floor mean."""
    from pdf_parser_ray.pipelines.relational import TRIM_PCTS

    pcts = ", ".join(str(p) for p in TRIM_PCTS)
    return (
        "WITH o AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) v"
        "   FROM orders),"
        " r AS (SELECT v, row_number() OVER (ORDER BY v) rn FROM o),"
        " n AS (SELECT CAST(count(*) AS BIGINT) nt FROM o),"
        f" p AS (SELECT unnest([{pcts}]) pct),"
        " cuts AS (SELECT pct, (n.nt*pct)//100 AS k, n.nt FROM p, n),"
        " kept AS (SELECT cuts.pct, cuts.nt, CAST(count(*) AS BIGINT) nk,"
        "   min(r.v) lo, max(r.v) hi, CAST(sum(CAST(r.v AS HUGEINT))"
        "    AS HUGEINT) s"
        "   FROM cuts JOIN r ON r.rn > cuts.k AND r.rn <= cuts.nt - cuts.k"
        "   GROUP BY cuts.pct, cuts.nt)"
        " SELECT CAST(pct AS BIGINT) trim_pct, nt n_total, nk n_kept,"
        "  lo lo_cut_cents, hi hi_cut_cents, CAST(s // nk AS BIGINT)"
        "   mean_cents FROM kept"
    )


def _prefix_dup_sql() -> str:
    """Mirror of analysis.prefix_dup_groups: first-16-word join, the
    char-wise polynomial over Z/(2^61−1) (the simhash hash family) via
    HUGEINT list_reduce, groups of >= 2."""
    from pdf_parser_ray.pipelines.analysis import PREFIX_WORDS
    from pdf_parser_ray.pipelines.dedup import (
        _SIMHASH_HASH_BASE, _SIMHASH_HASH_MOD,
    )

    return (
        f"WITH w AS (SELECT doc_id, {_WORDS_EXPR} words FROM documents),"
        f" pre AS (SELECT doc_id, array_to_string(words[1:{PREFIX_WORDS}],"
        "   ' ') p FROM w),"
        " ph AS (SELECT doc_id, CASE WHEN length(p) = 0 THEN 0 ELSE"
        "   CAST(list_reduce(list_transform(range(1, length(p)+1),"
        "     i -> CAST(ord(substr(p, CAST(i AS INT), 1)) AS HUGEINT)),"
        f"     (a, b) -> (a * {_SIMHASH_HASH_BASE} + b)"
        f"      % {_SIMHASH_HASH_MOD}) AS BIGINT) END h FROM pre)"
        " SELECT h prefix_hash, CAST(count(*) AS BIGINT) n_docs,"
        "  CAST(min(doc_id) AS BIGINT) min_doc_id"
        " FROM ph GROUP BY h HAVING count(*) >= 2"
    )


def _word_length_sql() -> str:
    """Mirror of analysis.word_length_histogram: char lengths clamped
    to the cap, HUGEINT micro shares."""
    from pdf_parser_ray.pipelines.analysis import WORD_LEN_CAP

    return (
        f"WITH w AS (SELECT unnest({_WORDS_EXPR}) word FROM documents),"
        f" l AS (SELECT least(length(word), {WORD_LEN_CAP}) len FROM w),"
        " g AS (SELECT len, CAST(count(*) AS BIGINT) n FROM l GROUP BY len),"
        " t AS (SELECT CAST(sum(n) AS HUGEINT) tot FROM g)"
        " SELECT CAST(len AS BIGINT) length, n n_words,"
        "  CAST((CAST(n AS HUGEINT)*1000000)//t.tot AS BIGINT) share_micros"
        " FROM g, t"
    )


def _vocab_drift_sql() -> str:
    """Mirror of analysis.temporal_vocab_drift: id-range midpoint
    split, per-word two-sided counts, shared-support floored log
    factors, final double KL expression per half."""
    return (
        "WITH r AS (SELECT (min(doc_id)+max(doc_id))//2 cut"
        "   FROM documents),"
        " w AS (SELECT CASE WHEN doc_id <= (SELECT cut FROM r) THEN 0"
        f"   ELSE 1 END half, unnest({_WORDS_EXPR}) word FROM documents),"
        " c AS (SELECT half, word, CAST(count(*) AS BIGINT) k FROM w"
        "   GROUP BY 1, 2),"
        " p AS (SELECT word, sum(CASE WHEN half = 0 THEN k END) k0,"
        "   sum(CASE WHEN half = 1 THEN k END) k1 FROM c GROUP BY word),"
        " tk AS (SELECT CAST(coalesce(sum(k0), 0) AS BIGINT) t0,"
        "   CAST(coalesce(sum(k1), 0) AS BIGINT) t1 FROM p),"
        " sh AS (SELECT CAST(sum(k0) AS BIGINT) s0,"
        "   CAST(sum(k1) AS BIGINT) s1,"
        "   CAST(sum(k0 * CAST(floor(ln(CAST(k0 AS DOUBLE)/k1)*1000000)"
        "     AS BIGINT)) AS BIGINT) a0,"
        "   CAST(sum(k1 * CAST(floor(ln(CAST(k1 AS DOUBLE)/k0)*1000000)"
        "     AS BIGINT)) AS BIGINT) a1"
        "   FROM p WHERE k0 IS NOT NULL AND k1 IS NOT NULL)"
        " SELECT CAST(0 AS BIGINT) half, tk.t0 n_tokens,"
        "  sh.s0 n_shared_tokens,"
        "  CAST(CASE WHEN sh.s0 IS NULL OR sh.s1 IS NULL THEN 0 ELSE"
        "   floor(CAST(sh.a0 AS DOUBLE)/sh.s0 +"
        "    ln(CAST(sh.s1 AS DOUBLE)/sh.s0)*1000000) END AS BIGINT)"
        "   kl_micros FROM tk, sh"
        " UNION ALL SELECT 1, tk.t1, sh.s1,"
        "  CAST(CASE WHEN sh.s0 IS NULL OR sh.s1 IS NULL THEN 0 ELSE"
        "   floor(CAST(sh.a1 AS DOUBLE)/sh.s1 +"
        "    ln(CAST(sh.s0 AS DOUBLE)/sh.s1)*1000000) END AS BIGINT)"
        "  FROM tk, sh"
    )


def _length_deciles_sql() -> str:
    """Mirror of analysis.length_deciles_by_lang: per-lang row_number
    rank at ceil(d·n/10) via the positive-operand (a+b-1)//b ceil."""
    return (
        "WITH r AS (SELECT lang, n_chars v, row_number() OVER"
        "   (PARTITION BY lang ORDER BY n_chars) rn FROM documents),"
        " n AS (SELECT lang, CAST(count(*) AS BIGINT) nt FROM documents"
        "   GROUP BY lang),"
        " d AS (SELECT unnest(range(1, 10)) dk)"
        " SELECT r.lang, CAST(d.dk AS BIGINT) decile,"
        "  CAST(r.v AS BIGINT) cutoff_chars"
        " FROM d, n JOIN r ON r.lang = n.lang"
        "  AND r.rn = (d.dk*n.nt + 9)//10"
    )


def _robust_scaled_sql() -> str:
    """Mirror of relational.robust_scaled_events: lower-median rank
    (n+1)//2 for both median and MAD, sign-routed positive-operand
    milli division, MAD 0 ⇒ z 0."""
    return (
        "WITH e AS (SELECT event_id,"
        "   CAST(round(value*100) AS BIGINT) c FROM events),"
        " n AS (SELECT CAST(count(*) AS BIGINT) nt FROM e),"
        " med AS (SELECT c m FROM (SELECT c, row_number() OVER"
        "   (ORDER BY c) rn FROM e), n WHERE rn = (n.nt+1)//2),"
        " mad AS (SELECT d md FROM (SELECT abs(e.c - med.m) d,"
        "   row_number() OVER (ORDER BY abs(e.c - med.m)) rn"
        "   FROM e, med), n WHERE rn = (n.nt+1)//2)"
        " SELECT e.event_id, e.c cents,"
        "  CAST(CASE WHEN mad.md = 0 THEN 0 ELSE"
        "   (CASE WHEN e.c < med.m THEN -1 ELSE 1 END) *"
        "   ((abs(e.c - med.m)*1000) // mad.md) END AS BIGINT) z_milli"
        " FROM e, med, mad"
    )


def _max_repeated_ngram_sql() -> str:
    """Mirror of analysis.max_repeated_ngram: all 1..16-gram counts by
    exact joined strings, per-doc max repeated length + its top count,
    (0, 0) for repeat-free docs."""
    from pdf_parser_ray.pipelines.analysis import MAX_NGRAM_N

    return (
        f"WITH w AS (SELECT doc_id, {_WORDS_EXPR} words FROM documents),"
        " pos AS (SELECT doc_id, words,"
        "   unnest(range(1, len(words) + 1)) i FROM w),"
        f" nn AS (SELECT unnest(range(1, {MAX_NGRAM_N + 1})) n),"
        " g AS (SELECT p.doc_id, nn.n, array_to_string("
        "   p.words[CAST(p.i AS INT):CAST(p.i + nn.n - 1 AS INT)], ' ')"
        "   gram FROM pos p, nn WHERE p.i + nn.n - 1 <= len(p.words)),"
        " cnt AS (SELECT doc_id, n, gram, count(*) c FROM g"
        "   GROUP BY 1, 2, 3),"
        " mx AS (SELECT doc_id, n, max(c) mc FROM cnt GROUP BY 1, 2),"
        " rep AS (SELECT doc_id, max(n) max_n FROM mx WHERE mc >= 2"
        "   GROUP BY doc_id),"
        " occ AS (SELECT rep.doc_id, rep.max_n, mx.mc n_occ FROM rep"
        "   JOIN mx ON mx.doc_id = rep.doc_id AND mx.n = rep.max_n)"
        " SELECT d.doc_id, CAST(coalesce(occ.max_n, 0) AS BIGINT) max_n,"
        "  CAST(coalesce(occ.n_occ, 0) AS BIGINT) n_occ"
        " FROM documents d LEFT JOIN occ ON occ.doc_id = d.doc_id"
    )


def _sketch_quantile_error_sql() -> str:
    """Mirror of sketch.sketch_quantile_error: the exact side is the
    per-type row_number quantile at the sketch's own rank convention
    (max(1, min(n, ceil(q·n))) — cents ×10⁴ micros); the approx side
    is the committed DDSketch golden unpivoted to q_pct rows."""
    golden = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "goldens", "rows_only", "approx_event_quantiles.parquet",
    )
    return (
        "WITH e AS (SELECT event_type t,"
        "   CAST(round(value*100) AS BIGINT) v FROM events),"
        " r AS (SELECT t, v, row_number() OVER (PARTITION BY t"
        "   ORDER BY v) rn FROM e),"
        " n AS (SELECT t, CAST(count(*) AS BIGINT) nt FROM e GROUP BY t),"
        " q AS (SELECT unnest([50, 90, 99]) qp),"
        " ex AS (SELECT r.t, q.qp, CAST(r.v*10000 AS BIGINT) exact"
        "   FROM q, n JOIN r ON r.t = n.t"
        "   AND r.rn = greatest(1, least(n.nt, (q.qp*n.nt + 99)//100))),"
        " ap AS ("
        f"  SELECT event_type, 50 qp, q50_micros a FROM read_parquet('{golden}')"
        f"  UNION ALL SELECT event_type, 90, q90_micros FROM read_parquet('{golden}')"
        f"  UNION ALL SELECT event_type, 99, q99_micros FROM read_parquet('{golden}'))"
        " SELECT ex.t event_type, CAST(ex.qp AS BIGINT) q_pct,"
        "  ex.exact exact_micros, CAST(ap.a AS BIGINT) approx_micros,"
        "  CAST(abs(ap.a - ex.exact) AS BIGINT) err_micros,"
        "  CAST(abs(ap.a - ex.exact)*1000000 //"
        "   greatest(1, abs(ex.exact)) AS BIGINT) rel_err_ppm"
        " FROM ex JOIN ap ON ap.event_type = ex.t AND ap.qp = ex.qp"
    )


def _asof_sql() -> str:
    """Mirror of relational.asof_event_join: IGNORE-NULLS last_value
    over the (ts, event_id)-ordered per-user window — the current row
    (a left event) contributes NULL, so the window's last value IS the
    strictly-prior right event."""
    return (
        "WITH e AS (SELECT event_id, user_id, epoch_us(ts) tm, event_type"
        "   FROM events WHERE event_type IN ('error', 'click')),"
        " w AS (SELECT event_id, user_id, tm, event_type,"
        "   last_value(CASE WHEN event_type = 'click' THEN event_id END"
        "     IGNORE NULLS) OVER (PARTITION BY user_id"
        "     ORDER BY tm, event_id"
        "     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cid,"
        "   last_value(CASE WHEN event_type = 'click' THEN tm END"
        "     IGNORE NULLS) OVER (PARTITION BY user_id"
        "     ORDER BY tm, event_id"
        "     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) ctm"
        "  FROM e)"
        " SELECT event_id, user_id, cid click_event_id,"
        "  (tm - ctm)//1000 gap_ms"
        " FROM w WHERE event_type = 'error' AND cid IS NOT NULL"
    )


def _storage_audit_sql() -> str:
    """Mirror of analysis.storage_audit over the oracle sf dir's
    parquet footers: DuckDB's parquet_metadata per column chunk,
    deduped to row groups for row counts, summed for compressed
    bytes."""
    from pdf_parser_ray.pipelines.analysis import STORAGE_AUDIT_TABLES

    parts = []
    for t in STORAGE_AUDIT_TABLES:
        p = os.path.join(_ORACLE_SF_DIR, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        parts.append(
            f"SELECT '{t}' table_name,"
            " CAST(count(DISTINCT file_name) AS BIGINT) n_files,"
            " CAST(count(*) AS BIGINT) n_row_groups,"
            " CAST(sum(nr) AS BIGINT) n_rows,"
            " CAST(sum(cb) AS BIGINT) compressed_bytes FROM ("
            "  SELECT file_name, row_group_id,"
            "   max(row_group_num_rows) nr,"
            "   sum(total_compressed_size) cb"
            f"  FROM parquet_metadata('{p}') GROUP BY 1, 2)"
        )
    return " UNION ALL ".join(parts)


def _sentence_stats_sql() -> str:
    """Mirror of analysis.sentence_stats: regexp split on [.!?]+ runs,
    ASCII-whitespace trim, empties dropped, (1000·Σ)//n mean."""
    return (
        "WITH p AS (SELECT doc_id, trim(unnest(regexp_split_to_array("
        "   text, '[.!?]+')), ' ' || chr(9) || chr(13) || chr(10)) s"
        "   FROM documents),"
        " k AS (SELECT doc_id, length(s) l FROM p WHERE s <> ''),"
        " a AS (SELECT doc_id, CAST(count(*) AS BIGINT) n,"
        "   CAST(sum(l) AS BIGINT) tot, CAST(max(l) AS BIGINT) mx"
        "   FROM k GROUP BY doc_id)"
        " SELECT d.doc_id, CAST(coalesce(a.n, 0) AS BIGINT) n_sentences,"
        "  CAST(coalesce((1000*a.tot)//a.n, 0) AS BIGINT)"
        "   mean_sent_chars_milli,"
        "  CAST(coalesce(a.mx, 0) AS BIGINT) max_sent_chars"
        " FROM documents d LEFT JOIN a ON a.doc_id = d.doc_id"
    )


def _embedding_drift_sql() -> str:
    """Mirror of similarity.embedding_drift: the shared floor(x·L/A)
    symmetric quantizer (max-abs scale as one double — the
    knn_quantized discipline), per-half per-dim HUGEINT sums at the
    id-range midpoint split, one double cosine floored to micros."""
    from pdf_parser_ray.pipelines.similarity import QUANT_LEVELS

    levels = float(QUANT_LEVELS)
    return (
        "WITH v AS (SELECT vec_id, embedding e FROM embeddings),"
        " a AS (SELECT CAST(max(abs(x)) AS DOUBLE) a FROM"
        "   (SELECT unnest(e) x FROM v)),"
        " r AS (SELECT (min(vec_id)+max(vec_id))//2 cut FROM v),"
        " u AS (SELECT vec_id, unnest(e) x,"
        "   generate_subscripts(e, 1) i FROM v),"
        " q AS (SELECT CASE WHEN u.vec_id <= (SELECT cut FROM r)"
        "   THEN 0 ELSE 1 END side, u.i,"
        f"   CAST(floor(CAST(u.x AS DOUBLE) * {levels} / a.a) AS BIGINT)"
        "   qv FROM u CROSS JOIN a),"
        " s AS (SELECT side, i, CAST(sum(qv) AS HUGEINT) sv FROM q"
        "   GROUP BY 1, 2),"
        " n AS (SELECT CAST(sum(CASE WHEN vec_id <= (SELECT cut FROM r)"
        "   THEN 1 ELSE 0 END) AS BIGINT) ne,"
        "   CAST(sum(CASE WHEN vec_id <= (SELECT cut FROM r)"
        "   THEN 0 ELSE 1 END) AS BIGINT) nl FROM v),"
        " d AS (SELECT sum(x.sv*y.sv) dot FROM s x JOIN s y"
        "   ON x.i = y.i AND x.side = 0 AND y.side = 1),"
        " m AS (SELECT sum(CASE WHEN side = 0 THEN sv*sv END) n0,"
        "   sum(CASE WHEN side = 1 THEN sv*sv END) n1 FROM s)"
        " SELECT n.ne n_early, n.nl n_late,"
        "  CAST(floor(CAST(d.dot AS DOUBLE) /"
        "   (sqrt(CAST(m.n0 AS DOUBLE)) * sqrt(CAST(m.n1 AS DOUBLE)))"
        "   * 1000000) AS BIGINT) cos_micros"
        " FROM n, d, m"
    )


def _hll_error_sql() -> str:
    """Mirror of sketch.hll_error_eval: SQL exact distinct per type ×
    the committed HLL golden."""
    golden = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "goldens", "rows_only", "approx_distinct_users.parquet",
    )
    return (
        "WITH ex AS (SELECT event_type,"
        "   CAST(count(DISTINCT user_id) AS BIGINT) e FROM events"
        "   GROUP BY 1),"
        f" ap AS (SELECT event_type, n_users_approx a"
        f"   FROM read_parquet('{golden}'))"
        " SELECT ex.event_type, ex.e exact_n, CAST(ap.a AS BIGINT)"
        "  approx_n,"
        "  CAST(abs(ap.a - ex.e)*1000000 // greatest(1, ex.e) AS BIGINT)"
        "   err_ppm"
        " FROM ex JOIN ap USING (event_type)"
    )


def _cms_error_sql() -> str:
    """Mirror of sketch.cms_error_eval: SQL exact per-candidate counts
    × the committed Count-Min golden (estimates are upper bounds, so
    err = approx − exact ≥ 0)."""
    golden = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "goldens", "rows_only", "heavy_hitters.parquet",
    )
    return (
        f"WITH hh AS (SELECT user_id, n_est FROM read_parquet('{golden}')),"
        " ex AS (SELECT user_id, CAST(count(*) AS BIGINT) e FROM events"
        "   WHERE user_id IN (SELECT user_id FROM hh) GROUP BY 1)"
        " SELECT hh.user_id, coalesce(ex.e, 0) exact_n,"
        "  CAST(hh.n_est AS BIGINT) approx_n,"
        "  CAST(hh.n_est - coalesce(ex.e, 0) AS BIGINT) err"
        " FROM hh LEFT JOIN ex USING (user_id)"
    )


def _open_order_sql() -> str:
    """Mirror of relational.open_order_concurrency: ±1 boundary deltas
    at order-date / last-ship-day+1, running window sum in day
    order."""
    return (
        "WITH o AS (SELECT o_orderkey k,"
        "   epoch_us(o_orderdate)//86400000000 sd FROM orders),"
        " l AS (SELECT l_orderkey k,"
        "   max(epoch_us(l_shipdate))//86400000000 ed FROM lineitem"
        "   GROUP BY 1),"
        " iv AS (SELECT o.sd, l.ed FROM o JOIN l USING (k)),"
        " ev AS (SELECT sd d, 1 delta FROM iv"
        "   UNION ALL SELECT ed + 1, -1 FROM iv),"
        " g AS (SELECT d, CAST(sum(delta) AS BIGINT) delta FROM ev"
        "   GROUP BY d)"
        " SELECT CAST(d AS BIGINT) AS \"day\","
        "  CAST(sum(delta) OVER (ORDER BY d) AS BIGINT) n_open FROM g"
    )


def _bigram_entropy_sql() -> str:
    """Mirror of analysis.bigram_entropy: list-indexed bigrams,
    per-bigram floored log factors against the left-word marginal,
    HUGEINT sum, positive-operand floor mean."""
    return (
        f"WITH w AS (SELECT {_WORDS_EXPR} words FROM documents),"
        " bg AS (SELECT words[CAST(i AS INT)] w1,"
        "   words[CAST(i + 1 AS INT)] w2"
        "   FROM (SELECT words, unnest(range(1, len(words))) i FROM w)),"
        " c AS (SELECT w1, w2, CAST(count(*) AS BIGINT) k FROM bg"
        "   GROUP BY 1, 2),"
        " l AS (SELECT w1, CAST(sum(k) AS BIGINT) k1 FROM c GROUP BY 1),"
        " f AS (SELECT c.k, CAST(floor(ln(CAST(l.k1 AS DOUBLE)/c.k)"
        "   *1000000) AS BIGINT) m FROM c JOIN l USING (w1))"
        " SELECT CAST(sum(k) AS BIGINT) n_bigrams,"
        "  CAST(count(*) AS BIGINT) n_distinct_bigrams,"
        "  CAST(CAST(sum(CAST(k AS HUGEINT)*m) AS HUGEINT) // sum(k)"
        "   AS BIGINT) h_micros FROM f"
    )


def _dedup_curve_sql() -> str:
    """Mirror of dedup.dedup_threshold_curve: the brute-force Jaccard
    pair set at the lowest threshold, bucketed by the curve's
    thresholds — valid under the same LSH-completeness guard as the
    minhash oracle."""
    from pdf_parser_ray.pipelines.dedup import DEDUP_CURVE_THRESHOLDS

    lo = min(DEDUP_CURVE_THRESHOLDS)
    ths = ", ".join(str(t) for t in DEDUP_CURVE_THRESHOLDS)
    return (
        f"WITH p AS ({_jaccard_pairs_sql(lo)}),"
        f" th AS (SELECT unnest([{ths}]) t)"
        " SELECT CAST(th.t AS BIGINT) threshold_millis,"
        "  CAST(coalesce(sum(CASE WHEN p.jaccard_millis >= th.t"
        "   THEN 1 ELSE 0 END), 0) AS BIGINT) n_pairs"
        " FROM th LEFT JOIN p ON true GROUP BY th.t"
    )


def _host_components_sql() -> str:
    """Mirror of graph.host_components: symmetric edge closure via a
    recursive CTE, component = min reachable node (incl. self), sizes
    by label."""
    return (
        f"WITH RECURSIVE {_host_edges_expr()},"
        " ed AS (SELECT src a, dst b FROM e"
        "   UNION SELECT dst, src FROM e),"
        " reach(a, b) AS (SELECT a, b FROM ed"
        "   UNION SELECT r.a, e2.b FROM reach r JOIN ed e2 ON r.b = e2.a),"
        " lbl AS (SELECT a host, least(a, min(b)) comp FROM reach"
        "   GROUP BY a),"
        " sz AS (SELECT comp, CAST(count(*) AS BIGINT) n FROM lbl"
        "   GROUP BY comp)"
        " SELECT CAST(lbl.host AS BIGINT) host,"
        "  CAST(lbl.comp AS BIGINT) component_id,"
        "  sz.n component_size"
        " FROM lbl JOIN sz USING (comp)"
    )


def _grouping_sets_sql() -> str:
    """Mirror of relational.revenue_grouping_sets: native GROUPING
    SETS with rolled-up dims coalesced to −1."""
    return (
        "WITH o AS (SELECT c.c_nationkey nk,"
        "   CAST(year(o.o_orderdate) AS BIGINT) yr,"
        "   CAST(round(o.o_totalprice*100) AS BIGINT) cents"
        "   FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)"
        " SELECT CAST(coalesce(nk, -1) AS BIGINT) nation_key,"
        "  CAST(coalesce(yr, -1) AS BIGINT) \"year\","
        "  CAST(sum(cents) AS BIGINT) revenue_cc,"
        "  CAST(count(*) AS BIGINT) n_orders"
        " FROM o GROUP BY GROUPING SETS ((nk, yr), (nk), (yr), ())"
    )


def _value_psi_sql() -> str:
    """Mirror of relational.value_psi: global decile edges at
    quantile_disc ranks, half split at the time-range midpoint,
    per-bin floored log factors with matching-sign differences, one
    positive-operand integer division."""
    from pdf_parser_ray.pipelines.relational import PSI_BINS

    return (
        "WITH e AS (SELECT epoch_us(ts) tm,"
        "   CAST(round(value*100) AS BIGINT) v FROM events),"
        " b AS (SELECT (min(tm)+max(tm))//2 cut, CAST(count(*) AS BIGINT)"
        "   nt FROM e),"
        " r AS (SELECT v, row_number() OVER (ORDER BY v) rn FROM e),"
        f" dk AS (SELECT unnest(range(1, {PSI_BINS})) d),"
        " edges AS (SELECT dk.d, r.v FROM dk, b JOIN r"
        f"   ON r.rn = (dk.d*b.nt + {PSI_BINS} - 1)//{PSI_BINS}),"
        # bin index = count of edges strictly below the value
        # (searchsorted side='left': first edge >= v keeps v left)
        " binned AS (SELECT CASE WHEN e.tm > (SELECT cut FROM b)"
        "   THEN 1 ELSE 0 END half,"
        "   (SELECT count(*) FROM edges WHERE edges.v < e.v) bin"
        "   FROM e),"
        " c AS (SELECT half, bin, CAST(count(*) AS BIGINT) n FROM binned"
        "   GROUP BY 1, 2),"
        " w AS (SELECT coalesce(a.bin, bb.bin) bin,"
        "   coalesce(a.n, 0) an, coalesce(bb.n, 0) bn"
        "   FROM (SELECT bin, n FROM c WHERE half = 0) a"
        "   FULL JOIN (SELECT bin, n FROM c WHERE half = 1) bb"
        "    USING (bin)),"
        " tot AS (SELECT CAST(sum(an) AS BIGINT) na,"
        "   CAST(sum(bn) AS BIGINT) nb FROM w),"
        " terms AS (SELECT CAST((w.an*tot.nb - w.bn*tot.na) AS HUGEINT) *"
        "   CAST(floor(ln((CAST(w.an AS DOUBLE)*tot.nb)/"
        "    (CAST(w.bn AS DOUBLE)*tot.na))*1000000) AS BIGINT) term"
        "   FROM w, tot WHERE w.an > 0 AND w.bn > 0),"
        " used AS (SELECT CAST(count(*) AS BIGINT) u FROM w"
        "   WHERE an > 0 AND bn > 0)"
        " SELECT tot.na n_early, tot.nb n_late, used.u n_bins_used,"
        "  CAST(CAST(coalesce((SELECT sum(term) FROM terms), 0) AS HUGEINT)"
        "   // (CAST(tot.na AS HUGEINT)*tot.nb) AS BIGINT) psi_micros"
        " FROM tot, used"
    )


def _fivenum_sql() -> str:
    """Mirror of relational.value_fivenum: per-type row_number ranks
    at ceil(q·n) via (a+b−1)//b, ×4 integer Tukey fences."""
    return (
        "WITH e AS (SELECT event_type t,"
        "   CAST(round(value*100) AS BIGINT) v FROM events),"
        " r AS (SELECT t, v, row_number() OVER (PARTITION BY t"
        "   ORDER BY v) rn FROM e),"
        " n AS (SELECT t, CAST(count(*) AS BIGINT) nt FROM e GROUP BY t),"
        " qs AS (SELECT n.t,"
        "   (SELECT r.v FROM r WHERE r.t = n.t"
        "     AND r.rn = greatest(1, (1*n.nt + 3)//4)) q1,"
        "   (SELECT r.v FROM r WHERE r.t = n.t"
        "     AND r.rn = greatest(1, (2*n.nt + 3)//4)) med,"
        "   (SELECT r.v FROM r WHERE r.t = n.t"
        "     AND r.rn = greatest(1, (3*n.nt + 3)//4)) q3,"
        "   (SELECT min(v) FROM e WHERE e.t = n.t) mn,"
        "   (SELECT max(v) FROM e WHERE e.t = n.t) mx FROM n)"
        " SELECT qs.t event_type, CAST(qs.mn AS BIGINT) min_c,"
        "  CAST(qs.q1 AS BIGINT) q1_c, CAST(qs.med AS BIGINT) med_c,"
        "  CAST(qs.q3 AS BIGINT) q3_c, CAST(qs.mx AS BIGINT) max_c,"
        "  CAST((SELECT count(*) FROM e WHERE e.t = qs.t"
        "   AND (4*e.v < 4*qs.q1 - 6*(qs.q3 - qs.q1)"
        "    OR 4*e.v > 4*qs.q3 + 6*(qs.q3 - qs.q1))) AS BIGINT)"
        "   n_outliers"
        " FROM qs"
    )


def _lang_density_sql() -> str:
    """Mirror of analysis.lang_token_density: whitespace tokens and
    char lengths per lang, (10⁶·tokens)//chars milli ratio."""
    return (
        f"WITH d AS (SELECT lang, len({_WORDS_EXPR}) tk,"
        "   length(text) ch FROM documents)"
        " SELECT lang, CAST(count(*) AS BIGINT) n_docs,"
        "  CAST(sum(tk) AS BIGINT) n_tokens,"
        "  CAST(sum(ch) AS BIGINT) n_chars,"
        "  CAST((1000000*CAST(sum(tk) AS HUGEINT)) // sum(ch) AS BIGINT)"
        "   tokens_per_kchar_milli"
        " FROM d GROUP BY lang"
    )


def _rows_only_golden_sql() -> dict[str, str]:
    """Committed-golden oracles for the deterministic rows-only tail
    (VERDICT r04 ask #7): codec decode, iterative BPE merges, zlib
    ratios, and sketch folds are not SQL-expressible, but their
    outputs are bit-deterministic (fixed-seed synthetic media, integer
    feature math, seeded merges), so the canonical result at the
    driver's oracle scale is committed under goldens/rows_only/ and
    served as a plain SELECT — upgrading these entries from rows-only
    to full rows+schema+value-hash.  Regenerate ONLY on intentional
    semantic change via tools/regen_goldens.py (the independent md5
    value-hash goldens in tests/test_multimodal.py must move in the
    same commit).  pca_embeddings stays rows-only on purpose: eigh
    float output is not stable across BLAS builds."""
    root = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "goldens", "rows_only"
    )
    out: dict[str, str] = {}
    for name in (
        "compression_ratio",
        "train_bpe",
        "bpe_segment_counts",
        "approx_distinct_users",
        "heavy_hitters",
        "approx_event_quantiles",
        "media_features",
        "image_resize",
        "image_dedup",
        "audio_dedup",
        "frame_sample",
        "audio_features",
    ):
        p = os.path.join(root, f"{name}.parquet")
        if os.path.exists(p):
            out[name] = f"SELECT * FROM read_parquet('{p}')"
    return out
