"""Bbox-grid table reconstruction (SURVEY §2 M5; reference
base.py:46-50 names the capability as pdfplumber's extract_tables —
dead code there, semantics defined by pdf_parser_ray.pdf.tables)."""

import pytest

from pdf_parser_ray.pdf.build import build_pdf
from pdf_parser_ray.pdf.parse import TextRun
from pdf_parser_ray.pdf.tables import extract_tables, page_tables

COLS = (72.0, 250.0, 430.0)

GRID = [
    ["Category", "Items", "Share"],
    ["Groceries", "12", "34%"],
    ["Travel", "3", "9%"],
]


def _page(grid, title="Category breakdown", cols=COLS):
    return [title] + [
        [(cols[j], c) for j, c in enumerate(row)] for row in grid
    ]


def _runs(rows, cols=COLS, top=720.0, leading=14.0):
    """Synthetic positioned runs: rows of (col -> text) dicts."""
    out = []
    y = top
    for row in rows:
        for j, text in row.items():
            out.append(TextRun(x=cols[j], y=y, text=text, size=12.0))
        y -= leading
    return out


class TestPageTables:
    def test_title_line_excluded(self):
        runs = _runs([{0: "Title only"}, {0: "A", 1: "B"}, {0: "C", 1: "D"}])
        assert page_tables(runs) == [[["A", "B"], ["C", "D"]]]

    def test_min_rows(self):
        # a lone 2-cell row is not a table
        runs = _runs([{0: "A", 1: "B"}])
        assert page_tables(runs) == []

    def test_misaligned_columns_split_tables(self):
        runs = _runs([{0: "A", 1: "B"}, {0: "C", 1: "D"}]) + _runs(
            [{0: "E", 2: "F"}, {0: "G", 2: "H"}], top=720.0 - 2 * 14.0
        )
        assert page_tables(runs) == [
            [["A", "B"], ["C", "D"]],
            [["E", "F"], ["G", "H"]],
        ]

    def test_column_count_change_splits(self):
        runs = _runs(
            [
                {0: "A", 1: "B", 2: "C"},
                {0: "D", 1: "E", 2: "F"},
                {0: "G", 1: "H"},
                {0: "I", 1: "J"},
            ]
        )
        assert page_tables(runs) == [
            [["A", "B", "C"], ["D", "E", "F"]],
            [["G", "H"], ["I", "J"]],
        ]

    def test_multi_run_cell_joins_with_space(self):
        # "North" advances the pen to 72 + 5·12·0.5 = 102; a second
        # run at 110 is an 8 pt gap — word spacing (> x_tol, below
        # CELL_GAP), so both stay ONE cell joined by a single space
        runs = [
            TextRun(x=72.0, y=720.0, text="North", size=12.0),
            TextRun(x=110.0, y=720.0, text="East", size=12.0),
            TextRun(x=250.0, y=720.0, text="7", size=12.0),
            TextRun(x=72.0, y=706.0, text="South", size=12.0),
            TextRun(x=250.0, y=706.0, text="9", size=12.0),
        ]
        assert page_tables(runs) == [
            [["North East", "7"], ["South", "9"]]
        ]


@pytest.mark.parametrize(
    "form",
    [
        {},
        {"shuffle_order": True},
        {"xref_stream": True},
        {"objstm": True, "predictor": True},
        {"cid_font": True},
        {"cid_cmap": True},
        {"type3_font": True},
        {"truetype_symbolic": True},
        {"encrypt": True},
        {"encrypt_aes": True},
        {"content_filter": "lzw"},
        {"form_xobject": True},
        {"rotate": 90},
        {"rotate": 270},
        {"incremental": True},
        {"inline_image": True},
        {"broken_xref": True},
        {"type1_program": True},
    ],
)
def test_roundtrip_through_writer_forms(form):
    data = build_pdf([_page(GRID)], **form)
    assert extract_tables(data) == [GRID]


def test_multi_page_order():
    grid2 = [["X", "1"], ["Y", "2"]]
    data = build_pdf([_page(GRID), _page(grid2, cols=(72.0, 300.0))])
    assert extract_tables(data) == [GRID, grid2]


def test_statement_pages_have_no_tables():
    """Plain single-run statement lines never form a grid."""
    data = build_pdf(
        [["Community Credit Union statement 2024", "03/04 CHECK 1234 1.00"]]
    )
    assert extract_tables(data) == []


class TestPipeline:
    def test_matches_planted_goldens(
        self, ray_session, quiet_data_context, tmp_path
    ):
        """extract_tables_dir over a synthesized corpus reproduces the
        generator's golden grids cell-for-cell."""
        import pyarrow.parquet as pq

        from pdf_parser_ray.fixtures.gen import (
            explode_golden_tables, synthesize_pages,
        )
        from pdf_parser_ray.pipelines.extract import extract_tables_dir

        docs = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text", "lang"],
        )
        pages, golden = synthesize_pages(docs)
        pages_dir = str(tmp_path / "pages")
        import os

        os.makedirs(pages_dir)
        pq.write_table(pages, os.path.join(pages_dir, "part-0.parquet"))
        got = (
            extract_tables_dir(pages_dir)
            .to_pandas()
            .sort_values(["url", "table_idx", "row_idx", "col_idx"])
            .reset_index(drop=True)
        )
        want = (
            explode_golden_tables(golden)
            .to_pandas()
            .sort_values(["url", "table_idx", "row_idx", "col_idx"])
            .reset_index(drop=True)
        )
        assert len(want) > 0  # the corpus actually plants tables
        import pandas as pd

        pd.testing.assert_frame_equal(got, want)
