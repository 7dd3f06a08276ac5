"""Bbox-grid table reconstruction over positioned text runs.

The reference names the capability (base.py:46-50: pdfplumber's
``extract_tables`` yielded per page) but never calls it, so the
semantics here follow pdfplumber's *text* strategy in spirit, defined
deterministically over our own :class:`~pdf_parser_ray.pdf.parse.TextRun`
substrate:

- **rows** are y-clusters of runs (same ``Y_TOLERANCE`` as line
  assembly),
- **cells** are x-gap groups within a row: a horizontal jump larger
  than ``CELL_GAP`` from the previous run's pen position starts a new
  cell (smaller gaps are word spacing, joined with a single space
  exactly like :func:`~pdf_parser_ray.pdf.parse.assemble_lines`),
- **tables** are maximal bands of >= ``MIN_ROWS`` consecutive rows
  that all have the same >= ``MIN_COLS`` cell count with column
  x-starts aligned within ``COL_TOL``.

A one-cell title line above a grid therefore terminates it, and two
stacked grids with different column geometry come out as two tables.
Output mirrors the reference generator's shape: a list of tables per
document (page order), each table a list of rows, each row a list of
cell strings.
"""

from __future__ import annotations

from .parse import (
    _AVG_GLYPH_W,
    TextRun,
    X_TOLERANCE,
    Y_TOLERANCE,
    extract_page_runs,
)

# Minimum x-gap (pt) that separates two CELLS rather than two words.
# Word gaps in the fixture corpus are < 6 pt at 12 pt type; fixture
# table columns sit >= 100 pt apart, so the threshold has wide margin
# on both sides.
CELL_GAP = 24.0
# Column x-start alignment tolerance across the rows of one table.
COL_TOL = 3.0
MIN_ROWS = 2
MIN_COLS = 2


def _advance(r: TextRun) -> float:
    return r.width if r.width is not None else len(r.text) * (r.size or 12.0) * _AVG_GLYPH_W


def _row_clusters(
    runs: "list[TextRun]", y_tolerance: float
) -> "list[list[TextRun]]":
    """Top-down y-clusters — the assemble_lines row rule."""
    if not runs:
        return []
    ordered = sorted(runs, key=lambda r: (-r.y, r.x))
    rows: list[list[TextRun]] = []
    current = [ordered[0]]
    anchor_y = ordered[0].y
    for r in ordered[1:]:
        if anchor_y - r.y > y_tolerance:
            rows.append(current)
            current = [r]
            anchor_y = r.y
        else:
            current.append(r)
    rows.append(current)
    return rows


def _row_cells(
    row: "list[TextRun]",
    x_tolerance: float = X_TOLERANCE,
    cell_gap: float = CELL_GAP,
) -> "list[tuple[float, str]]":
    """One y-row -> [(cell_x_start, cell_text)] in x order.  Within a
    cell, runs join with the assemble_lines word rule (single space
    when the gap exceeds ``x_tolerance``)."""
    row = sorted(row, key=lambda r: r.x)
    cells: list[tuple[float, str]] = []
    pieces: list[str] = []
    start_x = row[0].x
    pen_x: float | None = None
    for r in row:
        if pen_x is not None and r.x - pen_x > cell_gap:
            cells.append((start_x, "".join(pieces)))
            pieces = []
            start_x = r.x
        elif pen_x is not None and r.x - pen_x > x_tolerance:
            pieces.append(" ")
        pieces.append(r.text)
        pen_x = r.x + _advance(r)
    cells.append((start_x, "".join(pieces)))
    return cells


def _aligned(a: "list[float]", b: "list[float]", tol: float) -> bool:
    return len(a) == len(b) and all(abs(x - y) <= tol for x, y in zip(a, b))


def page_tables(
    runs: "list[TextRun]",
    *,
    min_rows: int = MIN_ROWS,
    min_cols: int = MIN_COLS,
) -> "list[list[list[str]]]":
    """Positioned runs of ONE page -> tables (each a row-major grid of
    cell strings)."""
    tables: list[list[list[str]]] = []
    band: list[list[str]] = []
    band_cols: list[float] | None = None

    def flush() -> None:
        nonlocal band, band_cols
        if len(band) >= min_rows:
            tables.append(band)
        band = []
        band_cols = None

    for row in _row_clusters(runs, Y_TOLERANCE):
        cells = _row_cells(row)
        starts = [x for x, _ in cells]
        if len(cells) < min_cols:
            flush()
            continue
        if band_cols is not None and not _aligned(starts, band_cols, COL_TOL):
            flush()
        band.append([t for _, t in cells])
        if band_cols is None:
            band_cols = starts
    flush()
    return tables


def extract_tables(data: bytes) -> "list[list[list[str]]]":
    """PDF bytes -> all tables in page order — the reference's
    generator contract (base.py:46-50) as a list."""
    out: list[list[list[str]]] = []
    for runs in extract_page_runs(data):
        out.extend(page_tables(runs))
    return out
