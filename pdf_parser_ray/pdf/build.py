"""Minimal deterministic PDF writer for the fixture corpus.

Emits classic, spec-conformant single- or multi-page PDFs: header,
indirect objects (catalog, page tree, pages, one Type1 font, FlateDecode
content streams), a correct xref table, trailer and startxref.  The text
layout (one ``Tm``-positioned show per run, y descending per line) is
co-designed with the extractor in ``parse.py`` so goldens are exact
(SURVEY.md §7.6: fixtures and parser co-designed).

A page is a list of lines; a line is either a plain string (one run at
x=72) or a list of ``(x, text)`` runs (multi-column layouts for the
bbox-reordering tests).
"""

from __future__ import annotations

import zlib

Line = str | list[tuple[float, str]]

PAGE_WIDTH = 612
PAGE_HEIGHT = 792
TOP_Y = 720.0
LEFT_X = 72.0


def _escape(text: str) -> bytes:
    raw = text.encode("latin-1")  # fixture text must be latin-1-safe
    return raw.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _content_stream(
    lines: list[Line], font_size: float, leading: float, shuffle_order: bool
) -> bytes:
    """Build the page description.  With ``shuffle_order`` the runs are
    emitted in reversed order — the visual layout is identical but the
    stream order is scrambled, exercising bbox-based reassembly."""
    shows: list[tuple[float, float, str]] = []
    y = TOP_Y
    for line in lines:
        if isinstance(line, str):
            if line:
                shows.append((LEFT_X, y, line))
        else:
            for x, text in line:
                if text:
                    shows.append((float(x), y, text))
        y -= leading
    if shuffle_order:
        shows = shows[::-1]
    ops = [b"BT", b"/F1 %.2f Tf" % font_size]
    for x, y, text in shows:
        ops.append(b"1 0 0 1 %.2f %.2f Tm" % (x, y))
        ops.append(b"(" + _escape(text) + b") Tj")
    ops.append(b"ET")
    return b"\n".join(ops)


def build_pdf(
    pages: list[list[Line]],
    *,
    font_size: float = 12.0,
    leading: float = 14.0,
    compress: bool = True,
    shuffle_order: bool = False,
) -> bytes:
    objects: list[bytes] = []  # object 1..n bodies, in order

    n_pages = len(pages)
    # object layout: 1 catalog, 2 pages root, 3 font,
    # then per page i: page object (4+2i), content stream (5+2i)
    kids = b" ".join(b"%d 0 R" % (4 + 2 * i) for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    )
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding /WinAnsiEncoding >>"
    )
    for i, page_lines in enumerate(pages):
        page_num = 4 + 2 * i
        content_num = page_num + 1
        objects.append(
            b"<< /Type /Page /Parent 2 0 R"
            b" /MediaBox [0 0 %d %d]" % (PAGE_WIDTH, PAGE_HEIGHT)
            + b" /Resources << /Font << /F1 3 0 R >> >>"
            + b" /Contents %d 0 R >>" % content_num
        )
        body = _content_stream(page_lines, font_size, leading, shuffle_order)
        if compress:
            data = zlib.compress(body)
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(data)
        else:
            data = body
            head = b"<< /Length %d >>" % len(data)
        objects.append(head + b"\nstream\n" + data + b"\nendstream")

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: list[int] = []
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"

    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_pos)
    )
    return bytes(out)
