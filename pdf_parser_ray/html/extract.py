"""HTML boilerplate stripping via DOM block scoring (the north-star's
Readability/Boilerpipe-style heuristic, built on stdlib ``html.parser``
because no third-party HTML lib ships in this environment).

Model: a linear pass segments the document into *text blocks* at
block-level tag boundaries, tracking for each block

* its visible text (entity-decoded, ASCII-whitespace-collapsed; NBSP is
  preserved — the line normalizer downstream owns NBSP handling, parity
  with reference parsers/base.py:18-19),
* the number of characters contributed inside ``<a>`` elements,
* whether it sits inside a structural boilerplate container
  (nav/header/footer/aside/form/menu),
* the block-level tag that opened it.

Classification is a deterministic threshold rule (stable across runs
and workers — a hard requirement for byte-identical output under Ray
task retry):

    content  ⇔  not in a boilerplate container
                and link_density ≤ 1/3
                and (word_count ≥ MIN_CONTENT_WORDS
                     or (heading tag and word_count ≥ MIN_HEADING_WORDS))

``extracted_text`` is the kept blocks joined with a single ``\\n`` (one
block per line — the same line-stream shape the record extractors
consume); ``spans`` carries (start, end, kind) offsets into it.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from html import unescape
from html.parser import HTMLParser

MIN_CONTENT_WORDS = 5
MIN_HEADING_WORDS = 1
MAX_LINK_DENSITY = 1 / 3

# Tags whose entire subtree is invisible.
_DROP_SUBTREE = frozenset(
    {"script", "style", "noscript", "template", "svg", "iframe", "head", "title",
     "button", "select", "option", "datalist", "object", "embed", "textarea"}
)
# Structural containers that are boilerplate by construction.
_BOILERPLATE_CONTAINERS = frozenset({"nav", "header", "footer", "aside", "form", "menu"})
# Tags that terminate the current text block.
_BLOCK_TAGS = frozenset(
    {"p", "div", "section", "article", "main", "body", "html", "header", "footer",
     "nav", "aside", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "li", "dl",
     "dt", "dd", "table", "thead", "tbody", "tr", "td", "th", "blockquote", "pre",
     "br", "hr", "form", "figure", "figcaption", "menu", "fieldset", "address"}
)
_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
# Collapse ASCII whitespace only; NBSP (\xa0) survives.
# includes \x1c-\x1f (FS/GS/RS/US): Python's str.split() treats those
# four control chars as whitespace, so the regex must too or the ASCII
# fast path below silently diverges from this canonical path (ADVICE r02)
_ASCII_WS_RE = re.compile(r"[ \t\r\n\f\v\x1c-\x1f]+")
_VOID_TAGS = frozenset({"br", "hr", "img", "input", "meta", "link", "area", "base",
                        "col", "source", "track", "wbr"})


@dataclass
class Block:
    text: str
    tag: str
    link_chars: int
    total_chars: int
    boilerplate_container: bool

    @property
    def words(self) -> int:
        return len(self.text.split())

    @property
    def link_density(self) -> float:
        return self.link_chars / self.total_chars if self.total_chars else 0.0

    def is_content(self) -> bool:
        if self.boilerplate_container:
            return False
        if self.link_density > MAX_LINK_DENSITY:
            return False
        w = self.words
        if self.tag in _HEADING_TAGS:
            return w >= MIN_HEADING_WORDS
        return w >= MIN_CONTENT_WORDS


class _BlockSegmenter(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._buf: list[str] = []
        self._buf_link_chars = 0
        self._buf_total_chars = 0
        self._drop_depth = 0
        self._anchor_depth = 0
        self._container_depth = 0
        self._open_block_tag = "div"
        # tag stacks so malformed nesting can't underflow the counters
        self._stack: list[str] = []

    # -- tag events ------------------------------------------------------

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _VOID_TAGS:
            if tag in ("br", "hr"):
                self._flush(self._open_block_tag)
            return
        self._stack.append(tag)
        if tag in _DROP_SUBTREE:
            self._drop_depth += 1
            return
        if tag in _BLOCK_TAGS:
            # flush text gathered *before* this boundary, under the old
            # container state
            self._flush(self._open_block_tag)
            self._open_block_tag = tag
        if tag == "a":
            self._anchor_depth += 1
        if tag in _BOILERPLATE_CONTAINERS:
            self._container_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _VOID_TAGS:
            return
        if tag in _BLOCK_TAGS:
            # flush while the closing element's container state is live
            self._flush(tag)
        # unwind to the matching open tag, tolerating bad nesting
        if tag in self._stack:
            while self._stack:
                top = self._stack.pop()
                if top in _DROP_SUBTREE:
                    self._drop_depth = max(0, self._drop_depth - 1)
                if top == "a":
                    self._anchor_depth = max(0, self._anchor_depth - 1)
                if top in _BOILERPLATE_CONTAINERS:
                    self._container_depth = max(0, self._container_depth - 1)
                if top == tag:
                    break

    def handle_data(self, data: str) -> None:
        if self._drop_depth or not data:
            return
        self._buf.append(data)
        n = len(data)
        self._buf_total_chars += n
        if self._anchor_depth:
            self._buf_link_chars += n

    def close(self) -> None:
        super().close()
        self._flush(self._open_block_tag)

    # -- block assembly --------------------------------------------------

    def _flush(self, tag: str) -> None:
        if not self._buf:
            return
        raw = "".join(self._buf)
        if raw.isascii():
            # identical to the regex path for ASCII (str.split splits on
            # exactly the ASCII ws set there), at C speed
            text = " ".join(raw.split())
        else:
            text = _ASCII_WS_RE.sub(" ", raw).strip()
        link_chars = self._buf_link_chars
        total_chars = self._buf_total_chars
        self._buf = []
        self._buf_link_chars = 0
        self._buf_total_chars = 0
        if not text:
            return
        self.blocks.append(
            Block(
                text=text,
                tag=tag,
                link_chars=link_chars,
                total_chars=total_chars,
                boilerplate_container=self._container_depth > 0,
            )
        )


def segment_blocks_stdlib(html_text: str) -> list[Block]:
    """Reference segmentation on stdlib html.parser (slower; kept as the
    semantic oracle and the fallback path)."""
    seg = _BlockSegmenter()
    try:
        seg.feed(html_text)
        seg.close()
    except Exception:
        # html.parser is tolerant, but guard the pipeline: return what we
        # segmented before the failure point
        pass
    return seg.blocks


# -- fast tokenizer path ----------------------------------------------------

# One scan over the markup; raw-text elements (script/style/...) are
# skipped wholesale with a single find.
#
# The start-tag regex is deliberately CONSERVATIVE: it matches only
# clean, well-formed tags (name, space-separated attrs, quotes only as
# `=`-introduced values).  Wherever it matches, html.parser's tolerant
# machinery (tagfind_tolerant / locatestarttagend_tolerant) provably
# parses the identical span to the identical (name, end) — every
# component below is a subset of the stdlib pattern.  Anything weirder
# (`<P<p>`, quotes in attr names, unclosed quotes, `<![`) bails out to
# segment_blocks_stdlib for the WHOLE document, so garbage markup gets
# exact stdlib semantics instead of a divergent guess.
_CLEAN_START = re.compile(
    r"""<(?P<name>[a-zA-Z][a-zA-Z0-9:_-]*)       # clean tag name
    (?P<attrs>(?:\s+[^\s/>=\x00"'<]+             # space + clean attr name
        (?:\s*=\s*(?:"[^"]*"|'[^']*'             # = then quoted value
            |(?!["'])[^>\s]*))?                  # ... or bare value
    )*\s*)
    (?P<selfclose>/?)>""",                       # "/" ONLY directly before ">"
    re.VERBOSE | re.DOTALL,
)
# stdlib html.parser's endtagfind / tagfind_tolerant, replicated so the
# fast end-tag path walks the exact decision ladder parse_endtag does
_ENDTAG_STRICT = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_NAME_TOLERANT = re.compile(r"([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*")
_COMMENT_CLOSE = re.compile(r"--\s*>")
_RAWTEXT_CLOSERS = {
    t: re.compile(rf"</{t}\s*>", re.IGNORECASE)
    for t in ("script", "style", "noscript", "template", "svg", "iframe",
              "title", "textarea")
}


def segment_blocks_fast(html_text: str) -> list[Block]:
    """Fast single-pass tokenizer producing the same blocks as
    :func:`segment_blocks_stdlib` (differential-tested on the golden
    corpus).  ~2-4x faster than html.parser: raw-text subtrees are
    skipped with one ``find`` instead of being tokenized, and entity
    decoding runs only on text runs that actually contain ``&``."""
    seg = _BlockSegmenter()
    n = len(html_text)
    pos = 0
    emit = seg.handle_data
    find = html_text.find
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            text = html_text[pos:]
            if text:
                emit(unescape(text) if "&" in text else text)
            break
        if lt > pos:
            text = html_text[pos:lt]
            emit(unescape(text) if "&" in text else text)
        c = html_text[lt + 1 : lt + 2]
        if c == "!":
            if html_text.startswith("<!--", lt):
                m = _COMMENT_CLOSE.search(html_text, lt + 4)
                if m:
                    pos = m.end()
                    continue
                # unterminated comment: stdlib's goahead() EOF recovery
                # emits "<!-- ... >" (to the first ">", else to the next
                # "<") as DATA and resumes after it
                gt = find(">", lt + 1)
                if gt >= 0:
                    text = html_text[lt : gt + 1]
                    emit(unescape(text) if "&" in text else text)
                    pos = gt + 1
                else:
                    emit("<")
                    pos = lt + 1
                continue
            if html_text.startswith("<![", lt):
                # marked section (<![CDATA[ / <![if ...) closes at "]]>",
                # not ">" — rare; take the exact-semantics path
                return segment_blocks_stdlib(html_text)
            # <!doctype ...> / bogus comment <!x...>: eat through ">"
            gt = find(">", lt + 2)
            if gt >= 0:
                pos = gt + 1
            else:
                emit("<")
                pos = lt + 1
            continue
        if c == "?":
            # processing instruction: eat through the first ">"
            gt = find(">", lt + 2)
            if gt >= 0:
                pos = gt + 1
            else:
                emit("<")
                pos = lt + 1
            continue
        if c == "/":
            # mirror html.parser parse_endtag's decision ladder
            if find(">", lt + 1) < 0:
                emit("<")
                pos = lt + 1
                continue
            m = _ENDTAG_STRICT.match(html_text, lt)
            if m:
                seg.handle_endtag(m.group(1).lower())
                pos = m.end()
                continue
            m = _NAME_TOLERANT.match(html_text, lt + 2)
            if m:
                # junk between name and ">" is skipped, exactly as stdlib
                seg.handle_endtag(m.group(1).lower())
                pos = find(">", m.end()) + 1
                continue
            if html_text.startswith("</>", lt):
                pos = lt + 3
                continue
            # "</" + non-letter: bogus comment, eat through ">"
            pos = find(">", lt + 2) + 1
            continue
        if not c.isalpha() or not c.isascii():
            emit("<")
            pos = lt + 1
            continue
        m = _CLEAN_START.match(html_text, lt)
        if not m:
            # tolerant-parser territory — hand the whole document to the
            # stdlib oracle rather than guess
            return segment_blocks_stdlib(html_text)
        pos = m.end()
        name = m.group("name").lower()
        self_closing = bool(m.group("selfclose"))
        if name in _RAWTEXT_CLOSERS and not self_closing:
            closer = _RAWTEXT_CLOSERS[name].search(html_text, pos)
            # the subtree is invisible: skip its content wholesale
            pos = n if closer is None else closer.end()
            continue
        seg.handle_starttag(name, None)
        if self_closing and name not in _VOID_TAGS:
            seg.handle_endtag(name)
    seg.close()
    return seg.blocks


def segment_blocks(html_text: str) -> list[Block]:
    """Decoded markup -> ordered text blocks with density features."""
    try:
        return segment_blocks_fast(html_text)
    except Exception:
        return segment_blocks_stdlib(html_text)


def extract_main_text(html_text: str) -> tuple[str, list[dict]]:
    """Boilerplate-stripped main content + spans.

    Returns ``(extracted_text, spans)`` where spans are
    ``{start, end, kind}`` character offsets into the joined text, one
    per kept block, ``kind`` = the opening block tag.
    """
    kept = [b for b in segment_blocks(html_text) if b.is_content()]
    parts: list[str] = []
    spans: list[dict] = []
    pos = 0
    for b in kept:
        start = pos
        parts.append(b.text)
        pos += len(b.text)
        spans.append({"start": start, "end": pos, "kind": b.tag})
        pos += 1  # the joining "\n"
    return "\n".join(parts), spans


class _LinkCollector(HTMLParser):
    """Document-order <a href> collection: (href, ws-normalized anchor
    text).  Nested anchors close the outer one (the HTML5 tree-builder
    behavior for the misnested case); anchors without href are
    skipped."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str]] = []
        self._href: str | None = None
        self._text: list[str] = []

    def _flush(self) -> None:
        if self._href is not None:
            anchor = _ASCII_WS_RE.sub(" ", " ".join(self._text)).strip()
            self.links.append((self._href, anchor))
        self._href, self._text = None, []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            if self._href is not None:
                self._flush()
            href = next((v for k, v in attrs if k == "href"), None)
            if href is not None:
                self._href, self._text = href, []

    def handle_endtag(self, tag: str) -> None:
        if tag == "a":
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._href is not None and data:
            self._text.append(data)


def extract_links(html_text: str) -> "list[tuple[str, str]]":
    """HTML -> [(href, anchor_text)] in document order — the outlink
    substrate of a Common-Crawl-style pipeline (the per-page edge list
    a link graph is built from).  Anchor text is whitespace-normalized;
    href kept verbatim."""
    p = _LinkCollector()
    try:
        p.feed(html_text)
        p.close()
    except Exception:
        pass
    p._flush()
    return p.links
