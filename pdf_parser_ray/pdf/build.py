"""Minimal deterministic PDF writer for the fixture corpus.

Emits spec-conformant single- or multi-page PDFs: header, indirect
objects (catalog, page tree, pages, one Type1 font, FlateDecode content
streams), and either a classic xref table + trailer (PDF 1.4) or a
**cross-reference stream** (PDF 1.5, ``/Type /XRef``, ``W [1 2 1]``
fields, optional PNG Up predictor) with the page-tree dictionaries
optionally packed into an **object stream** (``/Type /ObjStm``) — the
two modern forms real-world producers emit, used to test that the
parser extracts identical text from all variants.  The text layout (one
``Tm``-positioned show per run, y descending per line) is co-designed
with the extractor in ``parse.py`` so goldens are exact (SURVEY.md
§7.6: fixtures and parser co-designed).

A page is a list of lines; a line is either a plain string (one run at
x=72) or a list of ``(x, text)`` runs (multi-column layouts for the
bbox-reordering tests).
"""

from __future__ import annotations

import re
import zlib

Line = str | list[tuple[float, str]]

PAGE_WIDTH = 612
PAGE_HEIGHT = 792
TOP_Y = 720.0
LEFT_X = 72.0


def _escape(text: str) -> bytes:
    raw = text.encode("latin-1")  # fixture text must be latin-1-safe
    return raw.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _mixed_cid_bytes(text: str) -> bytes:
    """Encode a show for the non-Identity CMap form: uppercase A-Z as
    2-byte codes 0x8100+ord (codespace <8141><815a>), Latin-1 high
    chars 0xA0-0xFF as 2-byte 0x8200+ord (codespace <82a0><82ff>),
    every other printable-ASCII char as its 1-byte code (<20><7e>) —
    the mixed-width encoding real CJK-style CMaps use."""
    out = bytearray()
    for ch in text:
        o = ord(ch)
        if 0x41 <= o <= 0x5A:
            out += bytes((0x81, o))
        elif 0xA0 <= o <= 0xFF:
            out += bytes((0x82, o))
        elif 0x20 <= o <= 0x7E:
            out.append(o)
        else:
            raise ValueError(
                f"cid_cmap fixture text must be printable latin-1: {ch!r}"
            )
    return bytes(out)


def _type3_bytes(text: str) -> bytes:
    """Encode a show for the Type3 form: the deliberately NON-identity
    code assignment code = ord(ch) - 0x1f (0x20 -> 1 ... 0x7e -> 0x5f;
    0xa0 -> 0x81 ... 0xff -> 0xe0), matching the /Differences array the
    font writes — extraction must go through Differences -> glyph name
    -> unicode."""
    out = bytearray()
    for ch in text:
        o = ord(ch)
        # 0xAD excluded: the standard glyph list names soft hyphen
        # /hyphen, which round-trips to U+002D, not U+00AD
        if not (0x20 <= o <= 0x7E or 0xA0 <= o <= 0xFF) or o == 0xAD:
            raise ValueError(
                f"type3 fixture text must be printable latin-1: {ch!r}"
            )
        out.append(o - 0x1F)
    return bytes(out)


def _content_stream(
    lines: list[Line],
    font_size: float,
    leading: float,
    shuffle_order: bool,
    cid_font: bool = False,
    cid_cmap: bool = False,
    type3: bool = False,
    truetype_sym: bool = False,
) -> bytes:
    """Build the page description.  With ``shuffle_order`` the runs are
    emitted in reversed order — the visual layout is identical but the
    stream order is scrambled, exercising bbox-based reassembly.  With
    ``cid_font`` shows are hex strings of 2-byte Identity-H codes
    (code = Unicode code point, mapped back by the ToUnicode CMap);
    ``cid_cmap`` emits the mixed 1/2-byte codes of the embedded CMap
    form; ``type3`` the shifted single-byte codes of the Type3 form."""
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
        if cid_font:
            codes = text.encode("utf-16-be").hex().upper().encode("ascii")
            ops.append(b"<" + codes + b"> Tj")
        elif cid_cmap:
            codes = _mixed_cid_bytes(text).hex().upper().encode("ascii")
            ops.append(b"<" + codes + b"> Tj")
        elif type3:
            codes = _type3_bytes(text).hex().upper().encode("ascii")
            ops.append(b"<" + codes + b"> Tj")
        elif truetype_sym:
            codes = _symbolic_bytes(text).hex().upper().encode("ascii")
            ops.append(b"<" + codes + b"> Tj")
        else:
            ops.append(b"(" + _escape(text) + b") Tj")
    ops.append(b"ET")
    return b"\n".join(ops)


_TOUNICODE_CMAP = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) /Supplement 0 >> def
/CMapName /Adobe-Identity-UCS def
/CMapType 2 def
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
1 beginbfrange
<0000> <FFFF> <0000>
endbfrange
endcmap
CMap currentdict /CMap defineresource pop
end
end"""


# ToUnicode for the mixed 1/2-byte embedded-CMap form: 1-byte printable
# ASCII maps identically, 2-byte <8141>-<815a> maps to A-Z
_MIXED_TOUNICODE_CMAP = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CIDSystemInfo << /Registry (Graft) /Ordering (MixedUCS) /Supplement 0 >> def
/CMapName /Graft-Mixed-UCS def
/CMapType 2 def
3 begincodespacerange
<20> <7e>
<8140> <81ff>
<82a0> <82ff>
endcodespacerange
3 beginbfrange
<20> <7e> <0020>
<8141> <815a> <0041>
<82a0> <82ff> <00a0>
endbfrange
endcmap
CMap currentdict /CMap defineresource pop
end
end"""

# the /Encoding CMap itself (CMapType 1, code -> CID): its codespace
# ranges are what the parser needs to split mixed-width codes
_MIXED_ENCODING_CMAP = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CIDSystemInfo << /Registry (Graft) /Ordering (Mixed1) /Supplement 0 >> def
/CMapName /Graft-Mixed1 def
/CMapType 1 def
3 begincodespacerange
<20> <7e>
<8140> <81ff>
<82a0> <82ff>
endcodespacerange
3 begincidrange
<20> <7e> 32
<8141> <815a> 321
<82a0> <82ff> 400
endcidrange
endcmap
CMap currentdict /CMap defineresource pop
end
end"""


def _type3_glyph_names() -> "list[str]":
    from .parse import _ASCII_GLYPHS, _LATIN1_GLYPHS

    return list(_ASCII_GLYPHS) + ["nbspace"] + list(_LATIN1_GLYPHS)


def _type1_program_bytes() -> "tuple[bytes, int, int, int]":
    """A minimal embedded Type1 font program: cleartext public dict
    whose /Encoding array assigns the SAME non-identity codes as the
    Type3 form (code = ord - 0x1f via ``dup <code> /<glyph> put``),
    then an ``eexec`` section of opaque bytes (the parser never needs
    it — encodings live in the public dict) and the conventional
    512-zeros trailer.  -> (bytes, Length1, Length2, Length3)."""
    names = _type3_glyph_names()
    dups = [
        b"dup %d /%s put" % (i + 1, g.encode())
        for i, g in enumerate(names[:0x5F])
    ] + [
        b"dup %d /%s put" % (0x81 + i, g.encode())
        for i, g in enumerate(names[0x5F:])
    ]
    clear = (
        b"%!PS-AdobeFont-1.0: GraftT1 001.001\n"
        b"/FontName /GraftT1 def\n"
        b"/FontType 1 def\n"
        b"/FontMatrix [0.001 0 0 0.001 0 0] readonly def\n"
        b"/Encoding 256 array\n"
        b"0 1 255 {1 index exch /.notdef put} for\n"
        + b"\n".join(dups)
        + b"\nreadonly def\n"
        b"currentdict end\n"
        b"currentfile eexec\n"
    )
    private = bytes(range(256)) * 2  # opaque stand-in for the eexec body
    trailer = (b"0" * 64 + b"\n") * 8 + b"cleartomark\n"
    return clear + private + trailer, len(clear), len(private), len(trailer)


def _type3_differences() -> bytes:
    """The Type3 /Differences array: codes 1..0x5f name the standard
    glyphs for 0x20..0x7e and codes 0x81..0xe0 the Latin-1 glyphs for
    0xa0..0xff — a deliberately non-identity assignment (single-sourced
    from the parser's glyph-name table so builder and extractor cannot
    drift)."""
    from .parse import _ASCII_GLYPHS, _LATIN1_GLYPHS

    ascii_part = b" ".join(b"/" + g.encode() for g in _ASCII_GLYPHS)
    latin_part = b" ".join(
        b"/" + g.encode() for g in ["nbspace"] + list(_LATIN1_GLYPHS)
    )
    return b"[1 " + ascii_part + b" 129 " + latin_part + b"]"


# ---- minimal real TrueType (sfnt) builder for the symbolic-font form ----


def _sfnt_checksum(data: bytes) -> int:
    if len(data) % 4:
        data = data + b"\x00" * (4 - len(data) % 4)
    total = 0
    for i in range(0, len(data), 4):
        total = (total + int.from_bytes(data[i : i + 4], "big")) & 0xFFFFFFFF
    return total


def _cmap_format4(code_to_glyph: "dict[int, int]") -> bytes:
    """A real format-4 cmap subtable.  Segments are maximal contiguous
    code runs; every segment maps through the glyphIdArray (idDelta 0,
    idRangeOffset into the array) so glyph order is free to differ from
    code order — which the symbolic fixture exploits."""
    import struct as st

    codes = sorted(code_to_glyph)
    segs: list[tuple[int, int]] = []
    for c in codes:
        if segs and c == segs[-1][1] + 1:
            segs[-1] = (segs[-1][0], c)
        else:
            segs.append((c, c))
    segs.append((0xFFFF, 0xFFFF))  # required terminator
    seg_count = len(segs)
    # glyphIdArray: concatenated per-segment glyph runs (terminator maps
    # via idDelta, contributing nothing)
    glyph_runs: list[list[int]] = [
        [code_to_glyph[c] for c in range(lo, hi + 1)] for lo, hi in segs[:-1]
    ]
    end_codes = [hi for _, hi in segs]
    start_codes = [lo for lo, _ in segs]
    id_deltas = [0] * (seg_count - 1) + [1]  # 0xFFFF + 1 -> glyph 0
    id_range_offsets = []
    cum = 0
    for i, run in enumerate(glyph_runs):
        # byte distance from &idRangeOffset[i] to glyphIdArray[cum]:
        # remaining offset entries (seg_count - i) plus glyphs before
        id_range_offsets.append(2 * (seg_count - i + cum))
        cum += len(run)
    id_range_offsets.append(0)  # terminator uses idDelta
    glyph_ids = [g for run in glyph_runs for g in run]
    seg_x2 = seg_count * 2
    search_range = 2 * (2 ** (seg_count.bit_length() - 1))
    entry_selector = seg_count.bit_length() - 1
    body = st.pack(
        ">HHHH", seg_x2, search_range, entry_selector, seg_x2 - search_range
    )
    body += st.pack(f">{seg_count}H", *end_codes) + b"\x00\x00"
    body += st.pack(f">{seg_count}H", *start_codes)
    body += st.pack(f">{seg_count}h", *id_deltas)
    body += st.pack(f">{seg_count}H", *id_range_offsets)
    body += st.pack(f">{len(glyph_ids)}H", *glyph_ids)
    return st.pack(">HHH", 4, 6 + len(body), 0) + body  # format, len, lang


def _sfnt_symbolic(glyph_names: "list[str]", code_of: "dict[str, int]") -> bytes:
    """A structurally-valid TrueType font program carrying the two
    tables symbolic-font text extraction reads: a (3,0) format-4 cmap
    mapping 0xF000+code -> glyph id, and a post 2.0 table naming every
    glyph (custom indices >= 258, so no Mac-standard-order dependency).
    head/maxp/hhea/hmtx ride along for structural sanity.  Glyph ids
    are assigned in REVERSED name order so code order != glyph order —
    extraction must honestly resolve cmap -> post -> unicode."""
    import struct as st

    n_glyphs = len(glyph_names) + 1  # + .notdef at 0
    order = list(range(len(glyph_names)))[::-1]
    glyph_of_name = {
        glyph_names[idx]: 1 + pos for pos, idx in enumerate(order)
    }
    code_to_glyph = {
        0xF000 + code: glyph_of_name[name] for name, code in code_of.items()
    }
    cmap_sub = _cmap_format4(code_to_glyph)
    cmap = (
        st.pack(">HH", 0, 1)  # version, numTables
        + st.pack(">HHI", 3, 0, 12)  # platform 3, encoding 0, offset
        + cmap_sub
    )
    # post 2.0: names ordered by GLYPH id
    names_by_glyph = [".notdef"] + [
        glyph_names[idx] for idx in order
    ]
    # version, italicAngle, underline pos/thickness, isFixedPitch, 4x mem
    post = st.pack(">IihhI", 0x00020000, 0, 0, 0, 0) + st.pack(
        ">IIII", 0, 0, 0, 0
    )
    post += st.pack(">H", n_glyphs)
    post += st.pack(f">{n_glyphs}H", *[258 + i for i in range(n_glyphs)])
    for nm in names_by_glyph:
        raw = nm.encode("ascii")
        post += bytes([len(raw)]) + raw
    head = st.pack(
        ">IIIIHHQQhhhhHHhhh",
        0x00010000, 0, 0, 0x5F0F3CF5, 3, 1000, 0, 0,
        0, -250, 612, 750, 0, 8, 2, 0, 0,
    )
    maxp = st.pack(">IH", 0x00010000, n_glyphs) + b"\x00" * 26
    hhea = st.pack(">IhhhHhhhhhh", 0x00010000, 750, -250, 0, 1000,
                   0, 0, 0, 1, 0, 0) + b"\x00" * 8 + st.pack(">hH", 0, n_glyphs)
    hmtx = st.pack(f">{2 * n_glyphs}H", *([500, 0] * n_glyphs))
    tables = [
        (b"cmap", cmap),
        (b"head", head),
        (b"hhea", hhea),
        (b"hmtx", hmtx),
        (b"maxp", maxp),
        (b"post", post),
    ]
    n = len(tables)
    sr = 16 * (2 ** (n.bit_length() - 1))
    out = st.pack(">IHHHH", 0x00010000, n, sr, n.bit_length() - 1, 16 * n - sr)
    offset = 12 + 16 * n
    dir_entries = b""
    bodies = b""
    for tag, data in tables:
        pad = (-len(data)) % 4
        dir_entries += st.pack(
            ">4sIII", tag, _sfnt_checksum(data), offset, len(data)
        )
        bodies += data + b"\x00" * pad
        offset += len(data) + pad
    return out + dir_entries + bodies


def _symbolic_code_of() -> "dict[str, int]":
    """glyph name -> single-byte character code for the symbolic form.
    Codes are ord XOR 1 — deliberately NON-identity, so extraction that
    skips the sfnt cmap/post chain and falls back to chr(code) produces
    pair-swapped garbage instead of silently passing.  (Same
    standard-name tables as the Type3 form; the duplicate /hyphen name
    keeps its ASCII-derived code, and char 0xAD is excluded from
    fixture text.)"""
    from .parse import _ASCII_GLYPHS, _LATIN1_GLYPHS

    code_of: dict[str, int] = {}
    for i, g in enumerate(_ASCII_GLYPHS):
        code_of.setdefault(g, (0x20 + i) ^ 1)
    code_of.setdefault("nbspace", 0xA0 ^ 1)
    for i, g in enumerate(_LATIN1_GLYPHS):
        code_of.setdefault(g, (0xA1 + i) ^ 1)
    return code_of


def _symbolic_bytes(text: str) -> bytes:
    """Encode a show for the symbolic TrueType form: code = ord ^ 1
    (the inverse of _symbolic_code_of's assignment)."""
    out = bytearray()
    for ch in text:
        o = ord(ch)
        if not (0x20 <= o <= 0x7E or 0xA0 <= o <= 0xFF) or o == 0xAD:
            raise ValueError(
                f"symbolic fixture text must be printable latin-1: {ch!r}"
            )
        out.append(o ^ 1)
    return bytes(out)


def _lzw_encode(data: bytes, early: int = 1) -> bytes:
    """PDF LZWDecode-compatible encoder (9-12 bit codes, clear/EOD,
    EarlyChange=1) — mirror of ``parse._lzw_decode``.

    Width bookkeeping: the decoder materializes each new table entry one
    code LATER than the encoder assigns it (its entry for our phrase #n
    appears when it reads code #n+1), so the decoder's table size lags
    ours by one — every width comparison below uses ``next_code - 1``.
    The lag closes on the final data code (the decoder adds an entry we
    never assigned), handled before emitting EOD."""
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out = bytearray()
    buf = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal buf, nbits
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((buf >> nbits) & 0xFF)
            buf &= (1 << nbits) - 1

    emit(256)  # leading clear, what real producers write
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code < (1 << 12):
            table[wc] = next_code
            next_code += 1
            if width < 12 and next_code - 1 >= (1 << width) - early:
                width += 1
        else:  # table full: clear (decoder resets in lockstep)
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([byte])
    if w:
        emit(table[w])
        # the decoder adds one final entry for this code; if that entry
        # crosses the width boundary it reads EOD one bit wider
        if width < 12 and next_code >= (1 << width) - early:
            width += 1
    emit(257)  # EOD
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _ascii85_encode(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 4):
        chunk = data[i : i + 4]
        n = len(chunk)
        v = int.from_bytes(chunk + b"\x00" * (4 - n), "big")
        grp = bytearray(5)
        for k in range(4, -1, -1):
            grp[k] = 0x21 + v % 85
            v //= 85
        out += grp[: n + 1]
    return bytes(out) + b"~>"


def _rle_encode(data: bytes) -> bytes:
    """RunLengthDecode-compatible: literal chunks of <=128 bytes plus a
    run opcode for repeats of 3+ (keeps streams realistic)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 3:
            out += bytes([257 - (j - i), data[i]])
            i = j
            continue
        # literal until next run of 3+ or 128 bytes
        k = i
        while k < n and k - i < 128:
            if k + 2 < n and data[k] == data[k + 1] == data[k + 2]:
                break
            k += 1
        out += bytes([k - i - 1]) + data[i:k]
        i = k
    out.append(128)  # EOD
    return bytes(out)


def _encode_content(body: bytes, content_filter: str) -> tuple[bytes, bytes]:
    """-> (encoded bytes, ``/Filter ...`` dict fragment).  Filter arrays
    are written in DECODING order — "a85+lzw" emits ``/Filter
    [/ASCII85Decode /LZWDecode]``: the reader un-85s first, then
    un-LZWs, so the writer LZWs first, then 85s."""
    if content_filter == "flate":
        return zlib.compress(body), b"/Filter /FlateDecode"
    if content_filter == "lzw":
        return _lzw_encode(body), b"/Filter /LZWDecode"
    if content_filter == "rle":
        return _rle_encode(body), b"/Filter /RunLengthDecode"
    if content_filter == "a85+lzw":
        return (
            _ascii85_encode(_lzw_encode(body)),
            b"/Filter [/ASCII85Decode /LZWDecode]",
        )
    raise ValueError(f"unknown content_filter {content_filter!r}")


def _make_encryption(n_objects: int) -> tuple[bytes, bytes, bytes, int, bytes]:
    """Standard security handler values (V 2 / R 3 / 128-bit RC4, empty
    user AND owner passwords — openable by any reader): -> (O, U, id0,
    P, file_key).  Algorithms 3.3/3.4/3.5 of the PDF spec."""
    import hashlib

    from .parse import _PAD, _file_key, rc4

    p = -44  # print/copy allowed, modify denied — a typical producer value
    id0 = hashlib.md5(b"pdf_parser_ray_fixture_%d" % n_objects).digest()
    # O (alg 3.3): RC4 of padded user pw under a key from the owner pw
    okey = hashlib.md5(_PAD).digest()
    for _ in range(50):
        okey = hashlib.md5(okey[:16]).digest()
    okey = okey[:16]
    o_val = rc4(okey, _PAD)
    for i in range(1, 20):
        o_val = rc4(bytes(b ^ i for b in okey), o_val)
    fkey = _file_key(o_val, p, id0, r=3, key_len=16)
    # U (alg 3.5): md5(PAD + id0) through 20 RC4 rounds + 16 pad bytes
    u_val = rc4(fkey, hashlib.md5(_PAD + id0).digest())
    for i in range(1, 20):
        u_val = rc4(bytes(b ^ i for b in fkey), u_val)
    u_val += b"\x00" * 16
    return o_val, u_val, id0, p, fkey


def _deterministic_iv(num: int) -> bytes:
    import hashlib

    return hashlib.md5(b"pdf_parser_ray_iv_%d" % num).digest()


def _cipher_stream(mode: str, fkey: bytes, num: int, data: bytes) -> bytes:
    """Encrypt one already-filtered stream payload per the handler mode
    ('rc4' | 'aesv2' | 'aes256').  AES modes prefix a deterministic IV
    and PKCS#5-pad, so the payload LENGTH changes — callers must rewrite
    /Length (see _reencrypt_streams)."""
    from .parse import _aes_cbc, _object_key, rc4

    if mode == "rc4":
        return rc4(_object_key(fkey, num, 0), data)
    if mode == "aesv2":
        key = _object_key(fkey, num, 0, aes=True)
    elif mode == "aes256":
        key = fkey
    else:
        raise ValueError(mode)
    iv = _deterministic_iv(num)
    pad = 16 - len(data) % 16
    return iv + _aes_cbc(key, iv, data + bytes([pad]) * pad, encrypt=True)


def _reencrypt_streams(objects: list[bytes], fkey: bytes, mode: str) -> list[bytes]:
    """Encrypt every object's stream body; AES modes change the payload
    length, so the head's /Length is rewritten to match."""
    out = []
    for i, body in enumerate(objects):
        num = i + 1
        s = body.find(b"\nstream\n")
        if s < 0:
            out.append(body)
            continue
        start = s + len(b"\nstream\n")
        end = body.rfind(b"\nendstream")
        payload = _cipher_stream(mode, fkey, num, body[start:end])
        head = re.sub(
            rb"/Length \d+", b"/Length %d" % len(payload), body[:s], count=1
        )
        out.append(head + b"\nstream\n" + payload + body[end:])
    return out


def _make_encryption_aes256() -> tuple[bytes, bytes, bytes, bytes, bytes, int, bytes]:
    """AES-256 standard security handler values (V 5 / R 6, empty user
    and owner passwords): -> (O, U, OE, UE, Perms, P, file_key).
    ISO 32000-2 §7.6.4.4 algorithms 8-10 with fixed deterministic salts
    and file key (fixtures must be byte-reproducible)."""
    import hashlib

    from .parse import _aes_cbc, _hash_2b

    p = -44
    fkey = hashlib.sha256(b"pdf_parser_ray_aes256_file_key").digest()
    u_vsalt, u_ksalt = b"UVALSLT1", b"UKEYSLT1"
    o_vsalt, o_ksalt = b"OVALSLT1", b"OKEYSLT1"
    u_val = _hash_2b(b"", u_vsalt) + u_vsalt + u_ksalt  # 48 bytes
    ue = _aes_cbc(_hash_2b(b"", u_ksalt), bytes(16), fkey, encrypt=True)
    o_val = _hash_2b(b"", o_vsalt, u_val) + o_vsalt + o_ksalt
    oe = _aes_cbc(_hash_2b(b"", o_ksalt, u_val), bytes(16), fkey, encrypt=True)
    # /Perms: AES-256-ECB of (P || 0xFFFFFFFF || 'T' || 'adb' || 4 bytes)
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    perms_plain = (
        (p & 0xFFFFFFFF).to_bytes(4, "little")
        + b"\xff\xff\xff\xff"
        + b"Tadb"
        + b"seed"
    )
    enc = Cipher(algorithms.AES(fkey), modes.ECB()).encryptor()
    perms = enc.update(perms_plain) + enc.finalize()
    return o_val, u_val, oe, ue, perms, p, fkey


def _png_up_predict(data: bytes, columns: int) -> bytes:
    """Apply the PNG Up filter (type 2) per row — what real xref-stream
    producers emit with /Predictor 12."""
    out = bytearray()
    prev = bytes(columns)
    for r in range(0, len(data), columns):
        row = data[r : r + columns]
        out.append(2)  # Up filter tag
        out += bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))
        prev = row
    return bytes(out)


def _inline_image_bytes(declare_length: bool) -> bytes:
    """A 4×4 8-bit gray inline image (``BI … ID <16 bytes> EI``) whose
    sample bytes deliberately contain the two bytes ``EI``.  Without
    ``/L`` the payload embeds only non-whitespace-delimited EIs — a
    delimiter-aware scanner must reject them; with ``/L`` it embeds a
    whitespace-delimited `` EI `` that ONLY the declared byte count can
    disambiguate (the adversarial real-crawl case)."""
    if declare_length:
        data = b"ab EI zz EI\nppp "
    else:
        data = b"aEIbEI(cEI)dEIzz"
    assert len(data) == 16  # 4*4 samples, 8 bits/sample, gray
    params = b"/W 4 /H 4 /BPC 8 /CS /G"
    if declare_length:
        params += b" /L 16"
    return b"BI " + params + b" ID " + data + b" EI\n"


def build_pdf(
    pages: list[list[Line]],
    *,
    font_size: float = 12.0,
    leading: float = 14.0,
    compress: bool = True,
    shuffle_order: bool = False,
    xref_stream: bool = False,
    objstm: bool = False,
    predictor: bool = False,
    cid_font: bool = False,
    cid_cmap: bool = False,
    type3_font: bool = False,
    truetype_symbolic: bool = False,
    encrypt: bool = False,
    encrypt_aes: bool = False,
    encrypt_aes256: bool = False,
    content_filter: str = "flate",
    form_xobject: bool = False,
    rotate: int = 0,
    incremental: bool = False,
    inline_image: bool | str = False,
    broken_xref: bool = False,
    type1_program: bool = False,
) -> bytes:
    """``xref_stream`` writes a PDF 1.5 cross-reference stream instead
    of the classic table; ``objstm`` additionally packs every non-stream
    object (catalog/pages/font/page dicts) into a /Type /ObjStm object
    stream (implies ``xref_stream``); ``predictor`` applies the PNG Up
    predictor (/Predictor 12) to the xref stream body; ``cid_font``
    writes the font as a composite Type0/Identity-H font with a
    ToUnicode CMap and 2-byte hex-string shows; ``cid_cmap`` writes a
    composite font whose /Encoding is an EMBEDDED CMap stream with
    mixed 1- and 2-byte codespace ranges (uppercase rides the 2-byte
    <8140> page) — the non-Identity form CJK-style producers emit;
    ``type3_font`` writes a /Subtype /Type3 font (FontMatrix, CharProcs
    glyph streams, a non-identity /Encoding /Differences code
    assignment) so extraction must resolve codes through glyph names;
    ``encrypt`` applies the
    standard security handler (V 2 / R 3 / 128-bit RC4), ``encrypt_aes``
    the V 4 / R 4 crypt-filter form with /CFM /AESV2 (AES-128-CBC), and
    ``encrypt_aes256`` the V 5 / R 6 form (AES-256) — all with empty
    user and owner passwords; ``content_filter`` picks the content
    stream encoding ("flate" | "lzw" | "rle" | "a85+lzw");
    ``form_xobject`` moves every page's text into a /Subtype /Form
    XObject invoked by ``Do`` (the real-producer pattern the parser's
    form execution is tested against); ``rotate`` (90/180/270) writes
    /Rotate on each page and pre-rotates the content with the inverse
    ``cm`` so the page displays upright — extracted text must come out
    identical to the unrotated form; ``incremental`` writes a classic
    PDF whose page-1 content stream is a STALE draft, then appends an
    incremental-update section (new object version + xref subsection +
    trailer /Prev chain — PDF's save-in-place mechanism, ubiquitous in
    real corpora) carrying the real content: a reader must resolve to
    the LATEST object version or it extracts the stale marker;
    ``inline_image`` prepends a ``BI/ID/EI`` inline image whose sample
    bytes contain non-delimited ``EI`` sequences (``True``) or — with
    ``"L"`` — a whitespace-delimited ``EI`` that only the declared
    ``/L`` byte count disambiguates, so a naive ``find(b"EI")`` reader
    truncates or corrupts the page text; ``broken_xref`` writes a
    classic file whose xref table offsets are all garbage and whose
    ``startxref`` points mid-file — extraction must survive via
    object-scan recovery (the trailer dict itself stays intact);
    ``type1_program`` writes a symbolic /Subtype /Type1 font with NO
    /Encoding entry whose FontDescriptor embeds a real Type1 program
    (/FontFile) — the cleartext ``dup <code> /<glyph> put`` encoding
    array, with the same non-identity code assignment as the Type3
    form, is the ONLY decode source."""
    if incremental:
        return _build_incremental(
            pages,
            font_size=font_size,
            leading=leading,
            compress=compress,
            shuffle_order=shuffle_order,
        )
    pre_rotate = {
        0: b"",
        # inverse of the viewer rotation: layout -> device
        90: b"q 0 1 -1 0 %d 0 cm " % PAGE_WIDTH,
        180: b"q -1 0 0 -1 %d %d cm " % (PAGE_WIDTH, PAGE_HEIGHT),
        270: b"q 0 -1 1 0 0 %d cm " % PAGE_HEIGHT,
    }[rotate]
    if objstm:
        xref_stream = True
    enc_mode = (
        "aes256" if encrypt_aes256 else "aesv2" if encrypt_aes else
        "rc4" if encrypt else None
    )
    objects: list[bytes] = []  # object 1..n bodies, in order

    n_pages = len(pages)
    # object layout: 1 catalog, 2 pages root, 3 font,
    # then per page i: page object (4+2i), content stream (5+2i);
    # cid_font/cid_cmap append descendant-font + ToUnicode (+ /Encoding
    # CMap) objects at the end; type3_font appends one glyph-proc stream
    descendant_num = 4 + 2 * n_pages
    tounicode_num = descendant_num + 1
    encoding_num = descendant_num + 2  # cid_cmap only
    glyphproc_num = 4 + 2 * n_pages  # type3_font only
    descriptor_num = 4 + 2 * n_pages  # truetype_symbolic / type1_program
    fontfile_num = descriptor_num + 1
    kids = b" ".join(b"%d 0 R" % (4 + 2 * i) for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    )
    if cid_cmap:
        objects.append(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Helvetica"
            b" /Encoding %d 0 R /DescendantFonts [%d 0 R]"
            b" /ToUnicode %d 0 R >>"
            % (encoding_num, descendant_num, tounicode_num)
        )
    elif cid_font:
        objects.append(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Helvetica"
            b" /Encoding /Identity-H /DescendantFonts [%d 0 R]"
            b" /ToUnicode %d 0 R >>" % (descendant_num, tounicode_num)
        )
    elif truetype_symbolic:
        code_of = _symbolic_code_of()
        codes = sorted(code_of.values())
        objects.append(
            b"<< /Type /Font /Subtype /TrueType /BaseFont /GraftSymbol"
            b" /FirstChar %d /LastChar %d /Widths [" % (codes[0], codes[-1])
            + b" ".join(
                b"500" for _ in range(codes[-1] - codes[0] + 1)
            )
            + b"] /FontDescriptor %d 0 R >>" % descriptor_num
        )
    elif type1_program:
        # NO /Encoding entry: the embedded program's cleartext encoding
        # array is the only decode source
        objects.append(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /GraftT1"
            b" /FirstChar 1 /LastChar 224"
            b" /Widths [" + b" ".join(b"500" for _ in range(224)) + b"]"
            b" /FontDescriptor %d 0 R >>" % descriptor_num
        )
    elif type3_font:
        objects.append(
            b"<< /Type /Font /Subtype /Type3"
            b" /FontBBox [0 0 1000 1000]"
            b" /FontMatrix [0.001 0 0 0.001 0 0]"
            b" /CharProcs << "
            + b" ".join(
                b"/%s %d 0 R" % (g.encode(), glyphproc_num)
                for g in _type3_glyph_names()
            )
            + b" >>"
            b" /Encoding << /Type /Encoding /Differences "
            + _type3_differences()
            + b" >>"
            b" /FirstChar 1 /LastChar 224"
            b" /Widths [" + b" ".join(b"500" for _ in range(224)) + b"]"
            b" /Resources << >> >>"
        )
    else:
        objects.append(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
            b" /Encoding /WinAnsiEncoding >>"
        )
    is_stream_obj = [False, False, False]
    # form XObjects are appended after the fixed layout (pages, cid
    # objects); their numbers are computed up front so page dicts can
    # reference them
    form_base = 4 + 2 * n_pages + (
        3 if cid_cmap
        else 2 if cid_font
        else 1 if type3_font
        else 2 if truetype_symbolic
        else 2 if type1_program
        else 0
    )
    form_bodies: list[bytes] = []
    for i, page_lines in enumerate(pages):
        page_num = 4 + 2 * i
        content_num = page_num + 1
        resources = b" /Resources << /Font << /F1 3 0 R >>"
        if form_xobject:
            resources += b" /XObject << /Fm%d %d 0 R >>" % (i, form_base + i)
        resources += b" >>"
        objects.append(
            b"<< /Type /Page /Parent 2 0 R"
            b" /MediaBox [0 0 %d %d]" % (PAGE_WIDTH, PAGE_HEIGHT)
            + (b" /Rotate %d" % rotate if rotate else b"")
            + resources
            + b" /Contents %d 0 R >>" % content_num
        )
        is_stream_obj.append(False)
        body = _content_stream(
            page_lines, font_size, leading, shuffle_order, cid_font,
            # type1_program shares the Type3 code assignment, so the
            # content stream emits the same shifted single-byte codes
            cid_cmap=cid_cmap, type3=type3_font or type1_program,
            truetype_sym=truetype_symbolic,
        )
        if inline_image:
            body = _inline_image_bytes(inline_image == "L") + body
        if form_xobject:
            form_bodies.append(body)
            body = b"q /Fm%d Do Q" % i
        if pre_rotate:
            body = pre_rotate + body + b" Q"
        if compress:
            data, filt = _encode_content(body, content_filter)
            head = b"<< /Length %d " % len(data) + filt + b" >>"
        else:
            data = body
            head = b"<< /Length %d >>" % len(data)
        objects.append(head + b"\nstream\n" + data + b"\nendstream")
        is_stream_obj.append(True)
    if cid_font or cid_cmap:
        objects.append(
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Helvetica"
            b" /CIDSystemInfo << /Registry (Adobe) /Ordering (Identity)"
            b" /Supplement 0 >> /CIDToGIDMap /Identity >>"
        )
        is_stream_obj.append(False)
        tu = zlib.compress(
            _MIXED_TOUNICODE_CMAP if cid_cmap else _TOUNICODE_CMAP
        )
        objects.append(
            b"<< /Length %d /Filter /FlateDecode >>" % len(tu)
            + b"\nstream\n" + tu + b"\nendstream"
        )
        is_stream_obj.append(True)
    if cid_cmap:
        enc_body = zlib.compress(_MIXED_ENCODING_CMAP)
        assert len(objects) + 1 == encoding_num
        objects.append(
            b"<< /Type /CMap /CMapName /Graft-Mixed1"
            b" /CIDSystemInfo << /Registry (Graft) /Ordering (Mixed1)"
            b" /Supplement 0 >>"
            b" /Length %d /Filter /FlateDecode >>" % len(enc_body)
            + b"\nstream\n" + enc_body + b"\nendstream"
        )
        is_stream_obj.append(True)
    if type3_font:
        # one shared empty glyph proc (d0 sets the advance; no marks):
        # every CharProcs name references it
        assert len(objects) + 1 == glyphproc_num
        proc = b"500 0 d0"
        objects.append(
            b"<< /Length %d >>" % len(proc)
            + b"\nstream\n" + proc + b"\nendstream"
        )
        is_stream_obj.append(True)
    if truetype_symbolic:
        # FontDescriptor (Flags bit 3 = symbolic: 4) + the real sfnt
        code_of = _symbolic_code_of()
        sfnt = _sfnt_symbolic(list(code_of), code_of)
        assert len(objects) + 1 == descriptor_num
        objects.append(
            b"<< /Type /FontDescriptor /FontName /GraftSymbol /Flags 4"
            b" /FontBBox [0 -250 1000 750] /ItalicAngle 0 /Ascent 750"
            b" /Descent -250 /CapHeight 700 /StemV 80"
            b" /FontFile2 %d 0 R >>" % fontfile_num
        )
        is_stream_obj.append(False)
        ff = zlib.compress(sfnt)
        objects.append(
            b"<< /Length %d /Length1 %d /Filter /FlateDecode >>"
            % (len(ff), len(sfnt))
            + b"\nstream\n" + ff + b"\nendstream"
        )
        is_stream_obj.append(True)
    if type1_program:
        # symbolic FontDescriptor + the real Type1 program (/FontFile)
        prog, l1, l2, l3 = _type1_program_bytes()
        assert len(objects) + 1 == descriptor_num
        objects.append(
            b"<< /Type /FontDescriptor /FontName /GraftT1 /Flags 4"
            b" /FontBBox [0 -250 1000 750] /ItalicAngle 0 /Ascent 750"
            b" /Descent -250 /CapHeight 700 /StemV 80"
            b" /FontFile %d 0 R >>" % fontfile_num
        )
        is_stream_obj.append(False)
        ff = zlib.compress(prog)
        objects.append(
            b"<< /Length %d /Length1 %d /Length2 %d /Length3 %d"
            b" /Filter /FlateDecode >>" % (len(ff), l1, l2, l3)
            + b"\nstream\n" + ff + b"\nendstream"
        )
        is_stream_obj.append(True)

    for i, body in enumerate(form_bodies):
        assert len(objects) + 1 == form_base + i  # numbering invariant
        data, filt = _encode_content(body, content_filter)
        objects.append(
            b"<< /Type /XObject /Subtype /Form /BBox [0 0 %d %d]"
            % (PAGE_WIDTH, PAGE_HEIGHT)
            + b" /Resources << /Font << /F1 3 0 R >> >>"
            + b" /Length %d " % len(data) + filt
            + b" >>\nstream\n" + data + b"\nendstream"
        )
        is_stream_obj.append(True)

    trailer_extra = b""
    fkey = None
    if enc_mode == "aes256":
        o_val, u_val, oe, ue, perms, p, fkey = _make_encryption_aes256()
        objects = _reencrypt_streams(objects, fkey, enc_mode)
        enc_num = len(objects) + 1
        objects.append(
            b"<< /Filter /Standard /V 5 /R 6 /Length 256"
            b" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
            b" /StmF /StdCF /StrF /StdCF /P %d"
            b" /O <%s> /U <%s> /OE <%s> /UE <%s> /Perms <%s> >>"
            % (
                p,
                o_val.hex().upper().encode(),
                u_val.hex().upper().encode(),
                oe.hex().upper().encode(),
                ue.hex().upper().encode(),
                perms.hex().upper().encode(),
            )
        )
        # spec: the encryption dict may not live inside an object stream
        is_stream_obj.append(True)
        trailer_extra = b" /Encrypt %d 0 R" % enc_num
    elif enc_mode is not None:
        o_val, u_val, id0, p, fkey = _make_encryption(len(objects) + 1)
        objects = _reencrypt_streams(objects, fkey, enc_mode)
        enc_num = len(objects) + 1
        if enc_mode == "aesv2":
            objects.append(
                b"<< /Filter /Standard /V 4 /R 4 /Length 128"
                b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
                b" /StmF /StdCF /StrF /StdCF /P %d /O <%s> /U <%s> >>"
                % (p, o_val.hex().upper().encode(), u_val.hex().upper().encode())
            )
        else:
            objects.append(
                b"<< /Filter /Standard /V 2 /R 3 /Length 128 /P %d"
                b" /O <%s> /U <%s> >>"
                % (p, o_val.hex().upper().encode(), u_val.hex().upper().encode())
            )
        # spec: the encryption dict may not live inside an object stream
        is_stream_obj.append(True)
        idhex = id0.hex().upper().encode()
        trailer_extra = b" /Encrypt %d 0 R /ID [<%s> <%s>]" % (enc_num, idhex, idhex)

    header = b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n" if xref_stream else b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n"
    out = bytearray(header)

    if not xref_stream:
        offsets: list[int] = []
        for num, body in enumerate(objects, start=1):
            offsets.append(len(out))
            out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
        xref_pos = len(out)
        out += b"xref\n0 %d\n" % (len(objects) + 1)
        out += b"0000000000 65535 f \n"
        for off in offsets:
            # broken_xref: every offset garbage — a reader that trusts
            # the table dereferences mid-stream junk; object-scan
            # recovery must not care
            out += b"9999999999 00000 n \n" if broken_xref else (
                b"%010d 00000 n \n" % off
            )
        out += (
            b"trailer\n<< /Size %d /Root 1 0 R%s >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objects) + 1, trailer_extra, 7 if broken_xref else xref_pos)
        )
        return bytes(out)

    # ---- PDF 1.5 layout: optional ObjStm + cross-reference stream ----
    n = len(objects)
    objstm_num = n + 1
    xref_num = objstm_num + 1 if objstm else n + 1
    # entry per object num: ("offset", byte_off) | ("instream", index)
    entries: dict[int, tuple[str, int]] = {}

    if objstm:
        packed_nums = [i + 1 for i in range(n) if not is_stream_obj[i]]
        bodies = [objects[num - 1] for num in packed_nums]
        offs: list[int] = []
        pos = 0
        for b in bodies:
            offs.append(pos)
            pos += len(b) + 1
        head_pairs = " ".join(
            f"{num} {off}" for num, off in zip(packed_nums, offs)
        ).encode()
        payload = head_pairs + b"\n" + b"\n".join(bodies) + b"\n"
        first = len(head_pairs) + 1
        data = zlib.compress(payload)
        if fkey is not None:  # ObjStm bodies are encrypted like any stream
            data = _cipher_stream(enc_mode, fkey, objstm_num, data)
        stm = (
            b"<< /Type /ObjStm /N %d /First %d /Length %d /Filter /FlateDecode >>"
            % (len(packed_nums), first, len(data))
            + b"\nstream\n" + data + b"\nendstream"
        )
        for idx, num in enumerate(packed_nums):
            entries[num] = ("instream", idx)
        # write only the stream objects + the ObjStm as top-level
        for i in range(n):
            num = i + 1
            if is_stream_obj[i]:
                entries[num] = ("offset", len(out))
                out += b"%d 0 obj\n" % num + objects[i] + b"\nendobj\n"
        entries[objstm_num] = ("offset", len(out))
        out += b"%d 0 obj\n" % objstm_num + stm + b"\nendobj\n"
    else:
        for i in range(n):
            num = i + 1
            entries[num] = ("offset", len(out))
            out += b"%d 0 obj\n" % num + objects[i] + b"\nendobj\n"

    # cross-reference stream: W [1 4 2] (4-byte offsets); object 0 free
    size = xref_num + 1
    row_w = 7
    rows = bytearray()
    for num in range(size):
        if num == 0:
            t, f2, f3 = 0, 0, 65535
        elif num == xref_num:
            t, f2, f3 = 1, 0, 0  # patched below once offset known
        elif num in entries:
            kind, val = entries[num]
            if kind == "offset":
                t, f2, f3 = 1, val, 0
            else:
                t, f2, f3 = 2, objstm_num, val
        else:
            t, f2, f3 = 0, 0, 65535
        rows += bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")

    xref_pos = len(out)
    # patch the xref stream's own entry now that its offset is known
    row_off = xref_num * row_w
    rows[row_off : row_off + row_w] = (
        bytes([1]) + xref_pos.to_bytes(4, "big") + (0).to_bytes(2, "big")
    )

    body = bytes(rows)
    parms = b""
    if predictor:
        body = _png_up_predict(body, row_w)
        parms = b" /DecodeParms << /Predictor 12 /Columns %d >>" % row_w
    data = zlib.compress(body)
    out += (
        b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 4 2] /Index [0 %d]"
        % (xref_num, size, size)
        + b" /Root 1 0 R /Filter /FlateDecode"
        + trailer_extra
        + parms
        + b" /Length %d >>\nstream\n" % len(data)
        + data
        + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n%d\n%%%%EOF\n" % xref_pos
    return bytes(out)


def _build_incremental(
    pages: list[list[Line]],
    *,
    font_size: float,
    leading: float,
    compress: bool,
    shuffle_order: bool,
) -> bytes:
    """Classic PDF + appended incremental update: the base body holds a
    stale draft of page 1's content stream (object 5 in the fixed
    layout); the update appends the real version of that object, an
    ``xref`` subsection for it, and a trailer whose /Prev points at the
    base xref.  Extracted text must equal the non-incremental form."""
    stale_first: list[Line] = ["STALE DRAFT - SUPERSEDED BY INCREMENTAL UPDATE"]
    base = build_pdf(
        [stale_first] + list(pages[1:]),
        font_size=font_size,
        leading=leading,
        compress=compress,
        shuffle_order=shuffle_order,
    )
    m = re.search(rb"startxref\s+(\d+)", base)
    assert m is not None
    prev_pos = int(m.group(1))
    n_objects = 3 + 2 * len(pages)  # catalog, pages, font + 2 per page

    content_num = 5  # page 1's content stream in the fixed layout
    body = _content_stream(pages[0], font_size, leading, shuffle_order)
    if compress:
        data, filt = _encode_content(body, "flate")
        head = b"<< /Length %d " % len(data) + filt + b" >>"
    else:
        data = body
        head = b"<< /Length %d >>" % len(data)

    out = bytearray(base)
    obj_off = len(out)
    out += (
        b"%d 0 obj\n" % content_num
        + head
        + b"\nstream\n"
        + data
        + b"\nendstream\nendobj\n"
    )
    xref_pos = len(out)
    out += b"xref\n%d 1\n%010d 00000 n \n" % (content_num, obj_off)
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R /Prev %d >>\nstartxref\n%d\n%%%%EOF\n"
        % (n_objects + 1, prev_pos, xref_pos)
    )
    return bytes(out)
