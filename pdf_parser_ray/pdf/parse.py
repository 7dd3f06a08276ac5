"""From-scratch PDF text extraction (no third-party PDF library).

Implements the north-star's "xref/object parse, page tree walk, text-run
reordering by bounding box" directly:

1. **Object scan** — every ``N G obj … endobj`` in the byte stream is
   lexed with a recursive-descent parser for the PDF object grammar
   (dicts, arrays, literal/hex strings, names, numbers, refs, streams).
   Scanning all objects (rather than trusting the xref table) tolerates
   mild corruption; the trailer/xref is still used to find ``/Root``.
2. **Page tree walk** — ``/Root → /Pages → /Kids`` recursion; documents
   without a usable catalog fall back to all ``/Type /Page`` objects in
   object-number order.
3. **Content interpretation** — ``BT/ET``, ``Td/TD/TL/Tm/T*``,
   ``Tj/TJ/'/"``, ``Tf`` with full text-matrix + CTM (``q/Q/cm``)
   tracking; each shown string becomes a positioned *text run*.
4. **Layout reassembly** — runs cluster into lines by y within
   ``y_tolerance`` and sort by x within a line (the same tolerances as
   the reference's extraction call, x=2/y=3 at reference
   parsers/base.py:31); lines join top-down with ``\\n``, pages with
   ``\\n`` (reference base.py:27-33 semantics).

Determinism note: run ordering uses stable sorts keyed only on content
geometry, so identical bytes always yield identical text — required for
byte-identical per-url output under Ray task retry.

Coverage: simple fonts (Latin-1 ≈ WinAnsi/PDFDoc, /Encoding
/Differences remaps), Type3 fonts (CharProcs + /Differences glyph-name
resolution), and composite Type0/CID fonts — Identity-H + ToUnicode
CMaps AND non-Identity embedded /Encoding CMap streams, whose codespace
ranges drive variable-length (mixed 1/2-byte) code splitting;
/FlateDecode, /ASCIIHexDecode, /ASCII85Decode,
/LZWDecode (EarlyChange) and /RunLengthDecode stream filters with
PNG/TIFF predictors; PDF 1.5 cross-reference streams (``/Type /XRef``,
W fields, /Index subsections) and object streams (``/Type /ObjStm``) —
the trailer dict merges from XRef stream dicts and compressed objects
are expanded exhaustively; standard-security-handler decryption for
RC4 (V 1-2 / R 2-3), crypt-filter RC4/AES-128 (V 4 / CFM V2|AESV2) and
AES-256 (V 5 / R 6), all for the empty-user-password ("any reader can
open") case.
"""

from __future__ import annotations

import codecs
import re
import zlib
from dataclasses import dataclass, field
from typing import Any

X_TOLERANCE = 2.0
Y_TOLERANCE = 3.0

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"

_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_TRAILER_RE = re.compile(rb"trailer")


class PDFSyntaxError(ValueError):
    pass


@dataclass(frozen=True)
class Ref:
    num: int
    gen: int


class Name(str):
    """A PDF name token (distinct from a string value)."""


def _png_unpredict(data: bytes, columns: int, bpp: int) -> bytes:
    """Reverse the PNG row filters (predictors 10-15: each row is a
    filter-tag byte + filtered bytes).  All five filter types handled —
    real producers mostly emit Up (2), but Sub/Average/Paeth appear."""
    row_w = columns
    out = bytearray()
    prev = bytearray(row_w)
    pos = 0
    n = len(data)
    while pos + 1 <= n:
        ft = data[pos]
        row = bytearray(data[pos + 1 : pos + 1 + row_w])
        pos += 1 + row_w
        if ft == 1:  # Sub
            for i in range(len(row)):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + left) & 0xFF
        elif ft == 2:  # Up
            for i in range(len(row)):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(len(row)):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(len(row)):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        # ft == 0: None
        out += row
        prev = row
    return bytes(out)


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """PDF LZWDecode: variable 9-12 bit codes, clear=256, EOD=257,
    ``/EarlyChange`` (default 1) widens the code one step early — the
    TIFF/PDF convention virtually every producer uses."""
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    next_code = 258
    width = 9
    prev: bytes | None = None
    out = bytearray()
    buf = 0
    nbits = 0
    for byte in data:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (buf >> nbits) & ((1 << width) - 1)
            buf &= (1 << nbits) - 1
            if code == 256:
                table = {i: bytes([i]) for i in range(256)}
                next_code = 258
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if code in table:
                entry = table[code]
            elif code == next_code and prev is not None:
                entry = prev + prev[:1]
            else:
                raise PDFSyntaxError(f"bad LZW code {code}")
            if prev is not None:
                table[next_code] = prev + entry[:1]
                next_code += 1
            out += entry
            prev = entry
            if width < 12 and next_code >= (1 << width) - early:
                width += 1
    return bytes(out)


def _ascii85_decode(data: bytes) -> bytes:
    """ASCII85Decode: 5 chars ('!'..'u') -> 4 bytes base-85; 'z' is a
    zero group; whitespace ignored; '~>' terminates; a trailing partial
    group of n chars yields n-1 bytes (pad with 'u')."""
    end = data.find(b"~>")
    if end >= 0:
        data = data[:end]
    out = bytearray()
    group: list[int] = []
    for c in data:
        if c in _WS:
            continue
        if c == 0x7A:  # 'z'
            if group:
                raise PDFSyntaxError("'z' inside ascii85 group")
            out += b"\x00\x00\x00\x00"
            continue
        if not 0x21 <= c <= 0x75:
            raise PDFSyntaxError(f"bad ascii85 char {c}")
        group.append(c - 0x21)
        if len(group) == 5:
            v = 0
            for g in group:
                v = v * 85 + g
            out += v.to_bytes(4, "big")
            group = []
    if group:
        if len(group) == 1:
            raise PDFSyntaxError("lone trailing ascii85 char")
        n = len(group)
        group += [84] * (5 - n)  # pad with 'u'
        v = 0
        for g in group:
            v = v * 85 + g
        out += v.to_bytes(4, "big")[: n - 1]
    return bytes(out)


def _rle_decode(data: bytes) -> bytes:
    """RunLengthDecode: length byte L — 0-127 copies the next L+1 bytes,
    129-255 repeats the next byte 257-L times, 128 is EOD."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        l = data[pos]
        pos += 1
        if l == 128:
            break
        if l < 128:
            out += data[pos : pos + l + 1]
            pos += l + 1
        else:
            if pos < n:
                out += bytes([data[pos]]) * (257 - l)
                pos += 1
    return bytes(out)


@dataclass
class Stream:
    attrs: dict
    raw: bytes

    def data(self, doc: "PDFDocument | None" = None) -> bytes:
        filt = self.attrs.get("Filter")
        parms = self.attrs.get("DecodeParms", self.attrs.get("DP"))
        if doc is not None:
            filt = doc.resolve(filt)
            parms = doc.resolve(parms)
        filters: list[Any]
        if filt is None:
            filters = []
        elif isinstance(filt, list):
            filters = filt
        else:
            filters = [filt]
        parms_list: list[Any]
        if parms is None:
            parms_list = [None] * len(filters)
        elif isinstance(parms, list):
            parms_list = list(parms) + [None] * (len(filters) - len(parms))
        else:
            parms_list = [parms] + [None] * (len(filters) - 1)
        out = self.raw
        for f, p in zip(filters, parms_list):
            name = str(f)
            if doc is not None:
                p = doc.resolve(p)
                if isinstance(p, dict):
                    p = {k: doc.resolve(v) for k, v in p.items()}
            if name == "FlateDecode":
                try:
                    out = zlib.decompress(out)
                except zlib.error:
                    # tolerate trailing garbage after the deflate body
                    d = zlib.decompressobj()
                    out = d.decompress(out)
            elif name == "ASCIIHexDecode":
                hexbody = re.sub(rb"[^0-9A-Fa-f>]", b"", out).rstrip(b">")
                if len(hexbody) % 2:
                    hexbody += b"0"
                out = bytes.fromhex(hexbody.decode("ascii"))
            elif name == "LZWDecode":
                early = 1
                if isinstance(p, dict):
                    early = int(p.get("EarlyChange", 1) or 0)
                out = _lzw_decode(out, early)
            elif name == "ASCII85Decode":
                out = _ascii85_decode(out)
            elif name == "RunLengthDecode":
                out = _rle_decode(out)
            else:
                raise PDFSyntaxError(f"unsupported stream filter {name}")
            if isinstance(p, dict):
                pred = int(p.get("Predictor", 1) or 1)
                if pred >= 10:
                    colors = int(p.get("Colors", 1) or 1)
                    bpc = int(p.get("BitsPerComponent", 8) or 8)
                    columns = int(p.get("Columns", 1) or 1)
                    bpp = max(1, (colors * bpc + 7) // 8)
                    out = _png_unpredict(out, columns * bpp, bpp)
                elif pred == 2:  # TIFF horizontal differencing (8-bit)
                    colors = int(p.get("Colors", 1) or 1)
                    bpc = int(p.get("BitsPerComponent", 8) or 8)
                    columns = int(p.get("Columns", 1) or 1)
                    # per-component stride: component i differences
                    # against the same component of the previous pixel
                    bpp = max(1, (colors * bpc + 7) // 8)
                    row_bytes = columns * bpp
                    buf = bytearray(out)
                    for r in range(0, len(buf), row_bytes):
                        for i in range(r + bpp, min(r + row_bytes, len(buf))):
                            buf[i] = (buf[i] + buf[i - bpp]) & 0xFF
                    out = bytes(buf)
        return out


class _Lexer:
    """Recursive-descent parser over the PDF object grammar."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment to EOL
                while self.pos < n and d[self.pos] not in (0x0A, 0x0D):
                    self.pos += 1
            else:
                return

    def _peek(self, k: int = 1) -> bytes:
        return self.data[self.pos : self.pos + k]

    def parse(self) -> Any:
        self._skip_ws()
        d = self.data
        if self.pos >= len(d):
            raise PDFSyntaxError("unexpected end of data")
        c = d[self.pos]
        if d.startswith(b"<<", self.pos):
            return self._parse_dict()
        if c == 0x3C:  # '<' hex string
            return self._parse_hex_string()
        if c == 0x5B:  # '['
            return self._parse_array()
        if c == 0x28:  # '('
            return self._parse_literal_string()
        if c == 0x2F:  # '/'
            return self._parse_name()
        if d.startswith(b"true", self.pos):
            self.pos += 4
            return True
        if d.startswith(b"false", self.pos):
            self.pos += 5
            return False
        if d.startswith(b"null", self.pos):
            self.pos += 4
            return None
        return self._parse_number_or_ref()

    def _parse_dict(self) -> Any:
        self.pos += 2
        out: dict = {}
        while True:
            self._skip_ws()
            if self._peek(2) == b">>":
                self.pos += 2
                break
            key = self.parse()
            if not isinstance(key, Name):
                raise PDFSyntaxError("dict key must be a name")
            out[str(key)] = self.parse()
        # a stream may follow the dict
        self._skip_ws()
        if self.data.startswith(b"stream", self.pos):
            self.pos += len(b"stream")
            if self.data.startswith(b"\r\n", self.pos):
                self.pos += 2
            elif self.data.startswith(b"\n", self.pos) or self.data.startswith(
                b"\r", self.pos
            ):
                self.pos += 1
            end = self.data.find(b"endstream", self.pos)
            if end < 0:
                raise PDFSyntaxError("unterminated stream")
            raw = self.data[self.pos : end]
            # strip the EOL that precedes 'endstream'
            if raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith(b"\n") or raw.endswith(b"\r"):
                raw = raw[:-1]
            self.pos = end + len(b"endstream")
            return Stream(out, raw)
        return out

    def _parse_array(self) -> list:
        self.pos += 1
        out = []
        while True:
            self._skip_ws()
            if self._peek() == b"]":
                self.pos += 1
                return out
            out.append(self.parse())

    def _parse_name(self) -> Name:
        self.pos += 1
        start = self.pos
        d, n = self.data, len(self.data)
        buf = bytearray()
        while self.pos < n:
            c = d[self.pos]
            if c in _WS or c in _DELIM:
                break
            if c == 0x23 and self.pos + 2 < n:  # '#xx' escape
                try:
                    buf += bytes.fromhex(
                        d[self.pos + 1 : self.pos + 3].decode("ascii")
                    )
                    self.pos += 3
                    continue
                except (ValueError, UnicodeDecodeError):
                    pass  # malformed escape: keep the literal '#'
            buf.append(c)
            self.pos += 1
        if self.pos == start and not buf:
            return Name("")
        return Name(buf.decode("latin-1"))

    def _parse_literal_string(self) -> bytes:
        self.pos += 1
        d, n = self.data, len(self.data)
        depth = 1
        buf = bytearray()
        while self.pos < n:
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= n:
                    break
                e = d[self.pos]
                mapped = {
                    0x6E: 0x0A,  # n
                    0x72: 0x0D,  # r
                    0x74: 0x09,  # t
                    0x62: 0x08,  # b
                    0x66: 0x0C,  # f
                    0x28: 0x28,
                    0x29: 0x29,
                    0x5C: 0x5C,
                }.get(e)
                if mapped is not None:
                    buf.append(mapped)
                    self.pos += 1
                elif 0x30 <= e <= 0x37:  # octal
                    oct_digits = bytearray()
                    while (
                        self.pos < n and 0x30 <= d[self.pos] <= 0x37 and len(oct_digits) < 3
                    ):
                        oct_digits.append(d[self.pos])
                        self.pos += 1
                    buf.append(int(oct_digits.decode("ascii"), 8) & 0xFF)
                elif e in (0x0A, 0x0D):  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    buf.append(e)
                    self.pos += 1
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return bytes(buf)
            buf.append(c)
            self.pos += 1
        return bytes(buf)

    def _parse_hex_string(self) -> bytes:
        self.pos += 1
        end = self.data.find(b">", self.pos)
        if end < 0:
            raise PDFSyntaxError("unterminated hex string")
        body = re.sub(rb"[^0-9A-Fa-f]", b"", self.data[self.pos : end])
        self.pos = end + 1
        if len(body) % 2:
            body += b"0"
        return bytes.fromhex(body.decode("ascii"))

    _NUM_RE = re.compile(rb"[+-]?(?:\d+\.\d*|\.\d+|\d+)")
    _REF_RE = re.compile(rb"(\d+)\s+(\d+)\s+R\b")

    def _parse_number_or_ref(self) -> Any:
        m = self._REF_RE.match(self.data, self.pos)
        if m:
            self.pos = m.end()
            return Ref(int(m.group(1)), int(m.group(2)))
        m = self._NUM_RE.match(self.data, self.pos)
        if not m:
            raise PDFSyntaxError(
                f"cannot parse object at offset {self.pos}: {self.data[self.pos:self.pos+20]!r}"
            )
        self.pos = m.end()
        tok = m.group(0)
        if b"." in tok:
            return float(tok)
        return int(tok)


# --------------------------------------------------------------------------
# standard security handler (RC4, /V 1-2 /R 2-3) — the common "protected"
# PDF form that any reader can open (empty user password)
# --------------------------------------------------------------------------

_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _file_key(
    o_entry: bytes, p: int, id0: bytes, r: int, key_len: int, password: bytes = b""
) -> bytes:
    """Algorithm 2 (PDF 1.7 §7.6.3.3): the file encryption key from the
    (padded) user password, /O, /P and the first document ID."""
    import hashlib
    import struct

    padded = (password + _PAD)[:32]
    h = hashlib.md5(padded + o_entry[:32] + struct.pack("<i", p) + id0)
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:key_len]).digest()
    return key[:key_len]


def _object_key(file_key: bytes, num: int, gen: int, aes: bool = False) -> bytes:
    import hashlib

    salt = b"sAlT" if aes else b""  # AESV2 appends the fixed salt (§7.6.2)
    h = hashlib.md5(
        file_key + num.to_bytes(3, "little") + gen.to_bytes(2, "little") + salt
    ).digest()
    return h[: min(len(file_key) + 5, 16)]


def _aes_cbc(key: bytes, iv: bytes, data: bytes, *, encrypt: bool) -> bytes:
    """Raw AES-CBC (no padding handling) via the ``cryptography``
    package; raises ImportError when the package is absent — callers
    degrade to leaving bytes untouched."""
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    c = Cipher(algorithms.AES(key), modes.CBC(iv))
    ctx = c.encryptor() if encrypt else c.decryptor()
    return ctx.update(data) + ctx.finalize()


def _aes_stream_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF AES stream layout: 16-byte IV prefix + CBC ciphertext with
    PKCS#5 padding.  Tolerates truncated/ragged input by returning it
    unchanged (extraction then degrades, never crashes)."""
    if len(data) < 32 or (len(data) - 16) % 16:
        return data
    plain = _aes_cbc(key, data[:16], data[16:], encrypt=False)
    pad = plain[-1]
    if 1 <= pad <= 16:
        plain = plain[:-pad]
    return plain


def _hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B (R 6 password hash): iterated
    SHA-256/384/512 keyed by an AES-128-CBC round, ≥64 rounds, stop when
    the last byte of the AES output ≤ round-32."""
    import hashlib

    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = _aes_cbc(k[:16], k[16:32], k1, encrypt=True)
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[sum(e[:16]) % 3](
            e
        ).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _decrypt_streams(doc: "PDFDocument") -> None:
    """Decrypt every stream's raw bytes in place with the standard
    security handler (empty user password).  Runs BEFORE ObjStm
    expansion (compressed-object bodies are themselves encrypted);
    the /Type /XRef stream is written unencrypted per spec and skipped.
    Unsupported /V values leave the document untouched (extraction then
    degrades to whatever the content scan yields)."""
    enc = doc.resolve(doc.trailer.get("Encrypt"))
    if not isinstance(enc, dict) or str(enc.get("Filter", "")) != "Standard":
        return
    v = int(doc.resolve(enc.get("V")) or 0)
    r = int(doc.resolve(enc.get("R")) or 2)

    aes = False
    if v == 5:
        # AES-256 (R 5/6): the file key is recovered from /UE with the
        # intermediate key hashed from the empty user password and the
        # key salt (U[40:48]); streams are AES-256-CBC with IV prefix
        u_entry = doc.resolve(enc.get("U"))
        ue = doc.resolve(enc.get("UE"))
        if not (isinstance(u_entry, bytes) and isinstance(ue, bytes)) or len(
            u_entry
        ) < 48:
            return
        import hashlib

        try:
            ikey = (
                _hash_2b(b"", u_entry[40:48])
                if r >= 6
                else hashlib.sha256(u_entry[40:48]).digest()
            )
            fkey = _aes_cbc(ikey, bytes(16), ue[:32], encrypt=False)
        except ImportError:
            return  # no AES backend — leave bytes untouched
        for num, obj in doc.objects.items():
            if isinstance(obj, Stream) and str(obj.attrs.get("Type", "")) != "XRef":
                obj.raw = _aes_stream_decrypt(fkey, obj.raw)
        return

    if v == 4:
        # crypt filters: /StmF names the filter applied to streams;
        # /CF /<name> /CFM is V2 (RC4) or AESV2 (AES-128-CBC)
        stmf = str(doc.resolve(enc.get("StmF", "Identity")))
        if stmf == "Identity":
            return
        cf = doc.resolve(enc.get("CF")) or {}
        cfd = doc.resolve(cf.get(stmf)) if isinstance(cf, dict) else None
        cfm = str(doc.resolve(cfd.get("CFM", ""))) if isinstance(cfd, dict) else ""
        if cfm == "AESV2":
            aes = True
        elif cfm != "V2":
            return
    elif v not in (1, 2):
        return

    key_bits = int(doc.resolve(enc.get("Length")) or 40)
    o_entry = doc.resolve(enc.get("O"))
    p = int(doc.resolve(enc.get("P")) or -1)
    ids = doc.resolve(doc.trailer.get("ID")) or []
    id0 = ids[0] if isinstance(ids, list) and ids and isinstance(ids[0], bytes) else b""
    if not isinstance(o_entry, bytes):
        return
    fkey = _file_key(o_entry, p, id0, r, 16 if aes else max(5, key_bits // 8))
    for num, obj in doc.objects.items():
        if isinstance(obj, Stream) and str(obj.attrs.get("Type", "")) != "XRef":
            gen = doc.generations.get(num, 0)
            okey = _object_key(fkey, num, gen, aes=aes)
            if aes:
                try:
                    obj.raw = _aes_stream_decrypt(okey, obj.raw)
                except ImportError:
                    return
            else:
                obj.raw = rc4(okey, obj.raw)


@dataclass
class PDFDocument:
    objects: dict[int, Any] = field(default_factory=dict)
    trailer: dict = field(default_factory=dict)
    generations: dict[int, int] = field(default_factory=dict)

    def resolve(self, obj: Any) -> Any:
        seen = 0
        while isinstance(obj, Ref):
            obj = self.objects.get(obj.num)
            seen += 1
            if seen > 32:
                raise PDFSyntaxError("reference cycle")
        return obj

    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer.get("Root"))
        if isinstance(root, dict):
            tree = self.resolve(root.get("Pages"))
            if isinstance(tree, dict):
                out: list[dict] = []
                self._walk(tree, out, depth=0)
                if out:
                    return out
        # fallback: any /Type /Page object, in object-number order
        return [
            obj
            for _, obj in sorted(self.objects.items())
            if isinstance(obj, dict) and str(obj.get("Type", "")) == "Page"
        ]

    def _walk(self, node: dict, out: list[dict], depth: int) -> None:
        if depth > 64:
            return
        ntype = str(node.get("Type", ""))
        if ntype == "Page":
            out.append(node)
            return
        for kid in self.resolve(node.get("Kids")) or []:
            kid = self.resolve(kid)
            if isinstance(kid, dict):
                self._walk(kid, out, depth + 1)


def parse_xref_stream_entries(
    doc: PDFDocument, stream: Stream
) -> dict[int, tuple[int, int, int]]:
    """Decode a /Type /XRef cross-reference stream (PDF 1.5): W-field
    widths, /Index subsections, optional PNG predictor (handled by
    Stream.data).  -> {obj_num: (type, field2, field3)} where type 1 is
    (offset, gen) and type 2 is (objstm_num, index_in_stream)."""
    w = [int(v) for v in (doc.resolve(stream.attrs.get("W")) or [])]
    if len(w) < 3:
        raise PDFSyntaxError("xref stream missing /W")
    size = int(doc.resolve(stream.attrs.get("Size")) or 0)
    index = doc.resolve(stream.attrs.get("Index")) or [0, size]
    body = stream.data(doc)
    row_w = sum(w)
    entries: dict[int, tuple[int, int, int]] = {}
    pos = 0
    for s in range(0, len(index) - 1, 2):
        start, count = int(index[s]), int(index[s + 1])
        for num in range(start, start + count):
            if pos + row_w > len(body):
                return entries
            fields = []
            for width in w:
                if width == 0:
                    fields.append(1 if len(fields) == 0 else 0)  # defaults
                else:
                    fields.append(int.from_bytes(body[pos : pos + width], "big"))
                    pos += width
            entries[num] = (fields[0], fields[1], fields[2])
    return entries


def _expand_object_streams(doc: PDFDocument) -> None:
    """Lex every object packed inside /Type /ObjStm containers into
    doc.objects (PDF 1.5 compressed objects carry no ``N 0 obj`` header
    in the raw bytes, so the flat scan cannot see them)."""
    for num in sorted(doc.objects):
        obj = doc.objects[num]
        if not (isinstance(obj, Stream) and str(obj.attrs.get("Type", "")) == "ObjStm"):
            continue
        try:
            body = obj.data(doc)
            n = int(doc.resolve(obj.attrs.get("N")) or 0)
            first = int(doc.resolve(obj.attrs.get("First")) or 0)
            head = _Lexer(body[:first])
            pairs: list[tuple[int, int]] = []
            for _ in range(n):
                onum = head.parse()
                ooff = head.parse()
                pairs.append((int(onum), int(ooff)))
            for onum, ooff in pairs:
                if onum in doc.objects:
                    continue  # top-level definitions win (scan-all parity)
                lex = _Lexer(body, first + ooff)
                try:
                    doc.objects[onum] = lex.parse()
                except PDFSyntaxError:
                    continue
        except (PDFSyntaxError, ValueError, zlib.error):
            continue


def parse_document(data: bytes) -> PDFDocument:
    """Scan every indirect object, expand object streams, and assemble
    the trailer from classic ``trailer`` dicts and/or /Type /XRef
    cross-reference stream dicts (PDF 1.5+)."""
    doc = PDFDocument()
    for m in _OBJ_HEAD_RE.finditer(data):
        num = int(m.group(1))
        lex = _Lexer(data, m.end())
        try:
            doc.objects[num] = lex.parse()
            doc.generations[num] = int(m.group(2))
        except PDFSyntaxError:
            continue
    for m in _TRAILER_RE.finditer(data):
        lex = _Lexer(data, m.end())
        try:
            t = lex.parse()
        except PDFSyntaxError:
            continue
        if isinstance(t, dict):
            doc.trailer.update(t)
    # PDF 1.5: the trailer dict lives on the cross-reference stream;
    # merge every XRef stream's dict (classic trailer keys win)
    for num in sorted(doc.objects):
        obj = doc.objects[num]
        if isinstance(obj, Stream) and str(obj.attrs.get("Type", "")) == "XRef":
            for k, v in obj.attrs.items():
                doc.trailer.setdefault(k, v)
    _decrypt_streams(doc)  # before ObjStm expansion: bodies are encrypted
    _expand_object_streams(doc)
    if "Root" not in doc.trailer:
        # some producers omit a classic trailer; find a catalog object
        for num, obj in sorted(doc.objects.items()):
            if isinstance(obj, dict) and str(obj.get("Type", "")) == "Catalog":
                doc.trailer["Root"] = Ref(num, 0)
                break
    return doc


# --------------------------------------------------------------------------
# fonts: ToUnicode CMaps and composite (Type0/CID) text decoding
# --------------------------------------------------------------------------


def _uni(b: bytes) -> str:
    return b.decode("utf-16-be", "ignore") if len(b) >= 2 else b.decode("latin-1")


class CMap:
    """code -> unicode map: explicit ``bfchar`` entries as a dict, and
    ``bfrange`` runs kept as (lo, hi, base, width) tuples resolved on
    lookup — a 0000-FFFF identity range (the common modern-producer
    form) costs one tuple, never a 65k-entry dict per document."""

    __slots__ = ("chars", "ranges")

    def __init__(self, chars: dict[int, str], ranges: list[tuple[int, int, int, int]]):
        self.chars = chars
        self.ranges = ranges

    def get(self, code: int, default: str | None = None) -> str | None:
        hit = self.chars.get(code)
        if hit is not None:
            return hit
        for lo, hi, base, width in self.ranges:
            if lo <= code <= hi:
                return _uni((base + code - lo).to_bytes(width, "big"))
        return default

    def __contains__(self, code: int) -> bool:
        return self.get(code) is not None

    def __getitem__(self, code: int) -> str:
        got = self.get(code)
        if got is None:
            raise KeyError(code)
        return got

    def __bool__(self) -> bool:
        return bool(self.chars) or bool(self.ranges)


def parse_tounicode(data: bytes) -> CMap:
    """Parse a /ToUnicode CMap stream: ``bfchar`` pairs and ``bfrange``
    runs (both the increment form and the per-code array form).  The
    CMap bodies are PDF-object-grammar tokens (hex strings, arrays), so
    the object lexer parses them directly."""
    chars: dict[int, str] = {}
    ranges: list[tuple[int, int, int, int]] = []

    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.S):
        lex = _Lexer(m.group(1))
        try:
            while True:
                src = lex.parse()
                dst = lex.parse()
                if isinstance(src, bytes) and isinstance(dst, bytes):
                    chars[int.from_bytes(src, "big")] = _uni(dst)
        except PDFSyntaxError:
            pass
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.S):
        lex = _Lexer(m.group(1))
        try:
            while True:
                lo = lex.parse()
                hi = lex.parse()
                dst = lex.parse()
                if not (isinstance(lo, bytes) and isinstance(hi, bytes)):
                    continue
                lo_i, hi_i = int.from_bytes(lo, "big"), int.from_bytes(hi, "big")
                if hi_i < lo_i or hi_i - lo_i > 0x10FFFF:  # malformed guard
                    continue
                if isinstance(dst, list):
                    for k, d in enumerate(dst):
                        if isinstance(d, bytes):
                            chars[lo_i + k] = _uni(d)
                elif isinstance(dst, bytes):
                    ranges.append(
                        (lo_i, hi_i, int.from_bytes(dst, "big"), max(2, len(dst)))
                    )
        except PDFSyntaxError:
            pass
    return CMap(chars, ranges)


# per-worker-process memo: fonts repeat across documents from the same
# producer, and a ToUnicode stream's raw bytes key its parsed CMap
_CMAP_CACHE: dict[bytes, CMap] = {}


def parse_cmap_codespaces(data: bytes) -> list[tuple[int, int, int]]:
    """Parse the ``begincodespacerange`` blocks of an embedded CMap
    stream (a Type0 font's non-Identity /Encoding): returns (nbytes,
    lo, hi) tuples sorted by code width, the information needed to
    split a show string into variable-length character codes (PDF 32000
    §9.7.6.2 — code length is decided by which codespace range the
    leading bytes fall in)."""
    spaces: list[tuple[int, int, int]] = []
    for m in re.finditer(
        rb"begincodespacerange(.*?)endcodespacerange", data, re.S
    ):
        lex = _Lexer(m.group(1))
        try:
            while True:
                lo = lex.parse()
                hi = lex.parse()
                if isinstance(lo, bytes) and isinstance(hi, bytes) and lo:
                    spaces.append(
                        (
                            len(lo),
                            int.from_bytes(lo, "big"),
                            int.from_bytes(hi, "big"),
                        )
                    )
        except PDFSyntaxError:
            pass
    return sorted(spaces)


_CODESPACE_CACHE: dict[bytes, list[tuple[int, int, int]]] = {}


def _cached_codespaces(raw: bytes, decode) -> list[tuple[int, int, int]]:
    got = _CODESPACE_CACHE.get(raw)
    if got is None:
        got = _CODESPACE_CACHE[raw] = parse_cmap_codespaces(decode())
    return got


# ---- symbolic TrueType: sfnt cmap (format 4) + post (2.0) names ----------


def _sfnt_tables(data: bytes) -> dict[bytes, bytes]:
    import struct

    if len(data) < 12:
        return {}
    (num_tables,) = struct.unpack(">H", data[4:6])
    out: dict[bytes, bytes] = {}
    for i in range(num_tables):
        rec = data[12 + 16 * i : 28 + 16 * i]
        if len(rec) < 16:
            break
        tag = rec[0:4]
        offset, length = struct.unpack(">II", rec[8:16])
        out[tag] = data[offset : offset + length]
    return out


def _cmap_format4_to_glyphs(sub: bytes) -> dict[int, int]:
    """Parse a format-4 cmap subtable into code -> glyph id (both the
    idDelta and idRangeOffset/glyphIdArray segment forms)."""
    import struct

    (seg_x2,) = struct.unpack(">H", sub[6:8])
    seg = seg_x2 // 2
    ends = struct.unpack(f">{seg}H", sub[14 : 14 + seg_x2])
    base = 16 + seg_x2
    starts = struct.unpack(f">{seg}H", sub[base : base + seg_x2])
    base += seg_x2
    deltas = struct.unpack(f">{seg}h", sub[base : base + seg_x2])
    base += seg_x2
    offsets = struct.unpack(f">{seg}H", sub[base : base + seg_x2])
    offsets_pos = base  # byte position of idRangeOffset[0] within sub
    out: dict[int, int] = {}
    for i in range(seg):
        if starts[i] == 0xFFFF:
            continue
        for c in range(starts[i], ends[i] + 1):
            if offsets[i] == 0:
                g = (c + deltas[i]) & 0xFFFF
            else:
                pos = offsets_pos + 2 * i + offsets[i] + 2 * (c - starts[i])
                if pos + 2 > len(sub):
                    continue
                (g,) = struct.unpack(">H", sub[pos : pos + 2])
                if g:
                    g = (g + deltas[i]) & 0xFFFF
            if g:
                out[c] = g
    return out


def _post2_names(post: bytes) -> dict[int, str]:
    """Glyph id -> name from a post 2.0 table.  Standard-order indices
    (< 258) are left unnamed — the fixture writer emits custom indices
    only; real fonts using the Mac standard order carry ASCII glyphs a
    symbolic font wouldn't rename anyway."""
    import struct

    if len(post) < 34 or struct.unpack(">I", post[0:4])[0] != 0x00020000:
        return {}
    (n,) = struct.unpack(">H", post[32:34])
    idx = struct.unpack(f">{n}H", post[34 : 34 + 2 * n])
    names: list[str] = []
    pos = 34 + 2 * n
    while pos < len(post):
        ln = post[pos]
        names.append(post[pos + 1 : pos + 1 + ln].decode("latin-1"))
        pos += 1 + ln
    out: dict[int, str] = {}
    for g, ix in enumerate(idx):
        if ix >= 258 and ix - 258 < len(names):
            out[g] = names[ix - 258]
    return out


def parse_truetype_unicode_map(data: bytes) -> CMap:
    """code -> unicode for a symbolic TrueType font program: the (3,0)
    — or (3,1)/(1,0) fallback — format-4 cmap gives code -> glyph id,
    the post 2.0 table names each glyph, and the standard glyph-name
    table resolves unicode.  Codes on the 0xF000 symbol page fold back
    to their low byte (the single-byte show codes)."""
    import struct

    tables = _sfnt_tables(data)
    cmap_tbl = tables.get(b"cmap")
    post_tbl = tables.get(b"post")
    if not cmap_tbl or not post_tbl:
        return CMap({}, [])
    (n_enc,) = struct.unpack(">H", cmap_tbl[2:4])
    recs = {}
    for i in range(n_enc):
        pid, eid, off = struct.unpack(
            ">HHI", cmap_tbl[4 + 8 * i : 12 + 8 * i]
        )
        recs[(pid, eid)] = off
    off = recs.get((3, 0), recs.get((3, 1), recs.get((1, 0))))
    if off is None or off + 8 > len(cmap_tbl):
        return CMap({}, [])
    sub = cmap_tbl[off:]
    (fmt,) = struct.unpack(">H", sub[0:2])
    if fmt != 4:
        return CMap({}, [])
    code_to_glyph = _cmap_format4_to_glyphs(sub)
    glyph_names = _post2_names(post_tbl)
    chars: dict[int, str] = {}
    for code, g in code_to_glyph.items():
        name = glyph_names.get(g)
        uni = glyph_to_unicode(name) if name else None
        if uni is None:
            continue
        b = code & 0xFF if 0xF000 <= code <= 0xF0FF else code
        if b <= 0xFF:
            chars[b] = uni
    return CMap(chars, [])


_TRUETYPE_CACHE: dict[bytes, CMap] = {}


def _cached_truetype(raw: bytes, decode) -> CMap:
    got = _TRUETYPE_CACHE.get(raw)
    if got is None:
        try:
            got = parse_truetype_unicode_map(decode())
        except Exception:  # malformed font program: no usable map
            got = CMap({}, [])
        _TRUETYPE_CACHE[raw] = got
    return got


# ---- embedded Type1 font programs: /Encoding from the cleartext dict -----

_T1_DUP_PUT_RE = re.compile(rb"dup\s+(\d+)\s*/([^\s/\[\]{}()<>]+)\s+put")


def parse_type1_encoding_map(data: bytes) -> CMap:
    """Extract the code->glyph-name /Encoding assignment from an
    embedded Type1 font program (FontDescriptor /FontFile) and resolve
    it to code->unicode through the standard glyph list.

    The encoding always lives in the program's PUBLIC dict — the
    cleartext PostScript before ``eexec`` — either as ``/Encoding
    StandardEncoding def`` or as an array built by ``dup <code>
    /<glyph> put`` entries, so no eexec decryption is needed.  PFB
    segmented programs (0x80-type block headers) are de-framed first.
    Symbolic Type1 fonts carry NO /Encoding dict entry in the PDF —
    this table is their only decode source (the residual real-crawl
    hazard pdfplumber covers via its T1 parser; reference
    requirements.txt:6, VERDICT r03 'What's missing' #2)."""
    head = data
    if data[:1] == b"\x80":  # PFB framing: de-segment the ASCII blocks
        parts = []
        pos = 0
        while pos + 6 <= len(data) and data[pos] == 0x80:
            typ = data[pos + 1]
            ln = int.from_bytes(data[pos + 2 : pos + 6], "little")
            if typ == 3:
                break
            if typ == 1:
                parts.append(data[pos + 6 : pos + 6 + ln])
            pos += 6 + ln
        head = b"".join(parts)
    idx = head.find(b"eexec")
    if idx >= 0:
        head = head[:idx]
    enc_at = head.find(b"/Encoding")
    if enc_at < 0:
        return CMap({}, [])
    if re.match(
        rb"/Encoding\s+StandardEncoding\s+def", head[enc_at : enc_at + 40]
    ):
        # StandardEncoding ≈ the ASCII half of the standard glyph list;
        # our GLYPH_TO_UNICODE table already encodes exactly that
        return CMap(
            {0x20 + i: glyph_to_unicode(n) for i, n in enumerate(_ASCII_GLYPHS)},
            [],
        )
    chars: dict[int, str] = {}
    for m in _T1_DUP_PUT_RE.finditer(head[enc_at:]):
        uni = glyph_to_unicode(m.group(2).decode("latin-1"))
        if uni is not None:
            chars[int(m.group(1))] = uni
    return CMap(chars, [])


_TYPE1_CACHE: dict[bytes, CMap] = {}


def _cached_type1(raw: bytes, decode) -> CMap:
    got = _TYPE1_CACHE.get(raw)
    if got is None:
        try:
            got = parse_type1_encoding_map(decode())
        except Exception:  # malformed font program: no usable map
            got = CMap({}, [])
        _TYPE1_CACHE[raw] = got
    return got
_CMAP_CACHE_MAX = 256


def _cached_tounicode(raw: bytes, decode) -> CMap:
    """``decode`` is a thunk so a cache hit skips the stream
    decompression too, not just the CMap parse — the memo is on the
    extraction hot path (fonts repeat per page and per producer)."""
    got = _CMAP_CACHE.get(raw)
    if got is None:
        if len(_CMAP_CACHE) >= _CMAP_CACHE_MAX:
            _CMAP_CACHE.clear()
        got = _CMAP_CACHE[raw] = parse_tounicode(decode())
    return got


# glyph-name -> unicode for /Differences arrays: ASCII + Latin-1 built
# from their standard-encoding name sequences, WinAnsi extras hardcoded,
# plus the uniXXXX / uXXXX[XX] naming conventions resolved on demand
_ASCII_GLYPHS = (
    "space exclam quotedbl numbersign dollar percent ampersand quotesingle "
    "parenleft parenright asterisk plus comma hyphen period slash "
    "zero one two three four five six seven eight nine "
    "colon semicolon less equal greater question at "
    "A B C D E F G H I J K L M N O P Q R S T U V W X Y Z "
    "bracketleft backslash bracketright asciicircum underscore grave "
    "a b c d e f g h i j k l m n o p q r s t u v w x y z "
    "braceleft bar braceright asciitilde"
).split()
_LATIN1_GLYPHS = (
    "exclamdown cent sterling currency yen brokenbar section dieresis "
    "copyright ordfeminine guillemotleft logicalnot hyphen registered macron "
    "degree plusminus twosuperior threesuperior acute mu paragraph "
    "periodcentered cedilla onesuperior ordmasculine guillemotright "
    "onequarter onehalf threequarters questiondown "
    "Agrave Aacute Acircumflex Atilde Adieresis Aring AE Ccedilla "
    "Egrave Eacute Ecircumflex Edieresis Igrave Iacute Icircumflex Idieresis "
    "Eth Ntilde Ograve Oacute Ocircumflex Otilde Odieresis multiply Oslash "
    "Ugrave Uacute Ucircumflex Udieresis Yacute Thorn germandbls "
    "agrave aacute acircumflex atilde adieresis aring ae ccedilla "
    "egrave eacute ecircumflex edieresis igrave iacute icircumflex idieresis "
    "eth ntilde ograve oacute ocircumflex otilde odieresis divide oslash "
    "ugrave uacute ucircumflex udieresis yacute thorn ydieresis"
).split()
GLYPH_TO_UNICODE: dict[str, str] = {}
for _i, _n in enumerate(_ASCII_GLYPHS):
    GLYPH_TO_UNICODE.setdefault(_n, chr(0x20 + _i))
for _i, _n in enumerate(_LATIN1_GLYPHS):
    GLYPH_TO_UNICODE.setdefault(_n, chr(0xA1 + _i))
GLYPH_TO_UNICODE.update(
    {
        "Euro": "€", "quotesinglbase": "‚", "florin": "ƒ",
        "quotedblbase": "„", "ellipsis": "…", "dagger": "†",
        "daggerdbl": "‡", "circumflex": "ˆ", "perthousand": "‰",
        "Scaron": "Š", "guilsinglleft": "‹", "OE": "Œ",
        "Zcaron": "Ž", "quoteleft": "‘", "quoteright": "’",
        "quotedblleft": "“", "quotedblright": "”", "bullet": "•",
        "endash": "–", "emdash": "—", "tilde": "˜",
        "trademark": "™", "scaron": "š", "guilsinglright": "›",
        "oe": "œ", "zcaron": "ž", "Ydieresis": "Ÿ",
        "nbspace": " ", "minus": "−", "fi": "ﬁ", "fl": "ﬂ",
    }
)


def glyph_to_unicode(name: str) -> str | None:
    got = GLYPH_TO_UNICODE.get(name)
    if got is not None:
        return got
    if name.startswith("uni") and len(name) >= 7:
        try:
            return chr(int(name[3:7], 16))
        except ValueError:
            return None
    if name.startswith("u") and len(name) in (5, 6, 7):
        try:
            return chr(int(name[1:], 16))
        except ValueError:
            return None
    return None


#: named simple-font base encodings -> Python codec.  The default decode
#: is latin-1; WinAnsi (cp1252) differs in 0x80-0x9F (smart quotes,
#: dashes, Euro — ubiquitous in real-world statements) and MacRoman
#: differs across the whole high half, so both get explicit code->char
#: maps layered under any /Differences.
_BASE_ENCODING_CODECS = {
    "WinAnsiEncoding": "cp1252",
    "MacRomanEncoding": "mac_roman",
}
_BASE_ENCODING_CACHE: dict[str, CMap | None] = {}


def _base_encoding_cmap(name: str) -> CMap | None:
    if name not in _BASE_ENCODING_CACHE:
        codec = _BASE_ENCODING_CODECS.get(name)
        cmap = None
        if codec is not None:
            chars: dict[int, str] = {}
            for code in range(0x80, 0x100):
                try:
                    chars[code] = bytes([code]).decode(codec)
                except UnicodeDecodeError:
                    pass  # cp1252 leaves 0x81/0x8D/0x8F/0x90/0x9D undefined
            cmap = CMap(chars, [])
        _BASE_ENCODING_CACHE[name] = cmap
    return _BASE_ENCODING_CACHE[name]


def _differences_cmap(diffs: list) -> CMap:
    """An /Encoding /Differences array ([code /name /name code /name …])
    as a CMap: explicit code->unicode entries where the glyph name is
    known; unknown names fall back to latin-1 at decode time."""
    chars: dict[int, str] = {}
    code = 0
    for item in diffs:
        if isinstance(item, (int, float)):
            code = int(item)
        elif isinstance(item, Name):
            uni = glyph_to_unicode(str(item))
            if uni is not None:
                chars[code] = uni
            code += 1
    return CMap(chars, [])


def _latin1_fallback(err: UnicodeError) -> tuple[str, int]:
    """Codec error handler: undefined codes (e.g. cp1252 0x81) pass
    through as latin-1, matching the cmap-miss fallback."""
    return err.object[err.start : err.end].decode("latin-1"), err.end


codecs.register_error("pdfparse_latin1", _latin1_fallback)


@dataclass
class FontInfo:
    """What the interpreter needs per font: code width + unicode map."""

    two_byte: bool = False  # Type0/Identity-H composite font
    # Type0 with an embedded (non-Identity) /Encoding CMap: codespace
    # ranges (nbytes, lo, hi) sorted by width — shows split into
    # variable-length codes, each mapped through the ToUnicode cmap
    codespaces: "list[tuple[int, int, int]] | None" = None
    cmap: CMap | None = None
    # pure named base encoding (no /Differences): decode through the
    # Python codec at C speed instead of a per-byte cmap walk — the
    # common real-world case (/Encoding /WinAnsiEncoding on every font)
    codec: str | None = None
    # lazily-built 256-entry code->str table for single-byte cmapped
    # fonts (Differences remaps), one C-speed list lookup per glyph
    _table: list[str] | None = None

    def decode(self, raw: bytes) -> str:
        if self.codespaces is not None:
            out = []
            cmap = self.cmap
            i = 0
            n = len(raw)
            while i < n:
                for nb, lo, hi in self.codespaces:  # shortest width first
                    if i + nb <= n:
                        code = int.from_bytes(raw[i : i + nb], "big")
                        if lo <= code <= hi:
                            mapped = (
                                cmap.get(code) if cmap is not None else None
                            )
                            out.append(
                                mapped if mapped is not None else chr(code)
                            )
                            i += nb
                            break
                else:
                    i += 1  # byte outside every codespace: skip it
            return "".join(out)
        if self.two_byte:
            out = []
            cmap = self.cmap
            for i in range(0, len(raw) - 1, 2):
                code = raw[i] << 8 | raw[i + 1]
                mapped = cmap.get(code) if cmap is not None else None
                out.append(mapped if mapped is not None else chr(code))
            return "".join(out)
        if self.codec is not None:
            return raw.decode(self.codec, "pdfparse_latin1")
        if self.cmap:
            table = self._table
            if table is None:
                get = self.cmap.get
                table = self._table = [
                    (lambda m, b: m if m is not None else chr(b))(get(b), b)
                    for b in range(256)
                ]
            return "".join(map(table.__getitem__, raw))
        return raw.decode("latin-1")


_DEFAULT_FONT = FontInfo()


def _page_resources(doc: "PDFDocument", page: dict) -> dict:
    """The page's resolved /Resources dict; may be inherited from an
    ancestor /Pages node (walk /Parent)."""
    node: Any = page
    res: Any = None
    for _ in range(8):
        if not isinstance(node, dict):
            break
        res = doc.resolve(node.get("Resources"))
        if isinstance(res, dict) and (
            res.get("Font") is not None or res.get("XObject") is not None
        ):
            break
        node = doc.resolve(node.get("Parent"))
    return res if isinstance(res, dict) else {}


def _form_xobjects(
    doc: "PDFDocument", res: dict, depth: int = 0
) -> "dict[str, FormXObject]":
    """Name -> FormXObject for every /Subtype /Form entry in the
    resource dict's /XObject (recursing into each form's own resources,
    capped so reference cycles can't loop)."""
    if depth > 4 or not isinstance(res, dict):
        return {}
    xdict = doc.resolve(res.get("XObject"))
    if not isinstance(xdict, dict):
        return {}
    out: dict[str, FormXObject] = {}
    for name, ref in xdict.items():
        xo = doc.resolve(ref)
        if not isinstance(xo, Stream):
            continue
        if str(doc.resolve(xo.attrs.get("Subtype", ""))) != "Form":
            continue
        xres = doc.resolve(xo.attrs.get("Resources"))
        xres = xres if isinstance(xres, dict) else res  # inherit caller's
        matrix = doc.resolve(xo.attrs.get("Matrix"))
        mat: Matrix | None = None
        if isinstance(matrix, list) and len(matrix) == 6:
            try:
                mat = tuple(float(v) for v in matrix)  # type: ignore[assignment]
            except (TypeError, ValueError):
                mat = None
        try:
            content = xo.data(doc)
        except (PDFSyntaxError, ValueError, zlib.error):
            continue
        out[str(name)] = FormXObject(
            content=content,
            fonts=_fonts_from_resources(doc, xres),
            xobjects=_form_xobjects(doc, xres, depth + 1),
            matrix=mat,
        )
    return out


def _page_fonts(doc: "PDFDocument", page: dict) -> dict[str, FontInfo]:
    """Font name -> FontInfo for a page (inherited /Resources)."""
    return _fonts_from_resources(doc, _page_resources(doc, page))


def _fonts_from_resources(doc: "PDFDocument", res: dict) -> dict[str, FontInfo]:
    if not isinstance(res, dict):
        return {}
    fonts = doc.resolve(res.get("Font"))
    if not isinstance(fonts, dict):
        return {}
    out: dict[str, FontInfo] = {}
    for name, fref in fonts.items():
        fd = doc.resolve(fref)
        if not isinstance(fd, dict):
            continue
        two = str(doc.resolve(fd.get("Subtype", ""))) == "Type0"
        codespaces = None
        if two:
            # non-Identity composite encoding: an embedded CMap stream
            # whose codespace ranges drive variable-length code splits
            enc0 = doc.resolve(fd.get("Encoding"))
            if isinstance(enc0, Stream):
                try:
                    codespaces = _cached_codespaces(
                        enc0.raw, lambda: enc0.data(doc)
                    ) or None
                except (PDFSyntaxError, ValueError, zlib.error):
                    codespaces = None
                if codespaces:
                    two = False  # the codespace decode replaces fixed-2-byte
        cmap = None
        tu = doc.resolve(fd.get("ToUnicode"))
        if isinstance(tu, Stream):
            try:
                cmap = _cached_tounicode(tu.raw, lambda: tu.data(doc))
            except (PDFSyntaxError, ValueError, zlib.error):
                cmap = None
        codec = None
        if cmap is None and not two:
            # simple-font /Encoding: named base encoding (decoded via
            # its Python codec, C speed), and/or a /Differences remap
            # layered over /BaseEncoding
            enc = doc.resolve(fd.get("Encoding"))
            if isinstance(enc, Name):
                codec = _BASE_ENCODING_CODECS.get(str(enc))
            elif isinstance(enc, dict):
                base = doc.resolve(enc.get("BaseEncoding"))
                diffs = doc.resolve(enc.get("Differences"))
                if isinstance(diffs, list):
                    cmap = _differences_cmap(diffs)
                    base_cmap = (
                        _base_encoding_cmap(str(base))
                        if isinstance(base, Name)
                        else None
                    )
                    if base_cmap is not None:
                        # differences win; base fills the rest
                        merged = dict(base_cmap.chars)
                        merged.update(cmap.chars)
                        cmap = CMap(merged, cmap.ranges)
                elif isinstance(base, Name):
                    codec = _BASE_ENCODING_CODECS.get(str(base))
        if cmap is None and codec is None and not two:
            # symbolic TrueType: no ToUnicode, no /Encoding — the
            # embedded font program's (3,0) cmap + post names are the
            # only decode source (Flags bit 3 marks symbolic)
            subtype = str(doc.resolve(fd.get("Subtype", "")))
            if subtype == "TrueType":
                fdesc = doc.resolve(fd.get("FontDescriptor"))
                if isinstance(fdesc, dict):
                    flags = doc.resolve(fdesc.get("Flags", 0))
                    ff2 = doc.resolve(fdesc.get("FontFile2"))
                    if (
                        isinstance(flags, (int, float))
                        and int(flags) & 4
                        and isinstance(ff2, Stream)
                    ):
                        got = _cached_truetype(ff2.raw, lambda: ff2.data(doc))
                        if got:
                            cmap = got
            elif subtype in ("Type1", "MMType1"):
                # symbolic Type1: no ToUnicode, no /Encoding dict — the
                # embedded program's cleartext /Encoding array is the
                # only decode source
                fdesc = doc.resolve(fd.get("FontDescriptor"))
                if isinstance(fdesc, dict):
                    ff = doc.resolve(fdesc.get("FontFile"))
                    if isinstance(ff, Stream):
                        got = _cached_type1(ff.raw, lambda: ff.data(doc))
                        if got:
                            cmap = got
        out[str(name)] = FontInfo(
            two_byte=two, codespaces=codespaces, cmap=cmap, codec=codec
        )
    return out


# --------------------------------------------------------------------------
# content-stream interpretation
# --------------------------------------------------------------------------

Matrix = tuple[float, float, float, float, float, float]
_IDENTITY: Matrix = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _mat_mul(a: Matrix, b: Matrix) -> Matrix:
    """a then b (row-vector convention: p' = p · a · b)."""
    a0, a1, a2, a3, a4, a5 = a
    b0, b1, b2, b3, b4, b5 = b
    return (
        a0 * b0 + a1 * b2,
        a0 * b1 + a1 * b3,
        a2 * b0 + a3 * b2,
        a2 * b1 + a3 * b3,
        a4 * b0 + a5 * b2 + b4,
        a4 * b1 + a5 * b3 + b5,
    )


def _translate(tx: float, ty: float) -> Matrix:
    return (1.0, 0.0, 0.0, 1.0, tx, ty)


@dataclass
class TextRun:
    x: float
    y: float
    text: str
    size: float
    # the actual pen advance applied when the run was shown (reflects
    # char/word spacing and horizontal scaling); None -> estimate
    width: "float | None" = None


@dataclass
class FormXObject:
    """A /Subtype /Form XObject prepared for interpretation: decoded
    content plus its own resource scope (fonts, nested forms, /Matrix)."""

    content: bytes
    fonts: "dict[str, FontInfo]"
    xobjects: "dict[str, FormXObject]"
    matrix: "Matrix | None"


_OP_RE = re.compile(rb"[A-Za-z'\"][A-Za-z0-9*'\"]*")

_PDF_WS = b"\x00\t\n\x0c\r "
_PDF_DELIM = b"\x00\t\n\x0c\r ()<>[]{}/%"


def _skip_inline_image(content: bytes, lex: "_Lexer") -> int:
    """Advance past a ``BI … ID <binary> EI`` inline image; ``lex.pos``
    sits just after the ``BI`` token on entry.  Returns the position
    just after the terminating ``EI``.

    The parameter dict is parsed as key/value pairs so a declared
    ``/L`` (or ``/Length``) byte count can be honored — the only fully
    reliable terminator for compressed sample data.  Without one, the
    scan accepts an ``EI`` only when it is preceded by PDF whitespace
    and followed by whitespace, a delimiter, or EOF, which is how
    real-world readers disambiguate the payload bytes ``EI`` from the
    closing operator."""
    n = len(content)
    params: dict[str, Any] = {}
    while lex.pos < n:
        lex._skip_ws()
        m = _OP_RE.match(content, lex.pos)
        if m and m.group(0) == b"ID":
            lex.pos = m.end()
            break
        try:
            key = lex.parse()
            val = lex.parse()
        except PDFSyntaxError:
            lex.pos += 1
            continue
        if isinstance(key, Name):
            params[str(key)] = val
    else:
        return n
    pos = min(lex.pos + 1, n)  # exactly one whitespace byte after ID
    length = params.get("L", params.get("Length"))
    if isinstance(length, (int, float)) and int(length) >= 0:
        pos += int(length)
        end = content.find(b"EI", pos)
        return n if end < 0 else end + 2
    while True:
        end = content.find(b"EI", pos)
        if end < 0:
            return n
        before_ok = end > 0 and content[end - 1] in _PDF_WS
        after = content[end + 2 : end + 3]
        if before_ok and (after == b"" or after[0] in _PDF_DELIM):
            return end + 2
        pos = end + 2

# average glyph width as a fraction of font size — used only to advance
# the pen between consecutive shows on one line (ordering, not metrics)
_AVG_GLYPH_W = 0.5


class _ContentInterpreter:
    def __init__(
        self,
        fonts: dict[str, FontInfo] | None = None,
        xobjects: "dict[str, FormXObject] | None" = None,
        base_ctm: Matrix | None = None,
    ) -> None:
        self.runs: list[TextRun] = []
        # base_ctm seeds device space (e.g. the /Rotate derotation); cm
        # multiplies onto it, q/Q save/restore above it
        self.ctm: Matrix = base_ctm if base_ctm is not None else _IDENTITY
        self._gs_stack: list[Matrix] = []
        self.tm: Matrix = _IDENTITY
        self.tlm: Matrix = _IDENTITY
        self.leading = 0.0
        self.size = 0.0
        self.fonts = fonts or {}
        self.font: FontInfo = _DEFAULT_FONT
        self.xobjects = xobjects or {}
        self._do_depth = 0
        # text state affecting pen advance (PDF 9.3): char spacing (Tc),
        # word spacing (Tw), horizontal scaling (Tz, stored as /100)
        self.char_spacing = 0.0
        self.word_spacing = 0.0
        self.hscale = 1.0

    def _do_form(self, name: str) -> None:
        """Execute a /Subtype /Form XObject (PDF §8.10.1: Do saves the
        graphics state, concatenates /Matrix, paints the form's content,
        restores).  Text inside forms is how many real producers emit
        headers/footers/entire pages."""
        xo = self.xobjects.get(name)
        if xo is None or self._do_depth >= 4:
            return
        saved = (
            self.ctm, self.tm, self.tlm, self.leading, self.size,
            self.font, self.fonts, self.xobjects,
            self.char_spacing, self.word_spacing, self.hscale,
        )
        # isolate the graphics-state stack too: a stray unbalanced Q
        # inside the form must not pop the PAGE's saved entries (nor a
        # stray q leave extras behind) — restore the stack wholesale
        saved_gs = list(self._gs_stack)
        if xo.matrix is not None:
            self.ctm = _mat_mul(xo.matrix, self.ctm)
        self.fonts = xo.fonts or self.fonts
        self.xobjects = xo.xobjects
        self._do_depth += 1
        try:
            self.run(xo.content)
        except Exception:
            pass
        self._do_depth -= 1
        self._gs_stack[:] = saved_gs
        (
            self.ctm, self.tm, self.tlm, self.leading, self.size,
            self.font, self.fonts, self.xobjects,
            self.char_spacing, self.word_spacing, self.hscale,
        ) = saved

    def run(self, content: bytes) -> None:
        lex = _Lexer(content)
        operands: list[Any] = []
        n = len(content)
        while True:
            lex._skip_ws()
            if lex.pos >= n:
                break
            c = content[lex.pos]
            if (
                c in b"(<[/+-."
                or 0x30 <= c <= 0x39
                or content.startswith(b"true", lex.pos)
                or content.startswith(b"false", lex.pos)
                or content.startswith(b"null", lex.pos)
            ):
                try:
                    operands.append(lex.parse())
                except PDFSyntaxError:
                    lex.pos += 1
                continue
            m = _OP_RE.match(content, lex.pos)
            if not m:
                lex.pos += 1
                continue
            op = m.group(0)
            lex.pos = m.end()
            if op == b"BI":
                # inline image (PDF 32000 §8.9.7): parse the parameter
                # dict up to ID, then skip the binary payload.  A bare
                # find(b"EI") is wrong — the two bytes "EI" routinely
                # occur INSIDE image sample data — so honor /L (the
                # inline-image /Length synonym) when present, else scan
                # for an EI that is whitespace-preceded and followed by
                # whitespace / a delimiter / EOF.
                lex.pos = _skip_inline_image(content, lex)
                operands = []
                continue
            self._apply(op, operands)
            operands = []

    # -- operator dispatch ----------------------------------------------

    def _apply(self, op: bytes, args: list[Any]) -> None:
        try:
            if op == b"q":
                self._gs_stack.append(self.ctm)
            elif op == b"Q":
                if self._gs_stack:
                    self.ctm = self._gs_stack.pop()
            elif op == b"Do" and args and isinstance(args[-1], str):
                self._do_form(str(args[-1]))
            elif op == b"cm" and len(args) >= 6:
                self.ctm = _mat_mul(tuple(float(v) for v in args[-6:]), self.ctm)
            elif op == b"BT":
                self.tm = self.tlm = _IDENTITY
            elif op == b"ET":
                pass
            elif op == b"Tf" and len(args) >= 1:
                self.size = float(args[-1])
                if len(args) >= 2 and isinstance(args[-2], Name):
                    self.font = self.fonts.get(str(args[-2]), _DEFAULT_FONT)
            elif op == b"TL" and args:
                self.leading = float(args[-1])
            elif op == b"Tc" and args:
                self.char_spacing = float(args[-1])
            elif op == b"Tw" and args:
                self.word_spacing = float(args[-1])
            elif op == b"Tz" and args:
                self.hscale = float(args[-1]) / 100.0
            elif op == b"Td" and len(args) >= 2:
                self._td(float(args[-2]), float(args[-1]))
            elif op == b"TD" and len(args) >= 2:
                self.leading = -float(args[-1])
                self._td(float(args[-2]), float(args[-1]))
            elif op == b"Tm" and len(args) >= 6:
                self.tm = self.tlm = tuple(float(v) for v in args[-6:])
            elif op == b"T*":
                self._td(0.0, -self.leading)
            elif op == b"Tj" and args:
                self._show(args[-1])
            elif op == b"'" and args:
                self._td(0.0, -self.leading)
                self._show(args[-1])
            elif op == b'"' and len(args) >= 3:
                # aw ac string " : set word/char spacing, next line, show
                # (PDF §9.4.3) — spacing must update BEFORE the show so
                # the recorded run width and pen advance use it
                try:
                    self.word_spacing = float(args[-3])
                    self.char_spacing = float(args[-2])
                except (TypeError, ValueError):
                    pass
                self._td(0.0, -self.leading)
                self._show(args[-1])
            elif op == b"TJ" and args:
                arr = args[-1]
                if isinstance(arr, list):
                    # per-element shows with the numeric kerning applied
                    # between them: a large negative adjustment is how
                    # real producers encode inter-word spacing, and the
                    # gap it creates is what assemble_lines turns into a
                    # space (x_tolerance, pdfplumber semantics); small
                    # kerning stays below tolerance and concatenates
                    for e in arr:
                        if isinstance(e, (bytes, bytearray)):
                            self._show(bytes(e))
                        elif isinstance(e, (int, float)):
                            adv = (
                                -float(e) / 1000.0 * (self.size or 12.0)
                                * self.hscale
                            )
                            self.tm = _mat_mul(_translate(adv, 0.0), self.tm)
        except (TypeError, ValueError):
            pass

    def _td(self, tx: float, ty: float) -> None:
        self.tlm = _mat_mul(_translate(tx, ty), self.tlm)
        self.tm = self.tlm

    def _show(self, raw: Any) -> None:
        if not isinstance(raw, (bytes, bytearray)):
            return
        text = self.font.decode(bytes(raw))
        if not text:
            return
        dev = _mat_mul(self.tm, self.ctm)
        # advance the pen by an approximate width so consecutive shows on
        # one baseline keep their x-order; the run records the same
        # advance so line assembly measures gaps from true pen positions
        width = (
            len(text) * (self.size or 12.0) * _AVG_GLYPH_W
            + len(text) * self.char_spacing
            + text.count(" ") * self.word_spacing
        ) * self.hscale
        self.runs.append(
            TextRun(x=dev[4], y=dev[5], text=text, size=self.size, width=width)
        )
        self.tm = _mat_mul(_translate(width, 0.0), self.tm)


def _page_content(doc: PDFDocument, page: dict) -> bytes:
    contents = doc.resolve(page.get("Contents"))
    parts: list[bytes] = []
    if isinstance(contents, Stream):
        parts.append(contents.data(doc))
    elif isinstance(contents, list):
        for c in contents:
            c = doc.resolve(c)
            if isinstance(c, Stream):
                parts.append(c.data(doc))
    return b"\n".join(parts)


def assemble_lines(
    runs: list[TextRun],
    x_tolerance: float = X_TOLERANCE,
    y_tolerance: float = Y_TOLERANCE,
) -> str:
    """Text runs -> page text: cluster into lines by y (tolerance 3),
    order within a line by x, join runs with a single space when they are
    separated by more than x_tolerance, lines top-down joined with \\n.
    Mirrors the reference's extraction tolerances (base.py:31) at run
    granularity."""
    if not runs:
        return ""
    ordered = sorted(runs, key=lambda r: (-r.y, r.x))
    lines: list[list[TextRun]] = []
    current: list[TextRun] = [ordered[0]]
    anchor_y = ordered[0].y
    for r in ordered[1:]:
        if anchor_y - r.y > y_tolerance:
            lines.append(current)
            current = [r]
            anchor_y = r.y
        else:
            current.append(r)
    lines.append(current)

    out_lines: list[str] = []
    for line in lines:
        line.sort(key=lambda r: r.x)
        pieces: list[str] = []
        pen_x: float | None = None
        for r in line:
            if pen_x is None:
                pieces.append(r.text)
            elif r.x - pen_x > x_tolerance:
                pieces.append(" ")
                pieces.append(r.text)
            else:
                pieces.append(r.text)
            pen_x = r.x + (
                r.width
                if r.width is not None
                else len(r.text) * (r.size or 12.0) * _AVG_GLYPH_W
            )
        out_lines.append("".join(pieces))
    return "\n".join(out_lines)


def _page_attr(doc: "PDFDocument", page: dict, key: str) -> Any:
    """Resolve an inheritable page attribute (/Rotate, /MediaBox) by
    walking /Parent (PDF §7.7.3.4)."""
    node: Any = page
    for _ in range(8):
        if not isinstance(node, dict):
            break
        v = doc.resolve(node.get(key))
        if v is not None:
            return v
        node = doc.resolve(node.get("Parent"))
    return None


def _rotation_ctm(doc: "PDFDocument", page: dict) -> Matrix:
    """Base CTM undoing the page's /Rotate so text runs come out in
    reader orientation (a 90/180/270 viewer rotation would otherwise
    turn columns into rows for the y-then-x line assembler); identity
    for unrotated pages."""
    try:
        rot = int(_page_attr(doc, page, "Rotate") or 0) % 360
    except (TypeError, ValueError):
        return _IDENTITY
    if rot not in (90, 180, 270):
        return _IDENTITY
    box = _page_attr(doc, page, "MediaBox")
    try:
        x0, y0, x1, y1 = (float(doc.resolve(v)) for v in box)
        w, h = x1 - x0, y1 - y0
    except (TypeError, ValueError):
        w, h = 612.0, 792.0  # letter default
    if rot == 90:  # viewer rotates CW: reader = (y, w - x)
        return (0.0, -1.0, 1.0, 0.0, 0.0, w)
    if rot == 180:  # reader = (w - x, h - y)
        return (-1.0, 0.0, 0.0, -1.0, w, h)
    return (0.0, 1.0, -1.0, 0.0, h, 0.0)  # 270: reader = (h - y, x)


def extract_page_runs(data: bytes) -> "list[list[TextRun]]":
    """PDF bytes -> per-page positioned text runs (reader orientation)
    — the shared substrate of :func:`extract_page_texts` (line
    assembly) and :mod:`pdf_parser_ray.pdf.tables` (bbox-grid table
    reconstruction)."""
    doc = parse_document(data)
    out: list[list[TextRun]] = []
    for page in doc.pages():
        res = _page_resources(doc, page)
        interp = _ContentInterpreter(
            _fonts_from_resources(doc, res),
            _form_xobjects(doc, res),
            base_ctm=_rotation_ctm(doc, page),
        )
        try:
            interp.run(_page_content(doc, page))
        except Exception:
            pass
        out.append(interp.runs)
    return out


def extract_page_texts(data: bytes) -> list[str]:
    """PDF bytes -> per-page layout-ordered text."""
    return [assemble_lines(runs) for runs in extract_page_runs(data)]


def extract_text(data: bytes) -> str:
    """All pages joined with '\\n' — the reference's full-text contract
    (base.py:27-33)."""
    return "\n".join(extract_page_texts(data))


def is_pdf(data: bytes) -> bool:
    """Content-type detection by magic: the analogue of the reference's
    implicit PDF-input assumption (SURVEY.md §2.2 C1)."""
    return data[:1024].lstrip()[:5] == b"%PDF-" or data[:5] == b"%PDF-"
