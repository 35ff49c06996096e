"""PDF text-extraction source: read PDF files as per-page text rows —
with WARC/WET/HTML/archives/media closed, PDF is the highest-frequency
real LLM-corpus format (ISO 32000 is the public spec; everything here
is stdlib ``zlib`` + ``re``).

Scope (matches what a no-deps container can honestly do):
- cross-reference-free object scan (works on linearized and
  incrementally-updated files alike — the xref table is a seek
  optimization, not the only source of truth),
- page tree walk (/Root → /Pages → /Kids) for correct page ORDER,
- content streams raw or FlateDecode (stdlib zlib), single stream or
  /Contents arrays,
- text operators Tj ' " TJ with ()-string escapes, octal escapes and
  hex strings; Td/TD/T*/' line motion becomes newlines,
- CID-keyed (Identity-H) text via the font's /ToUnicode CMap
  (bfchar/bfrange, ISO 32000 9.10.3), /ObjStm object-stream
  expansion (PDF 1.5+ xref-stream files), indirect /Length refs,
  LZWDecode streams (7.4.4 variable-width codes, EarlyChange),
- standard-security-handler decryption (sources/pdf_crypt.py): RC4
  40-128, AES-128 (/AESV2) and AES-256 (/AESV3 R6) with an empty user
  password — the owner-locked files every viewer opens silently,
- documented NotImplementedError seams for password-protected files
  (non-empty user password — genuinely unreadable without
  credentials), image-codec stream filters (DCT/JBIG2/CCITT), and
  Identity-H fonts that carry no /ToUnicode map (their bytes are CID
  code points — decoding them as Latin-1 would yield garbage
  silently).

Spark shape: PDFs are whole-file units (object offsets are absolute),
so the scan is ``binaryFile`` — one file per row, per-file parallel.
That is the right 100 TB model: a corpus is millions of PDFs, and
task granularity is the file, exactly like the .warc.gz story in
sources/wet.py. Parsing is one zero-shuffle Arrow pass; only the
extracted text rows leave the scan.

Reference note: the reference engine has no document-file ingestion
path (SURVEY §1.1); this module is north-star training-pipeline
surface, public spec only.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from wc_vector_indexing_spark.operators.contract import quarantine

PDF_SCHEMA = T.StructType(
    [
        T.StructField("pdf_path", T.StringType()),
        T.StructField("page_no", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_chars", T.IntegerType()),
    ]
)

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")
# direct-integer /Length only: the negative lookahead rejects indirect
# refs (`/Length 8 0 R`) so they fall through to delimiter search +
# second-pass resolution instead of truncating the payload to 8 bytes
_NUM_RE = re.compile(rb"/Length\s+(\d+)\b(?!\s+\d+\s+R\b)")
_IND_LEN_RE = re.compile(rb"/Length\s+(\d+)\s+\d+\s+R\b")


def _scan_objects(
    data: bytes, decryptor=None
) -> dict[int, tuple[bytes, bytes | None]]:
    """num → (object dict/body bytes, stream payload or None). A linear
    scan over ``N G obj … endobj`` instead of the xref table: valid for
    every conforming file (objects are self-delimiting) and robust to
    the incremental-update / xref-stream variants a seek-based reader
    must special-case. Later definitions of the same object number win
    (incremental updates append replacements).

    Two fix-up passes after the linear scan:
    - indirect ``/Length N 0 R`` streams are re-sliced from the
      absolute payload offset once object N (the integer) is known —
      the delimiter-search slice used in pass 1 is only a fallback,
    - ``/Type /ObjStm`` object streams (PDF 1.5+ xref-stream files
      pack most objects inside them) are inflated and their packed
      objects added; a directly-defined object with the same number
      wins (appended incremental updates replace ObjStm members as
      whole objects)."""
    objects: dict[int, tuple[bytes, bytes | None]] = {}
    gens: dict[int, int] = {}
    pending: list[tuple[int, int, int]] = []  # (num, abs payload start, len ref)
    for m in _OBJ_RE.finditer(data):
        num = int(m.group(1))
        gens[num] = int(m.group(2))
        start = m.end()
        end = data.find(b"endobj", start)
        if end == -1:
            continue
        body = data[start:end]
        stream = None
        s = body.find(b"stream")
        if s != -1:
            head = body[:s]
            payload_start = s + len(b"stream")
            if body[payload_start : payload_start + 2] == b"\r\n":
                payload_start += 2
            elif body[payload_start : payload_start + 1] == b"\n":
                payload_start += 1
            # /Length is authoritative when it is a direct integer (a
            # payload may contain the bytes "endstream"); indirect refs
            # use the delimiter search now + exact re-slice in pass 2
            ln = _NUM_RE.search(head)
            if ln:
                payload = body[payload_start : payload_start + int(ln.group(1))]
            else:
                e = body.rfind(b"endstream")
                payload = body[payload_start:e].rstrip(b"\r\n")
                ind = _IND_LEN_RE.search(head)
                if ind:
                    pending.append((num, start + payload_start, int(ind.group(1))))
            body = head
            stream = payload
        objects[num] = (body, stream)
    for num, abs_start, ref in pending:
        if ref in objects:
            try:
                length = int(objects[ref][0].strip())
            except ValueError:
                continue
            objects[num] = (objects[num][0], data[abs_start : abs_start + length])
    if decryptor is not None:
        # decrypt-then-defilter (§7.6.2: encryption is the outermost
        # layer), BEFORE ObjStm expansion so packed objects inflate
        # from plaintext. Cross-reference streams (/Type /XRef) are
        # never encrypted (§7.5.8.2) — and never read here — skip them
        # so they don't decrypt to garbage in the object map.
        for num, (body, stream) in list(objects.items()):
            if stream is not None and b"/XRef" not in body:
                objects[num] = (body, decryptor(num, gens.get(num, 0), stream))
    for num, (body, stream) in list(objects.items()):
        if b"/ObjStm" in body and stream is not None:
            inflated = _decode_stream(body, stream)
            nm = re.search(rb"/N\s+(\d+)", body)
            fm = re.search(rb"/First\s+(\d+)", body)
            if nm is None or fm is None:
                raise ValueError("corrupt /ObjStm: missing /N or /First")
            n, first = int(nm.group(1)), int(fm.group(1))
            header = inflated[:first].split()
            if len(header) < 2 * n:
                raise ValueError("corrupt /ObjStm: short offset table")
            offs = [int(header[2 * k + 1]) for k in range(n)]
            for k in range(n):
                onum = int(header[2 * k])
                end_off = offs[k + 1] if k + 1 < n else len(inflated) - first
                obody = inflated[first + offs[k] : first + end_off]
                objects.setdefault(onum, (obody, None))
    return objects


def _lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """LZW per ISO 32000 7.4.4 / TIFF: 9→12-bit variable-width codes,
    MSB-first bit packing, Clear=256, EOD=257. ``early_change`` (the
    /DecodeParms /EarlyChange default 1) moves each width increase one
    code earlier than strictly needed. The decoder's table is exactly
    ONE add behind the encoder's at each read (the encoder adds after
    emitting code k, the decoder adds while processing code k+1), so
    its width threshold sits one entry lower than the encoder's —
    the classic TIFF-LZW 510/1022/2046 boundaries."""
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    next_code = 258
    width = 9
    prev: bytes | None = None
    out = bytearray()
    acc = 0
    nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                table = {i: bytes([i]) for i in range(256)}
                next_code = 258
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    raise ValueError("corrupt LZW stream: bad first code")
            elif code in table:
                entry = table[code]
                table[next_code] = prev + entry[:1]
                next_code += 1
            elif code == next_code:  # the KwKwK case
                entry = prev + prev[:1]
                table[next_code] = entry
                next_code += 1
            else:
                raise ValueError("corrupt LZW stream: code beyond table")
            out += entry
            prev = entry
            if width < 12 and next_code >= (1 << width) - 1 - early_change:
                width += 1
    return bytes(out)


def _lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """Fixture/export half of the LZW roundtrip (same writer-inverse
    pattern as ``to_pdf_bytes``); resets the table at 4094 entries as
    the spec requires."""
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    put(256)  # leading Clear, as common writers emit
    s = b""
    for byte in data:
        c = s + bytes([byte])
        if c in table:
            s = c
            continue
        put(table[s])
        table[c] = next_code
        next_code += 1
        if width < 12 and next_code >= (1 << width) - early_change:
            width += 1
        if next_code > 4094:  # table full: reset (spec 7.4.4.2)
            put(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        s = bytes([byte])
    if s:
        put(table[s])
    put(257)  # EOD
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _asciihex_decode(data: bytes) -> bytes:
    """ASCIIHexDecode (7.4.2): hex pairs, whitespace ignored, '>' EOD,
    odd final digit padded with 0."""
    end = data.find(b">")
    hx = re.sub(rb"\s", b"", data[: end if end != -1 else len(data)])
    if re.search(rb"[^0-9A-Fa-f]", hx):
        raise ValueError("corrupt ASCIIHex stream: non-hex character")
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii"))


def _ascii85_decode(data: bytes) -> bytes:
    """ASCII85Decode (7.4.3): base-85 groups of 5 chars → 4 bytes,
    'z' shorthand for four zero bytes, '~>' EOD, partial final group."""
    body = data
    if body.startswith(b"<~"):
        body = body[2:]
    end = body.find(b"~>")
    if end != -1:
        body = body[:end]
    body = re.sub(rb"\s", b"", body)
    out = bytearray()
    group: list[int] = []
    for ch in body:
        if ch == 0x7A:  # 'z'
            if group:
                raise ValueError("corrupt ASCII85 stream: z inside group")
            out += b"\x00\x00\x00\x00"
            continue
        if not (0x21 <= ch <= 0x75):
            raise ValueError("corrupt ASCII85 stream: char out of range")
        group.append(ch - 0x21)
        if len(group) == 5:
            n = 0
            for d in group:
                n = n * 85 + d
            out += n.to_bytes(4, "big")
            group = []
    if group:
        if len(group) == 1:
            raise ValueError("corrupt ASCII85 stream: lone final digit")
        k = len(group)
        n = 0
        for d in group + [84] * (5 - k):
            n = n * 85 + d
        out += n.to_bytes(4, "big")[: k - 1]
    return bytes(out)


def _decode_one_filter(name: str, head: bytes, payload: bytes) -> bytes:
    if name == "FlateDecode":
        try:
            return zlib.decompress(payload)
        except zlib.error as e:
            raise ValueError(f"corrupt FlateDecode content stream: {e}") from e
    if name == "LZWDecode":
        ec = re.search(rb"/EarlyChange\s+(\d+)", head)
        return _lzw_decode(payload, int(ec.group(1)) if ec else 1)
    if name == "ASCIIHexDecode":
        return _asciihex_decode(payload)
    if name == "ASCII85Decode":
        return _ascii85_decode(payload)
    if name == "RunLengthDecode":
        # 7.4.5: length byte L<128 → copy L+1 literal bytes; L>128 →
        # repeat next byte 257-L times; 128 = EOD
        out = bytearray()
        i = 0
        while i < len(payload):
            n = payload[i]
            if n == 128:
                break
            if n < 128:
                out += payload[i + 1 : i + 2 + n]
                i += 2 + n
            else:
                out += payload[i + 1 : i + 2] * (257 - n)
                i += 2
        return bytes(out)
    raise NotImplementedError(
        f"PDF stream filter {name} not supported (Flate/LZW/ASCIIHex/"
        "ASCII85/RunLength or none; DCT/JBIG2/CCITT are image codecs "
        "behind the external-decoder seam)"
    )


def _decode_stream(head: bytes, payload: bytes) -> bytes:
    """Apply the stream's /Filter — a single name or a cascade array
    (``/Filter [/ASCII85Decode /FlateDecode]``, applied in order)."""
    arr = re.search(rb"/Filter\s*\[([^\]]*)\]", head)
    if arr:
        names = [n.decode("ascii", "replace") for n in re.findall(rb"/(\w+)", arr.group(1))]
    else:
        one = re.search(rb"/Filter\s*/(\w+)", head)
        if one is None:
            return payload
        names = [one.group(1).decode("ascii", "replace")]
    for name in names:
        payload = _decode_one_filter(name, head, payload)
    return payload


def _page_order(objects: dict[int, tuple[bytes, bytes | None]]) -> list[int]:
    """Page object numbers in document order via the /Root → /Pages →
    /Kids walk; falls back to object-number order of /Type /Page
    objects when the tree is unresolvable (damaged files)."""
    page_re = re.compile(rb"/Type\s*/Page\b(?!s)")
    pages_in_tree: list[int] = []

    root_num = None
    for num, (body, _) in objects.items():
        if b"/Type" in body and b"/Catalog" in body:
            root_num = num
    if root_num is not None:
        mm = re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", objects[root_num][0])
        if mm:
            seen: set[int] = set()

            def walk(num: int) -> None:
                if num in seen or num not in objects:
                    return
                seen.add(num)
                body = objects[num][0]
                if page_re.search(body):
                    pages_in_tree.append(num)
                    return
                kids = re.search(rb"/Kids\s*\[([^\]]*)\]", body)
                if kids:
                    for r in _REF_RE.finditer(kids.group(1)):
                        walk(int(r.group(1)))

            walk(int(mm.group(1)))
    if pages_in_tree:
        return pages_in_tree
    return sorted(n for n, (b, _) in objects.items() if page_re.search(b))


_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _parse_literal_string(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ()-literal starting at data[i] == '('. Handles nesting,
    the standard escapes, and 1-3 digit octal codes (spec 7.3.4.2)."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i : i + 1]
        if c == b"\\":
            nxt = data[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
            elif nxt and nxt in b"01234567":
                # octal digits only — `\8`/`\9` are unrecognized
                # escapes and per 7.3.4.2 drop the backslash, keeping
                # the digit (handled by the final else branch)
                j = i + 1
                while j < min(i + 4, n) and data[j] in b"01234567":
                    j += 1
                out.append(int(data[i + 1 : j], 8) & 0xFF)
                i = j
            elif nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                if nxt == b"\r" and data[i : i + 1] == b"\n":
                    i += 1
            else:
                out += nxt
                i += 2
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth:
                out += c
            i += 1
        else:
            out += c
            i += 1
    return bytes(out), i


_TOKEN_RE = re.compile(
    rb"\(|<[0-9A-Fa-f\s]*>|\[|\]|/[^\s/\[\]()<>]*|[-+]?[\d.]+|[A-Za-z'\"*]+"
)


def _hex_to_text(hx: bytes) -> str:
    """CMap destination hex (UTF-16BE code units) → str."""
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")).decode("utf-16-be", "replace")


def _parse_tounicode(cmap: bytes) -> dict[int, str]:
    """/ToUnicode CMap stream → {CID code → unicode string}. Covers
    the public ISO 32000 9.10.3 forms: bfchar pairs, bfrange with a
    destination start (last code unit increments across the range) and
    bfrange with an explicit destination array. Codespace ranges are
    not needed for Identity-H (codes are uniformly 2 bytes)."""
    out: dict[int, str] = {}
    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", cmap, re.S):
        for mm in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", m.group(1)
        ):
            out[int(mm.group(1), 16)] = _hex_to_text(mm.group(2))
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", cmap, re.S):
        toks = re.findall(rb"<[0-9A-Fa-f]+>|\[|\]", m.group(1))
        i = 0
        while i + 1 < len(toks):
            lo = int(toks[i][1:-1], 16)
            hi = int(toks[i + 1][1:-1], 16)
            i += 2
            if i < len(toks) and toks[i] == b"[":
                i += 1
                code = lo
                while i < len(toks) and toks[i] != b"]":
                    out[code] = _hex_to_text(toks[i][1:-1])
                    code += 1
                    i += 1
                i += 1  # past ']'
            elif i < len(toks):
                base = _hex_to_text(toks[i][1:-1])
                i += 1
                last = ord(base[-1]) if base else 0
                for c in range(lo, hi + 1):
                    out[c] = base[:-1] + chr(last + c - lo)
    return out


def _page_fonts(
    objects: dict[int, tuple[bytes, bytes | None]], page_body: bytes
) -> dict[bytes, dict[int, str] | None]:
    """Resolve the page's /Resources → /Font dict into
    {font name → CID→unicode map (Identity-H fonts) or None (simple
    fonts; their byte strings decode latin-1)}. Raises
    NotImplementedError for an Identity-H font with no usable
    /ToUnicode CMap — its bytes are CID code points with no public
    mapping, and decoding them as latin-1 would be silent garbage.
    (Round-7's seam rejected ALL Identity-H files; the mapped case is
    now extracted for real.)"""
    res = page_body
    m = re.search(rb"/Resources\s+(\d+)\s+\d+\s+R", page_body)
    if m and int(m.group(1)) in objects:
        res = objects[int(m.group(1))][0]
    fdict = None
    fm = re.search(rb"/Font\s*<<(.*?)>>", res, re.S)
    if fm:
        fdict = fm.group(1)
    else:
        fr = re.search(rb"/Font\s+(\d+)\s+\d+\s+R", res)
        if fr and int(fr.group(1)) in objects:
            fdict = objects[int(fr.group(1))][0]
    fonts: dict[bytes, dict[int, str] | None] = {}
    if fdict is None:
        return fonts
    for mm in re.finditer(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R", fdict):
        name, ref = mm.group(1), int(mm.group(2))
        if ref not in objects:
            continue
        fbody = objects[ref][0]
        if b"/Identity-H" not in fbody:
            fonts[name] = None
            continue
        tu = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", fbody)
        if (
            tu is None
            or int(tu.group(1)) not in objects
            or objects[int(tu.group(1))][1] is None
        ):
            raise NotImplementedError(
                "CID-keyed (Identity-H) font without /ToUnicode CMap: "
                "text bytes are CID code points with no public mapping"
            )
        thead, tstream = objects[int(tu.group(1))]
        fonts[name] = _parse_tounicode(_decode_stream(thead, tstream))
    return fonts


def _extract_page_text(
    content: bytes, fonts: dict[bytes, dict[int, str] | None] | None = None
) -> str:
    """Walk the content stream's text operators. Line model: every
    text-line motion (Td/TD/T*) and the '/\" shorthands start a new
    output line; shows on the same line concatenate. TJ kerning
    numbers are ignored except large negative gaps (< -180/1000 em),
    which typeset as inter-word space in justified text. ``fonts``
    (from _page_fonts) maps names set by the Tf operator to a
    CID→unicode map for Identity-H fonts; strings shown under such a
    font decode as big-endian 2-byte codes through the map, all other
    strings as latin-1 bytes."""
    lines: list[str] = [""]
    i = 0
    n = len(content)
    stack: list[bytes] = []  # pending string/number tokens inside a TJ array
    cur_cid: list[dict[int, str] | None] = [None]  # active font's CID map
    last_name: list[bytes] = [b""]

    def show(s: bytes) -> None:
        cm = cur_cid[0]
        if cm is None:
            lines[-1] += s.decode("latin-1")
        else:
            lines[-1] += "".join(
                cm.get(int.from_bytes(s[k : k + 2], "big"), "�")
                for k in range(0, len(s) - 1, 2)
            )

    in_array = False
    pending: list[tuple[str, bytes | float]] = []
    while i < n:
        m = _TOKEN_RE.search(content, i)
        if m is None:
            break
        tok = m.group(0)
        if tok == b"(":
            s, i = _parse_literal_string(content, m.start())
            if in_array:
                pending.append(("s", s))
            else:
                stack.append(s)
            continue
        i = m.end()
        if tok.startswith(b"<"):
            hx = re.sub(rb"\s", b"", tok[1:-1])
            if len(hx) % 2:
                hx += b"0"
            s = bytes.fromhex(hx.decode("ascii"))
            if in_array:
                pending.append(("s", s))
            else:
                stack.append(s)
        elif tok == b"[":
            in_array = True
            pending = []
        elif tok == b"]":
            in_array = False
        elif tok in (b"Tj", b"'", b'"'):
            if tok in (b"'", b'"'):
                lines.append("")
            if stack:
                show(stack[-1])
            stack.clear()
        elif tok == b"TJ":
            for kind, v in pending:
                if kind == "s":
                    show(v)  # type: ignore[arg-type]
                elif v < -180:  # type: ignore[operator]
                    lines[-1] += " "
            pending = []
        elif tok in (b"Td", b"TD", b"T*"):
            lines.append("")
        elif tok.startswith(b"/"):
            last_name[0] = tok[1:]
        elif tok == b"Tf":
            cur_cid[0] = (fonts or {}).get(last_name[0])
        elif re.fullmatch(rb"[-+]?[\d.]+", tok):
            if in_array:
                try:
                    pending.append(("n", float(tok)))
                except ValueError:
                    pass
        elif tok == b"BT":
            stack.clear()
    # leading/trailing motions (the initial cursor Td) produce empty
    # edge lines — strip those; interior blank lines are real layout
    return "\n".join(lines).strip("\n")


def _build_file_decryptor(data: bytes):
    """Locate the trailer's /Encrypt dictionary (indirect ref or inline)
    plus the first /ID string and hand them to the standard security
    handler (sources/pdf_crypt.py). The encrypt dict is always a
    top-level object (§7.5.8.2 forbids packing it in an ObjStm), so a
    direct slice of ``N G obj … endobj`` is sufficient — no full object
    scan before key derivation."""
    from wc_vector_indexing_spark.sources import pdf_crypt

    enc_body = None
    ref = None
    # LAST trailer wins (incremental updates append a new one)
    for m in re.finditer(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R", data):
        ref = int(m.group(1))
    if ref is not None:
        om = re.search(
            rb"(?<![0-9])" + str(ref).encode() + rb"\s+\d+\s+obj\b", data
        )
        if om is not None:
            end = data.find(b"endobj", om.end())
            enc_body = data[om.end() : end if end != -1 else len(data)]
    else:
        im = re.search(rb"/Encrypt\s*(<<.*?>>)", data, re.DOTALL)
        if im is not None:
            enc_body = im.group(1)
    if enc_body is None:
        raise ValueError("corrupt PDF: /Encrypt reference cannot be resolved")
    id0 = b""
    idm = re.search(
        rb"/ID\s*\[\s*(?:<([0-9A-Fa-f\s]*)>|\(([^)]*)\))", data
    )
    if idm is not None:
        if idm.group(1) is not None:
            hx = re.sub(rb"\s", b"", idm.group(1))
            id0 = bytes.fromhex(hx.decode("ascii")) if hx else b""
        else:
            id0 = idm.group(2)
    return pdf_crypt.build_decryptor(enc_body, id0)


@quarantine("pdf")
def extract_pdf_text(data: bytes) -> list[str]:
    """data → per-page extracted text, in page-tree order. Raises
    ValueError for non-PDF/corrupt input and NotImplementedError at
    the documented seams (password-protected encryption — the
    empty-user-password case decrypts via pdf_crypt —, image-codec
    filters, Identity-H fonts lacking a /ToUnicode CMap)."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    decryptor = None
    if re.search(rb"/Encrypt(\s|<<|/)", data):
        decryptor = _build_file_decryptor(data)
    objects = _scan_objects(data, decryptor=decryptor)
    if not objects:
        raise ValueError("corrupt PDF: no objects found")
    pages = []
    for num in _page_order(objects):
        body = objects[num][0]
        cm = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", body)
        refs: list[int] = []
        if cm:
            refs = [int(cm.group(1))]
        else:
            arr = re.search(rb"/Contents\s*\[([^\]]*)\]", body)
            if arr:
                refs = [int(r.group(1)) for r in _REF_RE.finditer(arr.group(1))]
        chunks = []
        for r in refs:
            if r in objects and objects[r][1] is not None:
                head, payload = objects[r]
                chunks.append(_decode_stream(head, payload))
        pages.append(_extract_page_text(b"\n".join(chunks), _page_fonts(objects, body)))
    return pages


def read_pdf_corpus(
    spark: SparkSession, path: str, on_error: str = "raise"
) -> DataFrame:
    """Read PDF file(s) (glob/dir ok) into (pdf_path, page_no, text,
    n_chars) — one row per page. ``binaryFile`` scan (whole-file units,
    per-file task parallelism — the million-PDF corpus model), then one
    zero-shuffle Arrow parse pass. ``on_error='skip'`` quarantines
    files that fail to parse (encrypted, exotic filters, corrupt)
    instead of failing the task — the crawl-ingest default posture."""
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")
    raw = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in PDF_SCHEMA.fields]
        for pdf in batches:
            out = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    pages = extract_pdf_text(bytes(content))
                except Exception:  # noqa: BLE001 — per-file isolation
                    if on_error == "raise":
                        raise
                    continue
                for pno, text in enumerate(pages):
                    out.append(
                        {
                            "pdf_path": fpath,
                            "page_no": pno,
                            "text": text,
                            "n_chars": len(text),
                        }
                    )
            yield pd.DataFrame(out, columns=cols)

    return raw.mapInPandas(parse, schema=PDF_SCHEMA)


# ------------------------------------------------------------------ writer


def _esc(s: str) -> bytes:
    return (
        s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    ).encode("latin-1", "replace")


def to_pdf_bytes(
    pages: list[str], compress: bool = False, cid: bool = False
) -> bytes:
    """Serialize per-page text to a minimal, spec-valid PDF (catalog +
    page tree + Helvetica + one content stream per page, xref table
    included) — the fixture/export half; tests pin
    extract_pdf_text(to_pdf_bytes(x)) == x. ``compress`` Flate-encodes
    the content streams (both paths must extract identically).
    ``cid`` writes the text through a Type0/Identity-H font instead:
    each character becomes a 2-byte CID code shown as a hex string,
    with a /ToUnicode bfchar CMap carrying the code→unicode mapping —
    the planted-truth fixture for the CID extraction path."""
    objs: list[bytes] = []  # 1-indexed object bodies (without N 0 obj wrapper)
    n_pages = len(pages)
    first_page = 5 if cid else 4
    # layout: 1 catalog, 2 pages, 3 font, (4 ToUnicode CMap if cid),
    # then (page, contents) pairs
    kids = " ".join(f"{first_page + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    codes: dict[str, int] = {}
    if cid:
        chars = sorted({c for p in pages for c in p if c != "\n"})
        codes = {c: k + 1 for k, c in enumerate(chars)}
        objs.append(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Fixture "
            b"/Encoding /Identity-H /ToUnicode 4 0 R >>"
        )
        cmap = bytearray(
            b"/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
            b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        )
        items = list(codes.items())
        for b0 in range(0, len(items), 100):  # <=100 entries per block (spec)
            block = items[b0 : b0 + 100]
            cmap += b"%d beginbfchar\n" % len(block)
            for ch, code in block:
                cmap += b"<%04X> <%s>\n" % (
                    code,
                    ch.encode("utf-16-be").hex().upper().encode(),
                )
            cmap += b"endbfchar\n"
        cmap += b"endcmap\nend\nend\n"
        objs.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(cmap), bytes(cmap))
        )
    else:
        objs.append(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        )
    for i, page in enumerate(pages):
        content = bytearray(b"BT /F1 12 Tf 72 720 Td\n")
        for j, line in enumerate(page.split("\n")):
            if j:
                content += b"0 -14 Td\n"
            if cid:
                hx = "".join(f"{codes[c]:04X}" for c in line)
                content += b"<" + hx.encode() + b"> Tj\n"
            else:
                content += b"(" + _esc(line) + b") Tj\n"
        content += b"ET"
        payload = bytes(content)
        filt = b""
        if compress:
            payload = zlib.compress(payload)
            filt = b" /Filter /FlateDecode"
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {first_page + 1 + 2 * i} 0 R >>".encode()
        )
        objs.append(
            b"<< /Length %d%s >>\nstream\n%s\nendstream"
            % (len(payload), filt, payload)
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for n, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % n + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)
