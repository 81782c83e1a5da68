"""From-scratch PDF text extraction + layout reassembly (stdlib only).

The north rule names "PDF/layout parse" next to HTML boilerplate strip: a
Common-Crawl-style corpus carries application/pdf payloads alongside HTML,
and the extraction contract (byte-identical extracted text per url) must
hold for both. This module is the PDF sibling of ``html_blocks``:

- a minimal PDF *writer* (``build_pdf``) so the synthetic corpus contains
  genuine, spec-valid PDF 1.4 bytes (same discipline as the round-2 stdlib
  PNG codec: the decode path is tested against real encodings, not fakes);
- a from-scratch *reader* (``extract_pdf_runs`` -> ``parse_pdf_blocks``)
  that walks the object graph (trailer /Root -> /Pages -> /Kids ->
  /Contents), FlateDecodes streams with ``zlib``, tokenizes the content
  stream's text operators (Tf/Td/TD/TL/T*/Tm/Tj/TJ/'), and reassembles
  reading order from glyph positions: lines = runs grouped by y
  (quantized), top-to-bottom, left-to-right within a line — the layout
  parse. Page furniture (running "Page N of M" folios, short lines repeated
  across pages) is classified as boilerplate, the PDF analog of the HTML
  nav/footer strip.

Reference mapping: the reference OCRs invoice *images* and re-orders
detections by (y, x) bands (ocr.py sort + vision.py region heuristics);
here the positions come from the PDF text matrix instead of OCR boxes, and
the same (y, x) band assembly produces the reading order. No external PDF
library exists in this container — and none is needed: text-op extraction
plus Flate is a small, fully-specified subset of ISO 32000.

Runs inside the Arrow extraction kernel (mapInPandas) exactly like the HTML
parser: pure per-document Python on executor-side batches, zero driver
involvement, dispatch by magic bytes (``%PDF-``).

Deliberate scope bounds (documented, loud on violation): FlateDecode only
(LZW/DCT raise), literal + hex strings (UTF-16BE with BOM, else
PDFDocEncoding≈latin-1), no encrypted PDFs, no CID font re-mapping. Each
unsupported feature degrades to an error row in the pipeline, never a task
failure.
"""

from __future__ import annotations

import re
import zlib

from .html_blocks import MIN_CONTENT_TOKENS, MIN_KV_CHARS, Block

# ---------------------------------------------------------------------------
# Writer — minimal spec-valid PDF 1.4 with positioned text runs
# ---------------------------------------------------------------------------

PAGE_W, PAGE_H = 612, 792  # US Letter, the PDF default everyone uses


def _esc_literal(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _show_op(text: str) -> str:
    """One Tj show op; non-latin-1 text becomes a UTF-16BE hex string (the
    portable way to carry ₹ / Devanagari in a page stream)."""
    try:
        text.encode("latin-1")
    except UnicodeEncodeError:
        payload = b"\xfe\xff" + text.encode("utf-16-be")
        return f"<{payload.hex().upper()}> Tj"
    return f"({_esc_literal(text)}) Tj"


def content_stream(runs: list[tuple[float, float, str]], font_size: int = 11) -> bytes:
    """Render (x, y, text) runs as one BT/ET block with absolute Td moves."""
    ops = ["BT", f"/F1 {font_size} Tf"]
    cx = cy = 0.0
    for x, y, text in runs:
        ops.append(f"{x - cx:g} {y - cy:g} Td")
        cx, cy = x, y
        ops.append(_show_op(text))
    ops.append("ET")
    return "\n".join(ops).encode("latin-1")


def lines_to_runs(
    lines: list[str], x0: float = 72.0, y0: float = 720.0, leading: float = 14.0
) -> list[tuple[float, float, str]]:
    return [(x0, y0 - i * leading, ln) for i, ln in enumerate(lines)]


def build_pdf(pages: list[bytes | list], compress: bool = True) -> bytes:
    """Assemble page content streams into a complete PDF file.

    ``pages``: per page, either raw content-stream bytes or a list of
    (x, y, text) runs. Writes a correct xref table + trailer; /Length is
    always a direct integer (the reader exploits this for exact stream
    bounds).
    """
    streams = [p if isinstance(p, bytes) else content_stream(p) for p in pages]
    n_pages = len(streams)
    # object numbering: 1 catalog, 2 pages, 3 font, then per page (page, content)
    objs: dict[int, bytes] = {}
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    objs[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    for i, raw in enumerate(streams):
        page_num, cont_num = 4 + 2 * i, 5 + 2 * i
        objs[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} {PAGE_H}] "
            f"/Resources << /Font << /F1 3 0 R >> >> /Contents {cont_num} 0 R >>"
        ).encode()
        data = zlib.compress(raw) if compress else raw
        filt = b" /Filter /FlateDecode" if compress else b""
        objs[cont_num] = (
            b"<< /Length " + str(len(data)).encode() + filt + b" >>\nstream\n"
            + data
            + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n = max(objs) + 1
    out += f"xref\n0 {n}\n".encode() + b"0000000000 65535 f \n"
    for num in range(1, n):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n} /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


# ---------------------------------------------------------------------------
# Reader — object graph walk + content-stream tokenizer + layout assembly
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b", re.S)
_ROOT_RE = re.compile(rb"/Root\s+(\d+)\s+\d+\s+R")
_PAGES_RE = re.compile(rb"/Pages\s+(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+\d+\s+R)+)\s*\]")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_CONTENTS_RE = re.compile(rb"/Contents\s+(?:(\d+)\s+\d+\s+R|\[((?:\s*\d+\s+\d+\s+R)+)\s*\])")
_TYPE_PAGE_RE = re.compile(rb"/Type\s*/Page\b")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b")
_STREAM_RE = re.compile(rb"stream\r?\n")

# one content-stream token: literal string / hex string / number / name / op
_TOKEN_RE = re.compile(
    rb"""\(((?:\\.|[^\\()])*)\)      # 1: literal string (escapes, no nesting)
      |<([0-9A-Fa-f\s]*)>           # 2: hex string
      |([-+]?\d*\.?\d+)             # 3: number
      |/[^\s/<>()\[\]{}%]*          #    name (skipped)
      |(\[|\])                      # 4: array delimiters (TJ)
      |([A-Za-z'"][A-Za-z0-9*'"]*)  # 5: operator
    """,
    re.X,
)

_ESC_MAP = {
    b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
    b"(": "(", b")": ")", b"\\": "\\",
}
_ESC_RE = re.compile(rb"\\(\d{1,3}|\r\n|\n|\r|.)")

# A TJ kerning adjustment this large (thousandths of an em, negative = gap)
# is a word space, not a glyph tweak; smaller values are typographic kerning.
TJ_SPACE_THRESHOLD = -180.0


def _decode_literal(raw: bytes) -> str:
    # escape-free fast path: the tokenizer's literal-string group matches
    # escapes explicitly, so a string without a backslash needs no unescaping
    # pass at all — just the latin-1 view (the overwhelmingly common case;
    # byte-equality with the slow path asserted in test_pdf)
    if b"\\" not in raw:
        return raw.decode("latin-1")
    out = bytearray()
    i = 0
    for m in _ESC_RE.finditer(raw):
        out += raw[i : m.start()]
        g = m.group(1)
        if g in (b"\r\n", b"\n", b"\r"):
            pass  # escaped newline = line continuation, emits nothing
        elif g.isdigit():
            out.append(int(g, 8) & 0xFF)
        else:
            out += _ESC_MAP.get(g, g.decode("latin-1")).encode("latin-1")
        i = m.end()
    out += raw[i:]
    return out.decode("latin-1")


def _decode_hex(raw: bytes) -> str:
    h = re.sub(rb"\s+", b"", raw)
    if len(h) % 2:
        h += b"0"  # spec: odd final digit implies trailing 0
    b = bytes.fromhex(h.decode("ascii"))
    if b[:2] == b"\xfe\xff":
        return b[2:].decode("utf-16-be", errors="replace")
    return b.decode("latin-1")


class PdfError(ValueError):
    """Unsupported or malformed PDF — the pipeline turns this into an error
    row (never a task failure)."""


def _objects(data: bytes) -> dict[int, bytes]:
    """Object number -> body bytes. Stream bounds come from the direct
    /Length when present (exact even if the payload contains 'endobj'),
    else a lenient endstream scan."""
    objs: dict[int, bytes] = {}
    pos = 0
    while True:
        m = _OBJ_RE.search(data, pos)
        if not m:
            break
        num = int(m.group(1))
        body_start = m.end()
        sm = _STREAM_RE.search(data, body_start)
        lm = _LENGTH_RE.search(data, body_start)
        end = data.find(b"endobj", body_start)
        if sm is not None and (end == -1 or sm.start() < end):
            if lm is not None and lm.start() < sm.start():
                stream_end = sm.end() + int(lm.group(1))
            else:
                es = data.find(b"endstream", sm.end())
                if es == -1:
                    raise PdfError("unterminated stream")
                stream_end = es
            end = data.find(b"endobj", stream_end)
        if end == -1:
            raise PdfError("unterminated object")
        objs[num] = data[body_start:end]
        pos = end + 6
    if not objs:
        raise PdfError("no objects found")
    return objs


def _stream_data(body: bytes) -> bytes:
    sm = _STREAM_RE.search(body)
    if sm is None:
        raise PdfError("object has no stream")
    lm = _LENGTH_RE.search(body, 0, sm.start())
    if lm is not None:
        raw = body[sm.end() : sm.end() + int(lm.group(1))]
    else:
        es = body.find(b"endstream", sm.end())
        raw = body[sm.end() : es].rstrip(b"\r\n")
    head = body[: sm.start()]
    if b"/FlateDecode" in head:
        try:
            return zlib.decompress(raw)
        except zlib.error as e:
            raise PdfError(f"bad Flate stream: {e}") from e
    if b"/Filter" in head:
        raise PdfError("unsupported stream filter (only FlateDecode)")
    return raw


def _page_content_streams(data: bytes, objs: dict[int, bytes]) -> list[bytes]:
    """Content streams in document page order via /Root -> /Pages -> /Kids;
    falls back to /Type /Page objects in number order for xref-less files."""
    page_nums: list[int] = []
    rm = _ROOT_RE.search(data)
    if rm and int(rm.group(1)) in objs:
        pm = _PAGES_RE.search(objs[int(rm.group(1))])
        if pm and int(pm.group(1)) in objs:
            km = _KIDS_RE.search(objs[int(pm.group(1))])
            if km:
                page_nums = [int(r.group(1)) for r in _REF_RE.finditer(km.group(1))]
    if not page_nums:
        page_nums = [n for n in sorted(objs) if _TYPE_PAGE_RE.search(objs[n])]
    if not page_nums:
        raise PdfError("no page objects")
    streams = []
    for pn in page_nums:
        cm = _CONTENTS_RE.search(objs.get(pn, b""))
        if cm is None:
            streams.append(b"")
            continue
        refs = [int(cm.group(1))] if cm.group(1) else [
            int(r.group(1)) for r in _REF_RE.finditer(cm.group(2))
        ]
        streams.append(b"\n".join(_stream_data(objs[r]) for r in refs if r in objs))
    return streams


def _content_runs(stream: bytes) -> list[tuple[float, float, str]]:
    """Walk text operators, yielding (y, x, text) runs in emit order."""
    runs: list[tuple[float, float, str]] = []
    x = y = 0.0
    leading = 0.0
    stack: list[float] = []  # pending numeric operands
    strings: list[str] = []  # pending string operands (for Tj / ')
    tj_parts: list[str] | None = None  # non-None inside [ ... ] TJ array
    for m in _TOKEN_RE.finditer(stream):
        # lastindex-dispatch (round 6): exactly one alternative matches per
        # token — 1 literal / 2 hex / 3 number / 4 array delim / 5 operator;
        # names have no group (None). One group fetch instead of five.
        li = m.lastindex
        if li == 1 or li == 2:
            s = _decode_literal(m.group(1)) if li == 1 else _decode_hex(m.group(2))
            if tj_parts is not None:
                tj_parts.append(s)
            else:
                strings.append(s)
        elif li == 3:
            v = float(m.group(3))
            if tj_parts is not None:
                if v <= TJ_SPACE_THRESHOLD:
                    tj_parts.append(" ")
            else:
                stack.append(v)
        elif li == 4:
            if m.group(4) == b"[":
                tj_parts = []
            # b"]": TJ operator consumes tj_parts
        elif li == 5:
            # operators compared as raw bytes (no per-op latin-1 decode) and
            # ordered by frequency — Tj and Td dominate real content streams
            o = m.group(5)
            if o == b"Tj":
                if strings:
                    runs.append((y, x, strings[-1]))
            elif o in (b"Td", b"TD"):
                if len(stack) >= 2:
                    x, y = x + stack[-2], y + stack[-1]
                    if o == b"TD":
                        leading = -stack[-1]
            elif o == b"BT":
                x = y = 0.0
            elif o == b"TL":
                if stack:
                    leading = stack[-1]
            elif o == b"Tm":
                if len(stack) >= 6:
                    x, y = stack[-2], stack[-1]
            elif o == b"T*":
                y -= leading
            elif o == b"'":
                y -= leading
                if strings:
                    runs.append((y, x, strings[-1]))
            elif o == b'"':
                y -= leading
                if strings:
                    runs.append((y, x, strings[-1]))
            elif o == b"TJ" and tj_parts is not None:
                runs.append((y, x, "".join(tj_parts)))
                tj_parts = None
            stack.clear()
            strings.clear()
    return runs


Y_QUANTUM = 2.0  # runs within 2pt vertically sit on one visual line


def _runs_to_lines(runs: list[tuple[float, float, str]]) -> list[str]:
    """Layout assembly: quantize y, sort top-to-bottom then left-to-right,
    join same-line runs with a single space (glyph widths are unknown
    without font metrics — a space is the safe reading-order join)."""
    by_line: dict[float, list[tuple[float, str]]] = {}
    for y, x, s in runs:
        qy = round(y / Y_QUANTUM) * Y_QUANTUM
        by_line.setdefault(qy, []).append((x, s))
    lines = []
    for qy in sorted(by_line, reverse=True):
        parts = [s for _, s in sorted(by_line[qy], key=lambda t: t[0])]
        text = " ".join(" ".join(parts).split())
        if text:
            lines.append(text)
    return lines


def extract_pdf_pages_text(data: bytes) -> list[list[str]]:
    """Per-page reading-order lines for a PDF byte string."""
    if not data.startswith(b"%PDF-"):
        raise PdfError("not a PDF (missing %PDF- header)")
    objs = _objects(data)
    return [_runs_to_lines(_content_runs(s)) for s in _page_content_streams(data, objs)]


# --- furniture / boilerplate classification -------------------------------

_FOLIO_RE = re.compile(r"^(?:page\s+\d+(?:\s+of\s+\d+)?|[-–—\s]*\d+[-–—\s]*)$", re.I)
MAX_FURNITURE_CHARS = 60


def _is_furniture(line: str, repeated: set[str]) -> bool:
    return bool(_FOLIO_RE.match(line)) or (
        len(line) <= MAX_FURNITURE_CHARS and line in repeated
    )


def parse_pdf_blocks(data: bytes) -> list[Block]:
    """PDF -> the same Block list the HTML parser emits, so everything
    downstream (content join, field anchors, validators, confidence) is
    format-agnostic. One block per assembled line; page furniture (folio
    regex, short lines repeated on 2+ pages — the PDF analog of nav/footer
    boilerplate) gets region='boiler', is_content=False."""
    pages = extract_pdf_pages_text(data)
    seen: dict[str, int] = {}
    for lines in pages:
        for ln in set(lines):
            seen[ln] = seen.get(ln, 0) + 1
    repeated = {ln for ln, c in seen.items() if c >= 2 and len(pages) >= 2}
    blocks: list[Block] = []
    idx = 0
    for lines in pages:
        for ln in lines:
            furniture = _is_furniture(ln, repeated)
            b = Block(idx=idx, tag="pdfline", tag_path="pdf/page/line",
                      region="boiler" if furniture else "body", order=idx)
            b.text = ln
            b.n_chars = len(ln)
            b.n_tokens = len(ln.split(" "))
            b.text_density = float(b.n_chars)
            b.is_content = (not furniture) and (
                b.n_tokens >= MIN_CONTENT_TOKENS
                or (":" in ln and b.n_chars >= MIN_KV_CHARS)
            )
            blocks.append(b)
            idx += 1
    return blocks
