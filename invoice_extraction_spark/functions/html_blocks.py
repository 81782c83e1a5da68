"""DOM block segmentation + boilerplate classification (pure stdlib, deterministic).

This is the engine's analog of the reference's OCR + layout + vision stages:

- block segmentation  <-> OCR text-block detection (reference
  ``submission/utils/ocr.py:77-132`` — EasyOCR/Tesseract detections with
  text + bbox + confidence)
- region classification (header/body/footer)  <-> the y-band layout regioner
  (``submission/utils/ocr.py:280-306``: top 20% header, bottom 15% footer)
- text/link-density content scoring  <-> the YOLO/ROI density heuristics
  (``submission/utils/vision.py:44-273``) re-expressed as a
  Boilerpipe/CETD-style rule over DOM blocks

Everything here is pure Python/stdlib (``html.parser``) so the output is
bit-stable across environments — required for the byte-identical
``extracted_text`` golden contract. No lxml (not in the sandbox, and version
drift would break byte-identity anyway).

The kernel is invoked on Arrow batches (a ``pd.Series`` of HTML bytes) from
``operators/extract.py`` — never per-row from Spark.
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass, field
from html.parser import HTMLParser

# Tags that start a new text block (nearest enclosing block element owns the
# text). Mirrors the "detection = one visually coherent text region" notion of
# the reference's OCR output (ocr.py:89-97).
BLOCK_TAGS = frozenset(
    """html body div p h1 h2 h3 h4 h5 h6 ul ol li dl dt dd table thead tbody
    tfoot tr td th caption article section nav header footer aside main title
    blockquote pre form fieldset figure figcaption address summary details
    """.split()
)

# Content inside these is never text. iframe fallback content is included:
# a framing browser never renders it, so treating it as page text would
# hallucinate fields the user never sees (adversarial-fixture round 2).
SKIP_TAGS = frozenset({"script", "style", "noscript", "template", "svg", "iframe"})

# Content under these is kept as blocks but never main content.
HEAD_TAGS = frozenset({"head", "title"})

# Void elements never get a closing tag.
VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Structural-boilerplate containers (the reference's header/footer y-bands,
# ocr.py:284-287, plus nav/aside which have no invoice analog).
BOILER_TAGS = frozenset({"nav", "header", "footer", "aside"})

# id/class tokens that mark boilerplate (menus, ads, cookie banners ...).
BOILER_ATTR_TOKENS = frozenset(
    """nav navbar menu sidebar footer header banner ad ads advert cookie
    breadcrumb pagination share social related promo masthead""".split()
)

MAX_HTML_BYTES = 2_000_000  # early size cap, analog of the reference's
# 1800px image downscale before expensive ops (preprocess.py:34-42)

LINK_DENSITY_MAX = 0.35
MIN_CONTENT_TOKENS = 3
MIN_KV_CHARS = 8  # short "Total: ₹830000" key-value lines still count

# Data-cell tags: a td/dd holding "INV-555666" is a VALUE cell of a tabular
# key-value layout (the reference's invoices are exactly this shape) — keep
# it even though it fails the token/colon gates that prose blocks need.
DATA_CELL_TAGS = frozenset({"td", "th", "dt", "dd"})
MIN_CELL_CHARS = 2


@dataclass(slots=True)
class Block:
    """One DOM text block — the analog of an OCR detection struct
    (``{text, bbox, confidence, source}``, ocr.py:89-97). ``slots=True``:
    blocks are created ~30/page in the hot loop and their attributes are
    read in every classifier — slot access beats dict access measurably."""

    idx: int = -1
    tag: str = ""
    tag_path: str = ""
    _stack: tuple = ()  # open-tag snapshot; tag_path derived lazily at finalize
    region: str = "body"  # head | boiler | body  (layout-regioner analog)
    order: int = -1  # document order of first non-space text chunk
    _chunks: list = field(default_factory=list)
    _link_chunks: list = field(default_factory=list)
    n_links: int = 0
    n_tags: int = 0  # descendant tags opened while this block was innermost
    text: str = ""
    n_chars: int = 0
    n_tokens: int = 0
    link_chars: int = 0
    link_density: float = 0.0
    text_density: float = 0.0
    is_content: bool = False

    def finalize(self, path_cache: dict | None = None) -> bool:
        raw = "".join(self._chunks)
        t = " ".join(raw.split())
        # NFC is the identity on ASCII and str.isascii() is a C-speed scan —
        # the overwhelmingly common all-ASCII block skips the normalizer
        self.text = t if t.isascii() else unicodedata.normalize("NFC", t)
        if not self.text:
            return False
        # tag_path lazily, and memoized per parse: template pages repeat the
        # same DOM paths thousands of times (profiled: the eager per-block
        # join was ~6% of kernel time, mostly for blocks later discarded)
        if path_cache is not None:
            p = path_cache.get(self._stack)
            if p is None:
                p = "/".join(e[0] for e in self._stack)
                path_cache[self._stack] = p
            self.tag_path = p
        else:
            self.tag_path = "/".join(e[0] for e in self._stack)
        self.n_chars = len(self.text)
        # split(" ") on collapsed text yields count(" ")+1 pieces — count
        # avoids materializing the token list in the hottest method
        self.n_tokens = self.text.count(" ") + 1
        if self._link_chunks:
            link_raw = "".join(self._link_chunks)
            lr = " ".join(link_raw.split())
            self.link_chars = len(lr) if lr.isascii() else len(
                unicodedata.normalize("NFC", lr)
            )
        self.link_density = self.link_chars / self.n_chars
        self.text_density = self.n_chars / (1.0 + self.n_tags)
        self.is_content = (
            self.region == "body"
            and self.link_density <= LINK_DENSITY_MAX
            and (
                self.n_tokens >= MIN_CONTENT_TOKENS
                or (":" in self.text and self.n_chars >= MIN_KV_CHARS)
                or (self.tag in DATA_CELL_TAGS and self.n_chars >= MIN_CELL_CHARS)
            )
        )
        return True


# per-tag classification flags, resolved ONCE per tag name instead of 4-5
# frozenset probes in the hottest loop: (is_block, is_skip, is_head,
# is_boiler_tag, is_void). Unknown tags share a zero tuple.
_NO_FLAGS = (False, False, False, False, False)
_TAG_FLAGS: dict = {
    t: (t in BLOCK_TAGS, t in SKIP_TAGS, t in HEAD_TAGS, t in BOILER_TAGS, t in VOID_TAGS)
    for t in (BLOCK_TAGS | SKIP_TAGS | HEAD_TAGS | BOILER_TAGS | VOID_TAGS | {"a"})
}


class _BlockParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        # open tags: (tag, boiler_marked, is_skip, is_head, is_block) —
        # classification flags are resolved ONCE at open and travel with the
        # stack entry, so the endtag unwind (hottest loop after the
        # tokenizer) never re-probes the flags dict
        self.stack: list = []
        self.block_stack: list[Block] = []
        self.blocks: list[Block] = []
        self.skip_depth = 0
        self.head_depth = 0
        self.boiler_depth = 0
        self.link_depth = 0
        self.data_counter = 0
        self._path_cache: dict = {}

    def _is_boiler_attrs(self, attrs) -> bool:
        for k, v in attrs:
            if k in ("id", "class", "role") and v:
                for tok in v.replace("-", " ").replace("_", " ").lower().split():
                    if tok in BOILER_ATTR_TOKENS:
                        return True
        return False

    def handle_starttag(self, tag, attrs):
        is_block, is_skip, is_head, is_boiler_tag, is_void = _TAG_FLAGS.get(
            tag, _NO_FLAGS
        )
        if is_void:
            return
        marked = is_boiler_tag or (bool(attrs) and self._is_boiler_attrs(attrs))
        self.stack.append((tag, marked, is_skip, is_head, is_block))
        if is_skip:
            self.skip_depth += 1
        if is_head:
            self.head_depth += 1
        if marked:
            self.boiler_depth += 1
        if tag == "a":
            self.link_depth += 1
            if self.block_stack:
                self.block_stack[-1].n_links += 1
        if self.block_stack:
            self.block_stack[-1].n_tags += 1
        if is_block:
            b = Block(
                tag=tag,
                _stack=tuple(self.stack),
                region=(
                    "head"
                    if self.head_depth > 0
                    else ("boiler" if self.boiler_depth > 0 else "body")
                ),
            )
            self.block_stack.append(b)

    def handle_endtag(self, tag):
        flags = _TAG_FLAGS.get(tag, _NO_FLAGS)
        if flags[4]:  # void
            return
        # unwind to the matching open tag (tolerates malformed nesting)
        while self.stack:
            top_tag, marked, is_skip, is_head, is_block = self.stack.pop()
            if marked:
                self.boiler_depth -= 1
            if is_skip:
                self.skip_depth -= 1
            if is_head:
                self.head_depth -= 1
            if top_tag == "a":
                self.link_depth = max(0, self.link_depth - 1)
            if is_block and self.block_stack:
                b = self.block_stack.pop()
                if b.finalize(self._path_cache):
                    self.blocks.append(b)
            if top_tag == tag:
                break

    def handle_data(self, data):
        if self.skip_depth > 0 or not self.block_stack:
            return
        b = self.block_stack[-1]
        if data and not data.isspace():  # == data.strip(), sans the copy
            if b.order == -1:
                b.order = self.data_counter
            self.data_counter += 1
        b._chunks.append(data)
        if self.link_depth > 0:
            b._link_chunks.append(data)

    def close_all(self):
        while self.stack:
            self.handle_endtag(self.stack[-1][0])


# --- fast tokenizer ---------------------------------------------------------
# html.parser's goahead/parse_starttag is ~60% of kernel time (profiled:
# 0.88 ms/page). This regex tokenizer drives the SAME _BlockParser callbacks,
# so block-building semantics live in exactly one place; equivalence on the
# corpus + edge cases is asserted in tests (byte-identity contract intact).

import re as _re
from html import unescape as _unescape

# tag-name charsets mirror html.parser's tolerant regexes (tagfind_tolerant /
# endtagfind) so garbage like `<b<p>` tokenizes identically in both paths
_TOK = _re.compile(
    r"<!--.*?-->"
    r"|<!\[CDATA\[.*?\]\]>"
    r"|<![^>]*>"
    r"|<\?[^>]*>"
    r"|</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>"
    r"|<([a-zA-Z][^\t\n\r\f />\x00]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*?)(/?)>",
    _re.S,
)
_ATTR = _re.compile(r"([a-zA-Z-]+)\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))")
_RAWTEXT = frozenset({"script", "style", "textarea", "title"})
# title is rawtext in HTML5 (RCDATA), but html.parser treats it as normal
# markup; we match html.parser: only script/style skip to their close tag.
_CDATA_CONTAINERS = frozenset({"script", "style"})


def _parse_attrs(attr_str: str):
    out = []
    for m in _ATTR.finditer(attr_str):
        v = m.group(2) if m.group(2) is not None else (m.group(3) if m.group(3) is not None else m.group(4))
        if v and "&" in v:
            v = _unescape(v)
        out.append((m.group(1).lower(), v))
    return out


def _parse_fast(html: str) -> list[Block]:
    """Single-pass tokenizer + block builder with all parser state in locals
    (round 3 — NOTES.md hotspot: the per-token handle_* callback dispatch and
    their ``self.`` attribute traffic were ~45% of kernel time after the
    round-2 wins). Semantics are EXACTLY ``_BlockParser`` driven by the regex
    tokenizer; the stdlib ``html.parser`` + ``_BlockParser`` path remains the
    reference implementation, and block-for-block equivalence on corpus,
    edge cases, and hypothesis tag soup is asserted in
    tests/test_fast_tokenizer.py (plus the byte-identical goldens)."""
    stack: list = []  # (tag, marked, is_skip, is_head, is_block)
    block_stack: list[Block] = []
    blocks: list[Block] = []
    skip_depth = head_depth = boiler_depth = link_depth = 0
    data_counter = 0
    path_cache: dict = {}
    tag_flags = _TAG_FLAGS
    no_flags = _NO_FLAGS
    boiler_tokens = BOILER_ATTR_TOKENS
    search = _TOK.search
    unescape = _unescape

    def unwind(tag: str) -> None:
        # mirror of _BlockParser.handle_endtag's tolerant unwind
        nonlocal skip_depth, head_depth, boiler_depth, link_depth
        while stack:
            top_tag, marked, is_skip, is_head, is_block = stack.pop()
            if marked:
                boiler_depth -= 1
            if is_skip:
                skip_depth -= 1
            if is_head:
                head_depth -= 1
            if top_tag == "a":
                link_depth = max(0, link_depth - 1)
            if is_block and block_stack:
                b = block_stack.pop()
                if b.finalize(path_cache):
                    blocks.append(b)
            if top_tag == tag:
                break

    pos = 0
    lower = None  # lazily lowered copy for rawtext close-tag search
    n = len(html)
    while pos < n:
        m = search(html, pos)
        if m is None:
            data = html[pos:]
        else:
            start = m.start()
            data = html[pos:start] if start > pos else None
        if data and skip_depth == 0 and block_stack:
            # handle_data inlined (hottest callback). unescape-before-space-
            # check order preserved: &nbsp; unescapes to \xa0 which IS space.
            if "&" in data:
                data = unescape(data)
            b = block_stack[-1]
            if not data.isspace():
                if b.order == -1:
                    b.order = data_counter
                data_counter += 1
            b._chunks.append(data)
            if link_depth > 0:
                b._link_chunks.append(data)
        if m is None:
            break
        pos = m.end()
        # lastindex-dispatch: exactly one alternative matched — 1 = end tag,
        # 4 = start tag (its optional '/' group always participates), None =
        # comment/doctype/PI. One group fetch instead of four per token.
        li = m.lastindex
        if li == 1:
            tag = m.group(1).lower()
            if not tag_flags.get(tag, no_flags)[4]:  # void close: dropped
                unwind(tag)
        elif li is not None:
            start_tag, attr_str, self_close = m.group(2, 3, 4)
            tag = start_tag.lower()
            is_block, is_skip, is_head, is_boiler_tag, is_void = tag_flags.get(
                tag, no_flags
            )
            if not is_void:
                # handle_starttag inlined
                marked = is_boiler_tag
                if not marked and attr_str:
                    al = attr_str.lower()
                    if "id" in al or "class" in al or "role" in al:
                        for k, v in _parse_attrs(attr_str):
                            if k in ("id", "class", "role") and v:
                                for tok in (
                                    v.replace("-", " ").replace("_", " ").lower().split()
                                ):
                                    if tok in boiler_tokens:
                                        marked = True
                                        break
                                if marked:
                                    break
                stack.append((tag, marked, is_skip, is_head, is_block))
                if is_skip:
                    skip_depth += 1
                if is_head:
                    head_depth += 1
                if marked:
                    boiler_depth += 1
                if tag == "a":
                    link_depth += 1
                    if block_stack:
                        block_stack[-1].n_links += 1
                if block_stack:
                    block_stack[-1].n_tags += 1
                if is_block:
                    block_stack.append(
                        Block(
                            tag=tag,
                            _stack=tuple(stack),
                            region=(
                                "head"
                                if head_depth > 0
                                else ("boiler" if boiler_depth > 0 else "body")
                            ),
                        )
                    )
            if self_close and tag not in VOID_TAGS:
                unwind(tag)
            elif not self_close and (tag == "script" or tag == "style"):
                # rawtext containers: content is skipped (skip_depth>0
                # anyway); jump straight past the close tag
                if lower is None:
                    lower = html.lower()
                close = lower.find(f"</{tag}", pos)
                pos = close if close != -1 else n
        # comments / doctypes / processing instructions: dropped
    while stack:  # close_all
        unwind(stack[-1][0])
    return blocks


def parse_blocks(html: bytes | str, fast: bool = True) -> list[Block]:
    """Segment HTML into text blocks in document order, with density features.

    Deterministic: single whitespace-collapse rule (``" ".join(raw.split())``),
    NFC normalization. Returns blocks sorted by document order of their first
    text chunk (the reference sorts detections by top-y, ocr.py:266 — document
    order is the DOM equivalent). ``fast=True`` uses the regex tokenizer
    (same callbacks, ~2x); falls back to stdlib ``html.parser`` on any error.
    """
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html[:MAX_HTML_BYTES]).decode("utf-8", errors="replace")
    else:
        html = html[:MAX_HTML_BYTES]
    if fast:
        try:
            blocks = _parse_fast(html)
        except Exception:  # degrade to the battle-tested stdlib tokenizer
            return parse_blocks(html, fast=False)
    else:
        p = _BlockParser()
        try:
            p.feed(html)
            p.close()
        except Exception:
            pass  # keep whatever parsed; close_all salvages open blocks
        p.close_all()
        blocks = p.blocks
    blocks = sorted(blocks, key=lambda b: b.order)
    for i, b in enumerate(blocks):
        b.idx = i
    return blocks


def extract_text(html: bytes | str) -> str:
    """Main-content extraction: content blocks, document order, ``"\\n"``-joined.

    THE byte-identical contract (BASELINE.json input_hint). Fallback when the
    DOM yields no content blocks (the reference's Tesseract-second-engine
    analog, ocr.py:100-132): whitespace-collapsed tag-stripped text of ALL
    body blocks.
    """
    blocks = parse_blocks(html)
    content = [b.text for b in blocks if b.is_content]
    if not content:
        content = [b.text for b in blocks if b.region == "body"]
    return "\n".join(content)
