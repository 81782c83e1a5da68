"""Text repair for web corpora: mojibake, control chars, punctuation.

Crawled text arrives broken in predictable ways, and every production
pipeline runs a repair pass (the ftfy niche):

- **mojibake**: UTF-8 bytes mis-decoded as Latin-1/cp1252 somewhere
  upstream ("é" shipped as "Ã©", sometimes doubly so). The inverse is
  mechanical — re-encode as Latin-1, re-decode as UTF-8, repeat while it
  keeps working — but it is NOT safely expressible as a Column program
  under ANSI mode (``decode`` throws on any invalid sequence, and mixed
  clean/broken text guarantees invalid sequences), so the fixer is a
  vectorized Arrow kernel (``pandas_udf``): per-string try/except,
  converges in <= ``_MAX_PASSES`` rounds, never touches clean text.
- **control characters**: C0/C1 controls (minus \\t \\n) are OCR/crawl
  noise — stripped by a pure Column regex.
- **punctuation normalization**: curly quotes, long dashes, ellipsis,
  NBSP -> ASCII equivalents, pure Column ``translate`` (codegen'd) — the
  canonicalization that keeps n-gram dedup and anchors from fragmenting
  on typography.

``clean_text`` composes all three (Column stages around the one Arrow
stage). The kernel is deliberately conservative: a repair is accepted only
if the result decodes cleanly AND shrinks or preserves length (real
mojibake inflates byte length; fixing never should).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_CONTROL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]"

# ‘ ’ “ ” – — NBSP -> ' ' " " - - space;
# ellipsis is replaced separately (1 -> 3 chars, translate cannot grow)
_PUNCT_SRC = "‘’“”–— "
_PUNCT_DST = "''\"\"-- "

_MAX_PASSES = 3  # double-encoding is common, triple exists, more is noise


def strip_control_chars(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(c, _CONTROL_RE, "")


def normalize_punct(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.translate(
        F.regexp_replace(c, "…", "..."), _PUNCT_SRC, _PUNCT_DST
    )


def _sloppy_cp1252_bytes(s: str) -> bytes:
    """Invert a cp1252 (or latin-1) mis-decode: cp1252 for the printable
    0x80-0x9F remappings (€ ” œ ...), raw codepoint for everything else
    <= 0xFF (covering cp1252's five undefined slots, which sloppy decoders
    pass through as C1 controls). Chars > 0xFF mean the text was never a
    single-byte mis-decode — raise, caller passes the string through."""
    out = bytearray()
    for ch in s:
        try:
            out += ch.encode("cp1252")
        except UnicodeEncodeError:
            cp = ord(ch)
            if cp > 0xFF:
                raise
            out.append(cp)
    return bytes(out)


def _fix_one(s: str) -> str:
    for _ in range(_MAX_PASSES):
        try:
            fixed = _sloppy_cp1252_bytes(s).decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            return s
        if len(fixed) > len(s):  # repairs deflate; growth means false positive
            return s
        if fixed == s:
            return s
        s = fixed
    return s


# StringType() instance, not the "string" DDL string: DDL parsing at
# decoration time requires an active SparkSession (imports would fail in
# session-less contexts like pytest collection)
@pandas_udf(StringType())
def fix_mojibake(texts: pd.Series) -> pd.Series:
    """Arrow-vectorized mojibake repair. The sloppy-cp1252 round trip only
    succeeds on strings every char of which maps back to a byte AND whose
    bytes form valid UTF-8 — i.e. genuinely mis-decoded text; anything else
    (clean ASCII+accents, Devanagari, CJK, emoji, or clean smart quotes
    MIXED with mojibake) fails one of the two codecs and passes through
    byte-identical."""
    return texts.map(lambda s: _fix_one(s) if isinstance(s, str) else s)


def clean_text(text: Column | str) -> Column:
    """The composed repair stage: mojibake kernel, then control strip and
    punctuation normalization (Column), then whitespace re-collapse."""
    c = F.col(text) if isinstance(text, str) else text
    repaired = fix_mojibake(c)
    return F.trim(
        F.regexp_replace(normalize_punct(strip_control_chars(repaired)), r"\s+", " ")
    )
