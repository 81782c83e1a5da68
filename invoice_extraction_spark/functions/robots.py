"""Meta-robots compliance gate — pure Column expressions.

Responsible corpus builders honor ``<meta name="robots" content="noindex">``
(and its googlebot variant): a page that opts out of indexing opts out of
corpus inclusion. Common Crawl itself ships such pages, so the gate belongs
in the pipeline, not the crawler.

Detection is a regex over the decoded payload — attribute ORDER varies in
the wild (name-then-content and content-then-name both occur), quotes are
optional, and the directive list is comma-separated (``noindex, nofollow``).
Both orderings are matched; ``noindex`` inside OTHER attribute values does
not trip the gate because the match is anchored inside a single meta tag
with both attributes present. PDF payloads (no meta tags) and binary junk
simply never match — the gate is HTML-scoped by construction.

Kept portable across Java regex and RE2 (no lookarounds) so the DuckDB
oracle evaluates the identical rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one meta tag, robots-ish name, noindex among the content directives —
# in either attribute order. [^>]* keeps the match inside the tag.
_NAME = """name\\s*=\\s*["']?(?:robots|googlebot)["']?"""
_CONTENT = """content\\s*=\\s*["']?[^"'>]*noindex"""
NOINDEX_RE = f"(?i)<meta\\s[^>]*(?:{_NAME}[^>]*{_CONTENT}|{_CONTENT}[^>]*{_NAME})"


def meta_noindex(html_col: Column | str) -> Column:
    """True when the payload carries a robots/googlebot noindex directive.

    Decodes ISO-8859-1, not UTF-8: every byte sequence is valid latin-1, so
    binary payloads (PDF, images) can never throw (ANSI-mode ``decode``
    raises MALFORMED_CHARACTER_CODING on invalid UTF-8 — a compressed PDF
    stream is exactly that), and the match is ASCII-only so the charset
    choice cannot change the verdict."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    return F.decode(c, "ISO-8859-1").rlike(NOINDEX_RE)


def drop_noindex(df: DataFrame, html_col: str = "html") -> DataFrame:
    """The compliance filter: keep only pages that allow indexing. Map-only,
    zero shuffles — run it at scan time, before anything expensive."""
    return df.filter(~meta_noindex(F.col(html_col)))
