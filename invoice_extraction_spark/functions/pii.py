"""PII scrubbing — the redaction pass every pretraining pipeline runs before
text leaves the ingest tier. Pure Column regexp work (JVM-side, codegen'd),
patterns kept lookaround-free so they mean the same thing in Java regex
(Spark) and RE2 (DuckDB oracle) — that cross-engine agreement is itself
verified by the q:pii_scrub driver query.

Scope: emails, IPv4 addresses, international-ish phone numbers. This is the
deterministic regex tier; an NER-based second pass would slot in as another
Arrow kernel (same pattern as the extraction kernel), not here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
# digits with -. space separators, 9-16 chars total, optional +country;
# applied AFTER emails/IPs are already replaced so their digits can't match
PHONE_RE = r"\+?\b\d[\d\-. ]{7,14}\d\b"

_REDACTIONS = [
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
]


def _c(text: Column | str) -> Column:
    return F.col(text) if isinstance(text, str) else text


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Match counts per PII class (for redaction-rate reporting)."""
    c = _c(text)
    # counted in scrub order on the progressively-redacted text, so counts
    # agree exactly with what scrub_pii replaces
    emails = F.regexp_count(c, F.lit(EMAIL_RE))
    after_email = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    ips = F.regexp_count(after_email, F.lit(IPV4_RE))
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    phones = F.regexp_count(after_ip, F.lit(PHONE_RE))
    return {"n_emails": emails, "n_ips": ips, "n_phones": phones}


def scrub_pii(text: Column | str) -> Column:
    """Redact emails -> IPv4s -> phones (order matters: later, broader
    patterns must never eat digits of an already-typed match)."""
    out = _c(text)
    for pat, token in _REDACTIONS:
        out = F.regexp_replace(out, pat, token)
    return out
