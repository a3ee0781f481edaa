"""PII detection + scrubbing over web text: emails, IPv4 addresses,
SSN-shaped ids — counts per doc and a redacted text column.

The standard pre-training privacy pass (C4 and most public pipelines
strip or mask these).  Patterns are deliberately restricted to syntax
that Java regex (Spark, JVM-side regexp_* expressions — whole-stage
codegen, no UDFs) and RE2 (the DuckDB oracle) interpret IDENTICALLY:
character classes, bounded repetition, \\b word boundaries; no
lookaround, no backrefs.  Every function has a sql_* twin, same
discipline as functions/urls.py (Java $1 vs RE2 \\1 is irrelevant here —
replacements are literals).

Scrub order is fixed (email -> ipv4 -> ssn) and the replacement tokens
contain no digits or '@', so later passes can never match inside an
earlier redaction.

Scale: all pure JVM expressions over the text column — narrow, no
shuffle, pushdown-friendly; at 100 TB this runs inside the same scan
that computes quality/repetition signals (functions/textstats.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# local-part@host.tld — the pragmatic crawl-cleaning shape, not RFC 5322
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
SSN_RE = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

_SCRUB_ORDER = ((EMAIL_RE, "[EMAIL]"), (IPV4_RE, "[IP]"), (SSN_RE, "[SSN]"))


def _count(text: Column, pattern: str) -> Column:
    t = F.coalesce(text, F.lit(""))
    return F.size(
        F.regexp_extract_all(t, F.lit(pattern), F.lit(0))
    ).cast("long")


def email_count(text: Column) -> Column:
    return _count(text, EMAIL_RE)


def ipv4_count(text: Column) -> Column:
    return _count(text, IPV4_RE)


def ssn_count(text: Column) -> Column:
    return _count(text, SSN_RE)


def scrub_pii(text: Column) -> Column:
    """Redact all three PII shapes; NULL text -> '' (the usual
    coalesce-at-ingest convention, matching contamination_stats)."""
    t = F.coalesce(text, F.lit(""))
    for pat, repl in _SCRUB_ORDER:
        t = F.regexp_replace(t, pat, repl)
    return t


# --------------------------- DuckDB twins ---------------------------
# RE2 needs no escaping changes for these patterns; single quotes in SQL
# literals would, but the patterns contain none.

def _sql_count(text: str, pattern: str) -> str:
    return (
        f"CAST(len(regexp_extract_all(coalesce({text}, ''), "
        f"'{pattern}')) AS BIGINT)"
    )


def sql_email_count(text: str) -> str:
    return _sql_count(text, EMAIL_RE)


def sql_ipv4_count(text: str) -> str:
    return _sql_count(text, IPV4_RE)


def sql_ssn_count(text: str) -> str:
    return _sql_count(text, SSN_RE)


def sql_scrub_pii(text: str) -> str:
    t = f"coalesce({text}, '')"
    for pat, repl in _SCRUB_ORDER:
        t = f"regexp_replace({t}, '{pat}', '{repl}', 'g')"
    return t
