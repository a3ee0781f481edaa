"""URL canonicalization for web-crawl dedup.

A re-crawled page is frequently "duplicated" purely in the key space:
`HTTP://Example.com/a?utm_source=feed#top` and `http://example.com/a` are
the same fetch.  Canonicalizing BEFORE content dedup collapses those rows
in the cheap exact tier instead of burning near-dup candidates on them.

Same dual-formulation contract as functions/textstats.py: a Spark Column
expression chain (pure JVM regex ops, whole-stage codegen) and a DuckDB
SQL string computing the identical result (the replacement-group syntax
differs — `$1` in Java regex, `\\1` in RE2 — so the two are written
side by side and pinned against each other by tests/test_urls.py and the
url_canonical_dups oracle).

Rules (applied in order; each is a single global leftmost regex pass in
both engines):
  1. drop the fragment (`#...`)
  2. lowercase scheme and host:port (path/query case is significant)
  3. strip the scheme-default port (`:80` for http, `:443` for https)
  4. drop tracking params (`utm_*`, `gclid`, `fbclid`), then normalize
     separators (`?&`->`?`, `&&`->`&`, trailing `?`/`&` dropped)
  5. strip trailing slashes from the path

Deliberately NOT done: query-param sorting (reordering changes semantics
on some endpoints) and percent-decoding (decode-then-compare can merge
genuinely different keys); both sides of a pipeline must agree on the
same conservative rule set, which is the point of canonicalizing at all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_TRACK = r"([?&])(utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&#]*"


def canonical_url(url: Column) -> Column:
    # A key with no `scheme://` prefix passes through UNCHANGED: the old
    # behavior glued '://' onto empty extracts, silently rewriting every
    # schemeless doc_id key to a garbled form (no false merges, but ids
    # drifted).  Mirrored in sql_canonical_url.
    return F.when(
        url.rlike(_SCHEME), _canonical_url_inner(url)
    ).otherwise(url)


def _canonical_url_inner(url: Column) -> Column:
    s = F.regexp_replace(url, r"#.*", "")           # 1. fragment
    scheme = F.lower(F.regexp_extract(s, _SCHEME, 1))
    hostport = F.lower(F.regexp_extract(s, _HOSTPORT, 1))
    rest = F.regexp_replace(s, _HOSTPORT, "")
    host = F.when(                                   # 3. default ports
        scheme == "http", F.regexp_replace(hostport, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(hostport, r":443$", "")
    ).otherwise(hostport)
    rest = F.regexp_replace(rest, _TRACK, "$1")      # 4. tracking params
    rest = F.regexp_replace(rest, r"&&+", "&")       # before ?&: "?&&k"
    rest = F.regexp_replace(rest, r"\?&", "?")
    rest = F.regexp_replace(rest, r"[?&]$", "")
    # 5. trailing slashes — on the PATH only: '/dir/?k' -> '/dir?k', and
    # the bare-$ strip runs only when no query remains (a query VALUE
    # ending in '/' is a genuinely different key, never merged)
    rest = F.regexp_replace(rest, r"/+\?", "?")
    rest = F.when(rest.contains("?"), rest).otherwise(
        F.regexp_replace(rest, r"/+$", "")
    )
    return F.concat(scheme, F.lit("://"), host, rest)


def sql_canonical_url(url: str) -> str:
    inner = _sql_canonical_url_inner(url)
    return (
        f"(case when regexp_matches({url}, '{_SCHEME}') "
        f"then {inner} else {url} end)"
    )


def _sql_canonical_url_inner(url: str) -> str:
    s = f"regexp_replace({url}, '#.*', '', 'g')"
    scheme = f"lower(regexp_extract({s}, '{_SCHEME}', 1))"
    hostport = f"lower(regexp_extract({s}, '{_HOSTPORT}', 1))"
    rest = f"regexp_replace({s}, '{_HOSTPORT}', '', 'g')"
    host = (
        f"(case when {scheme} = 'http' "
        f"then regexp_replace({hostport}, ':80$', '') "
        f"when {scheme} = 'https' "
        f"then regexp_replace({hostport}, ':443$', '') "
        f"else {hostport} end)"
    )
    rest = f"regexp_replace({rest}, '{_TRACK}', '\\1', 'g')"
    rest = f"regexp_replace({rest}, '&&+', '&', 'g')"
    rest = f"regexp_replace({rest}, '\\?&', '?', 'g')"
    rest = f"regexp_replace({rest}, '[?&]$', '', 'g')"
    rest = f"regexp_replace({rest}, '/+\\?', '?', 'g')"
    rest = (
        f"(case when position('?' in {rest}) > 0 then {rest} "
        f"else regexp_replace({rest}, '/+$', '', 'g') end)"
    )
    return f"({scheme} || '://' || {host} || {rest})"
