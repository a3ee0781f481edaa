"""PII counts + scrubbing: hand-expected values and Spark/DuckDB parity
(Java regex vs RE2 on the same battery — the twin discipline from
test_urls.py)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from humid_spark.functions.pii import (
    email_count,
    ipv4_count,
    scrub_pii,
    sql_email_count,
    sql_ipv4_count,
    sql_scrub_pii,
    sql_ssn_count,
    ssn_count,
)

# (text, n_emails, n_ips, n_ssns, scrubbed)
CASES = [
    ("contact user42@example.org or admin@mail.example.com now",
     2, 0, 0, "contact [EMAIL] or [EMAIL] now"),
    ("host 10.0.17.7 ssn 123-45-6789 tail",
     0, 1, 1, "host [IP] ssn [SSN] tail"),
    # a@b and a@b.c miss the 2+-letter TLD rule; x@y.zz matches
    ("no pii 1234.5.6.7 a@b a@b.c x@y.zz",
     1, 0, 0, "no pii 1234.5.6.7 a@b a@b.c [EMAIL]"),
    # IPv4 is syntax-shaped, not value-validated (crawl-cleaning shape);
    # the 5-octet string matches its first four octets
    ("edge 999.999.999.999 and 1.2.3.4.5",
     0, 2, 0, "edge [IP] and [IP].5"),
    # '-' is a word boundary on both sides of the SSN
    ("and-123-45-6789-x", 0, 0, 1, "and-[SSN]-x"),
    ("", 0, 0, 0, ""),
    (None, 0, 0, 0, ""),
]


def _spark_rows(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(CASES)], "i int, t string"
    )
    return {
        r["i"]: r
        for r in df.select(
            "i",
            email_count(F.col("t")).alias("e"),
            ipv4_count(F.col("t")).alias("ip"),
            ssn_count(F.col("t")).alias("s"),
            scrub_pii(F.col("t")).alias("scr"),
        ).collect()
    }


def test_pii_hand_values(spark):
    rows = _spark_rows(spark)
    for i, (t, e, ip, s, scr) in enumerate(CASES):
        r = rows[i]
        assert (r["e"], r["ip"], r["s"], r["scr"]) == (e, ip, s, scr), (t, r)


def test_pii_sql_parity(spark):
    rows = _spark_rows(spark)
    con = duckdb.connect()
    q = (
        f"SELECT {sql_email_count('t')}, {sql_ipv4_count('t')}, "
        f"{sql_ssn_count('t')}, {sql_scrub_pii('t')} FROM (SELECT ? AS t)"
    )
    for i, (t, *_), in enumerate(CASES):
        e, ip, s, scr = con.execute(q, [t]).fetchone()
        r = rows[i]
        assert (r["e"], r["ip"], r["s"], r["scr"]) == (e, ip, s, scr), (t,)
