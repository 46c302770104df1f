"""PII redaction unit tests: pattern coverage, ordering, idempotency, and
count/redaction agreement (the oracle parity runs in the driver gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from duck_delta_share_spark.functions.text import PII_PATTERNS, pii_counts, pii_redact


def _redact_one(spark, s: str):
    df = spark.createDataFrame([(s,)], ["t"])
    return df.select(
        pii_redact("t").alias("red"), *pii_counts(F.col("t"))
    ).collect()[0]


def test_all_categories_redacted(spark):
    r = _redact_one(
        spark,
        "mail a.b+c@ex-ample.org node 10.2.3.4 id 123-45-6789 tel +1 555 867-5309 end",
    )
    assert r.red == "mail <EMAIL> node <IP> id <SSN> tel <PHONE> end"
    assert (r.n_email, r.n_ip, r.n_ssn, r.n_phone) == (1, 1, 1, 1)


def test_multiple_matches_and_counts(spark):
    r = _redact_one(spark, "a@b.co x@y.io 1.2.3.4 5.6.7.8 9.10.11.12")
    assert r.red == "<EMAIL> <EMAIL> <IP> <IP> <IP>"
    assert r.n_email == 2 and r.n_ip == 3


def test_redaction_idempotent(spark):
    once = _redact_one(spark, "ping admin@corp.net from 192.168.0.1").red
    r2 = _redact_one(spark, once)
    assert r2.red == once
    assert (r2.n_email, r2.n_ip, r2.n_ssn, r2.n_phone) == (0, 0, 0, 0)


def test_clean_text_untouched(spark):
    s = "no personal data here just words and 42 numbers"
    r = _redact_one(spark, s)
    assert r.red == s
    assert (r.n_email, r.n_ip, r.n_ssn, r.n_phone) == (0, 0, 0, 0)


def test_patterns_are_re2_safe():
    """The DuckDB oracle runs these byte-identical patterns under RE2 —
    no lookaround/backreferences allowed, and each must compile."""
    import re

    for pattern, repl in PII_PATTERNS:
        re.compile(pattern)
        assert "(?=" not in pattern and "(?<" not in pattern and "\\1" not in pattern
        assert repl.startswith("<") and repl.endswith(">")
