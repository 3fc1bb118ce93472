"""PII redaction semantics: pattern hits, global replacement, and
engine-compat (no lookahead; the DuckDB twin is value-checked by the
gate — these tests pin the operator contract on crafted strings)."""

from __future__ import annotations

from key_resource_table_extractor_spark.operators.text import (
    redact_pii,
)
from pyspark.sql import functions as F


def _one(spark, s):
    df = spark.createDataFrame([(s,)], "t string")
    return df.select(redact_pii(F.col("t")).alias("r")).collect()[0]["r"]


def test_redacts_all_three_types_globally(spark):
    s = (
        "mail a@b.org and c.d+e@f-g.co, call 415-555-0042 or 212-555-9999,"
        " host 10.0.0.1 and 192.168.255.3 end"
    )
    r = _one(spark, s)
    assert r.count("[EMAIL]") == 2
    assert r.count("[PHONE]") == 2
    assert r.count("[IP]") == 2
    assert "@" not in r and "555-" not in r and "10.0.0.1" not in r


def test_clean_text_unchanged(spark):
    s = "no personal data here, just prose with numbers like 42 and 3.14"
    assert _one(spark, s) == s


def test_version_strings_not_eaten(spark):
    # a 3-part version number must not match the 4-part IPv4 pattern
    s = "upgrade to release 10.2.3 today"
    assert _one(spark, s) == s
