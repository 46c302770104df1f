"""Round-7 unicode boundary: DuckDB's levenshtein counts UTF-8 BYTES
while Spark counts CODEPOINTS — the edit-distance oracle is exact only
on ASCII content (the companion of the r6 lower()-casing boundary).
Pins both the agreement zone (ASCII) and the divergence (non-ASCII) so
a silent behavior change in either engine surfaces here."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F


def test_levenshtein_agrees_on_ascii(spark):
    pairs = [
        ("kitten", "sitting"),
        ("flaw", "lawn"),
        ("", "abc"),
        ("same", "same"),
        ("a b c d", "a c b d"),
    ]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = {
        (r["a"], r["b"]): r["d"]
        for r in df.select(
            "a", "b", F.levenshtein("a", "b").alias("d")
        ).collect()
    }
    con = duckdb.connect()
    for a, b in pairs:
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert got[(a, b)] == want, (a, b)
    # the thresholded 3-arg kernel agrees with the full kernel in range
    got3 = {
        (r["a"], r["b"]): r["d"]
        for r in df.select(
            "a", "b", F.levenshtein("a", "b", 10).alias("d")
        ).collect()
    }
    assert got3 == got


def test_levenshtein_diverges_on_non_ascii_by_construction(spark):
    # é is 2 UTF-8 bytes: DuckDB counts 2 edits where Spark counts 1.
    # If either engine changes behavior, this pin fails and the fuzz
    # exclusion (tests/test_oracle_fuzz_r7.py KNOWN_ENGINE_DIVERGENCE)
    # must be re-adjudicated.
    df = spark.createDataFrame([("café", "cafe")], "a string, b string")
    spark_d = df.select(F.levenshtein("a", "b").alias("d")).first()["d"]
    duck_d = duckdb.connect().execute(
        "SELECT levenshtein('café', 'cafe')"
    ).fetchone()[0]
    assert spark_d == 1, "Spark levenshtein must count codepoints"
    assert duck_d == 2, "DuckDB levenshtein must count UTF-8 bytes"
