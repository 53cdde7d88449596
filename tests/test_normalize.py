"""Normalizer unit tests — hand-computed expectations (the analog of the
reference's placeholder/similarity unit tests, node.rs:369-581)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cargo_dupes_spark.functions.normalize import (
    is_boilerplate_col,
    n_tokens_col,
    n_tokens_sql,
    normalize_text_col,
    normalize_text_sql,
)

CASES = [
    ("Hello, World!", "hello world"),
    ("It's 42 degrees", "it s <num> degrees"),
    ("pi is 3.14159", "pi is <num>"),
    ("visit https://x.com/a?b=1 now", "visit <url> now"),
    ("mail me@foo.com ok", "mail <email> ok"),
    ("“smart” – dash", "smart dash"),  # quotes/dash fold then strip
    ("  MANY    spaces\t\tand\nnewlines  ", "many spaces and newlines"),
    ("", ""),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_normalize_expected(spark, raw, expected):
    got = (
        spark.createDataFrame([(raw,)], "text string")
        .select(normalize_text_col("text").alias("n"))
        .first()[0]
    )
    assert got == expected


def test_normalize_duckdb_parity(spark):
    """The SQL renderer must match the Column renderer byte-for-byte —
    the oracle contract."""
    raws = [c[0] for c in CASES] + [
        "A—B—C", "ünïcode blüb 123", "a b", "UPPER lower MiXeD 999",
    ]
    got = [
        r[0]
        for r in spark.createDataFrame([(x,) for x in raws], "text string")
        .select(normalize_text_col("text").alias("n"))
        .collect()
    ]
    con = duckdb.connect()
    sql = normalize_text_sql("text")
    for raw, g in zip(raws, got):
        d = con.execute(f"select {sql} from (select ? as text)", [raw]).fetchone()[0]
        assert d == g, f"parity broke for {raw!r}: spark={g!r} duck={d!r}"


def test_n_tokens(spark):
    df = spark.createDataFrame(
        [("a b c",), ("",), ("single",)], "norm string"
    ).select(n_tokens_col("norm").alias("nt"))
    assert [r.nt for r in df.collect()] == [3, 0, 1]
    con = duckdb.connect()
    for s, want in [("a b c", 3), ("", 0), ("single", 1)]:
        got = con.execute(
            f"select {n_tokens_sql('s')} from (select ? as s)", [s]
        ).fetchone()[0]
        assert got == want


def test_boilerplate_tag(spark):
    df = spark.createDataFrame(
        [("<num> not found page",), ("regular content here",)],
        "norm string",
    ).select(is_boilerplate_col("norm").alias("b"))
    assert [r.b for r in df.collect()] == [True, False]
