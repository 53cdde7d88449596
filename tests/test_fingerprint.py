"""Fingerprint properties (reference: fingerprint.rs:66-120 tests)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cargo_dupes_spark.functions.fingerprint import (
    composite_fingerprint_col,
    fingerprint_col,
    fingerprint_hex_col,
)


def test_deterministic_and_distinct(spark):
    df = spark.createDataFrame(
        [("same text",), ("same text",), ("other",)], "t string"
    ).select(fingerprint_col("t").alias("fp"))
    fps = [r.fp for r in df.collect()]
    assert fps[0] == fps[1] != fps[2]


def test_hex_roundtrip(spark):
    df = spark.createDataFrame([("x",), ("y",)], "t string").select(
        fingerprint_col("t").alias("fp")
    )
    df = df.withColumn("hx", fingerprint_hex_col("fp"))
    for r in df.collect():
        assert len(r.hx) == 16
        unsigned = int(r.hx, 16)
        signed = unsigned - (1 << 64) if unsigned >= (1 << 63) else unsigned
        assert signed == r.fp


def test_composite_order_independent(spark):
    """from_fingerprints sorts before hashing (fingerprint.rs:32-40)."""
    a = spark.createDataFrame([(1, 10), (1, 20), (1, 30)], "g int, fp long")
    b = spark.createDataFrame([(1, 30), (1, 10), (1, 20)], "g int, fp long")
    ca = a.groupBy("g").agg(composite_fingerprint_col("fp").alias("c")).first().c
    cb = b.groupBy("g").agg(composite_fingerprint_col("fp").alias("c")).first().c
    assert ca == cb
    c2 = (
        spark.createDataFrame([(1, 10), (1, 20)], "g int, fp long")
        .groupBy("g")
        .agg(composite_fingerprint_col("fp").alias("c"))
        .first()
        .c
    )
    assert ca != c2


def test_wide_fingerprint_shape_and_independence(spark):
    """128-bit mode: 32-char lowercase hex, deterministic, halves derived
    from independent seeds (never equal on real text), distinct texts get
    distinct fps."""
    df = spark.createDataFrame(
        [("same text",), ("same text",), ("other",)], "t string"
    ).select(fingerprint_col("t", bits=128).alias("fp"))
    fps = [r.fp for r in df.collect()]
    assert fps[0] == fps[1] != fps[2]
    for fp in fps:
        assert len(fp) == 32 and fp == fp.lower()
        int(fp, 16)  # valid hex
        assert fp[:16] != fp[16:]  # independent halves
    # low half IS the 64-bit fingerprint's hex form (the widening is an
    # extension, not a re-definition)
    narrow = (
        spark.createDataFrame([("same text",)], "t string")
        .select(fingerprint_hex_col(fingerprint_col("t")).alias("hx"))
        .first()
        .hx
    )
    assert fps[0][16:] == narrow


def test_wide_composite_order_independent(spark):
    a = spark.createDataFrame(
        [(1, "aa" * 16), (1, "bb" * 16)], "g int, fp string"
    )
    b = spark.createDataFrame(
        [(1, "bb" * 16), (1, "aa" * 16)], "g int, fp string"
    )
    ca = a.groupBy("g").agg(
        composite_fingerprint_col("fp", bits=128).alias("c")
    ).first().c
    cb = b.groupBy("g").agg(
        composite_fingerprint_col("fp", bits=128).alias("c")
    ).first().c
    assert ca == cb and len(ca) == 32
    # hex form of a 128-bit fp is the fp itself
    hx = a.select(fingerprint_hex_col("fp", bits=128).alias("h")).first().h
    assert hx in ("aa" * 16, "bb" * 16)
