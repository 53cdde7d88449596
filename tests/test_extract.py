"""HTML extraction: the byte-identical invariant (BASELINE.json input_hint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cargo_dupes_spark.functions.extract import extract_text, extracted_text_col
from cargo_dupes_spark.sources.web_pages import _wrap_html, generate_web_pages


def test_round_trip_pure():
    text = "Title Line\npara one words\npara two words"
    assert extract_text(_wrap_html(text), None) == text


def test_script_style_comment_stripped():
    html = (
        b"<html><head><title>T</title><style>p{}</style>"
        b"<script>if(a<b){}</script></head>"
        b"<body><p>keep</p><!-- drop --></body></html>"
    )
    assert extract_text(html, None) == "T\nkeep"


def test_entities_and_whitespace():
    html = b"<html><body><p>a &amp; b   c</p><p></p></body></html>"
    assert extract_text(html, None) == "a & b c"


def test_null_html_passthrough():
    assert extract_text(None, "already extracted") == "already extracted"


def test_corpus_byte_identical(spark, fixture_corpus):
    """Every generated row must extract to exactly its ground-truth text —
    the per-url invariant, end-to-end through the pandas UDF."""
    df, _ = fixture_corpus
    mismatches = (
        df.withColumn("ex", extracted_text_col("html", "text"))
        .filter(F.col("ex") != F.col("text"))
        .count()
    )
    assert mismatches == 0
