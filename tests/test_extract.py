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
        df.withColumn("ex", extracted_text_col("html", "text").getField("extracted_text"))
        .filter(F.col("ex") != F.col("text"))
        .count()
    )
    assert mismatches == 0


def test_rule_table_second_content_type():
    """P5: the same UDF skeleton runs a different rule set (NodeMapping
    analog) — markdown and plain-text rules, selected by content type."""
    from cargo_dupes_spark.functions.extract import extract_text_err

    md = (
        "# Title\n\nsome **bold** and _em_ text with a "
        "[link](http://x.example)\n\n```\ncode dropped\n```\ntail"
    ).encode()
    text, err = extract_text_err(md, None, "text/markdown")
    assert err is None
    assert text == "Title\nsome bold and em text with a link\ntail"
    plain, _ = extract_text_err(b"keep <tags> as-is &amp; raw", None, "text/plain")
    assert plain == "keep <tags> as-is &amp; raw"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no extraction rules"):
        extract_text_err(b"x", None, "application/pdf")


def test_opaque_with_name_ruleset():
    """N7: under text/html+opaque, a stripped script/style block leaves its
    TAG NAME as an opaque placeholder token (MacroCall{name} analog) — two
    docs differing only in script content extract identically."""
    a = b"<html><body><p>same body</p><script>f(1)</script></body></html>"
    b_ = b"<html><body><p>same body</p><script>g(2, 3)</script></body></html>"
    ta = extract_text(a, None, "text/html+opaque")
    tb = extract_text(b_, None, "text/html+opaque")
    assert ta == tb == "same body\n<script>"
    # style keeps its own name; default html rules still strip to nothing
    c = b"<p>x</p><style>p{}</style>"
    assert extract_text(c, None, "text/html+opaque") == "x\n<style>"
    assert extract_text(c, None) == "x"


def test_decode_failure_tagged_not_dropped():
    """Invalid utf-8 is extracted best-effort (byte-identical to a plain
    errors='replace' decode) AND reported — the reference's never-silent
    warning channel (lib.rs:50-66)."""
    from cargo_dupes_spark.functions.extract import extract_text_err

    bad = b"<html><body><p>ok \xff\xfe bytes</p></body></html>"
    text, err = extract_text_err(bad, None)
    assert text == extract_text(bad, None)  # still extracted
    assert "ok" in text and "�" in text
    assert err is not None and "utf8 decode" in err
    # valid input: no error, unchanged behavior
    good_text, good_err = extract_text_err(_wrap_html("fine"), None)
    assert good_err is None and good_text == "fine"
    # neither html nor text is counted too
    assert extract_text_err(None, None) == (None, "no html and no text")
