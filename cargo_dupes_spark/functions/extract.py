"""HTML → text extraction (P1/P2 analog).

The reference's per-file parse (``LanguageAnalyzer::parse_file``,
``dupes-core/src/analyzer.rs:25-31``) becomes a vectorized pandas UDF over
the ``html BINARY`` column. The invariant demanded by BASELINE.json
input_hint is **byte-identical extracted text per url** — so the algorithm
is pinned, pure-Python, locale/version independent, and fully specified
here:

  1. utf-8 decode (errors='replace')
  2. drop <script>/<style>/<!-- --> blocks
  3. block-separating tags (</p> </div> </li> </h1..6> </title> <br>) -> \n
  4. strip all remaining tags
  5. html.unescape entities
  6. per line: collapse internal whitespace to single spaces, strip;
     drop empty lines; join with '\n'

Rows whose html is NULL pass their existing ``text`` through unchanged
(pre-extracted corpora such as /root/testdata documents).

Failure accounting (S3/O6, the reference's warning channel —
``dupes-core/src/lib.rs:50-66``: never drop a file silently): every row also
yields an ``extract_error`` string (NULL on success). A corrupt html row is
still extracted best-effort (errors='replace', byte-identical to the
round-1 behavior) but the error is COUNTED — it flows into the stage's
lineage summary row via the write-time Observation (sources/catalog.py).

The extraction algorithm is TABLE-DRIVEN per content type (P5 — the
reference's ``NodeMapping`` table configures tree-sitter normalization per
language, ``dupes-treesitter/src/mapping.rs:11-62``): ``EXTRACTION_RULES``
maps a content type to an ordered list of (regex, replacement) steps plus an
entity-unescape flag; the decode → steps → line-collapse skeleton is shared.
The default 'text/html' rule set reproduces the round-1 pinned algorithm
byte-for-byte (tests/test_extract.py byte-identity tests).
"""

from __future__ import annotations

import html as _html
import re
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WS_RE = re.compile(r"\s+")


@dataclass(frozen=True)
class ExtractionRules:
    """Ordered (pattern, replacement) regex steps (flags inline, e.g.
    '(?si)') applied after utf-8 decode; then optional entity unescape; then
    the fixed per-line whitespace collapse."""

    steps: tuple[tuple[str, str], ...] = ()
    unescape_entities: bool = False


EXTRACTION_RULES: dict[str, ExtractionRules] = {
    # the pinned round-1 html algorithm, expressed as data
    "text/html": ExtractionRules(
        steps=(
            (r"(?si)<(script|style)\b[^>]*>.*?</\1>", " "),
            (r"(?s)<!--.*?-->", " "),
            (r"(?i)</(p|div|li|h[1-6]|title|tr)>|<br\s*/?>", "\n"),
            (r"<[^>]+>", " "),
        ),
        unescape_entities=True,
    ),
    # N7 "opaque node with a name" (MacroCall{name} analog,
    # dupes-rust/src/normalizer/helpers.rs:15-31): embedded script/style
    # blocks collapse to an opaque placeholder CARRYING THE TAG NAME
    # (<script>/<style> tokens, same shape as the normalizer's <url>/<num>
    # placeholders) — two docs differing only in script CONTENT become
    # exact duplicates, like two call sites of the same macro. Kept as a
    # separate rule set: the default text/html preserves the round-1
    # byte-identity contract (fixtures assume scripts strip to nothing).
    "text/html+opaque": ExtractionRules(
        steps=(
            (r"(?si)<(script|style)\b[^>]*>.*?</\1>", r" <\1> "),
            (r"(?s)<!--.*?-->", " "),
            (r"(?i)</(p|div|li|h[1-6]|title|tr)>|<br\s*/?>", "\n"),
            # strip tags EXCEPT the bare <script>/<style> placeholders the
            # first step just planted
            (r"(?i)<(?!script>|style>)[^>]+>", " "),
        ),
        unescape_entities=True,
    ),
    # markdown: drop fenced code, strip heading/emphasis markers, keep link
    # text, paragraph boundaries already literal newlines
    "text/markdown": ExtractionRules(
        steps=(
            (r"(?s)```.*?```", " "),
            (r"(?m)^#{1,6}[ \t]+", ""),
            (r"\[([^\]]*)\]\([^)]*\)", r"\1"),
            (r"(\*\*|__|\*|_)", ""),
        ),
        unescape_entities=False,
    ),
    # pre-rendered plain text: decode + line collapse only
    "text/plain": ExtractionRules(),
}

_COMPILED: dict[str, tuple[tuple[re.Pattern, str], ...]] = {}


def _compiled_steps(content_type: str) -> tuple[tuple[re.Pattern, str], ...]:
    if content_type not in _COMPILED:
        if content_type not in EXTRACTION_RULES:
            raise ValueError(
                f"no extraction rules for {content_type!r}; "
                f"known: {sorted(EXTRACTION_RULES)}"
            )
        rules = EXTRACTION_RULES[content_type]
        _COMPILED[content_type] = tuple(
            (re.compile(p), r) for p, r in rules.steps
        )
    return _COMPILED[content_type]


def extract_text_err(
    raw: bytes | None,
    fallback: str | None,
    content_type: str = "text/html",
) -> tuple[str | None, str | None]:
    """Pinned extraction of one document -> (text, error). Pure function.

    Decode failures do NOT drop the row: the bad bytes are replaced (same
    output bytes as a plain errors='replace' decode) and the error is
    reported alongside."""
    if raw is None:
        if fallback is None:
            return None, "no html and no text"
        return fallback, None
    try:
        s = raw.decode("utf-8")
        err = None
    except UnicodeDecodeError as e:
        s = raw.decode("utf-8", errors="replace")
        err = f"utf8 decode: {e.reason} at byte {e.start} (replaced)"
    for pattern, repl in _compiled_steps(content_type):
        s = pattern.sub(repl, s)
    if EXTRACTION_RULES[content_type].unescape_entities:
        s = _html.unescape(s)
    lines = [_WS_RE.sub(" ", ln).strip() for ln in s.split("\n")]
    return "\n".join(ln for ln in lines if ln), err


def extract_text(
    raw: bytes | None, fallback: str | None, content_type: str = "text/html"
) -> str | None:
    """Text-only view of extract_text_err (byte-identity contract holder)."""
    return extract_text_err(raw, fallback, content_type)[0]


_EXTRACT_RESULT = T.StructType(
    [
        T.StructField("extracted_text", T.StringType()),
        T.StructField("extract_error", T.StringType()),
    ]
)


def extract_text_udf(content_type: str = "text/html"):
    """pandas UDF (Arrow batches): (html BINARY, text STRING) ->
    STRUCT<extracted_text, extract_error>. One rule set per UDF instance —
    the rules are resolved once and shipped in the closure."""
    if content_type not in EXTRACTION_RULES:
        raise ValueError(
            f"no extraction rules for {content_type!r}; "
            f"known: {sorted(EXTRACTION_RULES)}"
        )

    @F.pandas_udf(_EXTRACT_RESULT)
    def _extract(html_col: pd.Series, text_col: pd.Series) -> pd.DataFrame:
        rows = [
            extract_text_err(h, t, content_type)
            for h, t in zip(html_col, text_col)
        ]
        return pd.DataFrame(rows, columns=["extracted_text", "extract_error"])

    return _extract


def extracted_text_col(
    html_col: str = "html",
    text_col: str = "text",
    content_type: str = "text/html",
) -> Column:
    """STRUCT<extracted_text, extract_error> column."""
    return extract_text_udf(content_type)(F.col(html_col), F.col(text_col))
