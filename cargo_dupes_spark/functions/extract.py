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
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCRIPT_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1>", re.S | re.I)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_BLOCK_RE = re.compile(r"</(p|div|li|h[1-6]|title|tr)>|<br\s*/?>", re.I)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def extract_text(raw: bytes | None, fallback: str | None) -> str | None:
    """Pinned extraction of one document (pure function, unit-testable)."""
    if raw is None:
        return fallback
    s = raw.decode("utf-8", errors="replace")
    s = _SCRIPT_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    s = _BLOCK_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    lines = [_WS_RE.sub(" ", ln).strip() for ln in s.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def extract_text_udf():
    """pandas UDF (Arrow batches): (html BINARY, text STRING) -> STRING."""

    @F.pandas_udf(T.StringType())
    def _extract(html_col: pd.Series, text_col: pd.Series) -> pd.Series:
        return pd.Series(
            [extract_text(h, t) for h, t in zip(html_col, text_col)],
            dtype="object",
        )

    return _extract


def extracted_text_col(html_col: str = "html", text_col: str = "text") -> Column:
    return extract_text_udf()(F.col(html_col), F.col(text_col))
