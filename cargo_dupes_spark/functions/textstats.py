"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, document fingerprinting.

These extend the engine beyond the reference's operator set (the reference
tags test code, ``dupes-rust/src/parser.rs:14-26`` — the same tag-don't-drop
philosophy applies to quality/lang tags here). Everything is built-in
column expressions so Catalyst codegens it; each has a DuckDB-SQL renderer
for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- language ID: stopword-hit heuristic ---------------------------------
# tiny per-language stopword lists (public knowledge); the language with the
# most distinct stopword hits wins, ties broken lexicographically smaller
# language code, zero hits -> 'und'
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with", "for", "was"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "nicht", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "de", "un", "une", "que", "pour"),
    "es": ("el", "la", "los", "las", "y", "es", "de", "un", "una", "que"),
}


def _hits_col(tokens: Column, lang: str) -> Column:
    words = LANG_STOPWORDS[lang]
    return F.size(
        F.array_intersect(tokens, F.array(*[F.lit(w) for w in words]))
    )


def lang_id_col(norm_col: Column | str) -> Column:
    """Best-guess language code from distinct stopword hits.

    Max hits wins; ties break to the lexicographically smallest language
    code (the chained ``when`` walks languages in sorted order, so the first
    language reaching the max is the smallest); zero hits -> 'und'. Plain
    integer columns + greatest + when keep the whole expression inside
    whole-stage codegen (no higher-order array_sort comparator).
    """
    c = F.col(norm_col) if isinstance(norm_col, str) else norm_col
    # no array_distinct: array_intersect already returns the DISTINCT
    # intersection whatever duplicates its inputs carry, so the extra
    # hash-set pass over every token was pure cost (size() counts the
    # same distinct stopword hits either way)
    tokens = F.split(c, " ")
    langs = sorted(LANG_STOPWORDS)
    hits = {lang: _hits_col(tokens, lang) for lang in langs}
    best = F.greatest(*hits.values()) if len(langs) > 1 else hits[langs[0]]
    out = F.lit("und")
    for lang in reversed(langs):
        out = F.when(hits[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best > 0, out).otherwise(F.lit("und"))


def lang_id_sql(norm_expr: str) -> str:
    """DuckDB equivalent of lang_id_col (list_intersect over stopwords)."""
    toks = f"list_distinct(string_split({norm_expr}, ' '))"
    selects = []
    for lang in sorted(LANG_STOPWORDS):
        words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        selects.append(
            f"(len(list_intersect({toks}, [{words}])), '{lang}')"
        )
    pairs = ", ".join(selects)
    # order desc by hits, asc by lang; pick first; 0 hits -> 'und'
    return (
        f"(select case when t.h > 0 then t.l else 'und' end from ("
        f"select u.p[1]::int as h, u.p[2]::varchar as l "
        f"from unnest([{pairs}]) as u(p) order by h desc, l asc limit 1"
        f") t)"
    )


# --- quality score --------------------------------------------------------
_ASCII_LETTERS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"


def _alpha_count_col(c: Column) -> Column:
    """#ASCII letters in c — identical to
    length(regexp_replace(c, '[^A-Za-z]', '')) (that keeps exactly the 52
    letters; translate removes exactly them), without the regex pass or the
    rebuilt string: n - length(translate(c, letters, ''))."""
    return F.length(c) - F.length(F.translate(c, _ASCII_LETTERS, ""))


def _split_count_col(trimmed: Column) -> Column:
    """size(split(trimmed, '\\s+')) without materializing the piece array:
    split with limit -1 always yields (#separator matches + 1) pieces, so
    regexp_count(trimmed, '\\s+') + 1 is identical (including leading/
    trailing non-space whitespace, which split keeps as empty pieces)."""
    return F.regexp_count(trimmed, F.lit(r"\s+")) + F.lit(1)


def quality_score_col(text_col: Column | str) -> Column:
    """Heuristic quality in [0,1] from raw text: length band, alpha ratio,
    mean word length band. Deterministic, built-in only (rounded to 6dp so
    oracle float comparison is stable). The alpha and word counts use the
    allocation-free twins above (outputs pinned identical in
    tests/test_r06_optimizations.py; the SQL renderer keeps the original
    formulation)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n = F.length(c)
    alpha = _alpha_count_col(c)
    alpha_ratio = F.when(n > 0, alpha.cast("double") / n.cast("double")).otherwise(F.lit(0.0))
    words = _split_count_col(F.trim(c))
    mean_wlen = F.when(words > 0, n.cast("double") / words.cast("double")).otherwise(F.lit(0.0))
    len_score = F.least(n.cast("double") / F.lit(500.0), F.lit(1.0))
    wlen_score = F.when((mean_wlen >= 3.0) & (mean_wlen <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((len_score + alpha_ratio + wlen_score) / F.lit(3.0), 6)


def quality_score_sql(text_expr: str) -> str:
    n = f"length({text_expr})"
    alpha = f"length(regexp_replace({text_expr}, '[^A-Za-z]', '', 'g'))"
    alpha_ratio = f"(case when {n} > 0 then {alpha}::double / {n} else 0.0 end)"
    words = f"len(regexp_split_to_array(trim({text_expr}), '\\s+'))"
    mean_wlen = f"(case when {words} > 0 then {n}::double / {words} else 0.0 end)"
    len_score = f"least({n}::double / 500.0, 1.0)"
    wlen_score = f"(case when {mean_wlen} >= 3.0 and {mean_wlen} <= 12.0 then 1.0 else 0.5 end)"
    return f"round(({len_score} + {alpha_ratio} + {wlen_score}) / 3.0, 6)"


# --- token counting (BPE-ish regex + whitespace) --------------------------
# a GPT-2-style pre-tokenizer regex restricted to the Java∩RE2 subset:
# word runs, digit runs, single punctuation marks
_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_col(text_col: Column | str) -> Column:
    """Subword-ish token count — regexp_count is definitionally
    size(regexp_extract_all(...)) (same engine, same successive
    non-overlapping matches) without materializing the match array."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_count(c, F.lit(_TOKEN_PATTERN))


def token_count_sql(text_expr: str) -> str:
    return f"len(regexp_extract_all({text_expr}, '{_TOKEN_PATTERN}'))"


def whitespace_token_count_col(text_col: Column | str) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        _split_count_col(F.trim(c))
    )


def whitespace_token_count_sql(text_expr: str) -> str:
    return (
        f"(case when length(trim({text_expr})) = 0 then 0 "
        f"else len(regexp_split_to_array(trim({text_expr}), '\\s+')) end)"
    )
