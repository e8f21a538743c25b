"""Text-analysis column functions: token stats, quality scoring,
language ID, fingerprints.

All per-row, higher-order-function / regexp work — JVM codegen, no UDFs,
no shuffle; at 100 TB these run at scan speed as a narrow projection.
Each has an exact SQL twin in plans/llmdata.py so the DuckDB oracle
verifies values, not just shapes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS_EN = ("the", "a", "of", "and", "to")
STOPWORDS_ES = ("el", "la", "de", "los", "y")
STOPWORDS_DE = ("der", "die", "das", "und", "zu")


def tokens(text: Column) -> Column:
    return F.split(text, r"\s+")


def n_tokens(text: Column) -> Column:
    return F.size(tokens(text))


def n_alpha_tokens(text: Column) -> Column:
    """BPE-ish token count: maximal alphabetic runs."""
    return F.regexp_count(text, F.lit("[a-z]+"))


def n_numeric_tokens(text: Column) -> Column:
    return F.regexp_count(text, F.lit("[0-9]+"))


def _count_in(text: Column, wordlist: tuple[str, ...]) -> Column:
    """Occurrences of any ``wordlist`` token.  The HOF filter is the
    right form here DESPITE its per-element lambda dispatch: the r13
    sf10 audit tried the "native" respell Σ_w (|toks| -
    |array_remove(toks, w)|) and it measured ~10x SLOWER at sf10 (each
    array_remove materializes a fresh copy of the token array, and the
    enlarged tree de-optimized the stage).  The scale lever for
    consumers is EVALUATION COUNT, not per-eval cost: derived ratios
    referenced by several downstream expressions get re-inlined by
    projection collapse / filter pushdown (HOFs are excluded from
    codegen subexpression elimination), so compute them ONCE per row
    and carry them through an aggregation boundary — see
    ``llm_prep_pipeline``'s quality stage."""
    toks = F.split(text, " ")
    return F.size(F.filter(toks, lambda t: t.isin(*wordlist)))


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    toks = F.split(text, " ")
    return _count_in(text, stopwords).cast("double") / F.size(toks).cast("double")


def distinct_word_ratio(text: Column) -> Column:
    """Lexical diversity: |distinct words| / |words|."""
    toks = F.split(text, " ")
    return F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double")


def avg_word_len(text: Column) -> Column:
    """Mean token length = chars-without-spaces / token count."""
    toks = F.split(text, " ")
    no_space = F.length(F.replace(text, F.lit(" "), F.lit("")))
    return no_space.cast("double") / F.size(toks).cast("double")


def quality_band(stop_ratio: Column, diversity: Column) -> Column:
    """Coarse quality gate in the style of pretraining-data filters:
    natural prose has some stopwords and non-trivial lexical diversity."""
    return (
        F.when((stop_ratio >= 0.05) & (diversity >= 0.5), F.lit("high"))
        .when((stop_ratio > 0.0) | (diversity >= 0.3), F.lit("medium"))
        .otherwise(F.lit("low"))
    )


def langid_scores(text: Column) -> dict[str, Column]:
    """Stopword-hit counts per candidate language (n-gram-free heuristic;
    a real model would be a broadcast lookup table — same plan shape)."""
    return {
        "en": _count_in(text, STOPWORDS_EN).cast("int"),
        "es": _count_in(text, STOPWORDS_ES).cast("int"),
        "de": _count_in(text, STOPWORDS_DE).cast("int"),
    }


def langid_pred(s_en: Column, s_es: Column, s_de: Column) -> Column:
    """Deterministic argmax with alphabetical tiebreak (de < en < es) and
    an 'unknown' floor when nothing matches."""
    return (
        F.when((s_de >= s_en) & (s_de >= s_es) & (s_de > 0), F.lit("de"))
        .when((s_en >= s_es) & (s_en > 0), F.lit("en"))
        .when(s_es > 0, F.lit("es"))
        .otherwise(F.lit("unknown"))
    )


def gopher_rules(text: Column) -> dict[str, Column]:
    """Gopher-style quality rule flags (Rae et al. 2021, table A1,
    thresholds adapted to this corpus's scale): each flag is True when
    the document PASSES the rule.  All flags are exact integer/double
    compares over per-row HOF counts — scan-speed, no shuffle, and
    bit-replayable in SQL.

    Rules: word count in [10, 1000]; mean word length in [3, 10];
    >= 2 stopword hits across the en/es/de lists (the multilingual
    form of Gopher's stop-word rule); lexical diversity >= 0.3
    (repetition proxy); numeric-token fraction <= 0.2.
    """
    toks = F.split(text, " ")
    n = F.size(toks)
    awl = avg_word_len(text)
    stop_hits = (
        _count_in(text, STOPWORDS_EN)
        + _count_in(text, STOPWORDS_ES)
        + _count_in(text, STOPWORDS_DE)
    )
    div = distinct_word_ratio(text)
    num_frac = n_numeric_tokens(text).cast("double") / n.cast("double")
    return {
        "r_word_count": (n >= 10) & (n <= 1000),
        "r_word_len": (awl >= 3.0) & (awl <= 10.0),
        "r_stopwords": stop_hits >= 2,
        "r_diversity": div >= 0.3,
        "r_numeric": num_frac <= 0.2,
    }
