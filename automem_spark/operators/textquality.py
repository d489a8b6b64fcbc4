"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, rolling-hash document fingerprinting.

All pure column expressions (whole-stage codegen) so they run at scan speed —
these are per-row map operations with no shuffle; at 100 TB they cost one
pass over the data and pipeline with any downstream filter.

Every scorer is deliberately SQL-expressible so the DuckDB oracle can verify
it exactly (heuristics, not ML models — the model-backed variants would slot
in as pandas_udfs behind the same column contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword-hit
# language-ID heuristic. Chosen to be disjoint across languages.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "with", "this", "that"],
    "es": ["el", "la", "los", "las", "que", "con"],
    "fr": ["le", "les", "des", "une", "est", "dans"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "zh": ["的", "是", "了", "在", "我"],
}


def words_expr(text: Column) -> Column:
    t = F.lower(text.cast("string"))
    t = F.regexp_replace(t, r"[^\w\s]", " ")
    return F.filter(F.split(F.trim(F.regexp_replace(t, r"\s+", " ")), " "), lambda w: w != "")


def lang_hits_expr(text: Column, markers: list[str]) -> Column:
    """Count of marker-word occurrences (as whole tokens)."""
    words = words_expr(text)

    def equals(m: str):
        return lambda w: w == m

    return sum((F.size(F.filter(words, equals(m))) for m in markers), F.lit(0))


def lang_id_expr(text: Column) -> Column:
    """Pick the language whose marker set hits most tokens; 'und' on zero
    hits. Deterministic tiebreak: language order as listed."""
    scores = [(lang, lang_hits_expr(text, markers)) for lang, markers in LANG_MARKERS.items()]
    best_lang: Column = F.lit("und")
    best_score: Column = F.lit(0)
    for lang, score in scores:
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def token_count_expr(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words_expr(text))


def bpe_ish_token_count_expr(text: Column) -> Column:
    """A BPE-like proxy count: word-piece segments of <=4 chars — every word
    contributes ceil(len/4) pieces, punctuation counts one each. A cheap,
    deterministic stand-in for tokenizer-based counting at scan speed."""
    words = words_expr(text)
    word_pieces = F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("int"),
    )
    punct = F.length(F.regexp_replace(text.cast("string"), r"[\w\s]", ""))
    return word_pieces + punct


def quality_score_expr(text: Column) -> Column:
    """Heuristic document quality in [0,1]: blend of
    - length factor: min(1, n_words/100)
    - alpha ratio: alphabetic chars / chars
    - stopword presence: min(1, english stopword hits / 5)
    - punctuation sanity: 1 - min(1, punct_ratio*5)
    (mirrors the shape of C4AI/Gopher-style quality rules, kept
    SQL-expressible).
    """
    t = text.cast("string")
    n_words = F.size(words_expr(t)).cast("double")
    n_chars = F.greatest(F.length(t).cast("double"), F.lit(1.0))
    alpha = F.length(F.regexp_replace(t, r"[^a-zA-Z]", "")).cast("double")
    punct = F.length(F.regexp_replace(t, r"[\w\s]", "")).cast("double")
    stop_hits = lang_hits_expr(t, LANG_MARKERS["en"]).cast("double")
    length_factor = F.least(F.lit(1.0), n_words / 100.0)
    alpha_ratio = alpha / n_chars
    stop_factor = F.least(F.lit(1.0), stop_hits / 5.0)
    punct_sanity = F.lit(1.0) - F.least(F.lit(1.0), punct / n_chars * 5.0)
    return (
        F.lit(0.25) * length_factor
        + F.lit(0.25) * alpha_ratio
        + F.lit(0.25) * stop_factor
        + F.lit(0.25) * punct_sanity
    )


def rolling_hash_expr(text: Column, window: int = 8, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling-hash fingerprint of the first `window` words
    (base-31 over word xxhash64 residues, mod p). Deterministic and
    SQL-expressible — a document fingerprint cheaper than full-content hash
    comparison when only prefix identity matters."""
    words = F.slice(words_expr(text), 1, window)
    return F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * 31 + F.pmod(F.xxhash64(w), F.lit(mod))) % mod,
    )


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass document profiling: attach all analysis columns."""
    t = F.col(text_col)
    return df.select(
        "*",
        lang_id_expr(t).alias("detected_lang"),
        token_count_expr(t).alias("n_tokens"),
        bpe_ish_token_count_expr(t).alias("n_bpe_tokens"),
        quality_score_expr(t).alias("quality_score"),
        rolling_hash_expr(t).alias("prefix_fingerprint"),
    )


def rolling_hash_md5_expr(
    text: Column, window: int = 8, mod: int = 1_000_000_007
) -> Column:
    """Oracle twin of :func:`rolling_hash_expr`: word residues derived from
    the first 15 hex chars of md5 (60 bits, sign-safe) instead of xxhash64,
    so DuckDB reproduces the identical fold — same pattern as the SimHash
    md5 twin. The fold itself (base-31 polynomial mod p) is unchanged and
    value-verified end-to-end by the `doc_fingerprint` driver row."""
    words = F.slice(words_expr(text), 1, window)

    def residue(w: Column) -> Column:
        return F.pmod(
            F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long"), F.lit(mod)
        )

    return F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * 31 + residue(w)) % mod,
    )
