"""Text-analysis operators for training-data pipelines.

All native Spark SQL expressions (no Python): token counting, quality
scoring, language-id heuristic, document fingerprinting. Each is
portable SQL so DuckDB oracles can replicate it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace token count, char count, avg token length."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars_actual"),
        F.size(toks).alias("n_tokens"),
        (F.length(F.regexp_replace(F.col(text_col), r"\s+", ""))
         / F.greatest(F.size(toks), F.lit(1))).alias("avg_token_len"),
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Length/punct/stopword heuristics → [0,1] quality score."""
    text = F.col(text_col)
    n = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^a-zA-Z]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    toks = F.split(F.trim(text), r"\s+")
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    alpha_ratio = n_alpha / F.greatest(n, F.lit(1))
    punct_ratio = n_punct / F.greatest(n, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tokens, F.lit(1))
    length_ok = F.when((n >= 64) & (n <= 10000), F.lit(1.0)).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * alpha_ratio
        + F.lit(0.3) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.2) * length_ok
        + F.lit(0.1) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0)))
    )
    return df.select(
        F.col(id_col),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Stopword-overlap language heuristic (en vs unknown) — a cheap
    n-gram/stopword scorer; SQL-portable for oracle checks."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    ratio = n_stop / F.greatest(F.size(toks), F.lit(1))
    return df.select(
        F.col(id_col),
        F.when(ratio >= 0.08, F.lit("en")).otherwise(F.lit("unknown")).alias("lang_guess"),
    )


def fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Normalized-document fingerprint: md5 of lowercased,
    whitespace-collapsed text (portable rolling-hash stand-in)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(F.col(id_col), F.md5(norm).alias("fingerprint"))


def bpe_token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """BPE-ish regex token counting (native SQL, oracle-portable):
    tokens are letter runs, digit runs, or single non-space symbols —
    the pre-tokenization shape BPE vocabularies split on. Emits the
    token count, distinct-token count, and subword-budget estimate
    (letters/4 heuristic for letter runs, 1 per symbol/digit-run)."""
    # pattern passed as a lit (not an expr string) — Spark SQL string
    # literals escape-process backslashes, silently dropping the \s
    pattern = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    toks = F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))
    letter_runs = F.filter(toks, lambda t: t.rlike("^[A-Za-z]+$"))
    subword_est = F.aggregate(
        F.transform(
            letter_runs, lambda t: (F.length(t) + F.lit(3)).cast("long") / F.lit(4)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ) + (F.size(toks) - F.size(letter_runs)).cast("double")
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(subword_est, 6).alias("subword_estimate"),
    )
