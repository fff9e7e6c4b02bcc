"""Text analysis operators — language ID, quality scoring, token counting,
document fingerprinting.  Training-data-pipeline surface over the
``documents`` table.

Everything except the rolling-hash fingerprint is pure columnar expressions
(split / higher-order functions / regexp), i.e. whole-stage-codegen'd —
exactly the hot-path discipline the engine uses for URL work.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "for", "on", "with")
FR_STOPWORDS = ("le", "la", "et", "de", "un", "une", "est", "pour", "dans", "avec")


def _stop_hits(words_col, stopwords: tuple[str, ...]):
    arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(words_col, lambda x: F.array_contains(arr, x)))


def quality_features(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword-ratio features (round 4 dp)."""
    d = docs.select(id_col, text_col).withColumn("w", F.split(F.col(text_col), " "))
    n_words = F.size("w")
    n_chars = F.length(text_col)
    letters_only = F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z ]", ""))
    return d.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        n_chars.alias("n_chars_calc"),
        F.round(
            (F.length(F.regexp_replace(F.col(text_col), " ", "")) / n_words), 4
        ).alias("avg_word_len"),
        F.round(_stop_hits(F.col("w"), EN_STOPWORDS) / n_words, 4).alias("stopword_ratio"),
        F.round((n_chars - letters_only) / n_chars, 4).alias("punct_ratio"),
    )


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens (runs of letters / digits /
    single other symbols) — the two standard size estimates."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[a-zA-Z]+|[0-9]+"), 0)).alias(
            "word_tokens"
        ),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit heuristic language ID (n-gram-free variant; a real
    deployment swaps in charset n-gram profiles — same plan shape)."""
    d = docs.select(id_col, text_col).withColumn("w", F.split(F.col(text_col), " "))
    en = _stop_hits(F.col("w"), EN_STOPWORDS)
    fr = _stop_hits(F.col("w"), FR_STOPWORDS)
    return d.select(
        F.col(id_col).alias("doc_id"),
        en.alias("en_hits"),
        fr.alias("fr_hits"),
        F.when(en >= fr, "en").otherwise("fr").alias("lang_pred"),
    )


FP_BASE = 1000003
FP_MOD = (1 << 61) - 1


def fingerprint_py(text: str) -> int:
    """Polynomial rolling hash over codepoints (pure core, testable)."""
    h = 0
    for ch in text:
        h = (h * FP_BASE + ord(ch)) % FP_MOD
    return h


def doc_fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Rolling-hash fingerprint per document via an Arrow-vectorized pandas
    UDF (numpy Horner over codepoint arrays — no per-row Python UDF)."""

    @F.pandas_udf("long")
    def fp(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            h = np.int64(0)
            if t:
                codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(object)
                acc = 0
                for c in codes:
                    acc = (acc * FP_BASE + int(c)) % FP_MOD
                h = np.int64(acc)
            out[i] = h
        return pd.Series(out)

    return docs.select(F.col(id_col).alias("doc_id"), fp(F.col(text_col)).alias("fingerprint"))
