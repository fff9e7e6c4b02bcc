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
FP_MOD = (1 << 61) - 1  # Mersenne prime 2^61-1: mulmod reduces to shifts


def fingerprint_py(text: str) -> int:
    """Polynomial rolling hash over codepoints (pure core, testable)."""
    h = 0
    for ch in text:
        h = (h * FP_BASE + ord(ch)) % FP_MOD
    return h


# -- vectorized modular arithmetic over the Mersenne prime 2^61-1 ------------
# h(doc) = Σ_i c_i · B^(L-1-i)  (mod M) — the same polynomial as
# fingerprint_py, evaluated as one dot product per document instead of a
# per-character Python loop: cost is a handful of numpy passes per Arrow
# batch, linear in bytes with SIMD constants, which is what survives 100 TB.

_M61 = np.uint64(FP_MOD)


def _fold61(x: np.ndarray) -> np.ndarray:
    """x mod (2^61-1) for any uint64 x (two shift-add folds + M→0 fix)."""
    x = (x >> np.uint64(61)) + (x & _M61)
    x = (x >> np.uint64(61)) + (x & _M61)
    return np.where(x == _M61, np.uint64(0), x)


def _rot61(x: np.ndarray, k: int) -> np.ndarray:
    """(x · 2^k) mod (2^61-1) = 61-bit left rotation, for x < 2^61-1."""
    lo_bits = np.uint64(61 - k)
    return ((x & ((np.uint64(1) << lo_bits) - np.uint64(1))) << np.uint64(k)) | (
        x >> lo_bits
    )


def _mulmod61(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a·b) mod (2^61-1) elementwise for a, b < 2^61-1, without 128-bit.

    Schoolbook split a=a1·2^31+a0, b=b1·2^31+b0; 2^62 ≡ 2 and ·2^31 is a
    rotation, so every partial product stays inside uint64.
    """
    a = a.astype(np.uint64)
    b = b.astype(np.uint64)
    mask31 = np.uint64(0x7FFFFFFF)
    a1, a0 = a >> np.uint64(31), a & mask31
    b1, b0 = b >> np.uint64(31), b & mask31
    hi = _rot61(_fold61(a1 * b1), 1)  # a1·b1·2^62 ≡ ·2
    mid = _rot61(_fold61(a1 * b0 + a0 * b1), 31)  # (a1·b0+a0·b1)·2^31
    lo = _fold61(a0 * b0)
    return _fold61(hi + mid + lo)


def _powers61(base: int, n: int) -> np.ndarray:
    """[base^0 .. base^(n-1)] mod 2^61-1, built by doubling (log2 n passes)."""
    p = np.array([1], dtype=np.uint64)
    b = np.array([base % FP_MOD], dtype=np.uint64)
    while len(p) < n:
        # next block = existing block · base^len, where base^len = p[-1]·base
        step = _mulmod61(p[-1:], b)
        p = np.concatenate([p, _mulmod61(p, np.broadcast_to(step, p.shape).copy())])
    return p[:n]


def fingerprint_batch(texts: "pd.Series") -> np.ndarray:
    """Vectorized fingerprint for a batch of texts — numpy modular Horner.

    One encode per doc (C speed), then: terms = c_i · B^exp_i (mod M) over
    the concatenated codepoint stream, segment-summed per doc in 31-bit
    halves so the accumulation never overflows uint64.
    """
    n = len(texts)
    out = np.zeros(n, dtype=np.int64)
    codes_list = []
    lengths = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(texts):
        if isinstance(t, str) and t:
            c = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            codes_list.append(c)
            lengths[i] = len(c)
    if not codes_list:
        return out
    codes = np.concatenate(codes_list).astype(np.uint64)
    nz = lengths > 0
    lens = lengths[nz]
    ends = np.cumsum(lens)
    starts = ends - lens
    # exponent of codepoint at global position g in its doc: end-1-g
    exp = np.repeat(ends - 1, lens) - np.arange(len(codes), dtype=np.int64)
    pw = _powers61(FP_BASE, int(lens.max()))
    p = pw[exp]
    # specialized small·big mulmod: codepoints < 2^21, so c·p_hi < 2^51 and
    # c·p_lo < 2^52 never overflow — 2 multiplies instead of mulmod61's 4
    p1, p0 = p >> np.uint64(31), p & np.uint64(0x7FFFFFFF)
    terms = _fold61(_rot61(codes * p1, 31) + codes * p0)
    # overflow-safe segment sum: accumulate 31-bit halves separately
    hi = np.add.reduceat(terms >> np.uint64(31), starts)
    lo = np.add.reduceat(terms & np.uint64(0x7FFFFFFF), starts)
    h = _fold61(_rot61(_fold61(hi), 31) + _fold61(lo))
    out[nz] = h.astype(np.int64)
    return out


def doc_fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Rolling-hash fingerprint per document via an Arrow-vectorized pandas
    UDF — numpy modular Horner over the batch's concatenated codepoints (no
    per-character Python; pinned to ``fingerprint_py`` by test)."""

    @F.pandas_udf("long")
    def fp(texts: pd.Series) -> pd.Series:
        return pd.Series(fingerprint_batch(texts))

    return docs.select(F.col(id_col).alias("doc_id"), fp(F.col(text_col)).alias("fingerprint"))


def curate_corpus(
    docs: DataFrame,
    min_words: int = 20,
    max_punct_ratio: float = 0.2,
    lang: str = "en",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The composed training-data curation pass: quality gates → language
    gate → exact dedup (keep lowest id per content hash) — one declarative
    plan (filters push into the scan; the dedup is one hash groupBy), the
    standard first mile of a corpus pipeline at 100 TB.

    r8 optimization note — examined and deliberately KEPT this shape: the
    gate expressions predicate-push into the scan (scale-correct: survivors
    only are shuffled), and the three derivations run as concurrent subplans
    whose combined scan-stage parallelism beats every single-pass variant
    tried on this host (single fused projection, pushdown barriers, and
    dedup-before-gating all measured slower at sf1.0 because the fused gate
    work lands on the 1-2 scan partitions or an AQE-coalesced exchange)."""
    q = quality_features(docs, text_col=text_col, id_col=id_col)
    l = language_id(docs, text_col=text_col, id_col=id_col).select(
        "doc_id", "lang_pred"
    )
    kept = (
        docs.select(F.col(id_col).alias("doc_id"), text_col)
        .join(q, "doc_id")
        .join(l, "doc_id")
        .where(
            (F.col("n_words") >= min_words)
            & (F.col("punct_ratio") <= max_punct_ratio)
            & (F.col("lang_pred") == lang)
        )
    )
    return (
        kept.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("dup_count"))
        .select("doc_id", "text_md5", "dup_count")
    )


# -- PII scrubbing (r6) --------------------------------------------------------

#: patterns valid in BOTH Java regex (Spark) and RE2 (DuckDB) so the same
#: strings drive the engine and its oracle: email, IPv4, international-ish
#: phone (8+ digits with separators, optional +)
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d[\d()\- ]{6,}\d\b",
}


def scrub_pii(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Redact emails / IPv4s / phone-shaped digit runs from a text column —
    the standard compliance pass before corpus publication.  Pure columnar
    (``regexp_count`` + chained ``regexp_replace``, whole-stage codegen; no
    Python on the hot path), so it scales as a map-only stage: no shuffle,
    predicate/column pruning intact.  Order matters: emails are counted and
    replaced FIRST (an address can contain digits a later pattern would
    claim), then IPs (a dotted quad would otherwise be eaten by the phone
    pattern), then phones.  Returns (doc_id, text, n_emails, n_ips,
    n_phones, pii_total) with ``text`` scrubbed to ``<EMAIL>``/``<IP>``/
    ``<PHONE>`` tokens."""
    t0 = F.col(text_col)
    n_email = F.regexp_count(t0, F.lit(PII_PATTERNS["email"]))
    t1 = F.regexp_replace(t0, PII_PATTERNS["email"], "<EMAIL>")
    n_ip = F.regexp_count(t1, F.lit(PII_PATTERNS["ip"]))
    t2 = F.regexp_replace(t1, PII_PATTERNS["ip"], "<IP>")
    n_phone = F.regexp_count(t2, F.lit(PII_PATTERNS["phone"]))
    t3 = F.regexp_replace(t2, PII_PATTERNS["phone"], "<PHONE>")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        t3.alias("text"),
        n_email.cast("long").alias("n_emails"),
        n_ip.cast("long").alias("n_ips"),
        n_phone.cast("long").alias("n_phones"),
        (n_email + n_ip + n_phone).cast("long").alias("pii_total"),
    )
