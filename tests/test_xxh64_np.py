"""Pin the vectorized numpy XXH64 (functions/xxh64_np) bit-identical to
Spark's ``xxhash64`` expression — the contract that lets the simhash
signature pass hash tokens inside the Arrow kernel while the DuckDB oracle
recomputes the same XXH64 in SQL."""

import random
import string

import numpy as np
import pytest
from pyspark.sql import functions as F

from govuk_crawler_worker_spark.functions.xxh64_np import (
    xxh64_strings,
    xxh64_tokens_unique,
)


CORPUS_VOCAB = (
    "a agg batch big column customer data dup fast filter group hash join key "
    "line merge order part query row scan slow small sort spark stream table "
    "the value vector window"
).split()


def _jvm_hashes(spark, cases):
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    return [r[0] for r in df.select(F.xxhash64("s")).collect()]


class TestXxh64Numpy:
    def test_matches_spark_expression_across_length_classes(self, spark):
        rng = random.Random(7)
        cases = (
            ["", "a", "ab", "abc", "abcd", "abcde"]
            + CORPUS_VOCAB
            + ["x" * n for n in (7, 8, 9, 15, 16, 31, 32, 33, 63, 64, 100)]
            + ["héllo wörld", "日本語テキスト", "mixé⚡", "\x00embedded"]
            + [
                "".join(rng.choices(string.printable, k=rng.randint(0, 80)))
                for _ in range(150)
            ]
        )
        jvm = _jvm_hashes(spark, cases)
        mine = xxh64_strings(cases)
        assert list(mine) == jvm

    def test_unique_dictionary_path_equals_direct(self):
        toks = np.array(
            [random.Random(3).choice(CORPUS_VOCAB) for _ in range(5000)],
            dtype=np.str_,
        )
        direct = xxh64_strings(toks.tolist())
        dictd = xxh64_tokens_unique(toks)
        assert np.array_equal(direct, dictd)

    def test_simhash_signature_unchanged_vs_jvm_hash_path(self, spark):
        """End-to-end pin: the one-pass Arrow simhash64 must equal the
        signature computed from JVM-side xxhash64 token hashes (the former
        pipeline's hashes) — the oracle's definition of the signature."""
        from govuk_crawler_worker_spark.operators.dedup import (
            _simhash_batch,
            simhash64,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

        new = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
        rows = (
            docs.select(
                "doc_id",
                F.expr("transform(split(text, ' '), x -> xxhash64(x))").alias("hs"),
            )
            .collect()
        )
        ref = dict(
            zip(
                [r["doc_id"] for r in rows],
                _simhash_batch([np.asarray(r["hs"], dtype=np.int64) for r in rows]),
            )
        )
        assert new == {k: int(v) for k, v in ref.items()}
