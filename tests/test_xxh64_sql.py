"""The DuckDB XXH64 recomputation (``functions/xxh64_sql.py``) must equal
BOTH a pure-Python transcription of the published XXH64 spec (Cyan4973,
public domain) AND Spark's ``F.xxhash64`` — the chain py-spec == SQL and
py-spec == Spark proves SQL == Spark without the oracle ever consulting the
engine it checks.

Reference semantics: the engine uses ``F.xxhash64(tok)`` for simhash token
hashing (operators/dedup.py ``simhash64``); the crawler reference keys its
seen-set with a content digest the same way
(``govuk_crawler_worker/main.go``-adjacent queue key hashing) — here the
hash itself is the unit under test.
"""

from __future__ import annotations

import random

from govuk_crawler_worker_spark.functions.xxh64_sql import (
    to_int64_sql,
    utf8_bytes_sql,
    xxh64_sql,
    xxhash64_of_string_sql,
)

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M


def _round(v: int, lane: int) -> int:
    return (_rotl((v + lane * P2) & M, 31) * P1) & M


def xxh64_py(data: bytes, seed: int = 42) -> int:
    """Pure-Python XXH64 per the published spec (unsigned)."""
    n, i = len(data), 0
    if n >= 32:
        v1, v2 = (seed + P1 + P2) & M, (seed + P2) & M
        v3, v4 = seed & M, (seed - P1) & M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        h = (_rotl(h ^ _round(0, int.from_bytes(data[i : i + 8], "little")), 27) * P1 + P4) & M
        i += 8
    if i + 4 <= n:
        h = (_rotl(h ^ ((int.from_bytes(data[i : i + 4], "little") * P1) & M), 23) * P2 + P3) & M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * P5) & M), 11) * P1) & M
        i += 1
    h = ((h ^ (h >> 33)) * P2) & M
    h = ((h ^ (h >> 29)) * P3) & M
    return h ^ (h >> 32)


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


# every branch boundary: empty, sub-4, 4/7/8 (4-byte step / 8-byte tail),
# 31/32/33 (stripe threshold), multi-stripe, plus 2/3/4-byte UTF-8
EDGE_STRINGS = [
    "",
    "a",
    "abc",
    "abcd",
    "abcde",
    "1234567",
    "12345678",
    "123456789012345",
    "x" * 31,
    "y" * 32,
    "z" * 33,
    "w" * 64,
    "q" * 100,
    "http://example.com/a?b=c#d",
    "héllo wörld",
    "日本語テスト",
    "emoji \U0001F600 astral \U0001F4A9",
    "mixed é中\U0001F600 tail",
]


def _random_strings(k: int = 60) -> list[str]:
    rng = random.Random(20260817)
    alpha = "abcdefgh XYZ0123é中\U0001F4A9"
    return [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 120)))
        for _ in range(k)
    ]


class TestXxh64Sql:
    def test_sql_matches_python_spec(self):
        import duckdb
        import pandas as pd

        tests = EDGE_STRINGS + _random_strings()
        df = pd.DataFrame({"t": tests})  # noqa: F841 — duckdb scans it
        con = duckdb.connect()
        got = [
            r[0]
            for r in con.execute(
                f"SELECT {xxhash64_of_string_sql('t')} FROM df"
            ).fetchall()
        ]
        exp = [_signed(xxh64_py(t.encode("utf-8"))) for t in tests]
        assert got == exp

    def test_null_propagates(self):
        import duckdb

        con = duckdb.connect()
        (h,) = con.execute(
            f"SELECT {xxhash64_of_string_sql('NULL::VARCHAR')}"
        ).fetchone()
        assert h is None

    def test_unsigned_form_and_seed(self):
        import duckdb

        con = duckdb.connect()
        u, s = con.execute(
            f"SELECT {xxh64_sql(utf8_bytes_sql(repr('abc')), seed=0)},"
            f" {to_int64_sql(xxh64_sql(utf8_bytes_sql(repr('abc')), seed=0))}"
        ).fetchone()
        assert int(u) == xxh64_py(b"abc", seed=0)
        assert s == _signed(xxh64_py(b"abc", seed=0))

    def test_python_spec_matches_spark(self, spark):
        from pyspark.sql import functions as F

        tests = EDGE_STRINGS + _random_strings(20)
        rows = (
            spark.createDataFrame([(t,) for t in tests], "t string")
            .select(F.xxhash64("t").alias("h"))
            .collect()
        )
        assert [r.h for r in rows] == [
            _signed(xxh64_py(t.encode("utf-8"))) for t in tests
        ]


class TestSplitmix64Sql:
    """The DuckDB splitmix64 recomputation must equal the vectorized numpy
    mixer that seeds the LSH hyperplanes (``operators/similarity.py``) —
    the equivalence the ``ann_lsh_topk`` full value oracle rests on."""

    def test_matches_numpy_mixer(self):
        import duckdb
        import numpy as np

        from govuk_crawler_worker_spark.functions.xxh64_sql import splitmix64_sql
        from govuk_crawler_worker_spark.operators.similarity import _splitmix64

        xs = [0, 1, 42, 2**31, 2**32, 2**63, 2**64 - 1, 12345678901234567]
        con = duckdb.connect()
        got = [
            int(v)
            for v in con.execute(
                "SELECT " + ", ".join(f"({splitmix64_sql(str(x))})" for x in xs)
            ).fetchone()
        ]
        exp = [
            int(_splitmix64(np.array([x % 2**64], dtype=np.uint64))[0]) for x in xs
        ]
        assert got == exp

    def test_plane_weights_recomputable_in_sql(self):
        import duckdb

        from govuk_crawler_worker_spark.functions.xxh64_sql import splitmix64_sql
        from govuk_crawler_worker_spark.operators.similarity import _QSCALE, _planes

        dim, n_planes, seed = 64, 32, 42
        planes = _planes(dim, n_planes, seed)
        sm = splitmix64_sql(f"CAST({seed} AS HUGEINT) * 4294967296 + CAST(r AS HUGEINT)")
        rows = duckdb.connect().execute(
            f"SELECT CAST(({sm}) % {2 * _QSCALE} AS BIGINT) - {_QSCALE}"
            f" FROM range({n_planes * dim}) t(r) ORDER BY r"
        ).fetchall()
        assert [r[0] for r in rows] == list(planes.flatten())
