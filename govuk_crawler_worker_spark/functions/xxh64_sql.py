"""Generate DuckDB SQL that recomputes Spark's ``xxhash64`` exactly.

Spark's ``F.xxhash64(str_col)`` is standard XXH64 (the public Cyan4973 spec)
with seed 42 over the string's UTF-8 bytes — verified bit-for-bit against a
pure-Python implementation of the published algorithm
(``tests/test_xxh64_sql.py``).  DuckDB has no xxhash builtin, but it has
HUGEINT (int128): every mod-2^64 step of XXH64 is exact in int128 provided
64×64-bit products are split (a·b can reach 2^128, one bit past HUGEINT), so
the whole hash is expressible as one scalar SQL expression.  That turns
engine-hash-dependent query outputs (simhash) from rows-only checks into
full value oracles: DuckDB independently re-derives the hash from the public
spec rather than echoing the engine.

Assembly: a chain of *let bindings* — each intermediate is bound once via
the single-element ``list_transform([value], name -> body)[1]`` trick, so
every value is named exactly once no matter how many times the next step
references it (no exponential text blowup, no correlated subqueries, fully
vectorizable).  Nested lambdas capture outer lambda variables, which DuckDB
supports.  Bound names, outermost first:

* ``bl`` — the UTF-8 byte list (LIST of HUGEINT, values 0..255, 1-indexed);
* ``n``  — ``len(bl)`` as HUGEINT;
* ``L``  — all aligned little-endian 8-byte lanes (computed once);
* ``h0``..``h4`` — the spec's accumulator after stripes / +length / 8-byte
  tail / 4-byte step / 1-byte tail;
* ``h5``/``h6`` — the first two avalanche steps (final step is the body).

Loops (stripes, 8-byte tail, 1-byte tail) are ``list_reduce`` folds; DuckDB
1.x ``list_reduce`` has no init argument, so the init value is prepended as
the first list item, and items ride in single-element lists so the element
type stays LIST(HUGEINT) alongside the list-typed accumulator.
"""

from __future__ import annotations

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
M64 = 1 << 64
SEED = 42


def _let(name: str, value: str, body: str) -> str:
    """Bind ``value`` to ``name`` inside ``body`` (single-element lambda)."""
    return f"list_transform([{value}], {name} -> {body})[1]"


def _mul64(a: str, b: str) -> str:
    """(a*b) mod 2^64 without exceeding HUGEINT: split a into 32-bit halves —
    a_lo*b < 2^96 and ((a_hi*(b mod 2^32)) mod 2^32) << 32 < 2^96."""
    return (
        f"((({a}) % 4294967296) * ({b})"
        f" + (((({a}) // 4294967296) * (({b}) % 4294967296)) % 4294967296)"
        f" * 4294967296) % {M64}"
    )


def _rotl(x: str, r: int) -> str:
    """64-bit rotate-left for 0 <= x < 2^64 (r <= 31 keeps x<<r below 2^96)."""
    return f"((({x}) * {1 << r}) % {M64} + (({x}) // {1 << (64 - r)}))"


def _add64(*xs: str) -> str:
    return "((" + " + ".join(f"({x})" for x in xs) + f") % {M64})"


def _xor(a: str, b: str) -> str:
    return f"xor(({a})::HUGEINT, ({b})::HUGEINT)"


def utf8_bytes_sql(text_expr: str) -> str:
    """LIST(HUGEINT) of the UTF-8 bytes of ``text_expr`` (NULL in, NULL
    out), encoding each codepoint per RFC 3629 — DuckDB cannot index BLOB
    bytes, so the byte stream is rebuilt from ``unicode(char)``.  The empty
    string needs its own arm: ``string_split('', '')`` yields ``['']`` and
    ``unicode('')`` is -1, not a codepoint."""
    enc = (
        "c -> CASE"
        " WHEN c < 128 THEN [c]"
        " WHEN c < 2048 THEN [192 + c // 64, 128 + c % 64]"
        " WHEN c < 65536 THEN [224 + c // 4096, 128 + (c // 64) % 64, 128 + c % 64]"
        " ELSE [240 + c // 262144, 128 + (c // 4096) % 64,"
        "       128 + (c // 64) % 64, 128 + c % 64] END"
    )
    return (
        f"CASE WHEN ({text_expr}) = '' THEN []::HUGEINT[]"
        f" ELSE flatten(list_transform("
        f"list_transform(string_split({text_expr}, ''), ch -> unicode(ch)::HUGEINT),"
        f" {enc})) END"
    )


def _le_lane(bl: str, off: str, width: int) -> str:
    """Little-endian integer of ``width`` bytes of 1-indexed ``bl`` starting
    at 0-based byte offset ``off``."""
    terms = [
        f"({bl})[(({off}) + {k + 1})::BIGINT] * {1 << (8 * k)}" for k in range(width)
    ]
    return "(" + " + ".join(terms) + ")"


def _round(v: str, lane: str) -> str:
    """v = rotl31(v + lane*P2) * P1  (the XXH64 stripe round)."""
    return _mul64(_rotl(_add64(v, _mul64(lane, str(P2))), 31), str(P1))


def xxh64_sql(bytes_list_expr: str, seed: int = SEED) -> str:
    """SQL (HUGEINT, unsigned 0..2^64-1) = XXH64 of a LIST(HUGEINT) byte
    list.  Wrap with :func:`to_int64_sql` to match Spark's signed BIGINT."""
    # --- stripe phase (n >= 32): fold [v1..v4] over stripe indices --------
    stripe_init = (
        f"[{(seed + P1 + P2) % M64}::HUGEINT, {(seed + P2) % M64}::HUGEINT,"
        f" {seed % M64}::HUGEINT, {(seed - P1) % M64}::HUGEINT]"
    )
    stripe_step = ", ".join(
        _round(f"a[{k}]", f"L[(4 * x[1] + {k})::BIGINT]") for k in (1, 2, 3, 4)
    )
    stripes = (
        f"list_reduce(list_concat([{stripe_init}],"
        f" list_transform(range(0, (n // 32)::BIGINT), s -> [s::HUGEINT])),"
        f" (a, x) -> [{stripe_step}])"
    )
    # merged accumulator: h = rotls, then per k: h = (h ^ round0(vk))*P1 + P4
    h_merged = _add64(
        _rotl("a[1]", 1), _rotl("a[2]", 7), _rotl("a[3]", 12), _rotl("a[4]", 18)
    )
    for k in (1, 2, 3, 4):
        r0 = _mul64(_rotl(_mul64(f"a[{k}]", str(P2)), 31), str(P1))
        h_merged = _add64(_mul64(_xor(h_merged, r0), str(P1)), str(P4))
    h0 = (
        f"CASE WHEN n >= 32 THEN {_let('a', stripes, h_merged)}"
        f" ELSE {(seed + P5) % M64}::HUGEINT END"
    )

    h1 = _add64("h0", "n")

    # --- 8-byte tail: lanes 4*(n//32)+1 .. n//8 (1-based, empty if none) --
    tail8_step = _add64(
        _mul64(
            _rotl(
                _xor("a[1]", _mul64(_rotl(_mul64("x[1]", str(P2)), 31), str(P1))), 27
            ),
            str(P1),
        ),
        str(P4),
    )
    h2 = (
        f"list_reduce(list_concat([[h1]],"
        f" list_transform(list_slice(L, (4 * (n // 32) + 1)::BIGINT,"
        f" (n // 8)::BIGINT), l -> [l])),"
        f" (a, x) -> [{tail8_step}])[1]"
    )

    # --- 4-byte step at byte offset 8*(n//8) when n%8 >= 4 ----------------
    lane4 = _le_lane("bl", "8 * (n // 8)", 4)
    h3 = (
        "CASE WHEN n % 8 >= 4 THEN "
        + _add64(
            _mul64(_rotl(_xor("h2", _mul64(lane4, str(P1))), 23), str(P2)), str(P3)
        )
        + " ELSE h2 END"
    )

    # --- 1-byte tail over the last n%4 bytes ------------------------------
    byte_step = _mul64(_rotl(_xor("a[1]", _mul64("x[1]", str(P5))), 11), str(P1))
    h4 = (
        f"list_reduce(list_concat([[h3]],"
        f" list_transform(list_slice(bl, (n - n % 4 + 1)::BIGINT, n::BIGINT),"
        f" b -> [b])),"
        f" (a, x) -> [{byte_step}])[1]"
    )

    # --- avalanche: >>33 *P2, >>29 *P3, >>32 ------------------------------
    h5 = _mul64(_xor("h4", "h4 // 8589934592"), str(P2))
    h6 = _mul64(_xor("h5", "h5 // 536870912"), str(P3))
    body = _xor("h6", "h6 // 4294967296")

    lanes = (
        f"list_transform(range(0, (n // 8)::BIGINT),"
        f" k -> {_le_lane('bl', '8 * k', 8)})"
    )

    # let-chain, innermost body outward
    for name, value in (
        ("h6", h6),
        ("h5", h5),
        ("h4", h4),
        ("h3", h3),
        ("h2", h2),
        ("h1", h1),
        ("h0", h0),
        ("L", lanes),
        ("n", "len(bl)::HUGEINT"),
        ("bl", bytes_list_expr),
    ):
        body = _let(name, value, body)
    return body


def to_int64_sql(u64_expr: str) -> str:
    """Unsigned HUGEINT 0..2^64-1 → Spark's signed BIGINT two's complement."""
    return (
        f"CAST(CASE WHEN ({u64_expr}) >= {1 << 63} THEN ({u64_expr}) - {M64}"
        f" ELSE ({u64_expr}) END AS BIGINT)"
    )


def xxhash64_of_string_sql(text_expr: str, seed: int = SEED) -> str:
    """Signed-BIGINT XXH64(utf8(text), seed) == Spark ``F.xxhash64(text)``."""
    return to_int64_sql(xxh64_sql(utf8_bytes_sql(text_expr), seed=seed))


# splitmix64 finalizer constants (Steele/Lea/Flood, public-domain reference)
_SM_GOLDEN = 0x9E3779B97F4A7C15
_SM_C1 = 0xBF58476D1CE4E5B9
_SM_C2 = 0x94D049BB133111EB


def splitmix64_sql(x_expr: str) -> str:
    """HUGEINT (unsigned, 0..2^64-1) splitmix64 finalizer of ``x_expr``
    (a non-negative HUGEINT, reduced mod 2^64) — matches the vectorized
    numpy mixer in ``operators/similarity.py`` / ``operators/dedup.py``
    bit-for-bit, so plane/permutation streams seeded from counters can be
    re-derived inside a DuckDB oracle."""
    body = _xor("z4", "z4 // 2147483648")  # z ^= z >> 31
    for name, value in (
        ("z4", _mul64("z3", str(_SM_C2))),
        ("z3", _xor("z2", "z2 // 134217728")),  # z ^= z >> 27
        ("z2", _mul64("z1", str(_SM_C1))),
        ("z1", _xor("z0", "z0 // 1073741824")),  # z ^= z >> 30
        ("z0", _add64(f"({x_expr}) % {M64}", str(_SM_GOLDEN))),
    ):
        body = _let(name, value, body)
    return body
