"""Portable deterministic hashing shared by the dedup operators and their
DuckDB oracle twins.

Base hash: first 15 hex chars of md5 → 60-bit non-negative int64 — identical
in Spark (``conv(substring(md5(x),1,15),16,10)``) and DuckDB
(``('0x'||substr(md5(x),1,15))::BIGINT``).

Per-seed MinHash permutations avoid re-hashing the shingle per seed (md5 is
the expensive part): one md5 per shingle, then an overflow-free affine mix
    h_s = (hi(h)*A_s + lo(h)*B_s + C_s) mod 2^61
with hi/lo the 30-bit halves and A,B,C < 2^30 — every intermediate fits in
a signed 64-bit integer in BOTH engines (DuckDB BIGINT errors on overflow,
so plain ``(a*h+b) mod p`` would not be portable).
"""

from __future__ import annotations

import numpy as np

NUM_SEEDS = 16
_LO_MASK = (1 << 30) - 1
_MOD = 1 << 61

_rng = np.random.default_rng(20260816)
MINHASH_PARAMS: tuple[tuple[int, int, int], ...] = tuple(
    (
        int(_rng.integers(1, 1 << 30)) | 1,
        int(_rng.integers(1, 1 << 30)) | 1,
        int(_rng.integers(0, 1 << 30)),
    )
    for _ in range(NUM_SEEDS)
)


def h60_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def h60_spark_sql(expr: str) -> str:
    """Spark-SQL (expression string) form of the same 60-bit hash."""
    return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def mix_sql(h: str, seed: int) -> str:
    """DuckDB form of the affine per-seed permutation (operators)."""
    a, b, c = MINHASH_PARAMS[seed]
    return f"((({h}) >> 30) * {a} + (({h}) & {_LO_MASK}) * {b} + {c}) % {_MOD}"


def mix_spark_sql(h: str, seed: int) -> str:
    """Spark-SQL form: same math via shiftright/pmod — Spark's expression
    parser rejects `>>`/`&` inside (some) nested lambdas, the function
    forms always parse.  h is non-negative so `& mask` ≡ `pmod(·, 2^30)`."""
    a, b, c = MINHASH_PARAMS[seed]
    return (
        f"pmod(shiftright({h}, 30) * {a} + pmod({h}, {_LO_MASK + 1}) * {b} + {c}, {_MOD})"
    )


def mix_python(h: int, seed: int) -> int:
    a, b, c = MINHASH_PARAMS[seed]
    return ((h >> 30) * a + (h & _LO_MASK) * b + c) % _MOD
