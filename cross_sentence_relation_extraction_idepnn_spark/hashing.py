"""Engine-portable deterministic hashing.

The reference keys everything on Python dict identity (e.g. word →
embedding row, ``features_bb2016.py:2420-2439``); a distributed engine
needs explicit, *portable* hashes so that the DuckDB correctness oracle
can reproduce MinHash/SimHash/fingerprint values bit-for-bit.

Definition: ``H(s) = int(md5(s).hexdigest()[:15], 16)`` — a 60-bit
unsigned value, safely inside int64 for both engines.

- Spark:  ``conv(substr(md5(s), 1, 15), 16, 10) :: long`` (JVM-side,
  whole-stage-codegen'd; no Python).
- DuckDB: hex-digit arithmetic (emitted by :func:`duck_h15`).
- NumPy oracle: :func:`py_h15`.

MinHash permutations use the universal-hash family
``h_i(x) = (a_i * (H(x) mod P) + b_i) mod P`` with ``P = 2^31 - 1`` and
``a_i, b_i`` derived from ``H(f"perm-{i}")`` — reproducible everywhere,
and every intermediate stays < 2^62 (no int64 overflow in either
engine).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = (1 << 31) - 1


def py_h15(s: str) -> int:
    """NumPy/pytest oracle for H(s)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def spark_h15(col: Column | str) -> Column:
    """H(s) as a native Spark Column (stays in codegen)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def duck_h15(expr: str) -> str:
    """DuckDB SQL text computing H(``expr``) — hex digits → int64."""
    terms = [
        f"(strpos('0123456789abcdef', substr(md5({expr}), {i + 1}, 1)) - 1) * {16 ** (14 - i)}"
        for i in range(15)
    ]
    return "(" + " + ".join(terms) + ")"


def perm_coeffs(i: int) -> tuple[int, int]:
    """(a_i, b_i) for MinHash permutation *i*; a_i in [1, P-1], b_i in [0, P-1]."""
    a = py_h15(f"perm-a-{i}") % (MERSENNE_P - 1) + 1
    b = py_h15(f"perm-b-{i}") % MERSENNE_P
    return a, b


def spark_minhash_term(hcol: Column, i: int) -> Column:
    """(a_i * (H mod P) + b_i) mod P as a Spark Column over a H-column."""
    a, b = perm_coeffs(i)
    return (hcol % MERSENNE_P * F.lit(a) + F.lit(b)) % MERSENNE_P


def duck_minhash_term(h_expr: str, i: int) -> str:
    """Same permutation as DuckDB SQL text over an H-expression."""
    a, b = perm_coeffs(i)
    return f"((({h_expr}) % {MERSENNE_P}) * {a} + {b}) % {MERSENNE_P}"


def py_minhash_term(h: int, i: int) -> int:
    a, b = perm_coeffs(i)
    return (h % MERSENNE_P * a + b) % MERSENNE_P
