"""Portable deterministic hashing — identical values in Spark and DuckDB.

The LLM-pipeline operators (MinHash, SimHash, fingerprinting) need
hash functions that the DuckDB oracle can reproduce bit-for-bit. MD5
is the common denominator: both engines produce identical hex digests,
and a 15-hex-char prefix parses into a non-negative 60-bit BIGINT on
both sides:

- Spark:  ``conv(substr(md5(s), 1, 15), 16, 10)::bigint``
- DuckDB: ``CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)``

"Permutations" for MinHash are universal hashes over ONE md5 base
digest: h_i(x) = (a_i * (md5_60(x) mod p) + b_i) mod p with the
Mersenne prime p = 2^31 - 1 (see :func:`minhash_perm`). One md5 per
shingle plus k codegen'd integer maps replaces k salted digests;
a_i * (h mod p) <= 2^62 so the arithmetic never overflows int64 on
either engine, making the family bit-portable to DuckDB. The older
per-salt scheme survives as :func:`salted_hash` for single-hash uses
(banding, fingerprints).

Scale note: md5 on short strings is a JVM-side codegen'd expression in
Spark (no Python boundary), so these run at full whole-stage-codegen
speed on executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_int(col: Column, nchars: int = 15) -> Column:
    """Spark: first `nchars` hex chars of md5 as a BIGINT (≤60 bits)."""
    return F.conv(F.substring(F.md5(col), 1, nchars), 16, 10).cast("bigint")


def md5_int_sql(expr: str, nchars: int = 15) -> str:
    """DuckDB fragment computing the same value as :func:`md5_int`."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, {nchars})) AS BIGINT)"


def salted_hash(col: Column, salt: int, nchars: int = 15) -> Column:
    """Spark: md5-derived hash of ``salt || '|' || col`` (independent
    keyed hash; one md5 per salt — prefer :func:`minhash_perm` when
    many independent hashes of the SAME value are needed)."""
    return md5_int(F.concat(F.lit(f"{salt}|"), col), nchars)


def salted_hash_sql(expr: str, salt: int, nchars: int = 15) -> str:
    """DuckDB fragment matching :func:`salted_hash`."""
    return md5_int_sql(f"concat('{salt}|', {expr})", nchars)


# Universal-hash MinHash permutations: ONE md5 per value, then k cheap
# integer maps h_i(x) = (a_i * (h mod p) + b_i) mod p over the Mersenne
# prime p = 2^31 - 1. a_i * (h mod p) <= 2^62 never overflows int64, so
# the whole family is codegen'd integer arithmetic — measured ~1.2 s/
# query cheaper than k salted md5 digests at sf0.1 (8 permutations,
# ~300k shingles). 31-bit range is ample for min-hashing: the min over
# a document's few hundred shingles collides at ~n/2^31. Constants are
# fixed odd multipliers (golden-ratio / murmur mixing constants), so
# both engines reproduce the values bit-for-bit.
MERSENNE31 = (1 << 31) - 1


def _perm_consts(i: int) -> tuple[int, int]:
    a = ((2 * i + 1) * 0x9E3779B1) % MERSENNE31
    b = (i * 0x85EBCA77 + 1) % MERSENNE31
    return a, b


def minhash_perm(h: Column, i: int) -> Column:
    """Spark: permutation i of a non-negative 60-bit hash column."""
    a, b = _perm_consts(i)
    return (F.lit(a) * (h % F.lit(MERSENNE31)) + F.lit(b)) % F.lit(MERSENNE31)


def minhash_perm_sql(h_expr: str, i: int) -> str:
    """DuckDB fragment matching :func:`minhash_perm`."""
    a, b = _perm_consts(i)
    return f"(({a} * (({h_expr}) % {MERSENNE31}) + {b}) % {MERSENNE31})"
