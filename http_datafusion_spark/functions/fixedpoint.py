"""Exact fixed-point money aggregation — the codegen-fast replacement
for decimal-typed sums.

Why: Spark's sum over DECIMAL escapes the long-backed fast path once
the result precision exceeds 18 digits (sum of decimal(18,6) is
decimal(28,6)), so every row pays a BigDecimal add outside whole-stage
codegen's primitive loop — measured 1.44 s vs 0.26 s (double sums) for
TPC-H Q1 at sf0.1 on local[32]. DuckDB's decimal sum is int128 —
effectively free — so decimal-typed Spark plans lose ~1 s/query of
pure bookkeeping against the oracle baseline.

The exact, order-independent, any-scale-safe replacement:

1. Per row, scale the money value to an int64 by multiplying the SAME
   ``cast("decimal(18,d)")`` expression the oracle applies
   (:func:`int_fixed`) — per-row values stay bit-identical to the
   decimal plan, including the cast's HALF_UP rounding of doubles.
2. Sum the int64s grouped by (keys..., spark_partition_id()) — the
   partial aggregate runs in whole-stage codegen over primitive longs.
3. Merge the per-partition partials grouped by keys alone, summing as
   decimal(38,0) (:func:`dsum`) — exact at any cluster size, over a
   relation whose cardinality is #groups x #partitions, not #rows.
4. Recover the value with an exact decimal division
   (:func:`unscale`) — never a double divide, whose 0.5-ulp quotient
   error could flip a round-half boundary.

Overflow safety of step 2: a partial sum overflows int64 only if one
task accumulates >9.2e18 scaled units. At scale 1e6 and 1e5-magnitude
money values (1e11 units/row) that needs >9e7 rows in a single task —
two orders of magnitude beyond what a 128 MB parquet split or an
AQE-coalesced shuffle partition holds. Groups whose size is bounded by
schema semantics (lines per order <= 7, orders per customer ~10) can
skip the two-level split and sum int64 directly (:func:`unscale` still
applies).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def i100(col: Column | str) -> Column:
    """Exact int64 of a <=2-decimal base column (money, rate, quantity).

    The column's true value is a 2-decimal rational v = k/100; the
    stored double is within ~1e-12 relative of it, so x*100 lands
    within ~1e-7 of the integer k — round() recovers k exactly (the
    nearest competing integer is 0.5 away). One double round per base
    column, no BigDecimal per row.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("bigint")


def int6(col: Column | str) -> Column:
    """A 2-decimal base column at scale 1e6 — pure int64."""
    return i100(col) * F.lit(10_000).cast("bigint")


def mul_fixed6(a: Column | str, b: Column | str) -> Column:
    """a*b at scale 1e6 for two 2-decimal columns — pure int64.

    PROVABLY equals ``int_fixed(a * b)`` (the oracle's
    ``CAST(a*b AS DECIMAL(18,6))`` path): the true product is an exact
    4-decimal rational, the double product is within ~1e-9 of it, and
    HALF_UP at scale 6 of a value that close to a 4-decimal rational
    returns that rational — which is exactly i100(a)*i100(b)/1e4.
    """
    return i100(a) * i100(b) * F.lit(100).cast("bigint")


def money_x_rate6(money: Column | str, rate: Column | str) -> Column:
    """money*(1-rate) at scale 1e6 (the TPC-H revenue shape) — pure
    int64, bit-equal to ``int_fixed(money * (1 - rate))`` by the same
    4-decimal-rational argument as :func:`mul_fixed6`."""
    return i100(money) * (F.lit(100).cast("bigint") - i100(rate)) * F.lit(100).cast("bigint")


def charge6(money: Column | str, disc: Column | str, tax: Column | str) -> Column:
    """money*(1-disc)*(1+tax) at scale 1e6 — pure int64; the true
    value is an exact 6-decimal rational, double error ~1e-9, so the
    oracle's decimal(18,6) cast returns the same rational."""
    h = F.lit(100).cast("bigint")
    return i100(money) * (h - i100(disc)) * (h + i100(tax))


def int_fixed(col: Column, digits: int = 6) -> Column:
    """Exact scaled-int64 of a money expression.

    Routes through the identical ``decimal(18,digits)`` cast the
    decimal plan (and the DuckDB oracle) uses, so the per-row quantized
    value — including HALF_UP rounding of a double input — is
    bit-identical; the decimal multiply and bigint cast are then exact.
    """
    return (col.cast(f"decimal(18,{digits})") * F.lit(10**digits)).cast("bigint")


def dsum(name: str) -> Column:
    """Exact decimal merge of int64 partial sums (step 3)."""
    return F.sum(F.col(name).cast("decimal(38,0)"))


def unscale(col: Column, digits: int = 6, round_to: int | None = None) -> Column:
    """Exact value = col / 10**digits via DECIMAL division (never a
    double divide), optionally rounded (decimal HALF_UP — matches
    DuckDB's round-half-away on decimals). Cast the result yourself
    (`.cast("double")`) to match the oracle's output type."""
    v = col / F.lit(10**digits).cast("decimal(8,0)")
    return F.round(v, round_to) if round_to is not None else v


def two_level_agg(
    df: DataFrame,
    keys: list,
    partial: dict[str, Column],
    final: dict[str, Column],
) -> DataFrame:
    """groupBy(keys + partition id) -> ``partial`` aggregates, then
    groupBy(keys) -> ``final`` aggregates over the partial columns
    (referenced by name). ``keys`` may be empty (scalar aggregate) and
    may contain Column expressions. Both aggregations partial-combine
    map-side; the second one runs over #groups x #partitions rows."""
    pid = F.spark_partition_id().alias("__pid")
    p = df.groupBy(*keys, pid).agg(*[c.alias(n) for n, c in partial.items()])
    group_names = [c if isinstance(c, str) else p.columns[i] for i, c in enumerate(keys)]
    return p.groupBy(*group_names).agg(*[c.alias(n) for n, c in final.items()])
