"""Deterministic hash-based splitting and stratified sampling.

Training-data pipelines need reproducible row selection that is stable
under reshuffling, re-partitioning and incremental reruns — which rules
out ``df.sample`` (seeded per-partition RNG: the same row can flip
split when the partitioning changes).  The selector here is a pure
function of the row KEY: the first 4 hex digits of ``md5(key)`` define
65,536 equal-probability buckets, and a fraction ``f`` keeps the
buckets lexicographically below ``hex(floor(f * 65536))``.  Lowercase
hex comparison is order-isomorphic to the numeric bucket value and
``md5`` renders identically in Spark and any SQL engine, so every
selection is bit-reproducible cross-engine (the DuckDB oracle runs the
same expression).

At 100 TB this is embarrassingly parallel: one codegen'd projection,
no shuffle, no RNG state, pushdown-friendly (the filter sits directly
on the scan).
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 65536  # 16^4


def _hex_threshold(fraction: float) -> str:
    n = max(0, min(_BUCKETS, int(fraction * _BUCKETS)))
    if n >= _BUCKETS:
        # sorts above every 4-digit hex bucket (hex digits are all
        # < 'g'), so fraction 1.0 keeps everything
        return "g"
    return format(n, "04x")


def hash_bucket_hex(key: Column) -> Column:
    """First 4 lowercase-hex digits of md5(key) — the row's bucket."""
    return F.substring(F.md5(key.cast("string")), 1, 4)


def deterministic_split(
    df: DataFrame, key_col: str, fractions: Dict[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split with the given fractions
    (e.g. ``{"train": .8, "valid": .1, "test": .1}``; must sum to 1).

    Split boundaries are cumulative bucket thresholds, so adding a row
    never moves an existing row between splits."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions sum to {total}, expected 1.0")
    bucket = hash_bucket_hex(F.col(key_col))
    expr: Optional[Column] = None
    acc = 0.0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        acc += frac
        cond = bucket < F.lit(_hex_threshold(acc))
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame, key_col: str, strata_col: str,
    rates: Dict[str, float], default_rate: float = 1.0,
) -> DataFrame:
    """Per-stratum deterministic downsampling (e.g. rebalance an
    over-represented language): keep a row iff its bucket falls below
    its stratum's rate threshold."""
    bucket = hash_bucket_hex(F.col(key_col))
    keep: Column = F.lit(_hex_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        keep = F.when(F.col(strata_col) == F.lit(value),
                      F.lit(_hex_threshold(rate))).otherwise(keep)
    return df.filter(bucket < keep)
