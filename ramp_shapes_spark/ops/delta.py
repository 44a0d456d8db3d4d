"""Snapshot deltas for incrementally-maintained triple tables.

A production KG is re-materialized from a growing transcript corpus;
downstream consumers (indexes, caches, exported views) want the CHANGE
SET between two materializations, not a full rescan.  ``snapshot_delta``
computes it relationally: rows present only in the new snapshot are
``add``, rows present only in the old one are ``del`` (multiset
semantics — a row appearing twice in new and once in old yields one
``add``).

Scale shape: one hash aggregation per side on the full row key counts
multiplicities (map-side combinable), then a single full-outer
equi-join on the row key emits each changed row once with its
signed multiplicity difference.  No window, no sort, no Python; both
shuffles are on the same key so Catalyst plans one exchange per side.
At 100 TB the join keys are near-unique (triples), so AQE's skew
handling is idle and the delta is one shuffle round trip.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, functions as F


def snapshot_delta(
    old: DataFrame,
    new: DataFrame,
    key_cols: Optional[List[str]] = None,
) -> DataFrame:
    """Multiset difference of two snapshots of the same relation.

    Returns one row per changed row value: all ``key_cols`` plus

    * ``op`` — ``'add'`` (more copies in ``new``) or ``'del'``
      (more copies in ``old``)
    * ``n`` — how many copies were added / removed (>= 1)

    ``key_cols`` defaults to every column (whole-row identity, the
    right default for triple tables).  Unchanged rows never appear.
    """
    if key_cols is None:
        key_cols = list(old.columns)
    missing_old = set(key_cols) - set(old.columns)
    missing_new = set(key_cols) - set(new.columns)
    if missing_old or missing_new:
        raise ValueError(
            f"key columns missing: {sorted(missing_old)} from old side, "
            f"{sorted(missing_new)} from new side")

    def counted(df: DataFrame, alias: str) -> DataFrame:
        return df.select(*key_cols).groupBy(*key_cols).agg(
            F.count(F.lit(1)).cast("long").alias(alias))

    o = counted(old, "__no")
    n = counted(new, "__nn")
    j = o.join(n, key_cols, "full_outer").select(
        *key_cols,
        (F.coalesce(F.col("__nn"), F.lit(0))
         - F.coalesce(F.col("__no"), F.lit(0))).alias("__d"))
    return j.filter(F.col("__d") != 0).select(
        *key_cols,
        F.when(F.col("__d") > 0, F.lit("add")).otherwise(F.lit("del"))
        .alias("op"),
        F.abs(F.col("__d")).cast("long").alias("n"))
