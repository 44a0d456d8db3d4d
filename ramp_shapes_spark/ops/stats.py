"""Exact distributional statistics over grouped numeric columns.

``group_quantiles`` computes EXACT discrete quantiles with an
engine-agnostic rule — the element at rank ``max(1,
ceil(pct * n / 100))``, evaluated in INTEGER arithmetic
(``(pct*n + 99) div 100``) so no engine's float-vs-decimal literal
parsing can move a boundary — instead of leaning on the engines' own
``percentile_disc`` variants, whose conventions differ.
Exactness makes the op oracle-checkable; at 100 TB the same API shape
would be served by a mergeable sketch (``percentile_approx`` /
KLL) — the exact variant is the correctness anchor the sketch is
validated against on samples.

Scale shape: one shuffle on the group key for the sort window, one
conditional aggregate over the ranked rows; no collect, no Python.
Group cardinality is the event-type domain (tiny), so the final
exchange is negligible; the sort cost is the intrinsic price of an
exact quantile.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window, functions as F


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    percents: List[int] = (50, 95, 99),
) -> DataFrame:
    """One row per group: ``n`` plus one ``q<percent>`` column per
    requested percent (element at integer rank
    ``max(1, (pct*n + 99) div 100)`` of the ascending-sorted values —
    the classical discrete quantile)."""
    w = Window.partitionBy("grp").orderBy(F.asc("val"))
    df = df.filter(F.col(value_col).isNotNull())
    ranked = df.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).alias("val"),
    ).withColumn("__rn", F.row_number().over(w).cast("long"))
    counts = ranked.groupBy("grp").agg(
        F.max("__rn").cast("long").alias("n"))
    j = ranked.join(counts, "grp")
    aggs = [F.max("n").cast("long").alias("n")]
    for pct in percents:
        rank = F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"({int(pct)} * n + 99) div 100"))
        aggs.append(
            F.min(F.when(F.col("__rn") == rank, F.col("val")))
            .alias(f"q{int(pct)}"))
    return j.groupBy("grp").agg(*aggs) \
        .withColumnRenamed("grp", group_col)
