"""Temporal join operators.

Spark has no native as-of join (Pandas-on-Spark ``merge_asof`` exists
but detours through pandas); the scalable DataFrame formulation is the
union-tag + running ``last(..., ignorenulls)`` window below — one
shuffle on the join key, no per-row range scan, no key×time explosion.
DuckDB's native ``ASOF JOIN`` serves as the independent oracle.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: Optional[List[str]] = None,
              suffix: str = "_asof") -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` within the same ``on`` key (inclusive
    backward as-of join, the DuckDB/kdb default).  Left rows with no
    prior right row keep nulls.

    Returns the left columns plus ``<col><suffix>`` for each of
    ``right_cols`` (default: every right column except the key).

    Scale shape: ONE shuffle — both sides are union-tagged and
    window-scanned per key ordered by (ts, tag), with right rows
    ordered before left rows at equal timestamps so the join is
    inclusive.  The carried state is a single struct via
    ``last(..., ignorenulls=True)``, so memory per key is O(1) and a
    hot key costs only its own sort — never a cross product.  This is
    the formulation that survives a 100 TB event table; the pandas
    ``merge_asof`` detour would collect each key group into one
    worker's memory.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on]
    lcols = left.columns
    payload = F.struct(*[F.col(c) for c in right_cols])
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        payload.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in lcols],
    )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__payload"].dataType)
        .alias("__payload"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    w = (Window.partitionBy(on).orderBy("__ts", "__tag")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = F.last("__payload", ignorenulls=True).over(w)
    out = (
        l.unionByName(r)
        .withColumn("__carried", carried)
        .filter(F.col("__tag") == 1)
    )
    keep = [F.col(f"__l_{c}").alias(c) for c in lcols]
    keep += [F.col("__carried")[c].alias(f"{c}{suffix}")
             for c in right_cols]
    return out.select(*keep)
