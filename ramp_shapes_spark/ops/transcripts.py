"""Conversation-level analytics over multi-turn transcript tables.

The pipeline's input is the (conv_id, turn_idx, role, text, tool, ts)
transcript shape; before any KG extraction, a production corpus pass
needs per-conversation structure signals — turn-taking balance, tool
usage, latency gaps — for filtering and mixture design (the same role
quality scores play for plain documents).

Scale shape: ONE shuffle on conv_id feeds both the lag window and the
final per-conversation aggregate (same partitioning, so Catalyst
reuses the exchange); every measure is an exact integer (counts,
summed microsecond gaps) so a SQL oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def conversation_stats(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    tool_col: str = "tool",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-conversation turn-taking statistics.

    Returns one row per conversation:

    * ``n_turns`` — total turns
    * ``n_user`` / ``n_assistant`` / ``n_tool`` — per-role turn counts
    * ``n_tools_distinct`` — distinct non-empty tool names invoked
    * ``n_role_switches`` — turns whose role differs from the previous
      turn (turn order = ``turn_idx``)
    * ``total_gap_us`` / ``max_gap_us`` — sum / max of inter-turn
      timestamp gaps in exact microseconds (0 for 1-turn convs)
    """
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_role = F.lag(role_col).over(w)
    gap = us - F.lag(us).over(w)
    t = turns.select(
        F.col(conv_col).alias("conv_id"),
        F.col(role_col).alias("__role"),
        F.col(tool_col).alias("__tool"),
        F.when(prev_role.isNotNull() & (F.col(role_col) != prev_role), 1)
        .otherwise(0).alias("__switch"),
        F.coalesce(gap, F.lit(0)).cast("long").alias("__gap"),
    )
    return t.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum((F.col("__role") == "user").cast("long")).alias("n_user"),
        F.sum((F.col("__role") == "assistant").cast("long"))
        .alias("n_assistant"),
        F.sum((F.col("__role") == "tool").cast("long")).alias("n_tool"),
        F.count_distinct(
            F.when(F.col("__tool") != "", F.col("__tool"))
        ).cast("long").alias("n_tools_distinct"),
        F.sum("__switch").cast("long").alias("n_role_switches"),
        F.sum("__gap").alias("total_gap_us"),
        F.max("__gap").alias("max_gap_us"),
    )
