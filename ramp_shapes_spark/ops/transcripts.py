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


def tool_transitions(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    tool_col: str = "tool",
    start_token: str = "<start>",
) -> DataFrame:
    """Corpus-level tool-call transition counts (Markov bigrams).

    Within each conversation, the sequence of tool invocations (rows
    with a non-empty ``tool``) ordered by ``turn_idx`` yields one
    bigram per call: (previous tool or ``start_token``, tool).  The
    result is one row per distinct transition with its corpus count —
    the raw material for agent tool-usage models and anomaly
    screens (a transition never seen in the reference corpus).

    Scale shape: the non-tool turns are filtered BEFORE the window
    (predicate reaches the scan), one shuffle on ``conv_col`` for the
    lag, then a map-side-combinable groupBy on the (prev, tool) pair —
    the pair domain is tools², tiny, so the final exchange moves
    almost nothing at any corpus size.
    """
    calls = turns.filter(F.col(tool_col) != "").select(
        F.col(conv_col).alias("__c"),
        F.col(idx_col).alias("__i"),
        F.col(tool_col).alias("tool"),
    )
    bi = calls.select(
        F.coalesce(F.lag("tool").over(
            Window.partitionBy("__c").orderBy("__i")),
            F.lit(start_token)).alias("prev_tool"),
        "tool",
    )
    return bi.groupBy("prev_tool", "tool").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions"))


def conversation_dedup(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Whole-conversation exact dedup (replayed-transcript detection).

    A conversation's fingerprint is the md5 of its turns in
    ``turn_idx`` order, each turn rendered ``role \\x1e text`` and
    turns joined with ``\\x1f`` (separators make the encoding
    prefix-free, so no two distinct transcripts collide except by md5).
    Returns one row per conversation: ``conv_id``, ``conv_sha``,
    ``n_dup_convs`` (group size), ``canonical_conv_id`` (lexicographic
    min of the group) and ``is_canonical``.

    Scale shape: one shuffle on ``conv_col`` to assemble each
    transcript (conversations are bounded-length by nature — this is
    the one place the pipeline collects a whole conversation into a
    row, same bound the frame stage already relies on), then one
    shuffle on the 16-byte fingerprint for the group stats.  Both keys
    are near-uniform, so no skew defense is needed.
    """
    t = turns.select(
        F.col(conv_col).alias("conv_id"),
        F.struct(
            F.col(idx_col).alias("i"),
            F.col(role_col).alias("r"),
            F.col(text_col).alias("x"),
        ).alias("__t"),
    )
    per_conv = t.groupBy("conv_id").agg(
        F.md5(F.array_join(
            F.transform(
                F.sort_array(F.collect_list("__t")),
                lambda s: F.concat_ws("\x1e", s["r"], s["x"])),
            "\x1f")).alias("conv_sha"))
    groups = per_conv.groupBy("conv_sha").agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_convs"),
        F.min("conv_id").alias("canonical_conv_id"))
    return per_conv.join(groups, "conv_sha").select(
        "conv_id", "conv_sha", "n_dup_convs", "canonical_conv_id",
        (F.col("conv_id") == F.col("canonical_conv_id"))
        .alias("is_canonical"))
