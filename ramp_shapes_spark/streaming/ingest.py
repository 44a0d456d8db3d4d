"""Incremental KG construction over streaming transcript drops.

The reference engine is batch-only; at pipeline scale, transcripts
arrive continuously.  This module runs the SAME batch pipeline
(mentions → frame → flatten → canonicalize → materialize) incrementally
under Structured Streaming:

* **source**: a file-source stream over a parquet drop directory with
  the transcript schema ``(conv_id, turn_idx, role, text, tool, ts)``;
  the streaming checkpoint tracks processed files, so re-starting the
  query picks up exactly the new drops;
* **late/duplicate turns**: an event-time watermark on ``ts`` plus
  ``dropDuplicatesWithinWatermark`` on (conv_id, turn_idx) — re-sent
  turns inside the lateness bound are suppressed with bounded state;
* **sink**: ``foreachBatch`` → the batch pipeline with
  ``workdir=<root>/batches/<batch_id>`` and
  ``input_fingerprint="stream-batch-<batch_id>"``.  The materializer
  is idempotent per (bucket, fingerprint), so a batch re-run after a
  crash rewrites only unfinished buckets — exactly-once output on top
  of Structured Streaming's at-least-once batch replay;
* **entity canonicalization scope**: connected components run WITHIN
  each micro-batch (cross-batch aliasing is a compaction concern: the
  alias edges accumulate in the triple table and a periodic batch CC
  over ``kg:canonicalEntity`` edges folds them globally — same design
  as log-structured merge of graph updates).

100 TB shape: each micro-batch is the already-audited batch plan; the
streaming layer adds only file tracking and watermark state (keyed by
(conv_id, turn_idx), bounded by the watermark horizon).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

TURN_SCHEMA = ("conv_id string, turn_idx int, role string, "
               "text string, tool string, ts timestamp")


def stream_kg_ingest(
    spark: SparkSession,
    input_path: str,
    root: str,
    n_buckets: int = 16,
    watermark: str = "1 hour",
    track_errors: bool = False,
    checkpoint: Optional[str] = None,
    max_files_per_trigger: Optional[int] = None,
):
    """Start an ``availableNow`` streaming query that drains every
    unprocessed drop under ``input_path`` into the bucketed triple
    table at ``root`` and terminates.  Call again after new drops land
    (or swap the trigger for a continuous ``processingTime`` one on a
    real cluster) — the checkpoint carries the file log and dedup
    state across invocations.  Returns the StreamingQuery."""
    from ramp_shapes_spark.pipeline.run import run_pipeline

    reader = spark.readStream.schema(TURN_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    turns = (
        reader.parquet(input_path)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["conv_id", "turn_idx"])
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        run_pipeline(
            spark, batch_df,
            workdir=os.path.join(root, "batches", f"{batch_id:010d}"),
            n_buckets=n_buckets,
            input_fingerprint=f"stream-batch-{batch_id}",
            track_errors=track_errors,
        )

    return (
        turns.writeStream
        .foreachBatch(process)
        .option("checkpointLocation",
                checkpoint or os.path.join(root, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def read_stream_triples(spark: SparkSession, root: str) -> DataFrame:
    """Union view over every materialized micro-batch (flat triple
    layout, with ``pbucket`` partition pruning intact).  Each batch
    directory is its own partitioned table root, so they are read
    separately and unioned (mixed batch/partition levels confuse a
    single multi-root scan)."""
    import glob

    dirs = sorted(glob.glob(os.path.join(root, "batches", "*", "data")))
    if not dirs:
        raise FileNotFoundError(f"no materialized batches under {root}")
    out = spark.read.parquet(dirs[0])
    for d in dirs[1:]:
        out = out.unionByName(spark.read.parquet(d))
    return out


def compact_stream_aliases(spark: SparkSession, root: str,
                           n_buckets: int = 16) -> DataFrame:
    """Global entity-alias compaction over every materialized batch.

    Per-batch canonicalization only sees its own micro-batch's link
    edges, so entity clusters split across batches leave CHAINS of
    ``kg:canonicalEntity`` aliases (batch 1: B→A, batch 2: C→B).  This
    periodic batch job folds them: connected components over the union
    of all alias edges produce one global representative per cluster
    (the same log-round contraction CC as the pipeline), then every
    triple's entity references are rewritten to it — alias edges become
    a flat forest (no chains) and mention→entity edges point at global
    canonicals.  Returns the compacted flat triple DataFrame; callers
    write it as a new snapshot generation.  This is the LSM-style merge
    step of the streaming design: cheap incremental batches, periodic
    global fold."""
    from pyspark.sql import functions as F

    from ramp_shapes_spark.pipeline.canonicalize import (
        connected_components,
    )
    from ramp_shapes_spark.pipeline.kgshapes import kg

    flat = read_stream_triples(spark, root)
    canon_p = kg("canonicalEntity")
    alias = flat.filter(F.col("p") == F.lit(canon_p))
    edges = alias.select(F.col("s_value").alias("src"),
                         F.col("o_value").alias("dst"))
    cc = connected_components(edges)  # (node, component=min id)
    cmap = cc.select(F.col("node").alias("__n"),
                     F.col("component").alias("__c"))

    rest = flat.filter(F.col("p") != F.lit(canon_p))
    rewritten = (
        rest.join(cmap, (rest["o_value"] == F.col("__n"))
                  & (rest["o_kind"] == "iri"), "left")
        .select(
            "s_kind", "s_value", "p", "o_kind",
            F.coalesce("__c", "o_value").alias("o_value"),
            "o_dt", "o_lang", "pbucket",
        )
    )
    folded_aliases = (
        cc.filter(F.col("node") != F.col("component"))
        .select(
            F.lit("iri").alias("s_kind"), F.col("node").alias("s_value"),
            F.lit(canon_p).alias("p"),
            F.lit("iri").alias("o_kind"),
            F.col("component").alias("o_value"),
            F.lit(None).cast("string").alias("o_dt"),
            F.lit(None).cast("string").alias("o_lang"),
            F.pmod(F.xxhash64(F.lit(canon_p)), F.lit(n_buckets))
            .cast("int").alias("pbucket"),
        )
    )
    return rewritten.unionByName(folded_aliases).dropDuplicates(
        ["s_kind", "s_value", "p", "o_kind", "o_value", "o_dt", "o_lang"])


def stream_turn_rates(
    spark: SparkSession,
    input_path: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
):
    """Windowed streaming aggregate: turns and active conversations per
    event-time window — the monitoring metric a live ingest pipeline
    exports.  Returns the streaming DataFrame (caller picks the sink);
    late turns beyond the watermark are dropped by the engine."""
    from pyspark.sql import functions as F

    turns = spark.readStream.schema(TURN_SCHEMA).parquet(input_path)
    return (
        turns.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.approx_count_distinct("conv_id").alias("n_conversations"),
        )
        .select(
            F.col("w")["start"].alias("window_start"),
            F.col("w")["end"].alias("window_end"),
            "n_turns", "n_conversations",
        )
    )
