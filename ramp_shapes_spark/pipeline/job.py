"""spark-submit entry point for the KG-construction pipeline.

The north rule requires the pipeline to run "via spark-submit
--py-files on a multi-executor cluster".  This module is that entry:
it carries NO session construction policy beyond what spark-submit
provides (master, executor topology, memory all come from the submit
command / cluster manager), reads the transcript table from parquet
(or synthesizes a deterministic corpus for smoke runs), runs the full
transcripts → mentions → frame → flatten → canonicalize → materialize
pipeline, and writes the predicate-bucketed triple table with
per-partition lineage manifests for checkpointed resume.

Usage (see tools/submit.sh for the packaged form):

    spark-submit --py-files ramp_shapes_spark.zip \
        -m ramp_shapes_spark.pipeline.job -- \
        --input /data/transcripts.parquet --workdir /data/kg_out

    # or module-file form:
    spark-submit --py-files ramp_shapes_spark.zip \
        path/to/job.py --input ... --workdir ...

Resume: re-submitting with the same --workdir and an unchanged input
fingerprint skips every bucket whose manifest already matches; partial
failures rewrite only the missing buckets (materialize.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="ramp-shapes-spark-pipeline")
    p.add_argument("--input", default=None,
                   help="parquet path of the transcript table "
                        "(conv_id, turn_idx, role, text, tool, ts); "
                        "omit to synthesize --synthetic-conversations")
    p.add_argument("--workdir", required=True,
                   help="output directory: pbucket parquet + manifests")
    p.add_argument("--buckets", type=int, default=16,
                   help="predicate-hash bucket count of the triple table")
    p.add_argument("--fingerprint", default="",
                   help="input fingerprint recorded in manifests; resume "
                        "skips buckets whose manifest matches it")
    p.add_argument("--track-errors", action="store_true",
                   help="route malformed turns into the coded error "
                        "channel (slower general compiler)")
    p.add_argument("--synthetic-conversations", type=int, default=1000,
                   help="corpus size when --input is omitted (smoke runs)")
    p.add_argument("--hot-k", type=int, default=64,
                   help="hot-entity broadcast dictionary size for "
                        "canonicalization skew defense")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from pyspark.sql import SparkSession

    # absolute imports: spark-submit runs this file as a plain script
    # (no parent package); the --py-files zip provides the package
    from ramp_shapes_spark.pipeline.datagen import generate_transcripts
    from ramp_shapes_spark.pipeline.run import run_pipeline

    # spark-submit owns the session: master/executors/memory come from
    # the command line or cluster defaults, not from code
    spark = SparkSession.builder.appName("ramp-shapes-spark-kg").getOrCreate()

    t0 = time.time()
    if args.input:
        turns = spark.read.parquet(args.input)
    else:
        turns = generate_transcripts(
            spark, args.synthetic_conversations,
            n_entities=max(64, args.synthetic_conversations // 2),
            partitions=spark.sparkContext.defaultParallelism,
        )

    result = run_pipeline(
        spark, turns,
        workdir=args.workdir,
        n_buckets=args.buckets,
        input_fingerprint=args.fingerprint,
        hot_k=args.hot_k,
        track_errors=args.track_errors,
    )
    n_turns = turns.count()
    wall = time.time() - t0
    summary = {
        "n_turns": n_turns,
        "wall_sec": round(wall, 2),
        "turns_per_sec": round(n_turns / wall, 1),
        "metrics": result.metrics,
    }
    if args.track_errors:
        summary["n_frame_errors"] = result.frame_errors.count()
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
