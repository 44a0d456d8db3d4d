"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

The primary metric is KG-pipeline throughput (turns/sec) — the north
rule's unit of work — measured over the full transcript→mentions→
frame→flatten→canonicalize→count path.  Secondary per-query wall times
cover the operator surface (shape-engine joins/closures, dedup, ANN,
connected components).

Scaling evidence (two parallelism levels on the same input) is produced
by tools/scaling.py, which invokes the same pipeline workload.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# transcript corpus scale for the pipeline throughput measurement
N_CONV = int(os.environ.get("SPARK_GRAFT_NCONV", "3000"))


def main() -> None:
    import subprocess

    from pyspark.sql import SparkSession

    # contention telemetry: a leftover Spark JVM (e.g. from a killed
    # interactive run) or a busy host depresses every number 30%+;
    # record the evidence so a slow artifact can be read correctly
    try:
        # anchored to the java binary path so shells whose command line
        # merely CONTAINS the word (e.g. a pkill wrapper) don't count
        n_jvms = int(subprocess.run(
            ["pgrep", "-fc", r"^\S*/java .*SparkSubmit"],
            capture_output=True, text=True).stdout.strip() or 0)
    except Exception:
        n_jvms = -1
    load1 = round(os.getloadavg()[0], 2)

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        # parallelismFirst=true: never coalesce a shuffle stage below
        # the core count — compressed shuffle sizes undershoot the
        # advisory and size-first coalescing was serializing heavy
        # stages into 1-4 tasks (no scaling at any core count)
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        # shuffle to tmpfs: the sandbox's virtio disk is the bottleneck
        # for shuffle-heavy stages and does not scale with cores
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .appName("ramp-shapes-spark-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from ramp_shapes_spark.pipeline.datagen import generate_transcripts
    from ramp_shapes_spark.pipeline.run import run_pipeline

    queries = {}
    n_reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    # the pipeline headline is the noisiest number on this host
    # (identical min-of-3 runs measured 7.7-29.1 s across invocations);
    # one extra rep materially tightens the min
    n_pipe_reps = int(os.environ.get("SPARK_GRAFT_BENCH_PIPE_REPS",
                                     str(max(3, n_reps))))

    # -- flagship: pipeline throughput ---------------------------------
    # min-of-N: each measurement is a fresh pipeline over the same
    # checkpointed input; min discards one-off session/JIT/cache warmup
    # noise (r2 showed 2.5-3.5x swings on sub-second queries measured
    # once in a shared session)
    t0 = time.time()
    turns = generate_transcripts(
        spark, N_CONV, n_entities=2000, partitions=int(CPUS)
    ).localCheckpoint(eager=True)
    n_turns = turns.count()
    gen_t = time.time() - t0

    pipe_times = []
    for _ in range(n_pipe_reps):
        t0 = time.time()
        result = run_pipeline(spark, turns, track_errors=False)
        n_triples = result.triples.count()
        pipe_times.append(time.time() - t0)
    pipe_t = min(pipe_times)
    queries["kg_pipeline"] = round(pipe_t, 3)

    # -- operator surface (min-of-N wall time per query) ---------------
    allq = entrymod.queries()
    # the FULL queries() surface (== the CORRECTNESS query set), in a
    # stable order; ann_ivf_kmeans_topk is the real IVF (Lloyd k-means +
    # nprobe multi-probe) — ann_ivf_topk is the legacy label-probe
    # variant, kept for comparison
    for name in [
        "frame_supplier_record", "frame_nation_suppliers_set",
        "frame_order_optional_union", "frame_map_nations",
        "vocabulary_region",
        "path_sequence_region", "path_closure_chain", "path_one_or_more",
        "path_zero_or_one", "path_alternative_places",
        "flatten_roundtrip_counts", "flatten_relational_counts",
        "flatten_list_counts", "kg_turn_records",
        "dedup_exact", "minhash_signature", "minhash_pairs",
        "minhash_banded_pairs", "ngram_jaccard_pairs",
        "simhash", "simhash64", "token_stats", "quality_score",
        "lang_guess", "doc_fingerprint",
        "ann_brute_topk", "ann_ivf_kmeans_topk", "ann_ivf_topk",
        "cosine_dup_pairs", "media_decode_dims",
        "cc_customer_chains", "events_sessions",
        "turtle_roundtrip_counts",
    ] + sorted(  # never silently drop a query added after this list
        q for q in allq
        if q not in {
            "frame_supplier_record", "frame_nation_suppliers_set",
            "frame_order_optional_union", "frame_map_nations",
            "vocabulary_region", "path_sequence_region",
            "path_closure_chain", "path_one_or_more", "path_zero_or_one",
            "path_alternative_places", "flatten_roundtrip_counts",
            "flatten_relational_counts", "flatten_list_counts",
            "kg_turn_records", "dedup_exact", "minhash_signature",
            "minhash_pairs", "minhash_banded_pairs", "ngram_jaccard_pairs",
            "simhash", "simhash64", "token_stats", "quality_score",
            "lang_guess", "doc_fingerprint", "ann_brute_topk",
            "ann_ivf_kmeans_topk", "ann_ivf_topk", "cosine_dup_pairs",
            "media_decode_dims", "cc_customer_chains", "events_sessions",
            "turtle_roundtrip_counts",
        }
    ):
        best = None
        for _ in range(n_reps):
            t0 = time.time()
            n = allq[name](spark, SF_DIR).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        queries[name] = round(best, 3)

    # -- connected components on a Zipf-skewed 10^7-edge graph ----------
    # (hot-node broadcast + AQE skew handling; rounds reported)
    from pyspark.sql import functions as F  # noqa: E402
    from ramp_shapes_spark.pipeline.canonicalize import (  # noqa: E402
        connected_components,
    )
    n_edges = int(os.environ.get("SPARK_GRAFT_CC_EDGES", "10000000"))
    n_nodes = n_edges  # one out-edge per node
    u = (F.pmod(F.xxhash64(F.col("id")), F.lit(1_000_003)) + 0.5) / 1_000_003.0
    zipf_dst = F.floor(F.lit(float(n_nodes)) * F.pow(u, F.lit(3.0)))
    edges = (
        spark.range(0, n_edges, 1, int(CPUS) * 2)
        .select(
            F.concat(F.lit("n"), F.col("id").cast("string")).alias("src"),
            F.concat(F.lit("n"), zipf_dst.cast("long").cast("string"))
            .alias("dst"),
        )
    )
    cc_stats: dict = {}
    t0 = time.time()
    n_cc = connected_components(edges, hot_k=64, stats=cc_stats).count()
    queries["cc_zipf_10m"] = round(time.time() - t0, 3)

    total = sum(queries.values())
    print(json.dumps({
        "metric": "kg_pipeline_turns_per_sec",
        "value": round(n_turns / pipe_t, 2),
        "unit": "turns/sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "n_turns": n_turns,
        "n_triples": n_triples,
        "cc_zipf_edges": n_edges,
        "cc_zipf_rounds": cc_stats.get("rounds"),
        "cc_zipf_nodes": n_cc,
        "gen_sec": round(gen_t, 3),
        "total_sec": round(total, 3),
        "cpus": int(CPUS),
        "preexisting_spark_jvms": n_jvms,
        "load1_at_start": load1,
    }))


if __name__ == "__main__":
    main()
