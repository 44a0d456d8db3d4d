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
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        # coalesce tiny shuffle stages down to size, not to core count —
        # per-task fixed cost dominates micro-stages; at 100 TB the same
        # conf leaves large stages wide (they hit advisory size first)
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
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

    # -- flagship: pipeline throughput ---------------------------------
    t0 = time.time()
    turns = generate_transcripts(
        spark, N_CONV, n_entities=2000, partitions=int(CPUS)
    ).localCheckpoint(eager=True)
    n_turns = turns.count()
    gen_t = time.time() - t0

    t0 = time.time()
    result = run_pipeline(spark, turns)
    n_triples = result.triples.count()
    pipe_t = time.time() - t0
    queries["kg_pipeline"] = round(pipe_t, 3)

    # -- operator headliners --------------------------------------------
    allq = entrymod.queries()
    for name in [
        "frame_supplier_record", "frame_nation_suppliers_set",
        "path_closure_chain",
        "dedup_exact", "minhash_pairs", "token_stats",
        "ann_brute_topk", "ann_ivf_topk", "cc_customer_chains",
        "events_sessions",
    ]:
        t0 = time.time()
        n = allq[name](spark, SF_DIR).count()
        queries[name] = round(time.time() - t0, 3)

    total = sum(queries.values())
    print(json.dumps({
        "metric": "kg_pipeline_turns_per_sec",
        "value": round(n_turns / pipe_t, 2),
        "unit": "turns/sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "n_turns": n_turns,
        "n_triples": n_triples,
        "gen_sec": round(gen_t, 3),
        "total_sec": round(total, 3),
        "cpus": int(CPUS),
    }))


if __name__ == "__main__":
    main()
