"""Round-6 optimization harness (bench.py is FROZEN for measurement —
this file owns all extra instrumentation).

Modes:
  python bench_extra.py time <query> [reps]     one fresh JVM, warmup +
                                                interleaved reps, count()
                                                timing (bench parity)
  python bench_extra.py noop <query> [reps]     same but noop-sink action
                                                (guide §1.4)
  python bench_extra.py plan <query> <outfile>  explain("formatted") dump
  python bench_extra.py pipeline [reps]         kg_pipeline timing replica

Session config mirrors bench.py exactly so numbers are comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _session():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .appName("ramp-shapes-spark-bench-extra")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    mode = sys.argv[1]
    spark = _session()
    import __spark_entry__ as entrymod

    if mode == "pipeline":
        from ramp_shapes_spark.pipeline.datagen import generate_transcripts
        from ramp_shapes_spark.pipeline.run import run_pipeline

        reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
        n_conv = int(os.environ.get("SPARK_GRAFT_NCONV", "3000"))
        turns = generate_transcripts(
            spark, n_conv, n_entities=2000, partitions=int(CPUS)
        ).localCheckpoint(eager=True)
        n_turns = turns.count()
        times = []
        for _ in range(reps):
            t0 = time.time()
            result = run_pipeline(spark, turns, track_errors=True)
            n_triples = result.triples.count()
            times.append(round(time.time() - t0, 3))
        print(json.dumps({"query": "kg_pipeline", "times": times,
                          "min": min(times), "n_turns": n_turns,
                          "n_triples": n_triples}))
        return

    if mode == "cc":
        # replica of bench.py's cc_zipf_10m leg with per-phase stats
        from pyspark.sql import functions as F

        from ramp_shapes_spark.pipeline.canonicalize import (
            connected_components,
        )
        reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
        n_edges = int(os.environ.get("SPARK_GRAFT_CC_EDGES", "10000000"))
        n_nodes = n_edges
        u = (F.pmod(F.xxhash64(F.col("id")), F.lit(1_000_003)) + 0.5) \
            / 1_000_003.0
        zipf_dst = F.floor(F.lit(float(n_nodes)) * F.pow(u, F.lit(3.0)))
        edges = (
            spark.range(0, n_edges, 1, int(CPUS) * 2)
            .select(
                F.concat(F.lit("n"), F.col("id").cast("string"))
                .alias("src"),
                F.concat(F.lit("n"), zipf_dst.cast("long").cast("string"))
                .alias("dst"),
            )
        )
        for r in range(reps):
            stats: dict = {}
            t0 = time.time()
            n_cc = connected_components(edges, hot_k=64, stats=stats).count()
            print(json.dumps({"rep": r, "sec": round(time.time() - t0, 3),
                              "nodes": n_cc, **stats}))
        return

    if mode == "plans":
        # dump explain("formatted") for many queries in one JVM:
        #   python bench_extra.py plans <outdir> <suffix> [query ...]
        # (no query list = every queries() entry)
        outdir, suffix = sys.argv[2], sys.argv[3]
        names = sys.argv[4:] or sorted(entrymod.queries())
        os.makedirs(outdir, exist_ok=True)
        allq = entrymod.queries()
        for name in names:
            try:
                df = allq[name](spark, SF_DIR)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
            except Exception as exc:  # noqa: BLE001 — record, keep going
                plan = f"PLAN DUMP FAILED: {exc}\n"
            path = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"wrote {path} ({len(plan)} bytes)", flush=True)
        return

    name = sys.argv[2]
    fn = entrymod.queries()[name]
    if mode == "plan":
        out = sys.argv[3]
        df = fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(out, "w") as fh:
            fh.write(plan)
        print(f"wrote {out} ({len(plan)} bytes)")
        return

    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    action = _noop if mode == "noop" else (lambda df: df.count())
    spark.sparkContext.setJobDescription(f"{mode}:{name} warmup")
    action(fn(spark, SF_DIR))
    times = []
    for r in range(reps):
        spark.sparkContext.setJobDescription(f"{mode}:{name} rep{r}")
        t0 = time.time()
        action(fn(spark, SF_DIR))
        times.append(round(time.time() - t0, 3))
    print(json.dumps({"query": name, "mode": mode, "times": times,
                      "min": min(times)}))


if __name__ == "__main__":
    main()
