"""Experiment: frame-query wall time vs AQE coalescing config.

Times q_frame_supplier_record and q_frame_map_nations at $EXP_SF
(default sf0.1) under the session config given by env vars:
  EXP_PFIRST  - spark.sql.adaptive.coalescePartitions.parallelismFirst
  EXP_ADVISORY - advisoryPartitionSizeInBytes
  EXP_PARTS   - spark.sql.shuffle.partitions
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

PFIRST = os.environ.get("EXP_PFIRST", "true")
ADVISORY = os.environ.get("EXP_ADVISORY", "64m")
PARTS = os.environ.get("EXP_PARTS", "32")
CPUS = os.environ.get("EXP_CPUS", "32")
SF = os.environ.get("EXP_SF", "/root/testdata/sf0.1")

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", PARTS)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", PFIRST)
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", ADVISORY)
    .config("spark.local.dir", "/dev/shm/spark-local")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "48g")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .appName("exp").getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from ramp_shapes_spark.ops import relational as R

for name, fn in [
    ("frame_supplier_record", R.q_frame_supplier_record),
    ("frame_map_nations", R.q_frame_map_nations),
]:
    t0 = time.time()
    df = fn(spark, SF)
    t_build = time.time() - t0
    t0 = time.time()
    n = df.count()
    print(f"{name}: build={t_build:.2f}s count={time.time()-t0:.2f}s "
          f"rows={n} [pfirst={PFIRST} adv={ADVISORY} parts={PARTS}]",
          flush=True)

spark.stop()
