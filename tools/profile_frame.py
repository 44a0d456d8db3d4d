"""Ad-hoc profiling: where does frame-engine wall time go?

Times plan analysis (explain) separately from execution (count) for the
supplier-record frame query and a tiny CC run, at sf0.001.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

AQE = os.environ.get("PROF_AQE", "false")
CPUS = os.environ.get("PROF_CPUS", "8")

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.sql.adaptive.enabled", AQE)
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .appName("profile").getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

SF = "/root/testdata/sf0.001"

from ramp_shapes_spark.ops import relational as R

t0 = time.time()
df = R.q_frame_supplier_record(spark, SF)
t_build = time.time() - t0
print(f"build (python DF construction): {t_build:.2f}s", flush=True)

t0 = time.time()
df.explain(mode="simple")
t_explain = time.time() - t0
print(f"explain (analysis+opt): {t_explain:.2f}s", flush=True)

t0 = time.time()
n = df.count()
t_count = time.time() - t0
print(f"count ({n} rows): {t_count:.2f}s", flush=True)

sc = spark.sparkContext
tracker = sc.statusTracker()
print("jobs so far:", len(tracker.getJobIdsForGroup() or []), flush=True)

# tiny CC
from ramp_shapes_spark.pipeline.canonicalize import connected_components
edges = spark.createDataFrame(
    [(f"a{i}", f"a{i+1}") for i in range(100)], "src string, dst string")
t0 = time.time()
cc = connected_components(edges, hot_k=0)
ncc = cc.count()
print(f"tiny CC (100-chain, {ncc} nodes): {time.time()-t0:.2f}s", flush=True)

spark.stop()
