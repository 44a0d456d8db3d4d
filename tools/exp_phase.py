"""Phase timing of one frame query: graph build / engine construct /
frame() compile / count, plus job counts per phase."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

CPUS = os.environ.get("EXP_CPUS", "32")
SF = os.environ.get("EXP_SF", "/root/testdata/sf0.1")

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.local.dir", "/dev/shm/spark-local")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "48g")
    .appName("exp").getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
tracker = sc.statusTracker()


def njobs():
    ids = tracker.getJobIdsForGroup(None)
    return len(ids) if ids else 0


def phase(label, fn):
    j0 = njobs()
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time()-t0:.2f}s jobs+={njobs()-j0}", flush=True)
    return out


from ramp_shapes_spark.ops import relational as R
from ramp_shapes_spark.frame import FrameEngine
from ramp_shapes_spark.shapes import (
    PredicatePath, SELF_PATH, ShapeBuilder, prop,
)
from ramp_shapes_spark.terms import RDF_TYPE, XSD_STRING, iri

EX = "http://example.com/bench#"

g = phase("supplier_graph build", lambda: R.supplier_graph(spark, SF))
phase("triples count", lambda: g.count())

b = ShapeBuilder()
nation = b.record(
    EX + "Nation",
    type_properties=[prop("t", RDF_TYPE, b.constant(iri(EX + "Nation")),
                          transient=True)],
    properties=[prop("name", EX + "name", b.literal(datatype=XSD_STRING))],
)
supplier = b.record(
    EX + "Supplier",
    type_properties=[prop("t", RDF_TYPE, b.constant(iri(EX + "Supplier")),
                          transient=True)],
    properties=[
        prop("id", SELF_PATH, b.resource(only_named=True)),
        prop("name", EX + "name", b.literal(datatype=XSD_STRING)),
        prop("nation", EX + "locatedIn", nation),
    ],
)
eng = phase("engine ctor", lambda: FrameEngine(spark, b.catalog, g,
                                               diagnostics=False, track_errors=False))
phase("universe()", lambda: eng.universe())
phase("subject_props()", lambda: eng.subject_props())
res = phase("frame() compile", lambda: eng.frame(supplier))
phase("matches.count", lambda: res.matches.count())
phase("matches.count again", lambda: res.matches.count())

spark.stop()
