"""frame_from_store: prune-before-frame against the materialized
predicate-bucketed triple sink (materialize.py + subgraph.py).

Checks the two properties that make the path 100 TB-viable:
(1) correctness — framing from the store equals framing the original
    in-memory graph; and
(2) the physical scan actually PRUNES: a predicate step pins its
    pbucket partition via a constant-folded hash filter, visible as a
    PartitionFilters entry on the parquet scan node.
"""

import json
import re

from pyspark.sql import functions as F

from ramp_shapes_spark.dataset import triples_df
from ramp_shapes_spark.frame import FrameEngine
from ramp_shapes_spark.pipeline.materialize import (
    frame_from_store, materialize_triples, read_triples,
)
from ramp_shapes_spark.shapes import ShapeBuilder, prop
from ramp_shapes_spark.subgraph import roots_of_type
from ramp_shapes_spark.terms import RDF_TYPE, XSD_STRING, iri, lit

EX = "http://example.com/store#"
N_BUCKETS = 8


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def _shape(b):
    nation = b.record(
        EX + "Nation",
        type_properties=[prop("t", RDF_TYPE, b.constant(iri(EX + "Nation")),
                              transient=True)],
        properties=[prop("name", EX + "name",
                         b.literal(datatype=XSD_STRING))],
    )
    return b.record(
        EX + "Supplier",
        type_properties=[prop("t", RDF_TYPE,
                              b.constant(iri(EX + "Supplier")),
                              transient=True)],
        properties=[
            prop("name", EX + "name", b.literal(datatype=XSD_STRING)),
            prop("nation", EX + "locatedIn", nation),
        ],
    )


def _data():
    out = []
    for i in range(4):
        out += [
            (iri(f"s{i}"), RDF_TYPE, iri(EX + "Supplier")),
            (iri(f"s{i}"), EX + "name", lit(f"sup{i}")),
            (iri(f"s{i}"), EX + "locatedIn", iri(f"n{i % 2}")),
        ]
    for j in range(2):
        out += [
            (iri(f"n{j}"), RDF_TYPE, iri(EX + "Nation")),
            (iri(f"n{j}"), EX + "name", lit(f"nat{j}")),
        ]
    # shape-irrelevant predicate in its own traffic
    out.append((iri("s0"), EX + "unrelated", lit("junk")))
    return out


def test_frame_from_store_matches_direct(spark, tmp_path):
    b = ShapeBuilder()
    supplier = _shape(b)
    triples = triples_df(spark, _data())
    root = str(tmp_path / "sink")
    materialize_triples(triples, root, n_buckets=N_BUCKETS,
                        input_fingerprint="t1", spark=spark)

    direct = FrameEngine(spark, b.catalog, triples,
                         diagnostics=False, track_errors=False)
    want = sorted(
        r["value"] for r in direct.frame(supplier).matches.collect())

    res = frame_from_store(spark, root, b.catalog, supplier,
                           diagnostics=False, track_errors=False)
    got = sorted(r["value"] for r in res.matches.collect())
    assert got == want and len(got) == 4


def test_frame_from_store_seeded_roots(spark, tmp_path):
    b = ShapeBuilder()
    supplier = _shape(b)
    triples = triples_df(spark, _data())
    root = str(tmp_path / "sink")
    materialize_triples(triples, root, n_buckets=N_BUCKETS,
                        input_fingerprint="t1", spark=spark)
    stored = read_triples(spark, root, keep_bucket=True)
    roots = roots_of_type(stored, EX + "Supplier", RDF_TYPE,
                          predicate_bucket=("pbucket", N_BUCKETS))
    res = frame_from_store(spark, root, b.catalog, supplier, roots=roots,
                           diagnostics=False, track_errors=False)
    assert res.matches.count() == 4


def test_predicate_step_prunes_partitions(spark, tmp_path):
    triples = triples_df(spark, _data())
    root = str(tmp_path / "sink")
    materialize_triples(triples, root, n_buckets=N_BUCKETS,
                        input_fingerprint="t1", spark=spark)
    stored = read_triples(spark, root, keep_bucket=True)
    pred = EX + "name"
    k = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(pred)), F.lit(N_BUCKETS)).cast("int")
        .alias("k")).collect()[0]["k"]
    stepped = stored.filter(
        (F.col("p") == F.lit(pred))
        & (F.col("pbucket")
           == F.pmod(F.xxhash64(F.lit(pred)), F.lit(N_BUCKETS))
           .cast("int")))
    plan = _plan(stepped)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, plan
    assert "pbucket" in m.group(1) and str(k) in m.group(1), m.group(1)
    # and the pruned scan still returns exactly the predicate's rows
    assert stepped.count() == 6  # 4 supplier + 2 nation names


def test_store_tids_are_stable_content_hashes(spark, tmp_path):
    triples = triples_df(spark, _data())
    root = str(tmp_path / "sink")
    materialize_triples(triples, root, n_buckets=N_BUCKETS,
                        input_fingerprint="t1", spark=spark)
    a = {r["tid"] for r in read_triples(spark, root).select("tid").collect()}
    b = {r["tid"] for r in read_triples(spark, root).select("tid").collect()}
    assert a == b and len(a) == len(_data())  # distinct rows, stable ids
