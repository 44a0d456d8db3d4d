"""Degree-capped subject gather: a Zipf-head subject must not blow up
the gathered property map (one bounded row instead of a giant one),
while shapes that don't touch the hot predicate frame normally and
shapes that do get the semantically-correct failure."""

import json

from pyspark.sql import functions as F

from ramp_shapes_spark.frame import (
    ERR_MULTIPLE_PROPERTY_MATCHES, FrameEngine,
)
from ramp_shapes_spark.shapes import ShapeBuilder, prop
from ramp_shapes_spark.terms import RDF_TYPE, XSD_STRING, iri, lit

EX = "http://example.com/h#"
N_HOT = 50_000


def _hot_graph(spark):
    """One subject with N_HOT objects on ex:spam plus normal props."""
    term = "struct<kind:string,value:string,dt:string,lang:string>"
    spam = spark.range(N_HOT).selectExpr(
        "id AS tid",
        f"named_struct('kind','iri','value','hot','dt',CAST(NULL AS STRING),"
        f"'lang',CAST(NULL AS STRING)) AS s",
        f"'{EX}spam' AS p",
        "named_struct('kind','iri','value',concat('o',CAST(id AS STRING)),"
        "'dt',CAST(NULL AS STRING),'lang',CAST(NULL AS STRING)) AS o",
    )
    base = spark.createDataFrame(
        [
            (1000000, ("iri", "hot", None, None), RDF_TYPE,
             ("iri", EX + "Thing", None, None)),
            (1000001, ("iri", "hot", None, None), EX + "name",
             ("lit", "hotname", "http://www.w3.org/2001/XMLSchema#string",
              None)),
        ],
        f"tid long, s {term}, p string, o {term}",
    )
    return spam.unionAll(base)


def test_hot_subject_other_props_unaffected(spark):
    triples = _hot_graph(spark)
    b = ShapeBuilder()
    thing = b.record(
        EX + "Thing",
        type_properties=[prop("t", RDF_TYPE, b.constant(iri(EX + "Thing")),
                              transient=True)],
        properties=[prop("name", EX + "name",
                         b.literal(datatype=XSD_STRING))],
    )
    engine = FrameEngine(spark, b.catalog, triples, diagnostics=False,
                         max_gather_degree=1024)
    res = engine.frame(thing)
    rows = [json.loads(r["value"]) for r in res.matches.collect()]
    assert rows == [{"name": "hotname"}]


def test_hot_predicate_fails_correctly(spark):
    """An exactly-one property over the hot predicate must FAIL with
    MultiplePropertyMatches — computed from the capped gather without
    materializing 50k objects into one row."""
    triples = _hot_graph(spark)
    b = ShapeBuilder()
    thing = b.record(
        EX + "Thing",
        type_properties=[prop("t", RDF_TYPE, b.constant(iri(EX + "Thing")),
                              transient=True)],
        properties=[prop("one", EX + "spam", b.resource(only_named=True))],
    )
    engine = FrameEngine(spark, b.catalog, triples,
                         max_gather_degree=1024)
    res = engine.frame(thing)
    assert res.matches.count() == 0
    code, _ = res.first_error()
    assert code == ERR_MULTIPLE_PROPERTY_MATCHES


def test_hot_unbounded_set_uses_join_path(spark):
    """An unbounded set over the hot predicate takes the general join
    path and returns ALL 50k members (semantics preserved)."""
    triples = _hot_graph(spark)
    b = ShapeBuilder()
    thing = b.record(
        EX + "Thing",
        type_properties=[prop("t", RDF_TYPE, b.constant(iri(EX + "Thing")),
                              transient=True)],
        properties=[prop("all", EX + "spam",
                         b.set_of(b.resource(only_named=True)))],
    )
    engine = FrameEngine(spark, b.catalog, triples, diagnostics=False,
                         max_gather_degree=1024)
    res = engine.frame(thing)
    vals = [json.loads(r["value"]) for r in res.matches.collect()]
    assert len(vals) == 1
    assert len(vals[0]["all"]) == N_HOT


def test_hot_subject_set_value_guard(spark):
    """A hub subject whose SET value serializes past max_set_value_len
    must raise a clean error (never a silent executor OOM) on the
    fast-tree path; a generous bound frames the same set fine."""
    import pytest

    n = 1_000_000
    term = "struct<kind:string,value:string,dt:string,lang:string>"
    spam = spark.range(n).selectExpr(
        "id AS tid",
        "named_struct('kind','iri','value','hot','dt',CAST(NULL AS STRING),"
        "'lang',CAST(NULL AS STRING)) AS s",
        f"'{EX}spam' AS p",
        "named_struct('kind','iri','value',concat('o',CAST(id AS STRING)),"
        "'dt',CAST(NULL AS STRING),'lang',CAST(NULL AS STRING)) AS o",
    )
    base = spark.createDataFrame(
        [(2_000_000, ("iri", "hot", None, None), EX + "name",
          ("lit", "hotname", "http://www.w3.org/2001/XMLSchema#string",
           None))],
        f"tid long, s {term}, p string, o {term}",
    )
    triples = spam.unionAll(base)

    def make_engine(max_len):
        b = ShapeBuilder()
        thing = b.record(
            EX + "Thing",
            properties=[
                prop("name", EX + "name", b.literal(datatype=XSD_STRING)),
                prop("all", EX + "spam",
                     b.set_of(b.resource(only_named=True))),
            ],
        )
        return FrameEngine(spark, b.catalog, triples, diagnostics=False,
                           track_errors=False,
                           max_set_value_len=max_len), thing

    engine, thing = make_engine(100_000)
    with pytest.raises(Exception, match="max_set_value_len"):
        engine.frame(thing).matches.collect()

    engine, thing = make_engine(100_000_000)
    rows = [json.loads(r["value"]) for r in engine.frame(thing)
            .matches.collect()]
    assert len(rows) == 1 and len(rows[0]["all"]) == n
