"""Caller-provided candidates imply strict evaluation (frame.ts:38,
50-51): every seeded candidate must match the shape or the mismatch
surfaces in the error channel with the same code a strict run raises.
"""

import json

from ramp_shapes_spark.dataset import triples_df
from ramp_shapes_spark.frame import (
    ERR_NO_PROPERTY_MATCHES, FrameEngine,
)
from ramp_shapes_spark.shapes import ShapeBuilder, prop
from ramp_shapes_spark.terms import RDF_TYPE, XSD_STRING, iri, lit

EX = "http://example.com/c#"


def _setup(spark):
    b = ShapeBuilder()
    thing = b.record(
        EX + "Thing",
        type_properties=[prop("t", RDF_TYPE, b.constant(iri(EX + "Thing")),
                              transient=True)],
        properties=[prop("name", EX + "name",
                         b.literal(datatype=XSD_STRING))],
    )
    triples = [
        (iri("a"), RDF_TYPE, iri(EX + "Thing")),
        (iri("a"), EX + "name", lit("alpha")),
        (iri("b"), RDF_TYPE, iri(EX + "Thing")),
        (iri("b"), EX + "name", lit("beta")),
        (iri("c"), RDF_TYPE, iri(EX + "Thing")),
        # c has no name → mismatch under strict
    ]
    return b, thing, triples_df(spark, triples)


def test_candidates_restrict_and_match(spark):
    b, thing, triples = _setup(spark)
    engine = FrameEngine(spark, b.catalog, triples)
    res = engine.frame(thing, candidates=[iri("a")])
    rows = [json.loads(r["value"]) for r in res.matches.collect()]
    assert rows == [{"name": "alpha"}]
    assert res.errors.count() == 0


def test_candidates_imply_strict(spark):
    b, thing, triples = _setup(spark)
    engine = FrameEngine(spark, b.catalog, triples)
    res = engine.frame(thing, candidates=[iri("a"), iri("c")])
    rows = [json.loads(r["value"]) for r in res.matches.collect()]
    assert rows == [{"name": "alpha"}]
    first = res.first_error()
    assert first is not None
    code, stack = first
    assert code == ERR_NO_PROPERTY_MATCHES  # c: required name missing

    # parity: the default all-candidates run under strict=True reports
    # the same code for the same node
    engine2 = FrameEngine(spark, b.catalog, triples)
    res2 = engine2.frame(thing, strict=True)
    code2, _ = res2.first_error()
    assert code2 == code


def test_candidates_not_in_graph_mismatch(spark):
    b, thing, triples = _setup(spark)
    engine = FrameEngine(spark, b.catalog, triples)
    res = engine.frame(thing, candidates=[iri("nope")])
    assert res.matches.count() == 0
    assert res.errors.count() >= 1
