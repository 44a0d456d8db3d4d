"""Round-5 review parity fixes: the fast-tree compiler must either
express lenient semantics exactly or route the shape to the general
compiler; anyOf match counting is per (triple, variant) like the
general compiler's _compile_anyof; mapref emits null entry values for
NULL referenced parts instead of failing the map."""

import json

from ramp_shapes_spark.dataset import triples_df
from ramp_shapes_spark.fastframe import qualifies
from ramp_shapes_spark.frame import FrameEngine
from ramp_shapes_spark.shapes import (
    ShapeBuilder, ShapeReference, prop,
)
from ramp_shapes_spark.terms import RDF_TYPE, XSD_STRING, iri, lit

EX = "http://example.com/fl#"


def _anchor_props(b):
    return [prop("t", RDF_TYPE, b.constant(iri(EX + "T")), transient=True)]


def _both(spark, b, root, triples):
    """(fast matches, general matches) as {focus: parsed value}."""
    out = {}
    for fast in (True, False):
        engine = FrameEngine(spark, b.catalog, triples_df(spark, triples),
                             diagnostics=not fast, track_errors=not fast)
        res = engine.frame(root)
        out[fast] = {tuple(r["focus"]): json.loads(r["value"])
                     for r in res.matches.collect()}
    return out[True], out[False]


def test_anyleaf_overlapping_variants_counts_per_variant(spark):
    """A term matching TWO variants of an anyOf yields two matches in
    the general compiler (exactly-one then fails with 204); the fast
    anyleaf counters must agree instead of passing it."""
    b = ShapeBuilder()
    u = b.any_of([b.literal(), b.literal(datatype=XSD_STRING)])
    root = b.record(
        EX + "T",
        type_properties=_anchor_props(b),
        properties=[
            prop("id", EX + "id", b.literal(datatype=XSD_STRING)),
            prop("v", EX + "v", u),
        ],
    )
    t = [
        # s1's v matches BOTH variants (an xsd:string literal matches
        # the untyped-literal variant and the typed variant)
        (iri("s1"), RDF_TYPE, iri(EX + "T")),
        (iri("s1"), EX + "id", lit("s1")),
        (iri("s1"), EX + "v", lit("x")),
        # s2 control: IRI object fails both variants
        (iri("s2"), RDF_TYPE, iri(EX + "T")),
        (iri("s2"), EX + "id", lit("s2")),
        (iri("s2"), EX + "v", iri("y")),
    ]
    engine = FrameEngine(spark, b.catalog, triples_df(spark, t))
    assert qualifies(engine, b.catalog.get(root))
    fast, general = _both(spark, b, root, t)
    assert fast == general


def test_lenient_union_routes_to_general(spark):
    """anyOf(lenient=True) empties its mismatches in the general
    compiler; the fast counters cannot express that, so the shape must
    not qualify — and results must equal the general compiler's."""
    b = ShapeBuilder()
    u = b.any_of([b.literal(datatype=XSD_STRING)], lenient=True)
    root = b.record(
        EX + "T",
        type_properties=_anchor_props(b),
        properties=[
            prop("id", EX + "id", b.literal(datatype=XSD_STRING)),
            prop("v", EX + "v", u),
        ],
    )
    t = [
        (iri("s1"), RDF_TYPE, iri(EX + "T")),
        (iri("s1"), EX + "id", lit("s1")),
        (iri("s1"), EX + "v", lit("good")),
        (iri("s1"), EX + "v", iri("bad")),  # fails the variant, lenient
    ]
    engine = FrameEngine(spark, b.catalog, triples_df(spark, t))
    assert not qualifies(engine, b.catalog.get(root))
    fast, general = _both(spark, b, root, t)
    assert fast == general
    assert general[("iri", "s1", None, None)]["v"] == "good"


def test_lenient_set_item_routes_to_general(spark):
    """A set whose ITEM leaf is lenient silently drops failing items in
    the general compiler; nt = nm cannot express that."""
    b = ShapeBuilder()
    root = b.record(
        EX + "T",
        type_properties=_anchor_props(b),
        properties=[
            prop("id", EX + "id", b.literal(datatype=XSD_STRING)),
            prop("vals", EX + "v",
                 b.set_of(b.literal(datatype=XSD_STRING, lenient=True))),
        ],
    )
    t = [
        (iri("s1"), RDF_TYPE, iri(EX + "T")),
        (iri("s1"), EX + "id", lit("s1")),
        (iri("s1"), EX + "v", lit("keep1")),
        (iri("s1"), EX + "v", iri("dropped")),
        (iri("s1"), EX + "v", lit("keep2")),
    ]
    engine = FrameEngine(spark, b.catalog, triples_df(spark, t))
    assert not qualifies(engine, b.catalog.get(root))
    fast, general = _both(spark, b, root, t)
    assert fast == general
    assert sorted(general[("iri", "s1", None, None)]["vals"]) == \
        ["keep1", "keep2"]


def test_lenient_child_record_routes_to_general(spark):
    """A lenient CHILD record passes its property with exactly one
    matching edge among mismatching ones; the join plan requires all
    edges to match, so the shape must route general."""
    b = ShapeBuilder()
    child = b.record(
        EX + "C",
        properties=[prop("name", EX + "name",
                         b.literal(datatype=XSD_STRING))],
        lenient=True,
    )
    root = b.record(
        EX + "T",
        type_properties=_anchor_props(b),
        properties=[
            prop("id", EX + "id", b.literal(datatype=XSD_STRING)),
            prop("c", EX + "c", child),
        ],
    )
    t = [
        (iri("s1"), RDF_TYPE, iri(EX + "T")),
        (iri("s1"), EX + "id", lit("s1")),
        (iri("s1"), EX + "c", iri("c1")),
        (iri("s1"), EX + "c", iri("c2")),  # c2 fails the child, lenient
        (iri("c1"), EX + "name", lit("good")),
    ]
    engine = FrameEngine(spark, b.catalog, triples_df(spark, t))
    assert not qualifies(engine, b.catalog.get(root))
    fast, general = _both(spark, b, root, t)
    assert fast == general
    assert general[("iri", "s1", None, None)]["c"] == {"name": "good"}


def test_mapref_null_part_emits_null_value(spark):
    """A value reference on part='language' over plain literals emits
    "" entry values (reference literals store language as '' when
    absent, rdf-model.ts:62); the fast mapref must not count those
    items as failing, and neither engine may corrupt the JSON."""
    b = ShapeBuilder()
    key_shape = b.literal(datatype=XSD_STRING)
    val_shape = b.literal()
    entry = b.record(
        EX + "E",
        properties=[
            prop("k", EX + "key", key_shape),
            prop("v", EX + "val", val_shape),
        ],
    )
    m = b.map_of(ShapeReference(target=key_shape, part="value"), entry,
                 value=ShapeReference(target=val_shape, part="language"))
    root = b.record(
        EX + "T",
        type_properties=_anchor_props(b),
        properties=[
            prop("id", EX + "id", b.literal(datatype=XSD_STRING)),
            prop("entries", EX + "entry", m),
        ],
    )
    t = [
        (iri("s1"), RDF_TYPE, iri(EX + "T")),
        (iri("s1"), EX + "id", lit("s1")),
        (iri("s1"), EX + "entry", iri("e1")),
        (iri("e1"), EX + "key", lit("alpha")),
        (iri("e1"), EX + "val", lit("novalue")),     # no language tag
        (iri("s1"), EX + "entry", iri("e2")),
        (iri("e2"), EX + "key", lit("beta")),
        (iri("e2"), EX + "val", lit("tagged", lang="en")),
    ]
    fast, general = _both(spark, b, root, t)
    assert fast == general
    assert general[("iri", "s1", None, None)]["entries"] == \
        {"alpha": "", "beta": "en"}
