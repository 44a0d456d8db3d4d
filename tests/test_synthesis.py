"""Map ``value`` ShapeReference and composite computed-property
synthesis (shapes.ts:136-142; compactByReference synthesize.ts:11-36;
synthesizeShape record/set surface synthesize.ts:55-223)."""

import json

from ramp_shapes_spark.dataset import triples_df
from ramp_shapes_spark.frame import FrameEngine
from ramp_shapes_spark.shapes import (
    ComputedProperty, ShapeBuilder, ShapeReference, prop,
)
from ramp_shapes_spark.terms import XSD_STRING, iri, lit

EX = "http://example.com/s#"


def _entries_graph(spark):
    triples = [
        (iri("r1"), EX + "entry", iri("e1")),
        (iri("e1"), EX + "key", lit("alpha")),
        (iri("e1"), EX + "val", lit("1")),
        (iri("r1"), EX + "entry", iri("e2")),
        (iri("e2"), EX + "key", lit("beta")),
        (iri("e2"), EX + "val", lit("2")),
    ]
    return triples_df(spark, triples)


def test_map_value_reference(spark):
    """map with BOTH key and value refs: {key: val-part} instead of
    {key: whole item record}."""
    b = ShapeBuilder()
    key_shape = b.literal(datatype=XSD_STRING)
    val_shape = b.literal(datatype=XSD_STRING)
    entry = b.record(
        EX + "Entry",
        properties=[
            prop("k", EX + "key", key_shape),
            prop("v", EX + "val", val_shape),
        ],
    )
    m = b.map_of(ShapeReference(target=key_shape, part="value"), entry,
                 value=ShapeReference(target=val_shape, part="value"))
    root = b.record(
        EX + "Root",
        properties=[prop("entries", EX + "entry", m)],
    )
    engine = FrameEngine(spark, b.catalog, _entries_graph(spark))
    res = engine.frame(root)
    rows = [json.loads(r["value"]) for r in res.matches.collect()
            if json.loads(r["value"]).get("entries")]
    assert any(v.get("entries") == {"alpha": "1", "beta": "2"}
               for v in rows), rows


def test_map_value_reference_partless(spark):
    """value ref without a part: the framed value of the target."""
    b = ShapeBuilder()
    key_shape = b.literal(datatype=XSD_STRING)
    val_shape = b.literal(datatype=XSD_STRING)
    entry = b.record(
        EX + "Entry",
        properties=[
            prop("k", EX + "key", key_shape),
            prop("v", EX + "val", val_shape),
        ],
    )
    m = b.map_of(ShapeReference(target=key_shape, part="value"), entry,
                 value=ShapeReference(target=val_shape, part=None))
    root = b.record(
        EX + "Root",
        properties=[prop("entries", EX + "entry", m)],
    )
    engine = FrameEngine(spark, b.catalog, _entries_graph(spark))
    res = engine.frame(root)
    rows = [json.loads(r["value"]) for r in res.matches.collect()
            if json.loads(r["value"]).get("entries")]
    assert any(v.get("entries") == {"alpha": "1", "beta": "2"}
               for v in rows), rows


def test_computed_record_synthesis(spark):
    """computed property whose value shape is a RECORD over captured
    node references and constants (synthesize.ts:55-120)."""
    b = ShapeBuilder()
    name_shape = b.literal(datatype=XSD_STRING)
    synth_rec = b.record(
        EX + "Annot",
        properties=[
            prop("label", EX + "label_ignored", name_shape),
            prop("kind", EX + "kind_ignored", b.constant(lit("thing"))),
        ],
    )
    root = b.record(
        EX + "Item",
        properties=[prop("name", EX + "name", name_shape)],
        computed_properties=[ComputedProperty("meta", synth_rec)],
    )
    triples = [(iri("x1"), EX + "name", lit("widget"))]
    engine = FrameEngine(spark, b.catalog, triples_df(spark, triples))
    res = engine.frame(root)
    rows = [json.loads(r["value"]) for r in res.matches.collect()]
    assert {"name": "widget",
            "meta": {"label": "widget", "kind": "thing"}} in rows, rows


def test_computed_set_and_empty_synthesis(spark):
    """set (minCount bounded), optional(emptyValue), list and map
    synthesis targets (synthesize.ts:121-131 + empties)."""
    b = ShapeBuilder()
    name_shape = b.literal(datatype=XSD_STRING)
    synth_set = b.set_of(b.constant(lit("s")), min_count=2, max_count=5)
    synth_rec = b.record(
        EX + "Wrap",
        properties=[
            prop("tags", EX + "i1", synth_set),
            prop("opt", EX + "i2", b.optional(name_shape,
                                              empty_is_null=True)),
            prop("lst", EX + "i3", b.list_of(name_shape)),
        ],
    )
    root = b.record(
        EX + "Item2",
        properties=[prop("name", EX + "name", name_shape)],
        computed_properties=[ComputedProperty("extra", synth_rec)],
    )
    triples = [(iri("y1"), EX + "name", lit("gadget"))]
    engine = FrameEngine(spark, b.catalog, triples_df(spark, triples))
    res = engine.frame(root)
    rows = [json.loads(r["value"]) for r in res.matches.collect()]
    assert {"name": "gadget",
            "extra": {"tags": ["s", "s"], "opt": None, "lst": []}} in rows, rows


def test_map_value_reference_fast_parity(spark):
    """Value-reference maps on the FAST tree ('mapref' plan): the
    captured key/value terms rebuild each entry without the general
    compiler; every reference part must match the general path."""
    import pytest as _pytest

    from ramp_shapes_spark import fastframe
    from ramp_shapes_spark.terms import RDF_TYPE

    for part in ("value", "datatype", None):
        def build():
            b = ShapeBuilder()
            key_shape = b.literal(datatype=XSD_STRING)
            val_shape = b.literal(datatype=XSD_STRING)
            entry = b.record(
                EX + "Entry",
                properties=[
                    prop("k", EX + "key", key_shape),
                    prop("v", EX + "val", val_shape),
                ],
            )
            m = b.map_of(ShapeReference(target=key_shape, part="value"),
                         entry,
                         value=ShapeReference(target=val_shape, part=part))
            root = b.record(
                EX + "Root",
                type_properties=[prop("t", RDF_TYPE,
                                      b.constant(iri(EX + "Root")),
                                      transient=True)],
                properties=[prop("entries", EX + "entry", m)],
            )
            return b, root

        triples = [(iri("r1"), RDF_TYPE, iri(EX + "Root"))] + [
            (iri("r1"), EX + "entry", iri("e1")),
            (iri("e1"), EX + "key", lit("alpha")),
            (iri("e1"), EX + "val", lit("1")),
            (iri("r1"), EX + "entry", iri("e2")),
            (iri("e2"), EX + "key", lit("beta")),
            (iri("e2"), EX + "val", lit("2")),
        ]

        b1, root1 = build()
        fast = FrameEngine(spark, b1.catalog, triples_df(spark, triples),
                           diagnostics=False, track_errors=False)
        assert fastframe.qualifies(fast, b1.catalog.get(root1)), \
            f"mapref (part={part}) should route through the fast tree"
        fres = fast.frame(root1)
        fvals = [json.loads(r["value"]) for r in fres.matches.collect()]

        b2, root2 = build()
        general = FrameEngine(spark, b2.catalog,
                              triples_df(spark, triples))
        gvals = [json.loads(r["value"])
                 for r in general.frame(root2).matches.collect()]
        assert fvals == gvals and len(fvals) == 1, (
            f"part={part}:\n fast    {fvals}\n general {gvals}")
