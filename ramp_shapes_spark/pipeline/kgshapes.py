"""Shape catalog of the KG-construction pipeline.

The transcript KG uses the same shape algebra as the fixtures: a
type-gated Turn record owning a set of Mention records.  Built with the
builder DSL (the analog of the reference's ShapeBuilder,
builder.ts:79-428).
"""

from __future__ import annotations

from ramp_shapes_spark.shapes import SELF_PATH, ShapeBuilder, prop
from ramp_shapes_spark.terms import (
    RDF_TYPE, XSD_DOUBLE, XSD_INTEGER, XSD_STRING, iri,
)

KG = "http://ramp-shapes-spark.dev/kg#"


def kg(name: str) -> str:
    return KG + name


def build_kg_catalog():
    """Returns (catalog, turn_shape_id)."""
    b = ShapeBuilder()

    mention = b.record(
        kg("Mention"),
        type_properties=[
            prop("type", RDF_TYPE,
                 b.constant(iri(kg("Mention"))), transient=True),
        ],
        properties=[
            prop("entity", kg("entity"), b.resource(only_named=True)),
            prop("surface", kg("surface"), b.literal(datatype=XSD_STRING)),
            prop("score", kg("score"), b.literal(datatype=XSD_DOUBLE)),
        ],
    )

    turn = b.record(
        kg("Turn"),
        type_properties=[
            prop("type", RDF_TYPE, b.constant(iri(kg("Turn"))),
                 transient=True),
        ],
        properties=[
            prop("id", SELF_PATH, b.resource(only_named=True)),
            prop("conv", kg("inConversation"), b.resource(only_named=True)),
            prop("idx", kg("turnIndex"), b.literal(datatype=XSD_INTEGER)),
            prop("role", kg("role"), b.literal(datatype=XSD_STRING)),
            prop("tool", kg("tool"),
                 b.optional(b.literal(datatype=XSD_STRING))),
            prop("mentions", kg("mentions"), b.set_of(mention)),
        ],
    )
    return b.catalog, turn
