"""ramp_shapes_spark — a PySpark-native knowledge-graph construction
engine with the query/data-processing capabilities of the ramp-shapes
shape algebra (reference: ramp-shapes/ramp-shapes, studied read-only).

Not a port: the reference is a single-process lazy-generator engine;
this package compiles the same shape algebra (record / anyOf / set /
optional / resource / literal / list / map, SPARQL-style property
paths, frame/flatten roundtrip) into distributed DataFrame programs.
"""

from .terms import Term, iri, bnode, lit, TERM_TYPE  # noqa: F401
from .shapes import (  # noqa: F401
    ShapeBuilder, ShapeCatalog, Property, ComputedProperty, ShapeReference,
    PredicatePath, SequencePath, InversePath, AlternativePath,
    ZeroOrMorePath, ZeroOrOnePath, OneOrMorePath, SELF_PATH,
    ResourceShape, LiteralShape, RecordShape, AnyOfShape, SetShape,
    OptionalShape, ListShape, MapShape,
    prop, inverse_prop, self_prop, computed,
)
from .ttl import parse_turtle, parse_turtle_file  # noqa: F401
from .shape_ttl import load_shapes_from_file, load_shapes_from_graph  # noqa: F401
from .generate_query import generate_query, ConstructQuery  # noqa: F401

__version__ = "0.1.0"
