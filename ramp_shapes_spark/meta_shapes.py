"""Self-hosted shapes-for-shapes: the ramp meta-schema in the builder
DSL, and ``frame_shapes`` — loading shape graphs by FRAMING them with
the engine's own frame semantics (shapes-for-shapes.ts:12-360).

:mod:`ramp_shapes_spark.shape_ttl` interprets the ``ramp:`` vocabulary
directly (config parsing); this module is the reference's self-hosting
route and serves as its drift detector: both loaders must produce the
same catalog for every shape graph
(tests/test_shapes_for_shapes.py).
"""

from __future__ import annotations

from typing import Dict, List

from .shapes import (
    ShapeBuilder, ShapeCatalog, ShapeID, ShapeReference, computed, prop,
    self_prop,
)
from .terms import RAMP_NS, RDF_TYPE, Term, iri

XSD = "http://www.w3.org/2001/XMLSchema#"
XSD_BOOLEAN = XSD + "boolean"
XSD_STRING = XSD + "string"
XSD_INTEGER = XSD + "integer"


def _r(name: str) -> str:
    return RAMP_NS + name


def make_shapes_for_shapes() -> ShapeCatalog:
    """The meta-schema (shapes-for-shapes.ts:12-349), builder-for-
    builder: each ramp shape kind is a record over the ``ramp:``
    vocabulary, property paths are a recursive union with transient
    negative-exclusion guards, and shape-type tags are vocabulary
    lookups."""
    b = ShapeBuilder()

    SHAPE = iri(_r("Shape"))
    PATH = iri(_r("PropertyPath"))

    shape_type_vocab = {
        "record": iri(_r("Record")), "anyOf": iri(_r("AnyOf")),
        "set": iri(_r("Set")), "optional": iri(_r("Optional")),
        "resource": iri(_r("Resource")), "literal": iri(_r("Literal")),
        "list": iri(_r("List")), "map": iri(_r("Map")),
    }
    path_type_vocab = {
        "predicate": iri(_r("PredicatePath")),
        "sequence": iri(_r("SequencePath")),
        "inverse": iri(_r("InversePath")),
        "alternative": iri(_r("AlternativePath")),
        "zeroOrMore": iri(_r("ZeroOrMorePath")),
        "zeroOrOne": iri(_r("ZeroOrOnePath")),
        "oneOrMore": iri(_r("OneOrMorePath")),
    }

    def from_vocab(key: str, vocab: Dict[str, Term]):
        # fromVocabulary (builder.ts): constant term + vocabulary map —
        # frames as the vocabulary KEY string
        return b.resource(value=vocab[key], vocabulary=vocab)

    shape_id = b.resource(_r("ShapeID"), keep_as_term=True)
    opt_bool = lambda: b.optional(b.literal(datatype=XSD_BOOLEAN))  # noqa: E731

    def base_props():
        return [
            self_prop("id", shape_id),
            prop("lenient", _r("lenient"), opt_bool()),
        ]

    # property paths ---------------------------------------------------
    b.any_of([
        iri(_r("PredicatePath")), iri(_r("SequencePath")),
        iri(_r("InversePath")), iri(_r("AlternativePath")),
        iri(_r("ZeroOrMorePath")), iri(_r("ZeroOrOnePath")),
        iri(_r("OneOrMorePath")),
    ], id=PATH)

    # negative guard: a predicate path is a bare IRI — it must NOT
    # frame as any structured path node (shapes-for-shapes.ts:120-139)
    other_paths = b.any_of([
        iri(_r("SequencePath")), iri(_r("InversePath")),
        iri(_r("AlternativePath")), iri(_r("ZeroOrMorePath")),
        iri(_r("ZeroOrOnePath")), iri(_r("OneOrMorePath")),
    ], lenient=True)
    from .shapes import SELF_PATH
    b.record(_r("PredicatePath"), properties=[
        self_prop("predicate", b.resource(only_named=True, keep_as_term=True)),
        # negative guard (transient self set, maxCount 0): a predicate
        # path is a bare IRI — it must NOT match any structured path
        prop("exclude", SELF_PATH,
             b.set_of(other_paths, max_count=0), transient=True),
    ], computed_properties=[
        computed("type", from_vocab("predicate", path_type_vocab)),
    ])

    b.record(_r("SequencePath"), properties=[
        self_prop("sequence", b.list_of(PATH)),
    ], computed_properties=[
        computed("type", from_vocab("sequence", path_type_vocab)),
    ])
    b.record(_r("InversePath"), properties=[
        prop("inverse", _r("inversePath"), PATH),
    ], computed_properties=[
        computed("type", from_vocab("inverse", path_type_vocab)),
    ])
    b.record(_r("AlternativePath"), properties=[
        prop("alternatives", _r("alternativePath"), b.list_of(PATH)),
    ], computed_properties=[
        computed("type", from_vocab("alternative", path_type_vocab)),
    ])
    for kind, pred in (("zeroOrMore", "zeroOrMorePath"),
                       ("zeroOrOne", "zeroOrOnePath"),
                       ("oneOrMore", "oneOrMorePath")):
        b.record(_r(kind[0].upper() + kind[1:] + "Path"), properties=[
            prop(kind, _r(pred), PATH),
        ], computed_properties=[
            computed("type", from_vocab(kind, path_type_vocab)),
        ])

    # shape records ----------------------------------------------------
    b.any_of([
        iri(_r("Record")), iri(_r("AnyOf")), iri(_r("Set")),
        iri(_r("Optional")), iri(_r("Resource")), iri(_r("Literal")),
        iri(_r("List")), iri(_r("Map")),
    ], id=SHAPE)

    b.record(_r("Property"), properties=[
        prop("name", _r("name"), b.literal(datatype=XSD_STRING)),
        prop("path", _r("path"), PATH),
        prop("valueShape", _r("shape"), SHAPE),
        prop("transient", _r("transient"), opt_bool()),
    ])
    b.record(_r("ComputedProperty"), properties=[
        prop("name", _r("name"), b.literal(datatype=XSD_STRING)),
        prop("valueShape", _r("shape"), SHAPE),
    ])

    b.record(_r("Record"), type_properties=[
        prop("type", RDF_TYPE, from_vocab("record", shape_type_vocab)),
    ], properties=base_props() + [
        prop("typeProperties", _r("typeProperty"),
             b.set_of(iri(_r("Property")))),
        prop("properties", _r("property"), b.set_of(iri(_r("Property")))),
        prop("computedProperties", _r("computedProperty"),
             b.set_of(iri(_r("ComputedProperty")))),
    ])
    b.record(_r("AnyOf"), type_properties=[
        prop("type", RDF_TYPE, from_vocab("anyOf", shape_type_vocab)),
    ], properties=base_props() + [
        prop("variants", _r("variant"), b.set_of(SHAPE)),
    ])
    b.record(_r("Set"), type_properties=[
        prop("type", RDF_TYPE, from_vocab("set", shape_type_vocab)),
    ], properties=base_props() + [
        prop("itemShape", _r("item"), SHAPE),
        prop("minCount", _r("minCount"),
             b.optional(b.literal(datatype=XSD_INTEGER))),
        prop("maxCount", _r("maxCount"),
             b.optional(b.literal(datatype=XSD_INTEGER))),
    ])
    b.record(_r("Optional"), type_properties=[
        prop("type", RDF_TYPE, from_vocab("optional", shape_type_vocab)),
    ], properties=base_props() + [
        prop("itemShape", _r("item"), SHAPE),
    ])
    b.record(_r("Resource"), type_properties=[
        prop("type", RDF_TYPE, from_vocab("resource", shape_type_vocab)),
    ], properties=base_props() + [
        prop("onlyNamed", _r("onlyNamed"), opt_bool()),
        prop("value", _r("termValue"),
             b.optional(b.resource(keep_as_term=True))),
        prop("keepAsTerm", _r("keepAsTerm"), opt_bool()),
        prop("vocabulary", _r("vocabulary"),
             b.optional(iri(_r("Vocabulary")))),
    ])
    vocab_key = b.literal(datatype=XSD_STRING)
    vocab_term = b.resource(only_named=True, keep_as_term=True)
    vocab_item = b.record("\x00VocabularyItem", type_properties=[
        prop("key", _r("vocabKey"), vocab_key),
    ], properties=[
        prop("term", _r("termValue"), vocab_term),
    ])
    b.record(_r("Vocabulary"), properties=[
        self_prop("id", b.optional(b.resource(keep_as_term=True))),
        prop("terms", _r("vocabItem"),
             b.map_of(ShapeReference(target=vocab_key, part="value"),
                      vocab_item,
                      value=ShapeReference(target=vocab_term, part=None))),
    ])
    b.record(_r("Literal"), type_properties=[
        prop("type", RDF_TYPE, from_vocab("literal", shape_type_vocab)),
    ], properties=base_props() + [
        prop("datatype", _r("termDatatype"),
             b.optional(b.resource(only_named=True, keep_as_term=True))),
        prop("language", _r("termLanguage"),
             b.optional(b.literal(datatype=XSD_STRING))),
        prop("value", _r("termValue"),
             b.optional(b.literal(keep_as_term=True))),
        prop("keepAsTerm", _r("keepAsTerm"), opt_bool()),
    ])
    b.record(_r("List"), type_properties=[
        prop("type", RDF_TYPE, from_vocab("list", shape_type_vocab)),
    ], properties=base_props() + [
        prop("itemShape", _r("item"), SHAPE),
        prop("headPath", _r("headPath"), b.optional(PATH)),
        prop("tailPath", _r("tailPath"), b.optional(PATH)),
        prop("nil", _r("nil"),
             b.optional(b.resource(only_named=True, keep_as_term=True))),
    ])
    term_part_vocab = {
        "datatype": iri(_r("TermDatatype")),
        "value": iri(_r("TermValue")),
        "language": iri(_r("TermLanguage")),
    }
    b.record(_r("ShapeReference"), properties=[
        prop("target", _r("shape"), SHAPE),
        prop("part", _r("termPart"), b.optional(b.any_of([
            from_vocab("datatype", term_part_vocab),
            from_vocab("language", term_part_vocab),
            from_vocab("value", term_part_vocab),
        ]))),
    ])
    b.record(_r("Map"), type_properties=[
        prop("type", RDF_TYPE, from_vocab("map", shape_type_vocab)),
    ], properties=base_props() + [
        prop("key", _r("mapKey"), iri(_r("ShapeReference"))),
        prop("value", _r("mapValue"),
             b.optional(iri(_r("ShapeReference")))),
        prop("itemShape", _r("item"), SHAPE),
    ])
    return b.catalog


def frame_shapes(triples) -> List[dict]:
    """frameShapes (shapes-for-shapes.ts:351-360): frame a shape graph
    against the meta-schema with the reference-semantics interpreter;
    returns the raw framed shape values (dicts)."""
    from .pyframe import Graph, Mismatch, CyclicMatch, PyFrame, _stack_frame

    catalog = make_shapes_for_shapes()
    graph = Graph(list(triples))
    interp = PyFrame(catalog, graph)
    root = catalog.get(iri(_r("Shape")))
    out: List[dict] = []
    for term in graph.candidates():
        for match in interp.frame_shape(root.id, False, [term],
                                        [_stack_frame(root)]):
            if isinstance(match, (Mismatch, CyclicMatch)):
                continue
            out.append(match.value)
    return out
