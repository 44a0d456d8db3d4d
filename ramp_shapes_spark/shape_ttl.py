"""Load shape catalogs from Turtle shape-definition graphs.

The reference self-hosts this step by running ``frame`` over a
shape-of-shapes meta schema (``src/shapes-for-shapes.ts:12-360``).
Shape graphs are KB-sized driver configuration, so this engine
interprets the ``ramp:`` vocabulary directly in Python — same inputs,
same resulting catalog, no distributed machinery for config parsing.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from .shapes import (
    AlternativePath,
    AnyOfShape,
    ComputedProperty,
    InversePath,
    ListShape,
    LiteralShape,
    MapShape,
    OneOrMorePath,
    OptionalShape,
    PredicatePath,
    Property,
    PropertyPath,
    RecordShape,
    ResourceShape,
    SequencePath,
    SetShape,
    Shape,
    ShapeCatalog,
    ShapeID,
    ShapeReference,
    ZeroOrMorePath,
    ZeroOrOnePath,
)
from .terms import (
    RAMP_NS,
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    Term,
    iri,
)
from .ttl import Triple, parse_turtle_file


def _r(name: str) -> str:
    return RAMP_NS + name

SHAPE_TYPES = {
    _r("Record"): "record",
    _r("Resource"): "resource",
    _r("Literal"): "literal",
    _r("AnyOf"): "anyOf",
    _r("Set"): "set",
    _r("Optional"): "optional",
    _r("List"): "list",
    _r("Map"): "map",
}

_TERM_PARTS = {
    _r("TermValue"): "value",
    _r("TermDatatype"): "datatype",
    _r("TermLanguage"): "language",
}


class _Graph:
    """Tiny in-memory triple index preserving document order."""

    def __init__(self, triples: List[Triple]) -> None:
        self.triples = triples
        self._sp: Dict[Tuple[str, str], List[Term]] = {}
        for s, p, o in triples:
            self._sp.setdefault((s.key(), p), []).append(o)

    def objects(self, s: Term, p: str) -> List[Term]:
        return self._sp.get((s.key(), p), [])

    def one(self, s: Term, p: str) -> Optional[Term]:
        objs = self.objects(s, p)
        return objs[0] if objs else None

    def boolean(self, s: Term, p: str) -> bool:
        obj = self.one(s, p)
        return bool(obj and obj.kind == "lit" and obj.value == "true")

    def integer(self, s: Term, p: str) -> Optional[int]:
        obj = self.one(s, p)
        return int(obj.value) if obj and obj.kind == "lit" else None

    def string(self, s: Term, p: str) -> Optional[str]:
        obj = self.one(s, p)
        return obj.value if obj is not None else None

    def rdf_list(self, node: Term) -> List[Term]:
        items: List[Term] = []
        seen = set()
        while not (node.kind == "iri" and node.value == RDF_NIL):
            if node.key() in seen:
                raise ValueError("cyclic rdf:list in shape graph")
            seen.add(node.key())
            first = self.one(node, RDF_FIRST)
            rest = self.one(node, RDF_REST)
            if first is None or rest is None:
                raise ValueError(f"malformed rdf:list at {node}")
            items.append(first)
            node = rest
        return items


def _parse_path(g: _Graph, node: Term) -> PropertyPath:
    if node.kind == "iri" and node.value == RDF_NIL:
        return SequencePath(())
    if node.kind == "iri" and not g.objects(node, _r("inversePath")):
        # plain predicate IRI (unless it's a path node, which would be odd
        # for an IRI-identified node in practice)
        if not _is_path_node(g, node):
            return PredicatePath(node.value)
    if g.one(node, RDF_FIRST) is not None:
        return SequencePath(tuple(_parse_path(g, el) for el in g.rdf_list(node)))
    inv = g.one(node, _r("inversePath"))
    if inv is not None:
        return InversePath(_parse_path(g, inv))
    alt = g.one(node, _r("alternativePath"))
    if alt is not None:
        return AlternativePath(tuple(_parse_path(g, el) for el in g.rdf_list(alt)))
    zom = g.one(node, _r("zeroOrMorePath"))
    if zom is not None:
        return ZeroOrMorePath(_parse_path(g, zom))
    zoo = g.one(node, _r("zeroOrOnePath"))
    if zoo is not None:
        return ZeroOrOnePath(_parse_path(g, zoo))
    oom = g.one(node, _r("oneOrMorePath"))
    if oom is not None:
        return OneOrMorePath(_parse_path(g, oom))
    if node.kind == "iri":
        return PredicatePath(node.value)
    raise ValueError(f"cannot parse property path at {node}")


def _is_path_node(g: _Graph, node: Term) -> bool:
    return any(
        g.one(node, p) is not None
        for p in (
            _r("inversePath"), _r("alternativePath"), _r("zeroOrMorePath"),
            _r("zeroOrOnePath"), _r("oneOrMorePath"), RDF_FIRST,
        )
    )


def _parse_vocabulary(g: _Graph, node: Term) -> Tuple[Tuple[str, Term], ...]:
    out: List[Tuple[str, Term]] = []
    for item in g.objects(node, _r("vocabItem")):
        key = g.string(item, _r("vocabKey"))
        term = g.one(item, _r("termValue"))
        if key is None or term is None:
            raise ValueError(f"malformed vocab item {item}")
        out.append((key, term))
    return tuple(out)


def _parse_property(g: _Graph, node: Term) -> Property:
    name = g.string(node, _r("name"))
    path_node = g.one(node, _r("path"))
    shape = g.one(node, _r("shape"))
    if name is None or path_node is None or shape is None:
        raise ValueError(f"malformed property {node}")
    return Property(
        name=name,
        path=_parse_path(g, path_node),
        value_shape=shape,
        transient=g.boolean(node, _r("transient")),
    )


def _parse_shape_ref(g: _Graph, node: Term) -> ShapeReference:
    target = g.one(node, _r("shape"))
    if target is None:
        # the reference node IS the target shape id
        return ShapeReference(target=node)
    part_term = g.one(node, _r("termPart"))
    part = _TERM_PARTS.get(part_term.value) if part_term is not None else None
    return ShapeReference(target=target, part=part)


def load_shapes_from_graph(triples: List[Triple]) -> ShapeCatalog:
    g = _Graph(triples)
    catalog = ShapeCatalog()
    for s, p, o in triples:
        if p != RDF_TYPE or o.kind != "iri":
            continue
        kind = SHAPE_TYPES.get(o.value)
        if kind is None or s in catalog:
            continue
        catalog.add(_build_shape(g, s, kind))
    return catalog


def _build_shape(g: _Graph, sid: ShapeID, kind: str) -> Shape:
    lenient = g.boolean(sid, _r("lenient"))
    if kind == "record":
        return RecordShape(
            id=sid,
            lenient=lenient,
            type_properties=tuple(
                _parse_property(g, n) for n in g.objects(sid, _r("typeProperty"))
            ),
            properties=tuple(
                _parse_property(g, n) for n in g.objects(sid, _r("property"))
            ),
            computed_properties=tuple(
                ComputedProperty(
                    name=g.string(n, _r("name")) or "",
                    value_shape=g.one(n, _r("shape")),
                )
                for n in g.objects(sid, _r("computedProperty"))
            ),
        )
    if kind == "resource":
        vocab_node = g.one(sid, _r("vocabulary"))
        return ResourceShape(
            id=sid,
            lenient=lenient,
            only_named=g.boolean(sid, _r("onlyNamed")),
            value=g.one(sid, _r("termValue")),
            keep_as_term=g.boolean(sid, _r("keepAsTerm")),
            vocabulary=_parse_vocabulary(g, vocab_node) if vocab_node else None,
        )
    if kind == "literal":
        dt = g.one(sid, _r("termDatatype"))
        return LiteralShape(
            id=sid,
            lenient=lenient,
            datatype=dt.value if dt is not None else None,
            language=g.string(sid, _r("termLanguage")),
            value=g.one(sid, _r("termValue")),
            keep_as_term=g.boolean(sid, _r("keepAsTerm")),
        )
    if kind == "anyOf":
        # canonical variant order = the order the self-hosted
        # shapes-for-shapes loader produces, which is reference-exact:
        # frameAnyOf iterates the ramp:Shape meta-union's variants OUTER
        # and candidates inner (frame.ts:390-427), so members group by
        # meta-union position (Record, AnyOf, Set, Optional, Resource,
        # Literal, List, Map) and keep declaration order within a group
        rank = {"record": 0, "anyOf": 1, "set": 2, "optional": 3,
                "resource": 4, "literal": 5, "list": 6, "map": 7}

        def _kind_rank(v: Term) -> int:
            t = g.one(v, RDF_TYPE)
            k = SHAPE_TYPES.get(t.value) if t is not None else None
            return rank.get(k, len(rank))

        variants = sorted(g.objects(sid, _r("variant")), key=_kind_rank)
        return AnyOfShape(id=sid, lenient=lenient, variants=tuple(variants))
    if kind == "set":
        return SetShape(
            id=sid, lenient=lenient,
            item_shape=g.one(sid, _r("item")),
            min_count=g.integer(sid, _r("minCount")),
            max_count=g.integer(sid, _r("maxCount")),
        )
    if kind == "optional":
        return OptionalShape(id=sid, lenient=lenient, item_shape=g.one(sid, _r("item")))
    if kind == "list":
        head = g.one(sid, _r("headPath"))
        tail = g.one(sid, _r("tailPath"))
        return ListShape(
            id=sid, lenient=lenient,
            item_shape=g.one(sid, _r("item")),
            head_path=_parse_path(g, head) if head else None,
            tail_path=_parse_path(g, tail) if tail else None,
            nil=g.one(sid, _r("nil")),
        )
    if kind == "map":
        key_node = g.one(sid, _r("mapKey"))
        value_node = g.one(sid, _r("mapValue"))
        return MapShape(
            id=sid, lenient=lenient,
            key=_parse_shape_ref(g, key_node) if key_node else None,
            value=_parse_shape_ref(g, value_node) if value_node else None,
            item_shape=g.one(sid, _r("item")),
        )
    raise ValueError(f"unknown shape kind {kind}")


def first_shape_id(triples: List[Triple], catalog: ShapeCatalog) -> ShapeID:
    """Root-shape resolution rule of the reference test harness: the
    first subject in document order that is a shape (test/util.ts:62-75)."""
    for s, _, _ in triples:
        if s in catalog:
            return s
    raise ValueError("no shape subject found in graph")


def load_shapes_from_file(path: str) -> Tuple[ShapeCatalog, ShapeID]:
    triples = parse_turtle_file(path)
    catalog = load_shapes_from_graph(triples)
    return catalog, first_shape_id(triples, catalog)
