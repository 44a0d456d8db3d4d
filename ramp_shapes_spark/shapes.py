"""Shape algebra: the schema system of the engine.

Mirrors the 8-kind shape ADT of the reference (ramp-shapes
``src/shapes.ts:4-161``) as frozen dataclasses plus a programmatic
builder DSL (the analog of ``src/builder.ts:79-428``).

Shapes may reference each other cyclically (e.g. the selector-cyclic
fixture), so child shapes are referenced *by id* through a
:class:`ShapeCatalog` rather than by direct object links.  The catalog
is driver-side-only, KB-sized configuration; it is captured by value in
the closures/broadcasts the engine ships to executors.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field, replace
from typing import Dict, Iterable, List, Optional, Tuple, Union

from .terms import RDF_LANG_STRING, Term, XSD_STRING, bnode, iri

ShapeID = Term  # IRI or blank node term


# ---------------------------------------------------------------------------
# Property paths (shapes.ts:64-100) — SPARQL 1.1 path subset
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PredicatePath:
    predicate: str  # predicate IRI


@dataclass(frozen=True)
class SequencePath:
    sequence: Tuple["PropertyPath", ...]  # empty tuple == "self" path ()


@dataclass(frozen=True)
class InversePath:
    inverse: "PropertyPath"


@dataclass(frozen=True)
class AlternativePath:
    alternatives: Tuple["PropertyPath", ...]


@dataclass(frozen=True)
class ZeroOrMorePath:
    path: "PropertyPath"


@dataclass(frozen=True)
class ZeroOrOnePath:
    path: "PropertyPath"


@dataclass(frozen=True)
class OneOrMorePath:
    path: "PropertyPath"


PropertyPath = Union[
    PredicatePath,
    SequencePath,
    InversePath,
    AlternativePath,
    ZeroOrMorePath,
    ZeroOrOnePath,
    OneOrMorePath,
]

SELF_PATH = SequencePath(())


def is_self_path(path: PropertyPath) -> bool:
    return isinstance(path, SequencePath) and len(path.sequence) == 0


def nested_path(path: PropertyPath) -> PropertyPath:
    """Inner path of a closure path (shapes.ts getNestedPropertyPath)."""
    return path.path  # type: ignore[union-attr]


# ---------------------------------------------------------------------------
# Shapes (shapes.ts:22-161)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ShapeReference:
    """Reference to (a part of) another shape's match (shapes.ts:144-147)."""

    target: ShapeID
    part: Optional[str] = None  # None | 'value' | 'datatype' | 'language'


@dataclass(frozen=True)
class Property:
    """A record property (shapes.ts:52-57)."""

    name: str
    path: PropertyPath
    value_shape: ShapeID
    transient: bool = False


@dataclass(frozen=True)
class ComputedProperty:
    """A synthesized property with no graph path (shapes.ts:59-62)."""

    name: str
    value_shape: ShapeID


@dataclass(frozen=True)
class ResourceShape:
    id: ShapeID
    lenient: bool = False
    only_named: bool = False
    value: Optional[Term] = None
    keep_as_term: bool = False
    vocabulary: Optional[Tuple[Tuple[str, Term], ...]] = None  # key -> term

    type = "resource"


@dataclass(frozen=True)
class LiteralShape:
    id: ShapeID
    lenient: bool = False
    datatype: Optional[str] = None
    language: Optional[str] = None
    value: Optional[Term] = None
    keep_as_term: bool = False

    type = "literal"

    def effective_datatype(self) -> Optional[str]:
        # value-mapping.ts:effectiveDatatype
        if self.datatype:
            return self.datatype
        if self.language:
            return RDF_LANG_STRING
        if self.value is not None:
            return self.value.dt
        return None


@dataclass(frozen=True)
class RecordShape:
    id: ShapeID
    lenient: bool = False
    type_properties: Tuple[Property, ...] = ()
    properties: Tuple[Property, ...] = ()
    computed_properties: Tuple[ComputedProperty, ...] = ()

    type = "record"

    def all_properties(self) -> Tuple[Property, ...]:
        return self.type_properties + self.properties


@dataclass(frozen=True)
class AnyOfShape:
    id: ShapeID
    lenient: bool = False
    variants: Tuple[ShapeID, ...] = ()

    type = "anyOf"


@dataclass(frozen=True)
class SetShape:
    id: ShapeID
    lenient: bool = False
    item_shape: ShapeID = None  # type: ignore[assignment]
    min_count: Optional[int] = None
    max_count: Optional[int] = None

    type = "set"


@dataclass(frozen=True)
class OptionalShape:
    id: ShapeID
    lenient: bool = False
    item_shape: ShapeID = None  # type: ignore[assignment]
    # emptyValue: None encodes JS `undefined` (key omitted), the string
    # 'null' encodes JS `null`.  TTL-defined shapes always use undefined.
    empty_is_null: bool = False

    type = "optional"


@dataclass(frozen=True)
class ListShape:
    id: ShapeID
    lenient: bool = False
    item_shape: ShapeID = None  # type: ignore[assignment]
    head_path: Optional[PropertyPath] = None  # default rdf:first
    tail_path: Optional[PropertyPath] = None  # default rdf:rest
    nil: Optional[Term] = None  # default rdf:nil

    type = "list"


@dataclass(frozen=True)
class MapShape:
    id: ShapeID
    lenient: bool = False
    key: ShapeReference = None  # type: ignore[assignment]
    value: Optional[ShapeReference] = None
    item_shape: ShapeID = None  # type: ignore[assignment]

    type = "map"


Shape = Union[
    ResourceShape,
    LiteralShape,
    RecordShape,
    AnyOfShape,
    SetShape,
    OptionalShape,
    ListShape,
    MapShape,
]


class ShapeCatalog:
    """Id-indexed shape registry; the unit shipped to the engine."""

    def __init__(self, shapes: Iterable[Shape] = ()) -> None:
        self._shapes: Dict[str, Shape] = {}
        for shape in shapes:
            self.add(shape)

    def add(self, shape: Shape) -> None:
        self._shapes[shape.id.key()] = shape

    def get(self, shape_id: ShapeID) -> Shape:
        try:
            return self._shapes[shape_id.key()]
        except KeyError:
            raise KeyError(f"unknown shape {shape_id}") from None

    def __contains__(self, shape_id: ShapeID) -> bool:
        return shape_id.key() in self._shapes

    def __iter__(self):
        return iter(self._shapes.values())

    def __len__(self) -> int:
        return len(self._shapes)

    def children(self, shape: Shape) -> List[ShapeID]:
        """Directly referenced child shape ids (for dependency analysis)."""
        if isinstance(shape, RecordShape):
            out = [p.value_shape for p in shape.all_properties()]
            out.extend(c.value_shape for c in shape.computed_properties)
            return out
        if isinstance(shape, AnyOfShape):
            return list(shape.variants)
        if isinstance(shape, (SetShape, OptionalShape, ListShape)):
            return [shape.item_shape]
        if isinstance(shape, MapShape):
            return [shape.item_shape]
        return []

    def recursive_shape_ids(self) -> set:
        """Ids of shapes that participate in a shape-graph cycle.

        The frame compiler evaluates these via a semi-naive fixpoint
        instead of direct recursive compilation.
        """
        color: Dict[str, int] = {}
        recursive: set = set()

        def visit(sid: ShapeID, path: List[str]) -> None:
            k = sid.key()
            if color.get(k) == 1:
                # back edge: everything on the path from k is cyclic
                idx = path.index(k)
                recursive.update(path[idx:])
                return
            if color.get(k) == 2:
                return
            color[k] = 1
            path.append(k)
            if k in self._shapes:
                for child in self.children(self._shapes[k]):
                    visit(child, path)
            path.pop()
            color[k] = 2

        for shape in list(self._shapes.values()):
            visit(shape.id, [])
        return recursive


# ---------------------------------------------------------------------------
# Builder DSL (builder.ts:79-428)
# ---------------------------------------------------------------------------


class ShapeBuilder:
    """Programmatic shape construction with auto-generated blank ids."""

    def __init__(self) -> None:
        self.catalog = ShapeCatalog()
        self._ids = itertools.count(1)

    def _make_id(self, explicit: Optional[Union[str, Term]]) -> ShapeID:
        if explicit is None:
            return bnode(f"sb{next(self._ids)}")
        if isinstance(explicit, Term):
            return explicit
        return iri(explicit)

    def _add(self, shape: Shape) -> ShapeID:
        self.catalog.add(shape)
        return shape.id

    def resource(self, id=None, *, only_named=False, value=None,
                 keep_as_term=False, vocabulary=None, lenient=False) -> ShapeID:
        vocab = tuple(vocabulary.items()) if isinstance(vocabulary, dict) else vocabulary
        return self._add(ResourceShape(
            self._make_id(id), lenient, only_named, value, keep_as_term, vocab))

    def constant(self, value: Term, id=None, *, keep_as_term=False) -> ShapeID:
        """Shape matching exactly one term (builder.ts:254-284)."""
        if value.kind == "lit":
            return self._add(LiteralShape(
                self._make_id(id), value=value, keep_as_term=keep_as_term))
        return self._add(ResourceShape(
            self._make_id(id), value=value, keep_as_term=keep_as_term))

    def literal(self, id=None, *, datatype=None, language=None, value=None,
                keep_as_term=False, lenient=False) -> ShapeID:
        return self._add(LiteralShape(
            self._make_id(id), lenient, datatype, language, value, keep_as_term))

    def record(self, id=None, *, type_properties=(), properties=(),
               computed_properties=(), lenient=False) -> ShapeID:
        return self._add(RecordShape(
            self._make_id(id), lenient, tuple(type_properties),
            tuple(properties), tuple(computed_properties)))

    def any_of(self, variants, id=None, *, lenient=False) -> ShapeID:
        return self._add(AnyOfShape(self._make_id(id), lenient, tuple(variants)))

    def set_of(self, item, id=None, *, min_count=None, max_count=None,
               lenient=False) -> ShapeID:
        return self._add(SetShape(self._make_id(id), lenient, item, min_count, max_count))

    def optional(self, item, id=None, *, empty_is_null=False, lenient=False) -> ShapeID:
        return self._add(OptionalShape(self._make_id(id), lenient, item, empty_is_null))

    def list_of(self, item, id=None, *, head_path=None, tail_path=None,
                nil=None, lenient=False) -> ShapeID:
        return self._add(ListShape(self._make_id(id), lenient, item,
                                   head_path, tail_path, nil))

    def map_of(self, key: ShapeReference, item, id=None, *,
               value: Optional[ShapeReference] = None, lenient=False) -> ShapeID:
        return self._add(MapShape(self._make_id(id), lenient, key, value, item))


def prop(name: str, path: Union[str, PropertyPath], shape: ShapeID,
         transient: bool = False) -> Property:
    """``property(...)`` helper (builder.ts:382-427)."""
    if isinstance(path, str):
        path = PredicatePath(path)
    return Property(name, path, shape, transient)


def inverse_prop(name: str, predicate: str, shape: ShapeID) -> Property:
    return Property(name, InversePath(PredicatePath(predicate)), shape)


def self_prop(name: str, shape: ShapeID) -> Property:
    """Property bound to the subject itself (path ``()``)."""
    return Property(name, SELF_PATH, shape)


def computed(name: str, shape: ShapeID) -> ComputedProperty:
    return ComputedProperty(name, shape)
