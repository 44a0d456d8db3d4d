"""``generateQuery``: shape → SPARQL CONSTRUCT query.

Driver-side re-implementation of the reference generator
(generate-query.ts:25-114 main walk; recursion breaking 323-381;
subject resolution 558-614).  Given a shape, produces a CONSTRUCT
query whose WHERE clause matches every subgraph the shape could frame
and whose template re-emits those triples — the reference's mechanism
for fetching exactly the shape-relevant subgraph from a SPARQL
endpoint before framing (used by both shipped examples,
examples/wikidata-query and examples/iiif).

The query is produced as a small SPARQL AST (terms, triples, pattern
groups) plus a deterministic serializer; variable naming and traversal
order mirror the reference exactly (``{prefix}_{index}`` in
resolveSubject/makeVariable call order) so generated queries match the
reference goldens token-for-token after normalization.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple, Union

from .shapes import (
    AlternativePath, AnyOfShape, InversePath, ListShape, LiteralShape,
    MapShape, OneOrMorePath, OptionalShape, PredicatePath, Property,
    PropertyPath, RecordShape, ResourceShape, SequencePath, SetShape, Shape,
    ShapeCatalog, ShapeID, ZeroOrMorePath, ZeroOrOnePath, is_self_path,
)
from .terms import RDF_FIRST, RDF_NIL, RDF_REST, Term

# --------------------------------------------------------------------------
# SPARQL AST
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class Iri:
    value: str


@dataclass(frozen=True)
class Blank:
    name: str


@dataclass(frozen=True)
class Lit:
    value: str
    dt: Optional[str] = None
    lang: Optional[str] = None


SparqlTerm = Union[Var, Iri, Blank, Lit]


@dataclass(frozen=True)
class Path:
    """Compound property path; op in {'/', '|', '^', '*', '?', '+'}."""
    op: str
    items: Tuple[Union["Path", Iri], ...]


Predicate = Union[Path, Iri]


@dataclass(frozen=True)
class Triple:
    s: SparqlTerm
    p: Predicate
    o: SparqlTerm


@dataclass
class Bgp:
    triples: List[Triple]


@dataclass
class UnionPat:
    groups: List[List["Pattern"]]


@dataclass
class OptionalPat:
    patterns: List["Pattern"]


Pattern = Union[Bgp, UnionPat, OptionalPat]


@dataclass
class ConstructQuery:
    prefixes: Dict[str, str]
    template: List[Triple]
    where: List[Pattern]

    def to_sparql(self) -> str:
        return serialize_query(self)


# --------------------------------------------------------------------------
# shape path → SPARQL path (propertyPathToSparql, generate-query.ts:176-205)
# --------------------------------------------------------------------------

def path_to_sparql(path: PropertyPath) -> Predicate:
    if isinstance(path, PredicatePath):
        return Iri(path.predicate)
    if isinstance(path, SequencePath):
        return Path("/", tuple(path_to_sparql(p) for p in path.sequence))
    if isinstance(path, InversePath):
        return Path("^", (path_to_sparql(path.inverse),))
    if isinstance(path, AlternativePath):
        return Path("|", tuple(path_to_sparql(p) for p in path.alternatives))
    if isinstance(path, ZeroOrMorePath):
        return Path("*", (path_to_sparql(path.path),))
    if isinstance(path, ZeroOrOnePath):
        return Path("?", (path_to_sparql(path.path),))
    if isinstance(path, OneOrMorePath):
        return Path("+", (path_to_sparql(path.path),))
    raise TypeError(f"unknown path {path!r}")


def _concat_paths(op: str, parts: List[Predicate]) -> Predicate:
    """concatSparqlPaths (generate-query.ts:207-230): flattens nested
    same-operator paths."""
    if not parts:
        raise ValueError("cannot concat zero path parts")
    if len(parts) == 1:
        return parts[0]
    items: List[Predicate] = []
    for part in parts:
        if isinstance(part, Path) and part.op == op:
            items.extend(part.items)
        else:
            items.append(part)
    return Path(op, tuple(items))


def _is_empty_path(pred: Predicate) -> bool:
    return isinstance(pred, Path) and pred.op == "/" and not pred.items


def _term_to_sparql(t: Term) -> SparqlTerm:
    if t.kind == "iri":
        return Iri(t.value)
    if t.kind == "bnode":
        return Blank(t.value)
    if t.kind == "var":
        # reference Variable terms map onto SPARQL variables directly
        return Var(t.value)
    if t.kind in ("quad", "dgraph"):
        raise ValueError(
            f"cannot emit {t.kind!r} term as a SPARQL constant")
    return Lit(t.value, t.dt, t.lang)


# --------------------------------------------------------------------------
# generator (generateQuery, generate-query.ts:25-114)
# --------------------------------------------------------------------------

@dataclass
class _Edge:
    object: SparqlTerm
    subject: Optional[SparqlTerm] = None
    path: Optional[Predicate] = None


class _Context:
    def __init__(self, catalog: ShapeCatalog, template: List[Triple]) -> None:
        self.catalog = catalog
        self.template = template
        self.visiting: set = set()
        self.stack: List[Shape] = []
        self._subjects: Dict[str, Optional[SparqlTerm]] = {}
        self._var_index = 1
        self._blank_index = 1

    def make_variable(self, prefix: str) -> Var:
        v = Var(f"{prefix}_{self._var_index}")
        self._var_index += 1
        return v

    def resolve_subject(self, sid: ShapeID) -> SparqlTerm:
        shape = self.catalog.get(sid)
        key = sid.key()
        if key not in self._subjects:
            self._subjects[key] = _find_subject(self.catalog, shape)
        subject = self._subjects[key]
        return self.make_variable(shape.type) if subject is None else subject

    def add_edge(self, edge: _Edge) -> None:
        """Template emission (tryGeneratePropertyPath,
        generate-query.ts:40-66): predicates stay; inverse swaps;
        sequences chain through template blank nodes; closure and
        alternative paths emit nothing."""
        if edge.subject is None or edge.path is None or \
                _is_empty_path(edge.path):
            return

        def gen(s: SparqlTerm, pred: Predicate, o: SparqlTerm):
            if isinstance(pred, Iri):
                self.template.append(Triple(s, pred, o))
                return
            if pred.op == "^" and len(pred.items) == 1:
                gen(o, pred.items[0], s)
            elif pred.op == "/":
                cur = s
                for i in range(len(pred.items) - 1):
                    nxt = Blank(f"path_{self._blank_index}")
                    self._blank_index += 1
                    gen(cur, pred.items[i], nxt)
                    cur = nxt
                if pred.items:
                    gen(cur, pred.items[-1], o)

        gen(edge.subject, edge.path, edge.object)


def generate_query(catalog: ShapeCatalog, root: ShapeID,
                   prefixes: Optional[Dict[str, str]] = None
                   ) -> ConstructQuery:
    template: List[Triple] = []
    where: List[Pattern] = []
    ctx = _Context(catalog, template)
    obj = ctx.resolve_subject(root)
    _generate_for_shape(catalog.get(root), _Edge(object=obj), where, ctx)
    return ConstructQuery(prefixes=dict(prefixes or {}), template=template,
                          where=where)


def _generate_edge(edge: _Edge, out: List[Pattern]) -> None:
    if edge.subject is not None and edge.path is not None and \
            not _is_empty_path(edge.path):
        out.append(Bgp([Triple(edge.subject, edge.path, edge.object)]))


def _generate_for_shape(shape: Shape, edge: _Edge, out: List[Pattern],
                        ctx: _Context) -> None:
    if _should_break_recursion(shape, ctx):
        un = _Edge(subject=edge.subject, path=edge.path,
                   object=ctx.make_variable(shape.type + "_un"))
        _generate_edge(un, out)
        ctx.add_edge(un)
        return

    ctx.visiting.add(shape.id.key())
    ctx.stack.append(shape)
    buf: List[Pattern] = []

    if isinstance(shape, RecordShape):
        _generate_for_record(shape, edge, buf, ctx)
    elif isinstance(shape, AnyOfShape):
        _generate_for_anyof(shape, edge, buf, ctx)
    elif isinstance(shape, (SetShape, OptionalShape, MapShape)):
        _generate_for_setlike(shape, edge, buf, ctx)
    elif isinstance(shape, (ResourceShape, LiteralShape)):
        _generate_for_node(shape, edge, buf, ctx)
    elif isinstance(shape, ListShape):
        _generate_for_list(shape, edge, buf, ctx)
    else:
        raise TypeError(f"unknown shape {shape!r}")

    out.extend(buf)
    ctx.visiting.discard(shape.id.key())
    ctx.stack.pop()


def _generate_for_record(shape: RecordShape, edge: _Edge,
                         out: List[Pattern], ctx: _Context) -> None:
    _generate_edge(edge, out)
    ctx.add_edge(edge)

    if _is_breaking_point(shape):
        edge = _generate_recursive_edge(shape, edge, out, ctx)

    _generate_for_properties(edge.object, shape.type_properties, out, ctx)
    _generate_for_properties(edge.object, shape.properties, out, ctx)


def _generate_for_properties(subject: SparqlTerm,
                             properties: Tuple[Property, ...],
                             out: List[Pattern], ctx: _Context) -> None:
    for prop in properties:
        edge = _Edge(
            subject=subject,
            path=path_to_sparql(prop.path),
            object=subject if is_self_path(prop.path)
            else ctx.resolve_subject(prop.value_shape),
        )
        _generate_for_shape(ctx.catalog.get(prop.value_shape), edge, out, ctx)


def _generate_recursive_edge(shape: Shape, edge: _Edge, out: List[Pattern],
                             ctx: _Context) -> _Edge:
    """generateRecursiveEdge (generate-query.ts:303-331): for a
    breaking-point shape, bind a fresh subject reachable through the
    closure of every path that loops back to this shape."""
    alternatives = list(_find_recursive_paths(shape, ctx))
    if not alternatives:
        return edge
    obj = ctx.make_variable(shape.type + "_r")
    out.append(Bgp([Triple(
        edge.object,
        Path("*", (_concat_paths("|", alternatives),)),
        obj,
    )]))
    return _Edge(object=obj)


def _should_break_recursion(shape: Shape, ctx: _Context) -> bool:
    """shouldBreakRecursion (generate-query.ts:333-353)."""
    if shape.id.key() not in ctx.visiting:
        return False
    if _is_breaking_point(shape):
        return True
    for frame in reversed(ctx.stack):
        if _is_breaking_point(frame):
            return False
        if frame.id.key() == shape.id.key():
            return True
    return False


def _is_breaking_point(shape: Shape) -> bool:
    if isinstance(shape, RecordShape):
        return True
    if isinstance(shape, ListShape):
        head = shape.head_path or PredicatePath(RDF_FIRST)
        return not is_self_path(head)
    return False


def _generate_for_anyof(shape: AnyOfShape, edge: _Edge, out: List[Pattern],
                        ctx: _Context) -> None:
    blocks: List[List[Pattern]] = []
    for vid in shape.variants:
        patterns: List[Pattern] = []
        _generate_for_shape(ctx.catalog.get(vid), edge, patterns, ctx)
        if patterns:
            blocks.append(patterns)
    if blocks:
        out.append(UnionPat(blocks))


def _generate_for_setlike(shape, edge: _Edge, out: List[Pattern],
                          ctx: _Context) -> None:
    patterns: List[Pattern] = []
    _generate_for_shape(ctx.catalog.get(shape.item_shape), edge, patterns, ctx)
    if patterns:
        if isinstance(shape, SetShape) and (shape.min_count or 0) > 0:
            out.extend(patterns)
        else:
            out.append(OptionalPat(patterns))


def _generate_for_node(shape, edge: _Edge, out: List[Pattern],
                       ctx: _Context) -> None:
    if shape.value is not None:
        edge = _Edge(subject=edge.subject, path=edge.path,
                     object=_term_to_sparql(shape.value))
    _generate_edge(edge, out)
    ctx.add_edge(edge)


def _generate_for_list(shape: ListShape, edge: _Edge, out: List[Pattern],
                       ctx: _Context) -> None:
    head = shape.head_path or PredicatePath(RDF_FIRST)
    tail = shape.tail_path or PredicatePath(RDF_REST)

    _generate_edge(edge, out)
    ctx.add_edge(edge)

    if _is_breaking_point(shape):
        edge = _generate_recursive_edge(shape, edge, out, ctx)

    next_path = path_to_sparql(tail)
    node_path = Path("*", (next_path,))

    list_node = edge.object if is_self_path(head) \
        else ctx.make_variable("listNode")
    ln_edge = _Edge(subject=edge.object, path=node_path, object=list_node)
    _generate_edge(ln_edge, out)
    ctx.add_edge(ln_edge)

    next_node = ctx.make_variable("nextNode")
    nx_edge = _Edge(subject=list_node, path=next_path, object=next_node)
    _generate_edge(nx_edge, out)
    ctx.add_edge(nx_edge)

    if is_self_path(head):
        _generate_for_shape(ctx.catalog.get(shape.item_shape),
                            _Edge(object=list_node), out, ctx)
    else:
        head_path = path_to_sparql(head)
        obj = ctx.resolve_subject(shape.id)
        h_edge = _Edge(subject=list_node, path=head_path, object=obj)
        _generate_for_shape(ctx.catalog.get(shape.item_shape), h_edge,
                            out, ctx)


def _find_recursive_paths(origin: Shape, ctx: _Context):
    """findRecursivePaths (generate-query.ts:498-556)."""
    visiting: set = set()
    path: List[Predicate] = []
    catalog = ctx.catalog

    def visit(shape: Shape):
        if shape.id.key() in visiting:
            if shape.id.key() == origin.id.key():
                yield _concat_paths("/", list(path))
            return
        if shape.id.key() != origin.id.key() \
                and shape.id.key() in ctx.visiting \
                and _is_breaking_point(shape):
            return
        visiting.add(shape.id.key())
        if isinstance(shape, RecordShape):
            yield from visit_properties(shape.type_properties)
            yield from visit_properties(shape.properties)
        elif isinstance(shape, AnyOfShape):
            for vid in shape.variants:
                yield from visit(catalog.get(vid))
        elif isinstance(shape, (SetShape, OptionalShape, MapShape)):
            yield from visit(catalog.get(shape.item_shape))
        elif isinstance(shape, ListShape):
            head = shape.head_path or PredicatePath(RDF_FIRST)
            tail = shape.tail_path or PredicatePath(RDF_REST)
            path.append(Path("*", (path_to_sparql(tail),)))
            if not is_self_path(head):
                path.append(path_to_sparql(head))
            yield from visit(catalog.get(shape.item_shape))
            if not is_self_path(head):
                path.pop()
            path.pop()
        visiting.discard(shape.id.key())

    def visit_properties(properties):
        for prop in properties:
            path.append(path_to_sparql(prop.path))
            yield from visit(catalog.get(prop.value_shape))
            path.pop()

    return visit(origin)


def _find_subject(catalog: ShapeCatalog, shape: Shape) -> Optional[SparqlTerm]:
    """findSubject (generate-query.ts:558-614): the unique named-node
    constant reachable through self-path properties, if any."""
    visiting: set = set()

    def visit(shape: Shape):
        if shape.id.key() in visiting:
            return
        visiting.add(shape.id.key())
        if isinstance(shape, RecordShape):
            for prop in shape.type_properties + shape.properties:
                if is_self_path(prop.path):
                    yield from visit(catalog.get(prop.value_shape))
        elif isinstance(shape, AnyOfShape):
            for vid in shape.variants:
                yield from visit(catalog.get(vid))
        elif isinstance(shape, (SetShape, OptionalShape, MapShape)):
            yield from visit(catalog.get(shape.item_shape))
        elif isinstance(shape, ResourceShape):
            if shape.value is not None and shape.value.kind == "iri":
                yield Iri(shape.value.value)
        visiting.discard(shape.id.key())

    term: Optional[SparqlTerm] = None
    for subject in visit(shape):
        if term is not None:
            return None
        term = subject
    return term


# --------------------------------------------------------------------------
# serializer (deterministic; parenthesizes every compound path)
# --------------------------------------------------------------------------

def _ser_term(t: SparqlTerm, prefixes: Dict[str, str]) -> str:
    if isinstance(t, Var):
        return "?" + t.name
    if isinstance(t, Blank):
        return "_:" + t.name
    if isinstance(t, Iri):
        return _ser_iri(t.value, prefixes)
    # literal
    out = '"' + t.value.replace("\\", "\\\\").replace('"', '\\"') + '"'
    if t.lang:
        return out + "@" + t.lang
    if t.dt and t.dt != "http://www.w3.org/2001/XMLSchema#string":
        return out + "^^" + _ser_iri(t.dt, prefixes)
    return out


def _ser_iri(value: str, prefixes: Dict[str, str]) -> str:
    best = None
    for pfx, ns in prefixes.items():
        if value.startswith(ns) and (best is None or len(ns) > len(best[1])):
            local = value[len(ns):]
            if local and all(c.isalnum() or c in "_-" for c in local):
                best = (pfx, ns, local)
    if best is not None:
        return f"{best[0]}:{best[2]}"
    return f"<{value}>"


def _ser_path(p: Predicate, prefixes: Dict[str, str]) -> str:
    if isinstance(p, Iri):
        return _ser_iri(p.value, prefixes)
    if p.op in ("*", "?", "+"):
        return f"({_ser_path(p.items[0], prefixes)}{p.op})"
    if p.op == "^":
        return f"(^{_ser_path(p.items[0], prefixes)})"
    sep = p.op
    return "(" + sep.join(_ser_path(i, prefixes) for i in p.items) + ")"


def _ser_patterns(patterns: List[Pattern], prefixes: Dict[str, str],
                  indent: str) -> List[str]:
    lines: List[str] = []
    for pat in patterns:
        if isinstance(pat, Bgp):
            for t in pat.triples:
                lines.append(
                    f"{indent}{_ser_term(t.s, prefixes)} "
                    f"{_ser_path(t.p, prefixes)} "
                    f"{_ser_term(t.o, prefixes)} ."
                )
        elif isinstance(pat, OptionalPat):
            lines.append(indent + "OPTIONAL {")
            lines.extend(_ser_patterns(pat.patterns, prefixes, indent + "  "))
            lines.append(indent + "}")
        elif isinstance(pat, UnionPat):
            for i, group in enumerate(pat.groups):
                if i > 0:
                    lines.append(indent + "UNION")
                lines.append(indent + "{")
                lines.extend(_ser_patterns(group, prefixes, indent + "  "))
                lines.append(indent + "}")
    return lines


def serialize_query(q: ConstructQuery) -> str:
    lines = [f"PREFIX {p}: <{ns}>" for p, ns in q.prefixes.items()]
    lines.append("CONSTRUCT {")
    for t in q.template:
        lines.append(
            f"  {_ser_term(t.s, q.prefixes)} {_ser_path(t.p, q.prefixes)} "
            f"{_ser_term(t.o, q.prefixes)} ."
        )
    lines.append("}")
    lines.append("WHERE {")
    lines.extend(_ser_patterns(q.where, q.prefixes, "  "))
    lines.append("}")
    return "\n".join(lines)
