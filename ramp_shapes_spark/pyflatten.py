"""``flatten``: typed values → triples (reference ``src/flatten.ts``).

Flatten is a *per-value local* computation: one framed value produces a
self-contained set of triples, with no joins against other rows.  The
distributed form (:mod:`ramp_shapes_spark.flatten`) therefore maps this
emitter over Arrow record batches (``mapInPandas``) — embarrassingly
parallel, no shuffle — while this module holds the single-value core
mirroring the reference semantics:

* record property matching with the same required/type-gate rules as
  frame (flatten.ts:200-248, 211-224),
* subject resolution through self-properties with IRI-beats-blank memo
  (``SubjectMemo``, common.ts:116-138),
* property-path quad generation: sequences chain through fresh blank
  nodes, inverse swaps s/o, alternatives take the first branch, closure
  paths emit a single step (flatten.ts:302-357),
* anyOf takes the first matching variant (flatten.ts:363-384),
* lists emit head/tail chains ending in nil (flatten.ts:470-512),
* value↔term conversion inverts the frame-side mapping
  (value-mapping.ts:141-233).

Blank node generation is the one deliberate divergence: the reference
uses session-random ids (flatten.ts:580-587); a distributed engine
must be deterministic, so ids derive from a caller-supplied seed plus a
sequential counter.  Comparisons are blank-node-isomorphism-aware
anyway (the reference itself pins the generator in tests,
test/operations.ts:171-180).
"""

from __future__ import annotations

import hashlib
import json
import math
from typing import Callable, Dict, Iterable, List, Optional, Tuple

from .shapes import (
    AlternativePath, AnyOfShape, InversePath, ListShape, LiteralShape,
    MapShape, OneOrMorePath, OptionalShape, PredicatePath, PropertyPath,
    RecordShape, ResourceShape, SequencePath, SetShape, Shape, ShapeCatalog,
    ShapeID, ZeroOrMorePath, ZeroOrOnePath, is_self_path,
)
from .terms import (
    FRACTIONAL_TYPES, INTEGER_TYPES, RDF_FIRST, RDF_LANG_STRING, RDF_NIL,
    RDF_REST, Term, XSD_BOOLEAN, XSD_STRING, iri, lit,
)
from .ttl import Triple

UNDEFINED = object()


class FlattenError(Exception):
    def __init__(self, code: int, message: str, stack: List[dict]):
        super().__init__(f"RAMP{code}: {message}")
        self.code = code
        self.stack = stack


def _frame(shape: Shape, edge=None) -> dict:
    out: dict = {"shape": shape.id.value if shape.id.kind == "iri"
                 else {"type": shape.type}}
    if edge is not None:
        out["edge"] = edge
    return out


def _number_str(value) -> str:
    """JS ``Number.prototype.toString`` for JSON numbers."""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, int):
        return str(value)
    if isinstance(value, float) and value.is_integer() and abs(value) < 1e21:
        return str(int(value))
    return repr(value)


class _Memo:
    """(shape, value) memo keyed by object identity for containers and
    by equality for scalars (flatten.ts:38-62)."""

    def __init__(self) -> None:
        self._obj: Dict[Tuple[str, int], object] = {}
        self._scalar: Dict[Tuple[str, object], object] = {}

    def _key(self, sid: str, value):
        if isinstance(value, (dict, list)):
            return ("o", (sid, id(value)))
        return ("s", (sid, type(value).__name__, value))

    def get(self, sid: str, value):
        kind, key = self._key(sid, value)
        store = self._obj if kind == "o" else self._scalar
        return store.get(key, UNDEFINED)

    def set(self, sid: str, value, match) -> None:
        kind, key = self._key(sid, value)
        store = self._obj if kind == "o" else self._scalar
        if match is UNDEFINED:
            store.pop(key, None)
        else:
            store[key] = match


class PyFlatten:
    def __init__(self, catalog: ShapeCatalog,
                 generate_bnode: Optional[Callable[[str], Term]] = None):
        self.catalog = catalog
        self.stack: List[dict] = []
        self.memo = _Memo()
        if generate_bnode is None:
            counter = [0]
            def generate_bnode(prefix: str) -> Term:
                counter[0] += 1
                return Term("bnode", f"{prefix}_{counter[0]}")
        self.generate_bnode = generate_bnode

    def _err(self, code: int, message: str):
        raise FlattenError(code, message, list(self.stack))

    # -- value → term conversion (value-mapping.ts toRdf) --------------
    def to_rdf(self, value, shape: Shape):
        if isinstance(shape, ResourceShape):
            if shape.vocabulary is not None:
                if isinstance(value, str):
                    for key, term in shape.vocabulary:
                        if key == value:
                            return term
                    self._err(0, f"key {value!r} not in vocabulary")
                return value
            if shape.keep_as_term:
                return value
            if isinstance(value, str):
                if value.startswith("_:"):
                    return Term("bnode", value[2:])
                return iri(value)
            return value
        if isinstance(shape, LiteralShape) and not shape.keep_as_term:
            dt = shape.effective_datatype()
            if dt == XSD_STRING and isinstance(value, str):
                return lit(value)
            if dt == RDF_LANG_STRING and shape.language and isinstance(value, str):
                return lit(value, lang=shape.language)
            if dt == XSD_BOOLEAN and isinstance(value, bool):
                return lit("true" if value else "false", dt=dt)
            if dt in INTEGER_TYPES | FRACTIONAL_TYPES and \
                    isinstance(value, (int, float)) and not isinstance(value, bool):
                return lit(_number_str(value), dt=dt)
            return value
        return value

    # -- dispatch (flattenShape, flatten.ts:139-198) --------------------
    def flatten_shape(self, sid: ShapeID, required: bool, value,
                      frame: dict):
        shape = self.catalog.get(sid)
        existing = self.memo.get(sid.key(), value)
        if existing is None:
            return _Placeholder(self, shape, value)
        if existing is not UNDEFINED:
            return existing

        self.stack.append(frame)
        self.memo.set(sid.key(), value, None)
        converted = self.to_rdf(value, shape)

        if isinstance(shape, RecordShape):
            match = self._flatten_record(shape, required, converted)
        elif isinstance(shape, AnyOfShape):
            match = self._flatten_anyof(shape, required, converted)
        elif isinstance(shape, SetShape):
            match = self._flatten_set(shape, required, converted)
        elif isinstance(shape, OptionalShape):
            match = self._flatten_optional(shape, required, converted)
        elif isinstance(shape, (ResourceShape, LiteralShape)):
            match = self._flatten_node(shape, required, converted)
        elif isinstance(shape, ListShape):
            match = self._flatten_list(shape, required, converted)
        elif isinstance(shape, MapShape):
            match = self._flatten_map(shape, required, converted)
        else:
            raise TypeError(shape)

        if required and match is None:
            self._err(201, f"value does not match shape: {value!r}")
        self.stack.pop()
        self.memo.set(sid.key(), value, match if match is not None else UNDEFINED)
        return match

    # -- record (flatten.ts:200-248) ------------------------------------
    def _flatten_record(self, shape: RecordShape, required: bool, value):
        if not isinstance(value, dict):
            return None
        matches: List[Tuple[object, object]] = []
        if not self._match_properties(shape.type_properties, required, value,
                                      matches):
            return None
        check = required or bool(shape.type_properties)
        if not self._match_properties(shape.properties, check, value, matches):
            if check:
                self._err(401, "failed to match properties")
            return None

        subject_iri = None
        subject_blank = None
        for prop, match in matches:
            if is_self_path(prop.path):
                for node in match.nodes():
                    if node.kind == "iri":
                        if subject_iri is not None and subject_iri != node:
                            raise ValueError("inconsistent self reference")
                        subject_iri = node
                    elif node.kind == "bnode":
                        subject_blank = node
        subject = subject_iri or subject_blank or \
            self.generate_bnode(shape.type)

        return _RecordMatch(self, subject, matches)

    def _match_properties(self, properties, required, value, matches) -> bool:
        for prop in properties:
            frame = _frame(self.catalog.get(prop.value_shape), prop.name)
            if prop.transient:
                pvalue = self._synthesize(prop.value_shape)
            else:
                pvalue = value.get(prop.name, UNDEFINED)
                if pvalue is UNDEFINED:
                    pvalue = UNDEFINED
            match = self.flatten_shape(prop.value_shape, required,
                                       _undef_to_sentinel(pvalue), frame)
            if match is not None:
                matches.append((prop, match))
            elif required:
                self._err(402, f"failed to match property {prop.name!r}")
            else:
                return False
        return True

    def _synthesize(self, sid: ShapeID):
        shape = self.catalog.get(sid)
        if isinstance(shape, (ResourceShape, LiteralShape)) and \
                shape.value is not None:
            # constants re-enter flatten pre-converted (toRdf is identity
            # for terms)
            return self._term_to_native(shape.value, shape)
        if isinstance(shape, OptionalShape):
            return UNDEFINED
        if isinstance(shape, (SetShape, ListShape)):
            return []
        if isinstance(shape, MapShape):
            return {}
        self._err(301, "cannot synthesize value for shape")

    def _term_to_native(self, term: Term, shape):
        if isinstance(shape, ResourceShape) and not shape.keep_as_term \
                and shape.vocabulary is None:
            return term.value if term.kind == "iri" else "_:" + term.value
        if isinstance(shape, LiteralShape) and not shape.keep_as_term:
            dt = shape.effective_datatype()
            if dt == XSD_STRING or (dt == RDF_LANG_STRING and shape.language):
                return term.value
            if dt == XSD_BOOLEAN:
                return term.value != "false"
            if dt in INTEGER_TYPES:
                return int(term.value)
            if dt in FRACTIONAL_TYPES:
                return float(term.value)
        return term

    # -- node (flatten.ts:445-468) --------------------------------------
    def _flatten_node(self, shape, required: bool, value):
        if not isinstance(value, Term):
            if isinstance(value, dict) and "@term" in value:
                t = value["@term"]
                value = Term(t["kind"], t["value"], t.get("dt"), t.get("lang"))
            else:
                return None
        ok = _matches_term(shape, value)
        if not ok:
            if required:
                _matches_term(shape, value, self)
            return None
        return _NodeMatch(self, value)

    # -- anyOf (flatten.ts:363-384) -------------------------------------
    def _flatten_anyof(self, shape: AnyOfShape, required: bool, value):
        for vid in shape.variants:
            match = self.flatten_shape(vid, False, value,
                                       _frame(self.catalog.get(vid)))
            if match is not None:
                return match
        if required:
            for vid in shape.variants:
                self.flatten_shape(vid, True, value,
                                   _frame(self.catalog.get(vid)))
        return None

    # -- set (flatten.ts:386-418) ---------------------------------------
    def _flatten_set(self, shape: SetShape, required: bool, value):
        if not isinstance(value, list):
            return None
        frame = _frame(self.catalog.get(shape.item_shape))
        matches = []
        for item in value:
            match = self.flatten_shape(shape.item_shape, required, item, frame)
            if match is None:
                return None
            matches.append(match)
        return _GroupMatch(matches)

    # -- optional (flatten.ts:420-443) ----------------------------------
    def _flatten_optional(self, shape: OptionalShape, required: bool, value):
        empty = (value is None) if shape.empty_is_null else (value is UNDEFINED)
        if empty:
            return _GroupMatch([])
        frame = _frame(self.catalog.get(shape.item_shape))
        match = self.flatten_shape(shape.item_shape, required, value, frame)
        if match is None:
            return None
        return _GroupMatch([match])

    # -- list (flatten.ts:470-512) --------------------------------------
    def _flatten_list(self, shape: ListShape, required: bool, value):
        if not isinstance(value, list):
            return None
        head = shape.head_path or PredicatePath(RDF_FIRST)
        tail = shape.tail_path or PredicatePath(RDF_REST)
        nil = shape.nil or iri(RDF_NIL)
        frame = _frame(self.catalog.get(shape.item_shape))
        matches = []
        for item in value:
            match = self.flatten_shape(shape.item_shape, required, item, frame)
            if match is None:
                return None
            matches.append(match)
        return _ListMatch(self, matches, head, tail, nil)

    # -- map (flatten.ts:514-565) ---------------------------------------
    def _flatten_map(self, shape: MapShape, required: bool, value):
        if not isinstance(value, dict):
            return None
        frame = _frame(self.catalog.get(shape.item_shape))
        matches = []
        for key in value:
            item = value[key]
            if shape.value is not None:
                # value-reference maps store only the referenced PART of
                # each item; rebuild the full item via synthesizeShape
                # with the key/value reference matches (flatten.ts:533-543)
                refs: Dict[str, list] = {}
                refs.setdefault(shape.key.target.key(), []).append(
                    (shape.key.part, key))
                refs.setdefault(shape.value.target.key(), []).append(
                    (shape.value.part, item))
                item = self._synthesize_with_refs(shape.item_shape, refs)
            match = self.flatten_shape(shape.item_shape, required, item, frame)
            if match is None:
                return None
            matches.append(match)
        return _GroupMatch(matches)

    # -- reference synthesis (synthesize.ts:55-198) ----------------------
    def _synthesize_with_refs(self, sid: ShapeID, refs: Dict[str, list]):
        """Rebuild the NATIVE value of ``sid`` from reference matches
        (``refs``: target shape key → [(part, match)]); constants and
        empty-synthesizable shapes fill the remainder."""
        shape = self.catalog.get(sid)
        matches = refs.get(sid.key(), [])
        if isinstance(shape, ResourceShape):
            if shape.value is not None:
                return self._term_to_native(shape.value, shape)
            for part, m in matches:
                if part is None:
                    return m
                if part == "value":
                    if not isinstance(m, str):
                        self._err(0, "cannot synthesize resource from "
                                     "non-string value")
                    return self._term_to_native(iri(m), shape)
                self._err(0, f"cannot synthesize resource from part "
                             f"{part!r}")
            self._err(0, "no matches to synthesize resource")
        if isinstance(shape, LiteralShape):
            if shape.value is not None:
                return self._term_to_native(shape.value, shape)
            value = None
            datatype = shape.datatype
            language = shape.language
            for part, m in matches:
                if part is None:
                    return m
                if not isinstance(m, str):
                    self._err(0, "cannot synthesize literal part from "
                                 "non-string value")
                if part == "value":
                    value = m
                elif part == "datatype":
                    datatype = m
                elif part == "language":
                    language = m
            if value is None:
                self._err(0, "no 'value' part to synthesize literal")
            if datatype is None:
                self._err(0, "no 'datatype' part to synthesize literal")
            term = lit(value, lang=language) \
                if datatype == RDF_LANG_STRING else lit(value, dt=datatype)
            return self._term_to_native(term, shape)
        if isinstance(shape, RecordShape):
            out: Dict[str, object] = {}
            props = list(shape.type_properties) + list(shape.properties)
            for p in props:
                v = self._synthesize_with_refs(p.value_shape, refs)
                if v is not UNDEFINED:
                    out[p.name] = v
            for cp in shape.computed_properties or ():
                v = self._synthesize_with_refs(cp.value_shape, refs)
                if v is not UNDEFINED:
                    out[cp.name] = v
            return out
        if isinstance(shape, SetShape):
            hi = shape.max_count if shape.max_count is not None \
                else (shape.min_count or 0)
            count = min(shape.min_count or 0, hi)
            return [self._synthesize_with_refs(shape.item_shape, refs)
                    for _ in range(count)]
        if isinstance(shape, OptionalShape):
            return None if shape.empty_is_null else UNDEFINED
        if isinstance(shape, ListShape):
            return []
        if isinstance(shape, MapShape):
            return {}
        self._err(301, "cannot synthesize value for shape")

    # -- quad generation (flatten.ts:302-357) ---------------------------
    def generate_path(self, subject: Term, path: PropertyPath, obj: Term
                      ) -> Iterable[Triple]:
        if isinstance(path, PredicatePath):
            if subject.kind == "lit":
                self._err(403, "cannot use literal as subject")
            yield (subject, path.predicate, obj)
            return
        if isinstance(path, SequencePath):
            seq = path.sequence
            if not seq:
                return
            s = subject
            for i, element in enumerate(seq):
                o = obj if i == len(seq) - 1 else self.generate_bnode("path")
                yield from self.generate_path(s, element, o)
                s = o
            return
        if isinstance(path, InversePath):
            yield from self.generate_path(obj, path.inverse, subject)
            return
        if isinstance(path, AlternativePath):
            if path.alternatives:
                yield from self.generate_path(subject, path.alternatives[0], obj)
            return
        if isinstance(path, (ZeroOrMorePath, ZeroOrOnePath, OneOrMorePath)):
            yield from self.generate_path(subject, path.path, obj)
            return
        raise TypeError(path)


def _undef_to_sentinel(value):
    return value


class _NodeMatch:
    def __init__(self, ctx: PyFlatten, node: Term):
        self.ctx = ctx
        self.node = node

    def nodes(self):
        return [self.node]

    def generate(self, edge):
        if edge is None:
            return []
        subject, path = edge
        return self.ctx.generate_path(subject, path, self.node)


class _GroupMatch:
    def __init__(self, matches):
        self.matches = matches

    def nodes(self):
        for m in self.matches:
            yield from m.nodes()

    def generate(self, edge):
        for m in self.matches:
            yield from m.generate(edge)


class _RecordMatch:
    def __init__(self, ctx: PyFlatten, subject: Term, prop_matches):
        self.ctx = ctx
        self.subject = subject
        self.prop_matches = prop_matches

    def nodes(self):
        return [self.subject]

    def generate(self, edge):
        if edge is not None:
            subject, path = edge
            yield from self.ctx.generate_path(subject, path, self.subject)
        for prop, match in self.prop_matches:
            yield from match.generate((self.subject, prop.path))


class _ListMatch:
    def __init__(self, ctx: PyFlatten, matches, head, tail, nil):
        self.ctx = ctx
        self.matches = matches
        self.head = head
        self.tail = tail
        self.nil = nil
        self.list_node = nil if not matches else ctx.generate_bnode("list")

    def nodes(self):
        return [self.list_node]

    def generate(self, edge):
        if edge is not None:
            subject, path = edge
            yield from self.ctx.generate_path(subject, path, self.list_node)
        current = self.list_node
        for i, match in enumerate(self.matches):
            yield from match.generate((current, self.head))
            nxt = self.nil if i == len(self.matches) - 1 \
                else self.ctx.generate_bnode("list")
            yield from self.ctx.generate_path(current, self.tail, nxt)
            current = nxt


class _Placeholder:
    """Cyclic re-entry marker (flatten.ts:113-137)."""

    def __init__(self, ctx: PyFlatten, shape: Shape, value):
        self.ctx = ctx
        self.shape = shape
        self.value = value

    def nodes(self):
        return []

    def generate(self, edge):
        match = self.ctx.memo.get(self.shape.id.key(), self.value)
        if match is UNDEFINED or match is None:
            self.ctx._err(216, "cannot generate quads for cyclic shape")
        for node in match.nodes():
            if edge is not None:
                subject, path = edge
                yield from self.ctx.generate_path(subject, path, node)


def _matches_term(shape, node: Term, errctx: Optional[PyFlatten] = None) -> bool:
    def fail(code, msg):
        if errctx is not None:
            errctx._err(code, msg)
        return False

    if isinstance(shape, ResourceShape):
        if node.kind not in ("iri", "bnode"):
            return fail(221, "expected resource term")
        if shape.only_named and node.kind != "iri":
            return fail(221, "expected named term")
    else:
        if node.kind != "lit":
            return fail(221, "expected literal term")
        if shape.datatype and shape.datatype != node.dt:
            return fail(223, "datatype mismatch")
        if shape.language and shape.language != node.lang:
            return fail(224, "language mismatch")
    if shape.value is not None and shape.value != node:
        return fail(222, "term value mismatch")
    return True


def json_to_value(raw):
    """Decode a framed JSON value into the flatten input form:
    absent optional keys stay absent (record access yields UNDEFINED)."""
    return raw


def flatten_py(catalog: ShapeCatalog, root: ShapeID, value,
               generate_bnode: Optional[Callable[[str], Term]] = None
               ) -> List[Triple]:
    """flatten({value, shape}) → triples (flatten.ts:31-91).

    Output *order* differs from the reference (``postponeNamed`` is a
    Turtle-pretty-printing concern, flatten.ts:27,68-76); triple *sets*
    are equal.
    """
    ctx = PyFlatten(catalog, generate_bnode)
    root_shape = catalog.get(root)
    match = ctx.flatten_shape(root, True, value, _frame(root_shape))
    if match is None:
        raise FlattenError(201, "value does not match root shape", [])
    return list(match.generate(None))


def deterministic_bnode_generator(seed: str) -> Callable[[str], Term]:
    """Content-derived blank node ids: sha1(seed) prefix + counter —
    deterministic across executors and runs (replaces the reference's
    random session key, flatten.ts:580-587)."""
    digest = hashlib.sha1(seed.encode("utf-8")).hexdigest()[:12]
    counter = [0]

    def gen(prefix: str) -> Term:
        counter[0] += 1
        return Term("bnode", f"{prefix}_{digest}_{counter[0]}")

    return gen
