"""Driver-side reference-semantics ``frame`` over small in-memory graphs.

Faithful Python mirror of the reference interpreter
(ramp-shapes ``src/frame.ts``), used for three KB-scale jobs that do
not warrant distribution:

1. resolving *cyclic data* residuals left over by the distributed
   fixpoint (``frame.py``) — true graph cycles are evaluated per
   strongly-connected residual exactly like the reference's
   visiting/holes machinery (frame.ts:111-127, 813-829),
2. an independent oracle for the engine's fixture tests,
3. parsing shape-definition graphs if one ever self-hosts them.

Values are plain Python objects; cyclic matches produce genuinely
cyclic object graphs (patched holes), which :func:`encode_refs` turns
into the fixtures' ``{"@ref": n}`` / ``{"@use": n}`` encoding
(test/util.ts:22-57).
"""

from __future__ import annotations

import json
from typing import Dict, Iterable, List, Optional, Tuple

from .shapes import (
    AlternativePath, AnyOfShape, InversePath, ListShape, LiteralShape,
    MapShape, OneOrMorePath, OptionalShape, PredicatePath, PropertyPath,
    RecordShape, ResourceShape, SequencePath, SetShape, Shape, ShapeCatalog,
    ShapeID, ZeroOrMorePath, ZeroOrOnePath,
)
from .terms import (
    FRACTIONAL_TYPES, INTEGER_TYPES, RDF_FIRST, RDF_LANG_STRING, RDF_NIL,
    RDF_REST, Term, XSD_BOOLEAN, XSD_STRING, iri,
)
from .ttl import Triple


class RampError(Exception):
    def __init__(self, code: int, message: str, stack: List[dict]):
        super().__init__(f"RAMP{code}: {message}")
        self.code = code
        self.stack = stack


class Mismatch:
    pass


MISMATCH = Mismatch()

UNDEFINED = object()  # JS `undefined` sentinel (absent record key)


class CyclicMatch:
    def __init__(self, candidate: Term):
        self.candidate = candidate
        self.holes: List[Tuple[object, object]] = []  # (container, key)


class Match:
    __slots__ = ("value", "candidate")

    def __init__(self, value, candidate: Optional[Term]):
        self.value = value
        self.candidate = candidate


class Graph:
    def __init__(self, triples: Iterable[Triple]):
        self.triples = list(triples)
        self.by_sp: Dict[Tuple[str, str], List[Term]] = {}
        self.by_op: Dict[Tuple[str, str], List[Term]] = {}
        self.order: Dict[str, int] = {}
        seen = set()
        deduped = []
        for s, p, o in self.triples:
            k = (s.key(), p, o.key())
            if k in seen:
                continue
            seen.add(k)
            deduped.append((s, p, o))
            self.by_sp.setdefault((s.key(), p), []).append(o)
            self.by_op.setdefault((o.key(), p), []).append(s)
            for t in (s, o):
                self.order.setdefault(t.key(), len(self.order))
        self.triples = deduped

    def candidates(self) -> List[Term]:
        out: Dict[str, Term] = {}
        for s, _, o in self.triples:
            out.setdefault(s.key(), s)
            out.setdefault(o.key(), o)
        return list(out.values())


def _stack_frame(shape: Shape, edge=None, focus: Optional[Term] = None) -> dict:
    frame: dict = {"shape": shape.id.value if shape.id.kind == "iri"
                   else {"type": shape.type}}
    if edge is not None:
        frame["edge"] = edge
    if focus is not None:
        frame["focus"] = focus.n3() if focus.kind != "bnode" else "_:" + focus.value
    return frame


class PyFrame:
    """frame.ts:36-61 lifecycle, candidates default to all terms."""

    def __init__(self, catalog: ShapeCatalog, graph: Graph):
        self.catalog = catalog
        self.g = graph
        self.visiting: Dict[Tuple[str, str], Optional[CyclicMatch]] = {}
        self.matches_memo: Dict[Tuple[str, str], object] = {}
        self.refs: Dict[str, List[dict]] = {}

    # -- path evaluation (frame.ts:361-388, 730-802) -------------------
    def eval_path(self, path: PropertyPath, sources: List[Term],
                  reverse: bool = False) -> List[Term]:
        if isinstance(path, PredicatePath):
            out: Dict[str, Term] = {}
            for src in sources:
                idx = self.g.by_op if reverse else self.g.by_sp
                for t in idx.get((src.key(), path.predicate), []):
                    out.setdefault(t.key(), t)
            return list(out.values())
        if isinstance(path, SequencePath):
            steps = list(path.sequence)
            if reverse:
                steps = [InversePath(s) for s in reversed(steps)]
            cur = list(sources)
            for step in steps:
                cur = self.eval_path(step, cur)
            return cur
        if isinstance(path, InversePath):
            return self.eval_path(path.inverse, sources, not reverse)
        if isinstance(path, AlternativePath):
            out = {}
            for alt in path.alternatives:
                for t in self.eval_path(alt, sources, reverse):
                    out.setdefault(t.key(), t)
            return list(out.values())
        if isinstance(path, (ZeroOrMorePath, ZeroOrOnePath, OneOrMorePath)):
            out = {}
            if not isinstance(path, OneOrMorePath):
                for t in sources:
                    out.setdefault(t.key(), t)
            frontier = list(sources)
            while True:
                step = self.eval_path(path.path, frontier, reverse)
                new = [t for t in step if t.key() not in out]
                for t in new:
                    out[t.key()] = t
                if isinstance(path, ZeroOrOnePath) or not new:
                    break
                frontier = new
            return list(out.values())
        raise TypeError(path)

    # -- frameShape dispatch (frame.ts:142-205) ------------------------
    def frame_shape(self, sid: ShapeID, strict: bool, candidates: List[Term],
                    stack: List[dict]):
        shape = self.catalog.get(sid)
        required = strict and not shape.lenient
        if isinstance(shape, RecordShape):
            gen = self.frame_record(shape, required, candidates, stack)
        elif isinstance(shape, AnyOfShape):
            gen = self.frame_anyof(shape, required, candidates, stack)
        elif isinstance(shape, SetShape):
            gen = self.frame_set(shape, required, candidates, stack)
        elif isinstance(shape, OptionalShape):
            gen = self.frame_optional(shape, required, candidates, stack)
        elif isinstance(shape, (ResourceShape, LiteralShape)):
            gen = self.frame_node(shape, required, candidates, stack)
        elif isinstance(shape, ListShape):
            gen = self.frame_list(shape, required, candidates, stack)
        elif isinstance(shape, MapShape):
            gen = self.frame_map(shape, required, candidates, stack)
        else:
            raise TypeError(shape)
        for value in gen:
            if isinstance(value, Mismatch):
                if not shape.lenient:
                    if strict:
                        raise RampError(201, "failed to match", list(stack))
                    yield MISMATCH
            elif isinstance(value, CyclicMatch):
                yield value
            else:
                for ref in self.refs.get(sid.key(), []):
                    ref["match"] = value
                typed = self.from_rdf(value.value, shape)
                yield Match(typed, value.candidate)

    # -- value mapping (value-mapping.ts) ------------------------------
    def from_rdf(self, value, shape: Shape):
        if isinstance(shape, ResourceShape):
            if shape.vocabulary is not None and isinstance(value, Term):
                for key, term in shape.vocabulary:
                    if term == value:
                        return key
                raise RampError(0, f"term {value.n3()} not in vocabulary",
                                [])
            if shape.keep_as_term or shape.vocabulary is not None:
                return value
            if isinstance(value, Term):
                if value.kind == "iri":
                    return value.value
                if value.kind == "bnode":
                    return "_:" + value.value
            return value
        if isinstance(shape, LiteralShape) and not shape.keep_as_term:
            if isinstance(value, Term) and value.kind == "lit":
                dt = shape.effective_datatype()
                if dt == XSD_STRING:
                    return value.value
                if dt == RDF_LANG_STRING and shape.language:
                    return value.value
                if dt == XSD_BOOLEAN:
                    return value.value != "false"
                if dt in INTEGER_TYPES:
                    return int(value.value)
                if dt in FRACTIONAL_TYPES:
                    return float(value.value)
            return value
        return value

    # -- node shapes (frameNode + matchesTerm) -------------------------
    def matches_term(self, shape, node: Term,
                     err_stack: Optional[List[dict]] = None) -> bool:
        def fail(code, msg):
            if err_stack is not None:
                raise RampError(code, msg, err_stack)
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

    def frame_node(self, shape, required, candidates, stack):
        for cand in candidates:
            if self.matches_term(shape, cand):
                yield Match(cand, cand)
            elif required:
                last = dict(stack[-1]) if stack else _stack_frame(shape)
                last["focus"] = ("_:" + cand.value if cand.kind == "bnode"
                                 else cand.n3())
                self.matches_term(shape, cand, stack[:-1] + [last])
            else:
                yield MISMATCH

    # -- record (frame.ts:207-316) -------------------------------------
    def frame_record(self, shape: RecordShape, required, candidates, stack):
        ref_contexts = []
        for cp in shape.computed_properties:
            for target, part in self._open_refs(cp.value_shape):
                ctx = {"source": shape.id.key(), "target": target,
                       "part": part, "match": None}
                self.refs.setdefault(target, []).append(ctx)
                ref_contexts.append(ctx)

        for cand in candidates:
            # reference guard is isResource (frame.ts:222) — literals
            # AND var/dgraph/quad terms are all non-resource here
            if not cand.is_resource:
                if required:
                    raise RampError(205, "non-resource term",
                                    self._focused(stack, cand))
                yield MISMATCH
                continue
            memo_key = (shape.id.key(), cand.key())
            if memo_key in self.matches_memo:
                yield Match(self.matches_memo[memo_key], cand)
                continue
            if memo_key in self.visiting:
                cm = self.visiting[memo_key]
                if cm is None:
                    cm = CyclicMatch(cand)
                    self.visiting[memo_key] = cm
                yield cm
                continue
            self.visiting[memo_key] = None
            template: dict = {}
            fstack = self._focused(stack, cand)
            found = self._frame_properties(
                shape.type_properties, required, cand, template, fstack)
            if found:
                strict_by_type = required or bool(shape.type_properties)
                found = self._frame_properties(
                    shape.properties, strict_by_type, cand, template, fstack)
            if found:
                self._synthesize_computed(shape, template, ref_contexts, stack)
                cm = self.visiting.get(memo_key)
                if cm is not None and cm.holes:
                    self.matches_memo[memo_key] = template
                    for container, key in cm.holes:
                        container[key] = template
            del self.visiting[memo_key]
            yield Match(template, cand) if found else MISMATCH

        for ctx in ref_contexts:
            self.refs[ctx["target"]].remove(ctx)

    def _frame_properties(self, properties, required, cand, template, fstack):
        for p in properties:
            values = self.eval_path(p.path, [cand]) if not _is_self(p.path) \
                else [cand]
            nstack = fstack + [_stack_frame(self.catalog.get(p.value_shape),
                                            p.name)]
            # (the child frame's shape/edge is refined inside recursion)
            found = False
            for match in self.frame_shape(p.value_shape, required, values,
                                          self._child_stack(fstack, p)):
                if isinstance(match, Mismatch):
                    if required:
                        raise RampError(202, f"property {p.name} mismatch",
                                        fstack)
                    return False
                if found:
                    if required:
                        raise RampError(204, f"property {p.name} multi",
                                        fstack)
                    return False
                found = True
                if p.transient:
                    pass
                elif isinstance(match, CyclicMatch):
                    match.holes.append((template, p.name))
                    template[p.name] = UNDEFINED
                else:
                    template[p.name] = match.value
            if not found:
                if required:
                    raise RampError(203, f"property {p.name} no match", fstack)
                return False
        return True

    def _child_stack(self, fstack, p):
        child = self.catalog.get(p.value_shape)
        return fstack + [_stack_frame(child, p.name)]

    @staticmethod
    def _focused(stack, cand):
        last = dict(stack[-1])
        last["focus"] = ("_:" + cand.value if cand.kind == "bnode"
                         else cand.n3())
        return stack[:-1] + [last]

    def _open_refs(self, sid: ShapeID):
        shape = self.catalog.get(sid)
        if isinstance(shape, ResourceShape):
            if shape.value is None:
                yield sid.key(), None
        elif isinstance(shape, LiteralShape):
            if shape.value is None:
                yield sid.key(), "value"
        elif isinstance(shape, RecordShape):
            for p in shape.all_properties():
                yield from self._open_refs(p.value_shape)
        elif isinstance(shape, SetShape):
            yield from self._open_refs(shape.item_shape)

    def _synthesize_computed(self, shape, template, ref_contexts, stack):
        for cp in shape.computed_properties:
            template[cp.name] = self._synthesize(cp.value_shape, ref_contexts,
                                                 stack)

    def _synthesize(self, sid: ShapeID, ref_contexts, stack):
        shape = self.catalog.get(sid)
        if isinstance(shape, (ResourceShape, LiteralShape)):
            if shape.value is not None:
                return self.from_rdf(shape.value, shape)
            for ctx in ref_contexts:
                if ctx["target"] == sid.key() and ctx["match"] is not None:
                    raw = ctx["match"].value
                    if ctx["part"] == "value" and isinstance(raw, Term):
                        raw = raw.value
                        if isinstance(shape, LiteralShape):
                            return self.from_rdf(
                                Term("lit", raw,
                                     shape.effective_datatype() or XSD_STRING,
                                     shape.language), shape)
                        return raw
                    return self.from_rdf(raw, shape)
            raise RampError(305, "no matches to synthesize", list(stack))
        if isinstance(shape, OptionalShape):
            return UNDEFINED
        if isinstance(shape, ListShape):
            return []
        if isinstance(shape, MapShape):
            return {}
        if isinstance(shape, SetShape):
            return []
        raise RampError(301, "cannot synthesize shape", list(stack))

    # -- anyOf (frame.ts:390-427) --------------------------------------
    def frame_anyof(self, shape: AnyOfShape, required, candidates, stack):
        unmatched = {c.key(): c for c in candidates}
        for vid in shape.variants:
            vstack = stack + [_stack_frame(self.catalog.get(vid))]
            for match in self.frame_shape(vid, False, candidates, vstack):
                if not isinstance(match, Mismatch):
                    if match.candidate is None:
                        unmatched.clear()
                    else:
                        unmatched.pop(match.candidate.key(), None)
                    yield match
        if unmatched:
            if required:
                for vid in shape.variants:
                    vstack = stack + [_stack_frame(self.catalog.get(vid))]
                    yield from self.frame_shape(vid, True,
                                                list(unmatched.values()), vstack)
            else:
                yield MISMATCH

    # -- set (frame.ts:429-469) ----------------------------------------
    def frame_set(self, shape: SetShape, required, candidates, stack):
        istack = stack + [_stack_frame(self.catalog.get(shape.item_shape))]
        matches: list = []
        for match in self.frame_shape(shape.item_shape, required, candidates,
                                      istack):
            if isinstance(match, Mismatch):
                yield match
                return
            if isinstance(match, CyclicMatch):
                idx = len(matches)
                matches.append(UNDEFINED)
                match.holes.append((matches, idx))
            else:
                matches.append(match.value)
        min_c = shape.min_count or 0
        if len(matches) < min_c:
            if required:
                raise RampError(219, "min count", list(stack))
            yield MISMATCH
            return
        if shape.max_count is not None and len(matches) > shape.max_count:
            if required:
                raise RampError(220, "max count", list(stack))
            yield MISMATCH
            return
        yield Match(matches, None)

    # -- optional (frame.ts:471-494) -----------------------------------
    def frame_optional(self, shape: OptionalShape, required, candidates, stack):
        found = False
        istack = stack + [_stack_frame(self.catalog.get(shape.item_shape))]
        for value in self.frame_shape(shape.item_shape, False, candidates,
                                      istack):
            if isinstance(value, Mismatch):
                if required:
                    list(self.frame_shape(shape.item_shape, True, candidates,
                                          istack))
            else:
                found = True
            yield value
        if not found:
            yield Match(None if shape.empty_is_null else UNDEFINED, None)

    # -- list (frame.ts:519-628) ---------------------------------------
    def frame_list(self, shape: ListShape, required, candidates, stack):
        head = shape.head_path or PredicatePath(RDF_FIRST)
        tail = shape.tail_path or PredicatePath(RDF_REST)
        nil = shape.nil or iri(RDF_NIL)

        for cand in candidates:
            memo_key = (shape.id.key(), cand.key())
            if memo_key in self.matches_memo:
                yield Match(self.matches_memo[memo_key], cand)
                continue
            if memo_key in self.visiting:
                cm = self.visiting[memo_key]
                if cm is None:
                    cm = CyclicMatch(cand)
                    self.visiting[memo_key] = cm
                yield cm
                continue
            self.visiting[memo_key] = None
            lst = self._walk_list(shape, head, tail, nil, cand, required,
                                  self._focused(stack, cand))
            if not isinstance(lst, Mismatch):
                cm = self.visiting.get(memo_key)
                if cm is not None and cm.holes:
                    self.matches_memo[memo_key] = lst
                    for container, key in cm.holes:
                        container[key] = lst
            del self.visiting[memo_key]
            yield lst if isinstance(lst, Mismatch) else Match(lst, cand)

    def _walk_list(self, shape, head, tail, nil, cand, required, fstack):
        def fail(code, msg):
            if required:
                raise RampError(code, msg, fstack)
            return MISMATCH

        result: Optional[list] = None
        rest = cand
        idx = 0
        seen = set()
        while True:
            if not rest.is_resource:  # frame.ts:541 isResource guard
                return fail(205, "list term not a resource")
            if rest == nil:
                return result if result is not None else []
            if rest.key() in seen:
                return fail(216, "cyclic list")
            seen.add(rest.key())
            heads = self.eval_path(head, [rest])
            if len(heads) > 1:
                return fail(206, "multiple list heads")
            if not heads:
                return fail(207, "no list head")
            if result is None:
                result = []
            istack = fstack + [_stack_frame(self.catalog.get(shape.item_shape),
                                            idx)]
            item_match = None
            for match in self.frame_shape(shape.item_shape, required, heads,
                                          istack):
                if isinstance(match, Mismatch):
                    return MISMATCH
                if isinstance(match, CyclicMatch):
                    raise RampError(216, "cyclic list item", istack)
                if item_match is not None:
                    return fail(208, "multiple list items")
                item_match = match
            if item_match is None:
                return fail(209, "no list item")
            result.append(item_match.value)
            tails = self.eval_path(tail, [rest])
            if len(tails) > 1:
                return fail(210, "multiple list tails")
            if not tails:
                return fail(211, "no list tail")
            rest = tails[0]
            idx += 1

    # -- map (frame.ts:642-696) ----------------------------------------
    def frame_map(self, shape: MapShape, required, candidates, stack):
        result: dict = {}
        key_ctx = {"source": shape.id.key(), "target": shape.key.target.key(),
                   "part": shape.key.part, "match": None}
        self.refs.setdefault(key_ctx["target"], []).append(key_ctx)
        val_ctx = None
        if shape.value is not None:
            val_ctx = {"source": shape.id.key(),
                       "target": shape.value.target.key(),
                       "part": shape.value.part, "match": None}
            self.refs.setdefault(val_ctx["target"], []).append(val_ctx)
        istack = stack + [_stack_frame(self.catalog.get(shape.item_shape))]
        try:
            for item in self.frame_shape(shape.item_shape, required,
                                         candidates, istack):
                if isinstance(item, Mismatch):
                    yield MISMATCH
                    return
                if isinstance(item, CyclicMatch):
                    raise RampError(216, "cyclic map item", list(stack))
                if key_ctx["match"] is None:
                    raise RampError(217, "no map key", list(stack))
                key = self._compact(key_ctx)
                value = self._compact(val_ctx) if val_ctx else item.value
                if key is not None and value is not None:
                    if not isinstance(key, (str, int, float, bool)):
                        raise RampError(212, "composite map key", list(stack))
                    if isinstance(key, bool):
                        key = "true" if key else "false"
                    result[str(key)] = value
        finally:
            self.refs[key_ctx["target"]].remove(key_ctx)
            if val_ctx:
                self.refs[val_ctx["target"]].remove(val_ctx)
        yield Match(result, None)

    def _compact(self, ctx):
        m = ctx["match"]
        if m is None:
            return None
        raw = m.value
        if ctx["part"] == "value" and isinstance(raw, Term):
            return raw.value
        if ctx["part"] == "datatype" and isinstance(raw, Term):
            return raw.dt
        if ctx["part"] == "language" and isinstance(raw, Term):
            # reference literals store language as '' when absent
            # (rdf-model.ts:62) — compacting never yields undefined
            return raw.lang or ""
        if isinstance(raw, Term):
            # whole-match reference through value mapping
            for shape in self.catalog:
                if shape.id.key() == ctx["target"]:
                    return self.from_rdf(raw, shape)
        return raw


def _is_self(path: PropertyPath) -> bool:
    return isinstance(path, SequencePath) and not path.sequence


def frame_py(catalog: ShapeCatalog, triples: Iterable[Triple], root: ShapeID,
             candidates: Optional[List[Term]] = None,
             strict: Optional[bool] = None) -> List[object]:
    """Reference ``frame`` entry point (frame.ts:36-61)."""
    g = Graph(triples)
    engine = PyFrame(catalog, g)
    cands = candidates if candidates is not None else g.candidates()
    eff_strict = strict if strict is not None else candidates is not None
    stack = [_stack_frame(catalog.get(root))]
    out = []
    for match in engine.frame_shape(root, eff_strict, cands, stack):
        if isinstance(match, CyclicMatch):
            raise RampError(216, "cyclic root match", stack)
        if not isinstance(match, Mismatch):
            out.append(match.value)
    return out


def encode_refs(value, _state=None) -> object:
    """Encode a possibly-cyclic value with ``@ref``/``@use`` markers
    compatible with the reference fixtures (test/util.ts:22-57)."""
    if _state is None:
        _state = {"path": {}, "refs": {}, "next": 1, "out_refs": {}}

    def enc(v, path_ids):
        vid = id(v)
        if isinstance(v, (dict, list)) and vid in path_ids:
            if vid not in _state["refs"]:
                _state["refs"][vid] = _state["next"]
                _state["next"] += 1
            return {"@use": _state["refs"][vid]}
        if isinstance(v, dict):
            path_ids = path_ids | {vid}
            out = {}
            for k, val in v.items():
                if val is UNDEFINED:
                    continue
                out[k] = enc(val, path_ids)
            if vid in _state["refs"]:
                out = {"@ref": _state["refs"][vid], **out}
            return out
        if isinstance(v, list):
            path_ids = path_ids | {vid}
            out_l = [enc(x, path_ids) for x in v]
            if vid in _state["refs"]:
                return {"@ref-list": _state["refs"][vid], "items": out_l}
            return out_l
        if v is UNDEFINED:
            return None
        if isinstance(v, Term):
            return {"@term": {"kind": v.kind, "value": v.value,
                              **({"dt": v.dt} if v.dt else {}),
                              **({"lang": v.lang} if v.lang else {})}}
        return v

    return enc(value, frozenset())
