"""Relational flatten: framed JSON values → triples without Python.

The generic flatten path (:mod:`ramp_shapes_spark.flatten`) runs the
reference-semantics interpreter per row inside ``mapInPandas`` — the
right fallback for any shape, but a Python-CPU wall on the single most
row-multiplying stage of a 100 TB pipeline.  For the acyclic shape
fragment that covers real pipelines (records, sets, optionals, anyOf
unions, maps, LISTS (head/tail chains), resource/literal leaves,
constant type-properties, forward/inverse predicate paths — reference
semantics flatten.ts:200-248, 302-357, 386-443, 470-565), this module
*compiles* the shape into a single JVM expression:

    from_json(value, <schema derived from the shape>)
      → array<struct<s,p,o>> assembled with concat/transform
      → one explode

One narrow scan, whole-stage codegen end to end, no shuffle, no Python
worker.  Shapes outside the fragment raise :class:`UnsupportedShape`
and callers fall back to the interpreter.

Blank-node ids are BYTE-IDENTICAL to the interpreter's
(:func:`ramp_shapes_spark.pyflatten.deterministic_bnode_generator`:
``{prefix}_{sha1(seed)[:12]}_{counter}``): the compiler statically
derives each blank node's generation-order counter (children before
parent subject, properties in declaration order — flatten.ts:200-217),
so either execution path emits the same graph and materialized
fingerprints stay stable.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, DataType, DoubleType, LongType, StringType,
    StructField, StructType,
)

from .shapes import (
    AlternativePath, AnyOfShape, InversePath, ListShape, LiteralShape,
    MapShape, OneOrMorePath, OptionalShape, PredicatePath, RecordShape,
    ResourceShape, SequencePath, SetShape, ShapeCatalog, ShapeID,
    ZeroOrMorePath, ZeroOrOnePath, is_self_path,
)
from .sqlutil import s_str
from .terms import (
    FRACTIONAL_TYPES, INTEGER_TYPES, RDF_FIRST, RDF_LANG_STRING, RDF_NIL,
    RDF_REST, Term, XSD_BOOLEAN, XSD_STRING,
)

TERM_SQL = "struct<kind:string,value:string,dt:string,lang:string>"
TRIPLE_SQL = f"struct<s:{TERM_SQL},p:string,o:{TERM_SQL}>"
EMPTY_TRIPLES = f"CAST(array() AS array<{TRIPLE_SQL}>)"

# framed keepAsTerm values serialize as {"@term": {kind, value, dt?,
# lang?}} (frame._s_node_value → sqlutil.s_term_json)
_TERM_WRAPPER_TYPE = StructType([
    StructField("@term", StructType([
        StructField("kind", StringType(), True),
        StructField("value", StringType(), True),
        StructField("dt", StringType(), True),
        StructField("lang", StringType(), True),
    ]), True),
])


class UnsupportedShape(Exception):
    """Shape uses a construct outside the relational-flatten fragment."""


# ---------------------------------------------------------------------------
# schema derivation (the typed projection of a framed JSON value)
# ---------------------------------------------------------------------------

def shape_struct_type(catalog: ShapeCatalog, sid: ShapeID,
                      _seen: Optional[set] = None) -> DataType:
    """Spark type of the framed value of ``sid`` (acyclic fragment)."""
    seen = set(_seen or ())
    key = sid.key()
    if key in seen:
        raise UnsupportedShape(f"recursive shape {sid!r}")
    seen.add(key)
    shape = catalog.get(sid)
    if isinstance(shape, RecordShape):
        fields = []
        for p in shape.type_properties + shape.properties:
            if p.transient:
                continue
            fields.append(StructField(
                p.name, shape_struct_type(catalog, p.value_shape, seen), True))
        return StructType(fields)
    if isinstance(shape, (SetShape, ListShape)):
        return ArrayType(shape_struct_type(catalog, shape.item_shape, seen))
    if isinstance(shape, MapShape):
        from pyspark.sql.types import MapType
        if shape.value is not None:
            # value-reference map: entries hold only the referenced PART
            # of each item — a term part (string) or the target shape's
            # framed value (synthesize.ts:11-36 compactByReference)
            if shape.value.part is not None:
                vt: DataType = StringType()
            else:
                vt = shape_struct_type(catalog, shape.value.target, seen)
            return MapType(StringType(), vt)
        return MapType(StringType(),
                       shape_struct_type(catalog, shape.item_shape, seen))
    if isinstance(shape, OptionalShape):
        return shape_struct_type(catalog, shape.item_shape, seen)
    if isinstance(shape, AnyOfShape):
        # heterogeneous union: parse as VARIANT — JSON value types are
        # preserved, so the emitter can discriminate variants at
        # runtime via schema_of_variant (string vs number vs array)
        from pyspark.sql.types import VariantType
        return VariantType()
    if isinstance(shape, ResourceShape):
        if shape.keep_as_term:
            return _TERM_WRAPPER_TYPE
        if shape.vocabulary is not None:
            return StringType()  # the vocabulary KEY (value-mapping.ts)
        return StringType()
    if isinstance(shape, LiteralShape):
        if shape.keep_as_term:
            return _TERM_WRAPPER_TYPE
        dt = shape.effective_datatype()
        if dt == XSD_STRING or (dt == RDF_LANG_STRING and shape.language):
            return StringType()
        if dt == XSD_BOOLEAN:
            return BooleanType()
        if dt in INTEGER_TYPES:
            return LongType()
        if dt in FRACTIONAL_TYPES:
            return DoubleType()
        raise UnsupportedShape(f"literal datatype {dt}")
    raise UnsupportedShape(f"{shape.type} shape")


# ---------------------------------------------------------------------------
# expression builders
# ---------------------------------------------------------------------------

def _iri_or_bnode(e: str) -> str:
    """toRdf for a resource-valued string (value-mapping.ts:152-170):
    '_:x' decodes to a blank node, anything else to an IRI."""
    return (
        f"CASE WHEN startswith(({e}), '_:') THEN named_struct("
        f"'kind', 'bnode', 'value', substring({e}, 3), "
        f"'dt', CAST(NULL AS STRING), 'lang', CAST(NULL AS STRING)) "
        f"ELSE named_struct('kind', 'iri', 'value', ({e}), "
        f"'dt', CAST(NULL AS STRING), 'lang', CAST(NULL AS STRING)) END"
    )


def _js_number(e: str) -> str:
    """JS Number.toString for a DOUBLE expr (pyflatten._number_str):
    integral doubles print without the trailing '.0'."""
    return (
        f"CASE WHEN ({e}) = floor({e}) AND abs({e}) < 1e21 "
        f"THEN CAST(CAST({e} AS BIGINT) AS STRING) "
        f"ELSE CAST({e} AS STRING) END"
    )


def _lit_term(value_e: str, dt: str, lang: Optional[str] = None) -> str:
    lang_e = s_str(lang) if lang else "CAST(NULL AS STRING)"
    return (
        f"named_struct('kind', 'lit', 'value', ({value_e}), "
        f"'dt', {s_str(dt)}, 'lang', {lang_e})"
    )


def _const_term(t: Term) -> str:
    dt = s_str(t.dt) if t.dt is not None else "CAST(NULL AS STRING)"
    lang = s_str(t.lang) if t.lang is not None else "CAST(NULL AS STRING)"
    return (f"named_struct('kind', {s_str(t.kind)}, 'value', "
            f"{s_str(t.value)}, 'dt', {dt}, 'lang', {lang})")


def _term_from_wrapper(e: str) -> str:
    """TERM struct from a parsed {"@term": {...}} wrapper value
    (keepAsTerm round trip — toRdf is identity for terms)."""
    t = f"({e}).`@term`"
    return (f"named_struct('kind', {t}.kind, 'value', {t}.value, "
            f"'dt', {t}.dt, 'lang', {t}.lang)")


def _vocab_term(shape: ResourceShape, e: str) -> str:
    """Vocabulary toRdf (value-mapping.ts:79-91): the framed KEY string
    rebuilds the dictionary term via a static in-expression map."""
    entries = ", ".join(
        f"{s_str(key)}, {_const_term(term)}" for key, term in shape.vocabulary)
    return f"try_element_at(map({entries}), ({e}))"


def _leaf_term(shape, e: str) -> str:
    """toRdf of a leaf value expr (value-mapping.ts toRdf)."""
    if shape.keep_as_term:
        return _term_from_wrapper(e)
    if isinstance(shape, ResourceShape):
        if shape.vocabulary is not None:
            return _vocab_term(shape, e)
        return _iri_or_bnode(e)
    dt = shape.effective_datatype()
    if dt == XSD_STRING:
        return _lit_term(e, XSD_STRING)
    if dt == RDF_LANG_STRING and shape.language:
        return _lit_term(e, RDF_LANG_STRING, shape.language)
    if dt == XSD_BOOLEAN:
        return _lit_term(f"CASE WHEN {e} THEN 'true' ELSE 'false' END", dt)
    if dt in INTEGER_TYPES:
        return _lit_term(f"CAST({e} AS STRING)", dt)
    if dt in FRACTIONAL_TYPES:
        return _lit_term(_js_number(e), dt)
    raise UnsupportedShape(f"literal datatype {dt}")


def _edge(subj: str, path, obj: str) -> str:
    """Quad generation for a forward/inverse predicate path
    (flatten.ts:302-357, restricted fragment)."""
    if isinstance(path, PredicatePath):
        return (f"named_struct('s', {subj}, 'p', {s_str(path.predicate)}, "
                f"'o', {obj})")
    if isinstance(path, InversePath) and \
            isinstance(path.inverse, PredicatePath):
        return (f"named_struct('s', {obj}, "
                f"'p', {s_str(path.inverse.predicate)}, 'o', {subj})")
    raise UnsupportedShape(f"path {path!r}")


def _path_bnode_count(path) -> int:
    """Generate-phase 'path' blank nodes one ``generatePropertyPath``
    invocation allocates (flatten.ts:302-357 / pyflatten.generate_path):
    a sequence of n elements chains through n-1 fresh nodes (each
    allocated BEFORE its step's inner nodes), alternatives generate the
    first branch only, closures emit a single inner step."""
    if isinstance(path, PredicatePath):
        return 0
    if isinstance(path, InversePath):
        return _path_bnode_count(path.inverse)
    if isinstance(path, SequencePath):
        seq = path.sequence
        if not seq:
            return 0
        return (len(seq) - 1) + sum(_path_bnode_count(e) for e in seq)
    if isinstance(path, AlternativePath):
        if not path.alternatives:
            return 0
        return _path_bnode_count(path.alternatives[0])
    if isinstance(path, (ZeroOrMorePath, ZeroOrOnePath, OneOrMorePath)):
        return _path_bnode_count(path.path)
    raise UnsupportedShape(f"path {path!r}")


class _Compiler:
    """Compiles one shape into an array<triple> SQL expr.

    Blank-node counters replicate the interpreter's generation order
    (pyflatten): within a record, property matches are built in
    declaration order (children's blank nodes first), then the record's
    own subject blank node (when no self property names it).  Counter
    offsets are SQL int exprs threaded through the walk.
    """

    def __init__(self, catalog: ShapeCatalog, seed: str) -> None:
        self.catalog = catalog
        self.seed = seed
        self._lambda_n = 0

    def _var(self) -> str:
        self._lambda_n += 1
        return f"fx{self._lambda_n}"

    def _bnode(self, shape, counter: str) -> str:
        """{shape.type}_{sha1(seed)[:12]}_{counter} — byte-identical to
        pyflatten.deterministic_bnode_generator."""
        ident = (f"concat({s_str(shape.type + '_')}, "
                 f"substring(sha1({self.seed}), 1, 12), '_', "
                 f"CAST({counter} AS STRING))")
        return (f"named_struct('kind', 'bnode', 'value', {ident}, "
                f"'dt', CAST(NULL AS STRING), 'lang', CAST(NULL AS STRING))")

    # -- property-path quad generation (flatten.ts:302-357) -------------
    def path_edges(self, s: str, o: str, path, gen_ctr: str,
                   s_lit: bool, o_lit: bool) -> str:
        """array<triple> expr of ``generate_path(s, path, o)``.

        Sequences chain through fresh generate-phase 'path' blank
        nodes, numbered ``gen_ctr + 1 ..`` in the interpreter's
        allocation order (each intermediate BEFORE its step's inner
        nodes); inverse swaps subject/object; alternatives take the
        first branch; closure paths emit one inner step; the empty
        sequence emits nothing.  ``s_lit``/``o_lit`` flag ends that may
        hold literal terms at runtime: a literal landing in subject
        position raises error 403 in the interpreter, so such shapes
        leave the relational fragment (the interpreter fallback then
        reports the error rows properly)."""
        if isinstance(path, PredicatePath):
            if s_lit:
                raise UnsupportedShape(
                    "literal term in subject position (interpreter "
                    "error 403)")
            return (f"array(named_struct('s', {s}, "
                    f"'p', {s_str(path.predicate)}, 'o', {o}))")
        if isinstance(path, InversePath):
            return self.path_edges(o, s, path.inverse, gen_ctr,
                                   o_lit, s_lit)
        if isinstance(path, SequencePath):
            seq = path.sequence
            if not seq:
                return EMPTY_TRIPLES
            class _PathNode:  # bnode prefix carrier for self._bnode
                type = "path"

            parts: List[str] = []
            consumed = 0
            cur, cur_lit = s, s_lit
            for i, element in enumerate(seq):
                if i == len(seq) - 1:
                    nxt, nxt_lit = o, o_lit
                else:
                    consumed += 1
                    nxt = self._bnode(_PathNode,
                                      f"({gen_ctr} + {consumed})")
                    nxt_lit = False
                parts.append(self.path_edges(
                    cur, nxt, element, f"({gen_ctr} + {consumed})",
                    cur_lit, nxt_lit))
                consumed += _path_bnode_count(element)
                cur, cur_lit = nxt, nxt_lit
            parts = [p for p in parts if p != EMPTY_TRIPLES]
            if not parts:
                return EMPTY_TRIPLES
            return parts[0] if len(parts) == 1 else \
                f"concat({', '.join(parts)})"
        if isinstance(path, AlternativePath):
            if not path.alternatives:
                return EMPTY_TRIPLES
            return self.path_edges(s, o, path.alternatives[0], gen_ctr,
                                   s_lit, o_lit)
        if isinstance(path, (ZeroOrMorePath, ZeroOrOnePath,
                             OneOrMorePath)):
            return self.path_edges(s, o, path.path, gen_ctr, s_lit, o_lit)
        raise UnsupportedShape(f"path {path!r}")

    def _edge_count_expr(self, vshape, pv: str) -> str:
        """Number of ``generate_path`` invocations this property value
        produces (one per matched node: leaves/records once, set/map
        items each, lists once for the head-node edge)."""
        if isinstance(vshape, OptionalShape):
            inner = self._edge_count_expr(
                self.catalog.get(vshape.item_shape), pv)
            return f"(CASE WHEN ({pv}) IS NULL THEN 0 ELSE {inner} END)"
        if isinstance(vshape, (SetShape, MapShape)):
            return f"coalesce(size({pv}), 0)"
        if isinstance(vshape, ListShape):
            return f"(CASE WHEN ({pv}) IS NULL THEN 0 ELSE 1 END)"
        return "1"

    def _static_edge_count(self, vshape) -> Optional[int]:
        if isinstance(vshape, (ResourceShape, LiteralShape, RecordShape,
                               AnyOfShape)):
            return 1
        return None  # optional/set/map/list: data-dependent

    def _prop_gen_static(self, prop, vshape) -> Optional[int]:
        """Static generate-phase count of one property: edge-path nodes
        plus the value's own (list tails, nested paths)."""
        P = _path_bnode_count(prop.path)
        if prop.transient:
            if not P:
                return 0
            if isinstance(vshape, (ResourceShape, LiteralShape)) and \
                    vshape.value is not None:
                return P  # constant → one edge
            if isinstance(vshape, ListShape):
                return P  # synthesized [] → one nil edge
            return 0      # optional/set/map synthesize empty → no edge
        sub = self._static_gen_count(vshape)
        if sub is None:
            return None
        if not P:
            return sub
        ec = self._static_edge_count(vshape)
        if ec is None:
            return None
        return ec * P + sub

    def _prop_gen_expr(self, prop, vshape, pv: str) -> str:
        static = self._prop_gen_static(prop, vshape)
        if static is not None:
            return str(static)
        P = _path_bnode_count(prop.path)
        parts: List[str] = []
        if P:
            parts.append(f"({self._edge_count_expr(vshape, pv)} * {P})")
        g = self._gen_count_expr(vshape, pv)
        if g != "0":
            parts.append(g)
        if not parts:
            return "0"
        return parts[0] if len(parts) == 1 else \
            "(" + " + ".join(parts) + ")"

    # -- blank-node counting -------------------------------------------
    def _has_self_subject(self, shape: RecordShape) -> bool:
        for prop in shape.type_properties + shape.properties:
            if is_self_path(prop.path) and not prop.transient:
                vshape = self.catalog.get(prop.value_shape)
                if isinstance(vshape, ResourceShape):
                    return True
        return False

    def _static_count(self, shape) -> Optional[int]:
        """Blank nodes per instance when data-independent, else None."""
        if isinstance(shape, (ResourceShape, LiteralShape)):
            return 0
        if isinstance(shape, OptionalShape):
            inner = self._static_count(self.catalog.get(shape.item_shape))
            return 0 if inner == 0 else None
        if isinstance(shape, (SetShape, MapShape)):
            inner = self._static_count(self.catalog.get(shape.item_shape))
            return 0 if inner == 0 else None
        if isinstance(shape, ListShape):
            # non-empty lists always allocate the match-phase head node
            # (pyflatten._ListMatch.__init__) → always data-dependent
            self._static_count(self.catalog.get(shape.item_shape))
            return None
        if isinstance(shape, AnyOfShape):
            # supported only when every variant generates zero blank
            # nodes (leaves, sets of leaves, nested such unions) — then
            # variant choice cannot shift any counter
            for vid in shape.variants:
                if self._static_count(self.catalog.get(vid)) != 0:
                    raise UnsupportedShape(
                        "anyOf variant generating blank nodes")
            return 0
        if isinstance(shape, RecordShape):
            total = 0 if self._has_self_subject(shape) else 1
            for prop in shape.type_properties + shape.properties:
                if prop.transient or is_self_path(prop.path):
                    continue
                sub = self._static_count(self.catalog.get(prop.value_shape))
                if sub is None:
                    return None
                total += sub
            return total
        raise UnsupportedShape(f"{shape.type} shape")

    def _count_expr(self, shape, value: str) -> str:
        """SQL int expr: blank nodes generated by this value."""
        static = self._static_count(shape)
        if static is not None:
            return str(static)
        if isinstance(shape, OptionalShape):
            inner = self._count_expr(self.catalog.get(shape.item_shape), value)
            return f"(CASE WHEN ({value}) IS NULL THEN 0 ELSE {inner} END)"
        if isinstance(shape, (SetShape, MapShape)):
            item = self.catalog.get(shape.item_shape)
            per = self._static_count(item)
            if per is None:
                raise UnsupportedShape(
                    "set/map items with data-dependent blank-node counts")
            return f"(coalesce(size({value}), 0) * {per})"
        if isinstance(shape, ListShape):
            item = self.catalog.get(shape.item_shape)
            per = self._static_count(item)
            if per is None:
                raise UnsupportedShape(
                    "list items with data-dependent blank-node counts")
            # items matched first (per each), then ONE "list" head node
            # when non-empty (pyflatten._ListMatch.__init__)
            return (f"(CASE WHEN ({value}) IS NULL OR size({value}) = 0 "
                    f"THEN 0 ELSE size({value}) * {per} + 1 END)")
        if isinstance(shape, RecordShape):
            parts = ["0" if self._has_self_subject(shape) else "1"]
            for prop in shape.type_properties + shape.properties:
                if prop.transient or is_self_path(prop.path):
                    continue
                parts.append(self._count_expr(
                    self.catalog.get(prop.value_shape),
                    f"({value}).{_q(prop.name)}"))
            return "(" + " + ".join(parts) + ")"
        raise UnsupportedShape(f"{shape.type} shape")

    # -- generate-phase blank-node counting -----------------------------
    # The interpreter's counter is ONE 1-indexed sequence shared by both
    # phases: every match-phase blank node (record subjects, list head
    # nodes) is numbered first, then generate-phase nodes (list TAIL
    # nodes, pyflatten._ListMatch.generate) continue from the total
    # match count in generation (= declaration DFS) order.

    def _static_gen_count(self, shape) -> Optional[int]:
        """Generate-phase blank nodes per instance when data-independent
        (today: only list tail nodes are generate-phase)."""
        if isinstance(shape, (ResourceShape, LiteralShape, AnyOfShape)):
            # anyOf variants are restricted to zero-bnode leaves by
            # _static_count, so no variant can hold a list
            return 0
        if isinstance(shape, OptionalShape):
            inner = self._static_gen_count(self.catalog.get(shape.item_shape))
            return 0 if inner == 0 else None
        if isinstance(shape, (SetShape, MapShape)):
            inner = self._static_gen_count(self.catalog.get(shape.item_shape))
            return 0 if inner == 0 else None
        if isinstance(shape, ListShape):
            return None
        if isinstance(shape, RecordShape):
            total = 0
            for prop in shape.type_properties + shape.properties:
                if is_self_path(prop.path):
                    continue
                sub = self._prop_gen_static(
                    prop, self.catalog.get(prop.value_shape))
                if sub is None:
                    return None
                total += sub
            return total
        raise UnsupportedShape(f"{shape.type} shape")

    def _gen_count_expr(self, shape, value: str) -> str:
        static = self._static_gen_count(shape)
        if static is not None:
            return str(static)
        if isinstance(shape, OptionalShape):
            inner = self._gen_count_expr(
                self.catalog.get(shape.item_shape), value)
            return f"(CASE WHEN ({value}) IS NULL THEN 0 ELSE {inner} END)"
        if isinstance(shape, ListShape):
            if self._static_gen_count(
                    self.catalog.get(shape.item_shape)) != 0:
                raise UnsupportedShape(
                    "list items generating tail-phase blank nodes")
            # n-1 tail nodes per non-empty list (last link is nil)
            return (f"(CASE WHEN ({value}) IS NULL OR size({value}) <= 1 "
                    f"THEN 0 ELSE size({value}) - 1 END)")
        if isinstance(shape, (SetShape, MapShape)):
            per = self._static_gen_count(self.catalog.get(shape.item_shape))
            if per is None:
                raise UnsupportedShape(
                    "set/map items with data-dependent generate-phase "
                    "blank-node counts")
            return f"(coalesce(size({value}), 0) * {per})"
        if isinstance(shape, RecordShape):
            parts = ["0"]
            for prop in shape.type_properties + shape.properties:
                if is_self_path(prop.path):
                    continue
                parts.append(self._prop_gen_expr(
                    prop, self.catalog.get(prop.value_shape),
                    f"({value}).{_q(prop.name)}"))
            return "(" + " + ".join(parts) + ")"
        raise UnsupportedShape(f"{shape.type} shape")

    # -- reference synthesis (synthesize.ts:55-198) ----------------------
    def _shape_ddl(self, sid: ShapeID) -> str:
        return shape_struct_type(self.catalog, sid).simpleString()

    def _synth_value_expr(self, sid: ShapeID, refs: dict) -> str:
        """SQL expr of the NATIVE value ``synthesizeShape`` rebuilds for
        ``sid`` from map key/value reference matches (``refs``: target
        shape key → (part, sql expr)); constants and empty-
        synthesizable shapes fill the remainder."""
        shape = self.catalog.get(sid)
        ref = refs.get(sid.key())
        if isinstance(shape, ResourceShape):
            if shape.keep_as_term or shape.vocabulary is not None:
                raise UnsupportedShape(
                    "synthesized keepAsTerm/vocabulary resource")
            if shape.value is not None:
                t = shape.value
                return s_str(t.value if t.kind == "iri"
                             else "_:" + t.value)
            if ref is not None:
                part, e = ref
                if part in (None, "value"):
                    return f"CAST({e} AS STRING)"
                raise UnsupportedShape(
                    f"resource synthesis from part {part!r}")
            raise UnsupportedShape("no matches to synthesize resource")
        if isinstance(shape, LiteralShape):
            if shape.keep_as_term:
                raise UnsupportedShape("synthesized keepAsTerm literal")
            if shape.value is not None:
                return _const_value_sql(shape.value)
            if ref is not None:
                part, e = ref
                if part is None:
                    return e
                if part == "value":
                    return f"CAST({e} AS {_leaf_ddl(shape)})"
                raise UnsupportedShape(
                    f"literal synthesis from part {part!r} with a "
                    f"static shape")
            raise UnsupportedShape("no matches to synthesize literal")
        if isinstance(shape, RecordShape):
            fields = []
            for p in list(shape.type_properties) + list(shape.properties):
                if p.transient:
                    continue  # re-synthesized from the shape at emission
                fields.append(
                    f"{s_str(p.name)}, "
                    f"{self._synth_value_expr(p.value_shape, refs)}")
            if not fields:
                raise UnsupportedShape(
                    "synthesized record with no readable properties")
            return "named_struct(" + ", ".join(fields) + ")"
        if isinstance(shape, SetShape):
            hi = shape.max_count if shape.max_count is not None \
                else (shape.min_count or 0)
            count = min(shape.min_count or 0, hi)
            if count == 0:
                return (f"CAST(array() AS "
                        f"array<{self._shape_ddl(shape.item_shape)}>)")
            item = self._synth_value_expr(shape.item_shape, refs)
            return "array(" + ", ".join([item] * count) + ")"
        if isinstance(shape, OptionalShape):
            return f"CAST(NULL AS {self._shape_ddl(shape.item_shape)})"
        if isinstance(shape, ListShape):
            return (f"CAST(array() AS "
                    f"array<{self._shape_ddl(shape.item_shape)}>)")
        if isinstance(shape, MapShape):
            return f"CAST(map() AS {self._shape_ddl(sid)})"
        raise UnsupportedShape(f"cannot synthesize {shape.type} shape")

    # -- emission -------------------------------------------------------
    def record_subject(self, shape: RecordShape, value: str,
                       counter: str) -> str:
        """Subject resolution (flatten.ts:203-217 + SubjectMemo,
        common.ts:116-138): a self-path resource property names the
        subject; otherwise the deterministic blank node ``counter``."""
        for prop in shape.type_properties + shape.properties:
            if is_self_path(prop.path) and not prop.transient:
                vshape = self.catalog.get(prop.value_shape)
                if isinstance(vshape, ResourceShape):
                    pv = f"({value}).{_q(prop.name)}"
                    if vshape.keep_as_term:
                        return _term_from_wrapper(pv)
                    if vshape.vocabulary is not None:
                        return _vocab_term(vshape, pv)
                    return _iri_or_bnode(pv)
        return self._bnode(shape, counter)

    def record_triples(self, shape: RecordShape, value: str, subj: str,
                       offset: str, gen_offset: str = "0") -> str:
        """array<triple> expr for one record instance whose children's
        match-phase blank-node counters start after ``offset`` and
        generate-phase counters (list tails) after ``gen_offset``."""
        parts: List[str] = []
        for prop in shape.type_properties + shape.properties:
            vshape = self.catalog.get(prop.value_shape)
            if prop.transient:
                # transient synthesis (flatten.ts:238-251): constants
                # emit; optional/set/map synthesize empty → no triples;
                # lists synthesize [] → the nil edge
                P = _path_bnode_count(prop.path)
                if isinstance(vshape, (ResourceShape, LiteralShape)) and \
                        vshape.value is not None:
                    parts.append(self.path_edges(
                        subj, _const_term(vshape.value), prop.path,
                        gen_offset, False, vshape.value.kind == "lit"))
                elif isinstance(vshape, (OptionalShape, SetShape,
                                         MapShape)):
                    continue
                elif isinstance(vshape, ListShape):
                    nil = _const_term(vshape.nil or Term("iri", RDF_NIL))
                    parts.append(self.path_edges(
                        subj, nil, prop.path, gen_offset, False, False))
                else:
                    raise UnsupportedShape(
                        f"transient property {prop.name} synthesis")
                if P:
                    gen_offset = f"({gen_offset} + {P})"
                continue
            if is_self_path(prop.path):
                continue  # the subject itself; no edge emitted
            pv = f"({value}).{_q(prop.name)}"
            parts.append(
                self.prop_triples(prop, vshape, pv, subj, offset, gen_offset))
            offset = f"({offset} + {self._count_expr(vshape, pv)})"
            adv = self._prop_gen_expr(prop, vshape, pv)
            if adv != "0":
                gen_offset = f"({gen_offset} + {adv})"
        if not parts:
            return EMPTY_TRIPLES
        return f"concat({', '.join(parts)})"

    def prop_triples(self, prop, vshape, pv: str, subj: str,
                     offset: str, gen_offset: str = "0") -> str:
        path = prop.path
        P = _path_bnode_count(path)
        optional = False
        if isinstance(vshape, OptionalShape):
            optional = True
            vshape = self.catalog.get(vshape.item_shape)
        if isinstance(vshape, (ResourceShape, LiteralShape)):
            one = self.path_edges(
                subj, _leaf_term(vshape, pv), path, gen_offset,
                False, isinstance(vshape, LiteralShape))
            if optional:
                return (f"CASE WHEN ({pv}) IS NULL THEN {EMPTY_TRIPLES} "
                        f"ELSE {one} END")
            return one
        if isinstance(vshape, SetShape):
            item = self.catalog.get(vshape.item_shape)
            if isinstance(item, (ResourceShape, LiteralShape)):
                x = self._var()
                item_gen = (f"({gen_offset} + {x}_i * {P})"
                            if P else gen_offset)
                body = self.path_edges(
                    subj, _leaf_term(item, x), path, item_gen,
                    False, isinstance(item, LiteralShape))
                arr = f"flatten(transform({pv}, ({x}, {x}_i) -> {body}))"
                return f"coalesce({arr}, {EMPTY_TRIPLES})"
            if isinstance(item, AnyOfShape):
                if P:
                    raise UnsupportedShape(
                        "anyOf value under a blank-node-generating path")
                self._static_count(item)  # raises unless zero-bnode
                x = self._var()
                body = self._anyof_edges(item, x, subj, path)
                arr = f"flatten(transform({pv}, {x} -> {body}))"
                return f"coalesce({arr}, {EMPTY_TRIPLES})"
            if isinstance(item, RecordShape):
                per = self._static_count(item)
                if per is None:
                    raise UnsupportedShape(
                        "set items with data-dependent blank-node counts")
                g = self._static_gen_count(item)
                if g is None:
                    raise UnsupportedShape(
                        "set items with data-dependent generate-phase "
                        "blank-node counts")
                x = self._var()
                # element i's blank nodes occupy
                # (offset + i*per, offset + (i+1)*per]; the element's own
                # subject counter comes LAST (children first).  Generate-
                # phase: per item, edge-path nodes (P) first, then the
                # item body's own (g) — stride P+g.
                elem_off = f"({offset} + {x}_i * {per})"
                subj_ctr = f"({elem_off} + {per})"
                child_subj = self.record_subject(item, x, subj_ctr)
                stride = P + g
                item_gen = (f"({gen_offset} + {x}_i * {stride})"
                            if stride else gen_offset)
                edge = self.path_edges(subj, child_subj, path, item_gen,
                                       False, False)
                body = self.record_triples(
                    item, x, child_subj, elem_off,
                    f"({item_gen} + {P})" if P else item_gen)
                arr = (f"flatten(transform({pv}, ({x}, {x}_i) -> "
                       f"concat({edge}, {body})))")
                return f"coalesce({arr}, {EMPTY_TRIPLES})"
            raise UnsupportedShape(f"set item shape {item.type}")
        if isinstance(vshape, MapShape):
            # flattenMap (flatten.ts:514-565): flatten each entry's item
            # value; entry order (JSON key order = frame's ord-sorted
            # assembly) fixes the per-entry blank-node counters exactly
            # like set elements
            if vshape.value is not None:
                # value-reference map: each entry stores only the
                # referenced part; rebuild the full item as a STATIC
                # struct expression over (key, value) — synthesizeShape
                # made relational (flatten.ts:533-543)
                item = self.catalog.get(vshape.item_shape)
                if not isinstance(item, RecordShape):
                    raise UnsupportedShape(
                        "map value reference on a non-record item")
                per = self._static_count(item)
                g = self._static_gen_count(item)
                if per is None or g is None:
                    raise UnsupportedShape(
                        "map items with data-dependent blank-node counts")
                x = self._var()
                refs = {
                    vshape.key.target.key():
                        (vshape.key.part, f"{x}.key"),
                    vshape.value.target.key():
                        (vshape.value.part, f"{x}.value"),
                }
                synth = self._synth_value_expr(vshape.item_shape, refs)
                elem_off = f"({offset} + {x}_i * {per})"
                subj_ctr = f"({elem_off} + {per})"
                child_subj = self.record_subject(item, synth, subj_ctr)
                stride = P + g
                item_gen = (f"({gen_offset} + {x}_i * {stride})"
                            if stride else gen_offset)
                edge = self.path_edges(subj, child_subj, path, item_gen,
                                       False, False)
                body = self.record_triples(
                    item, synth, child_subj, elem_off,
                    f"({item_gen} + {P})" if P else item_gen)
                arr = (f"flatten(transform(map_entries({pv}), "
                       f"({x}, {x}_i) -> concat({edge}, {body})))")
                return f"coalesce({arr}, {EMPTY_TRIPLES})"
            item = self.catalog.get(vshape.item_shape)
            if isinstance(item, (ResourceShape, LiteralShape)):
                x = self._var()
                item_gen = (f"({gen_offset} + {x}_i * {P})"
                            if P else gen_offset)
                body = self.path_edges(
                    subj, _leaf_term(item, f"{x}.value"), path, item_gen,
                    False, isinstance(item, LiteralShape))
                arr = (f"flatten(transform(map_entries({pv}), "
                       f"({x}, {x}_i) -> {body}))")
                return f"coalesce({arr}, {EMPTY_TRIPLES})"
            if isinstance(item, RecordShape):
                per = self._static_count(item)
                if per is None:
                    raise UnsupportedShape(
                        "map items with data-dependent blank-node counts")
                g = self._static_gen_count(item)
                if g is None:
                    raise UnsupportedShape(
                        "map items with data-dependent generate-phase "
                        "blank-node counts")
                x = self._var()
                elem_off = f"({offset} + {x}_i * {per})"
                subj_ctr = f"({elem_off} + {per})"
                child_subj = self.record_subject(item, f"{x}.value", subj_ctr)
                stride = P + g
                item_gen = (f"({gen_offset} + {x}_i * {stride})"
                            if stride else gen_offset)
                edge = self.path_edges(subj, child_subj, path, item_gen,
                                       False, False)
                body = self.record_triples(
                    item, f"{x}.value", child_subj, elem_off,
                    f"({item_gen} + {P})" if P else item_gen)
                arr = (f"flatten(transform(map_entries({pv}), "
                       f"({x}, {x}_i) -> concat({edge}, {body})))")
                return f"coalesce({arr}, {EMPTY_TRIPLES})"
            raise UnsupportedShape(f"map item shape {item.type}")
        if isinstance(vshape, AnyOfShape):
            if P:
                raise UnsupportedShape(
                    "anyOf value under a blank-node-generating path")
            self._static_count(vshape)  # raises unless zero-bnode
            body = self._anyof_edges(vshape, pv, subj, path)
            if optional:
                return (f"CASE WHEN ({pv}) IS NULL THEN {EMPTY_TRIPLES} "
                        f"ELSE {body} END")
            return body
        if isinstance(vshape, ListShape):
            return self._list_triples(prop, vshape, pv, subj, offset,
                                      gen_offset)
        if isinstance(vshape, RecordShape):
            own = self._count_expr(vshape, pv)
            subj_ctr = f"({offset} + {own})"  # children first, own last
            child_subj = self.record_subject(vshape, pv, subj_ctr)
            edge = self.path_edges(subj, child_subj, path, gen_offset,
                                   False, False)
            body = self.record_triples(
                vshape, pv, child_subj, offset,
                f"({gen_offset} + {P})" if P else gen_offset)
            full = f"concat({edge}, {body})"
            if optional:
                return (f"CASE WHEN ({pv}) IS NULL THEN {EMPTY_TRIPLES} "
                        f"ELSE {full} END")
            return full
        raise UnsupportedShape(f"property value shape {vshape.type}")


    # -- list (flatten.ts:470-512, pyflatten._ListMatch) ----------------
    def _list_triples(self, prop, vshape: ListShape, pv: str, subj: str,
                      offset: str, gen_offset: str) -> str:
        """head/tail chain emission, counter-exact vs the interpreter:

        * items are MATCHED first (``per`` match-phase bnodes each, in
          element order, from ``offset``), then the list's HEAD node is
          the next match-phase counter (``offset + n*per + 1``);
        * tail link nodes are GENERATE-phase: element i's successor node
          (i < n-1) takes counter ``gen_offset + i + 1``; the final link
          is ``nil``;
        * triple order per element: head edge (+ item record body), then
          the tail edge — exactly _ListMatch.generate.
        """
        item = self.catalog.get(vshape.item_shape)
        head = vshape.head_path or PredicatePath(RDF_FIRST)
        tail = vshape.tail_path or PredicatePath(RDF_REST)
        if _path_bnode_count(head) or _path_bnode_count(tail):
            raise UnsupportedShape(
                "list head/tail paths generating blank nodes")
        nil = _const_term(vshape.nil or Term("iri", RDF_NIL))
        n = f"size({pv})"
        x = self._var()
        i = f"{x}_i"
        # the property's own edge path consumes the first P generate
        # counters of a non-null list (one generate_path invocation
        # whether the list is empty or not); tail links follow
        P = _path_bnode_count(prop.path)
        go = f"({gen_offset} + {P})" if P else gen_offset

        class _ListNode:  # bnode prefix carrier for self._bnode
            type = "list"

        def list_bnode(ctr: str) -> str:
            return self._bnode(_ListNode, ctr)

        if isinstance(item, (ResourceShape, LiteralShape)):
            per = 0
        elif isinstance(item, RecordShape):
            per = self._static_count(item)
            if per is None:
                raise UnsupportedShape(
                    "list items with data-dependent blank-node counts")
            if self._static_gen_count(item) != 0:
                raise UnsupportedShape(
                    "list items generating tail-phase blank nodes")
        else:
            raise UnsupportedShape(f"list item shape {item.type}")

        head_ctr = f"({offset} + {n} * {per} + 1)"
        cur = (f"(CASE WHEN {i} = 0 THEN {list_bnode(head_ctr)} "
               f"ELSE {list_bnode(f'({go} + {i})')} END)")
        nxt = (f"(CASE WHEN {i} = {n} - 1 THEN {nil} "
               f"ELSE {list_bnode(f'({go} + {i} + 1)')} END)")
        tail_edge = self.path_edges(cur, nxt, tail, "0", False, False)
        if isinstance(item, (ResourceShape, LiteralShape)):
            head_edge = self.path_edges(
                cur, _leaf_term(item, x), head, "0",
                False, isinstance(item, LiteralShape))
            body = f"concat({head_edge}, {tail_edge})"
        else:
            elem_off = f"({offset} + {i} * {per})"
            subj_ctr = f"({elem_off} + {per})"
            child_subj = self.record_subject(item, x, subj_ctr)
            head_edge = self.path_edges(cur, child_subj, head, "0",
                                        False, False)
            child_body = self.record_triples(item, x, child_subj, elem_off)
            body = f"concat({head_edge}, {child_body}, {tail_edge})"

        arr = f"flatten(transform({pv}, ({x}, {i}) -> {body}))"
        first = list_bnode(head_ctr)
        prop_edge_full = self.path_edges(subj, first, prop.path,
                                         gen_offset, False, False)
        prop_edge_nil = self.path_edges(subj, nil, prop.path,
                                        gen_offset, False, False)
        nonempty = f"concat({prop_edge_full}, {arr})"
        return (f"(CASE WHEN ({pv}) IS NULL THEN {EMPTY_TRIPLES} "
                f"WHEN size({pv}) = 0 "
                f"THEN {prop_edge_nil} "
                f"ELSE {nonempty} END)")

    # -- anyOf over a VARIANT-typed value (flatten.ts:363-384) ----------
    _INT_SCHEMAS = "('TINYINT','SMALLINT','INT','BIGINT')"
    _WRAP_DDL = ("struct<`@term`:struct<kind:string,value:string,"
                 "dt:string,lang:string>>")

    def _term_variant_case(self, v, pv: str, subj: str, path) -> tuple:
        """(predicate, edges) for a keepAsTerm variant: the framed value
        is a {"@term": {...}} wrapper object — discriminate by casting
        the VARIANT to the wrapper struct and replaying matchesTerm
        (common.ts:21-92) over the decoded term."""
        from .frame import FrameEngine

        w = f"try_variant_get({pv}, '$', '{self._WRAP_DDL}')"
        term = f"(({w}).`@term`)"
        fail, _ = FrameEngine._s_node_checks(v, term)
        pred = (f"(schema_of_variant({pv}) LIKE 'OBJECT%' "
                f"AND ({term}).kind IS NOT NULL AND NOT {fail})")
        edges = self.path_edges(subj, term, path, "0", False,
                                isinstance(v, LiteralShape))
        return pred, edges

    def _variant_cases(self, shape: AnyOfShape, pv: str, subj: str,
                       path) -> List[tuple]:
        """(match_predicate, array<triple> expr) per variant, declared
        order — the first true predicate wins, replicating
        flattenAnyOf's first-match semantics.  Discrimination is by the
        VARIANT value's runtime JSON type (schema_of_variant), which is
        exactly the information the interpreter's per-variant
        ``flattenShape`` probe uses (string vs number vs boolean vs
        array)."""
        sov = f"schema_of_variant({pv})"
        out: List[tuple] = []
        for vid in shape.variants:
            v = self.catalog.get(vid)
            if isinstance(v, AnyOfShape):
                out.extend(self._variant_cases(v, pv, subj, path))
                continue
            if isinstance(v, LiteralShape):
                if v.keep_as_term:
                    out.append(self._term_variant_case(v, pv, subj, path))
                    continue
                dt = v.effective_datatype()
                if dt == XSD_BOOLEAN:
                    pred = f"({sov} = 'BOOLEAN')"
                    val = f"try_variant_get({pv}, '$', 'boolean')"
                elif dt in INTEGER_TYPES:
                    pred = f"({sov} IN {self._INT_SCHEMAS})"
                    val = f"try_variant_get({pv}, '$', 'bigint')"
                elif dt in FRACTIONAL_TYPES:
                    pred = (f"({sov} LIKE 'DECIMAL%' "
                            f"OR {sov} IN ('DOUBLE','FLOAT'))")
                    val = f"try_variant_get({pv}, '$', 'double')"
                elif dt == XSD_STRING or (dt == RDF_LANG_STRING
                                          and v.language):
                    pred = f"({sov} = 'STRING')"
                    val = f"CAST({pv} AS STRING)"
                else:
                    raise UnsupportedShape(f"literal datatype {dt}")
                if v.value is not None:
                    pred = (f"({pred} AND {val} = "
                            f"{_const_value_sql(v.value)})")
                out.append((pred, self.path_edges(
                    subj, _leaf_term(v, val), path, "0", False, True)))
            elif isinstance(v, ResourceShape):
                if v.keep_as_term:
                    out.append(self._term_variant_case(v, pv, subj, path))
                    continue
                if v.vocabulary is not None:
                    # the interpreter's variant probe THROWS (not
                    # "no match") on a string that is not a vocabulary
                    # key (value-mapping toRdf), so a first-match CASE
                    # cannot replicate the error semantics — interpreter
                    # fallback keeps them exact
                    raise UnsupportedShape("vocabulary variant")
                val = f"CAST({pv} AS STRING)"
                pred = f"({sov} = 'STRING')"
                if v.only_named:
                    pred = f"({pred} AND NOT startswith({val}, '_:'))"
                if v.value is not None:
                    pred = (f"({pred} AND {val} = "
                            f"{_const_value_sql(v.value)})")
                out.append((pred, self.path_edges(
                    subj, _iri_or_bnode(val), path, "0", False, False)))
            elif isinstance(v, SetShape):
                item = self.catalog.get(v.item_shape)
                if not isinstance(item, (ResourceShape, LiteralShape)) or (
                        isinstance(item, ResourceShape)
                        and item.vocabulary is not None):
                    raise UnsupportedShape("anyOf set-variant item")
                x = self._var()
                if item.keep_as_term:
                    arr = (f"try_variant_get({pv}, '$', "
                           f"'array<{self._WRAP_DDL}>')")
                    term = f"(({x}).`@term`)"
                    body = self.path_edges(
                        subj, term, path, "0",
                        False, isinstance(item, LiteralShape))
                else:
                    ddl = _leaf_ddl(item)
                    arr = f"try_variant_get({pv}, '$', 'array<{ddl}>')"
                    body = self.path_edges(
                        subj, _leaf_term(item, x), path, "0",
                        False, isinstance(item, LiteralShape))
                out.append((
                    f"({sov} LIKE 'ARRAY%')",
                    f"coalesce(flatten(transform({arr}, {x} -> {body})), "
                    f"{EMPTY_TRIPLES})",
                ))
            else:
                raise UnsupportedShape(f"anyOf variant shape {v.type}")
        return out

    def _anyof_edges(self, shape: AnyOfShape, pv: str, subj: str,
                     path) -> str:
        cases = self._variant_cases(shape, pv, subj, path)
        whens = " ".join(f"WHEN {p} THEN {e}" for p, e in cases)
        return f"(CASE {whens} ELSE {EMPTY_TRIPLES} END)"


def _leaf_ddl(shape) -> str:
    if isinstance(shape, ResourceShape):
        return "string"
    dt = shape.effective_datatype()
    if dt == XSD_BOOLEAN:
        return "boolean"
    if dt in INTEGER_TYPES:
        return "bigint"
    if dt in FRACTIONAL_TYPES:
        return "double"
    return "string"


def _const_value_sql(t: Term) -> str:
    if t.dt == XSD_BOOLEAN:
        return "true" if t.value != "false" else "false"
    if t.dt in INTEGER_TYPES:
        return str(int(t.value))
    if t.dt in FRACTIONAL_TYPES:
        return str(float(t.value))
    return s_str(t.value)


def _q(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def supports_shape(catalog: ShapeCatalog, root: ShapeID) -> bool:
    try:
        compile_flatten_exprs(catalog, root)
        return True
    except UnsupportedShape:
        return False


def compile_flatten_exprs(catalog: ShapeCatalog, root: ShapeID):
    """Returns (spark_schema, triples_array_expr) for ``root``.

    The expr references columns ``v`` (the parsed value struct) and
    ``seed`` (the per-row blank-node seed string)."""
    shape = catalog.get(root)
    if not isinstance(shape, RecordShape):
        raise UnsupportedShape("root must be a record shape")
    schema = shape_struct_type(catalog, root)
    comp = _Compiler(catalog, "seed")
    # the root's own blank node (when no self subject) is generated
    # AFTER all children (flatten.ts:203-217); generate-phase counters
    # (list tail nodes) continue after the FULL match-phase count
    own_ctr = comp._count_expr(shape, "v")
    subj = comp.record_subject(shape, "v", own_ctr)
    triples = comp.record_triples(shape, "v", subj, "0", own_ctr)
    return schema, triples


def flatten_relational(df: DataFrame, catalog: ShapeCatalog, root: ShapeID,
                       value_col: str = "value",
                       seed_col: Optional[str] = None) -> DataFrame:
    """Flatten every row's JSON value against ``root`` relationally.

    Output matches :func:`ramp_shapes_spark.flatten.flatten_df`'s
    success rows — (seed, tid, s, p, o), blank-node ids included — with
    tid the per-value emission index.  Raises :class:`UnsupportedShape`
    when ``root`` is outside the fragment; callers fall back to the
    interpreter path.
    """
    schema, triples_e = compile_flatten_exprs(catalog, root)
    if seed_col is None:
        df = df.withColumn("__seed", F.sha1(F.col(value_col)))
        seed_col = "__seed"
    parsed = df.select(
        F.col(seed_col).alias("seed"),
        F.from_json(F.col(value_col), schema).alias("v"),
    )
    out = parsed.select(
        "seed", F.posexplode(F.expr(triples_e)).alias("tid", "t"))
    return out.selectExpr("seed", "CAST(tid AS BIGINT) AS tid",
                          "t.s AS s", "t.p AS p", "t.o AS o")
