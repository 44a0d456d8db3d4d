"""``frame``: graph → typed records, compiled to DataFrame programs.

This is the distributed re-expression of the reference frame engine
(ramp-shapes ``src/frame.ts``).  The reference walks candidates with a
recursive lazy-generator interpreter; this engine *compiles* each shape
bottom-up into a relational program over a triples DataFrame:

* resource/literal shapes → column-predicate ``filter``s
  (frame.ts:496-517, common.ts:21-92),
* record property traversal → property-path equi-joins
  (frame.ts:361-388) + exactly-one enforcement via per-group counts
  (frame.ts:270-316),
* set/optional → ``collect_list`` aggregation / left-join-with-default
  (frame.ts:429-494),
* anyOf → tagged union of variant relations + anti-join for the
  unmatched set (frame.ts:390-427),
* recursive shapes → semi-naive global fixpoint (the memoization of
  frame.ts:228-236 becomes a shared per-shape match relation),
* cyclic *data* → residual-graph resolution emitting ``@ref``/``@use``
  reference ids exactly like the reference fixture encoding
  (frame.ts:111-127, 813-829; test/util.ts:22-57).

Framed values are carried as a JSON string column.  Rationale: shape
values are heterogeneous (anyOf unions mix scalars and arrays;
recursive shapes have unbounded depth), so no single Spark StructType
can hold every shape's value.  The JSON is assembled with JVM string
concatenation over ``to_json``-escaped fragments — all of it inside
whole-stage codegen; no Python UDF touches the match hot path.  For
homogeneous shapes :func:`ramp_shapes_spark.schema.shape_struct_type`
gives a typed projection via ``from_json``.

Errors are *data*, not exceptions (errors.ts:16-59): mismatching
candidates under a strict/type-gated context produce rows in an error
side-channel carrying the reference error code and the shape stack
(formatted like test/runner.ts:89-99 expects).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

from .dataset import all_candidate_terms
from .paths import eval_path
from .shapes import (
    AnyOfShape, ListShape, LiteralShape, MapShape, OptionalShape,
    PredicatePath, Property, RecordShape, ResourceShape, SetShape, Shape,
    ShapeCatalog, ShapeID, is_self_path,
)
from .sqlutil import (
    is_resource_col, json_quote_expr, jstr, n3_col, term_eq_const,
    term_json_col, term_key,
)
from .terms import (
    RDF_FIRST, RDF_LANG_STRING, RDF_NIL, RDF_REST, Term,
    XSD_BOOLEAN, XSD_STRING, INTEGER_TYPES, FRACTIONAL_TYPES,
)

# Reference error codes (errors.ts:16-59)
ERR_SHAPE_MISMATCH = 201
ERR_PROPERTY_MISMATCH = 202
ERR_NO_PROPERTY_MATCHES = 203
ERR_MULTIPLE_PROPERTY_MATCHES = 204
ERR_NON_RESOURCE_TERM = 205
ERR_MULTIPLE_LIST_HEAD = 206
ERR_NO_LIST_HEAD = 207
ERR_MULTIPLE_LIST_ITEM = 208
ERR_NO_LIST_ITEM = 209
ERR_MULTIPLE_LIST_TAIL = 210
ERR_NO_LIST_TAIL = 211
ERR_COMPOSITE_MAP_KEY = 212
ERR_CYCLIC_MATCH = 216
ERR_MIN_COUNT = 219
ERR_MAX_COUNT = 220
ERR_TERM_TYPE = 221
ERR_TERM_VALUE = 222
ERR_LITERAL_DATATYPE = 223
ERR_LITERAL_LANGUAGE = 224
ERR_VOCABULARY = 0  # reference throws a plain Error for vocabulary misses

_BIG_ORD = 2 ** 62

MATCH_FIELDS = "gid string, fkey string, focus struct<kind:string,value:string,dt:string,lang:string>, vkey string, ord long, value string"
MISMATCH_FIELDS = "gid string, fkey string, focus struct<kind:string,value:string,dt:string,lang:string>, ord long, gord long, code int, stack string"
ERROR_FIELDS = "code int, stack string, gord long, ord long, site long"


@dataclass
class Result:
    """Match relation of one shape evaluation site.

    ``matches``: (gid, fkey, focus, vkey, ord, value) — ``focus`` null
    for whole-group matches (sets, optional empty values); ``value``
    SQL-null encodes JS ``undefined`` (omitted record key).
    ``mismatches``: (gid, fkey, focus, ord, gord, code, stack) — the
    diagnostic each row carries is the error the reference would raise
    when evaluating this site under ``strict`` (the "replay" of
    frame.ts:390-427 / 471-494 made compile-time-static).
    """

    matches: DataFrame
    mismatches: DataFrame
    per_group: bool = False


@dataclass
class FrameResult:
    matches: DataFrame  # (focus TERM, ord long, value string)
    errors: DataFrame   # (code int, stack string, gord, ord, site)

    def first_error(self) -> Optional[Tuple[int, list]]:
        row = (
            self.errors.orderBy("gord", "ord", "site").limit(1).collect()
        )
        if not row:
            return None
        return row[0]["code"], json.loads(row[0]["stack"])


def _shape_display(shape: Shape) -> str:
    """Static stack-frame shape display (test/runner.ts:89-99)."""
    if shape.id.kind == "iri":
        return jstr(shape.id.value)
    return '{"type":%s}' % jstr(shape.type)


class FrameEngine:
    """Compiles shapes from a catalog into match relations over triples."""

    def __init__(self, spark: SparkSession, catalog: ShapeCatalog,
                 triples: DataFrame, max_fixpoint_iterations: int = 64,
                 max_list_length: int = 10_000) -> None:
        self.spark = spark
        # AQE re-plans every materialization; with this engine's many
        # small lineage-cut jobs that costs more than it saves and has
        # shown stage-scheduling stalls in local mode — disable at the
        # session level (runtime conf; engine results are identical)
        try:
            spark.conf.set("spark.sql.adaptive.enabled", "false")
        except Exception:
            pass
        self.catalog = catalog
        self.triples = triples
        self.recursive_ids = catalog.recursive_shape_ids()
        self.max_fixpoint_iterations = max_fixpoint_iterations
        self.max_list_length = max_list_length
        self._site = 0
        self._errors: List[DataFrame] = []
        self._suppress_errors = False
        self._fix: Dict[str, DataFrame] = {}
        self._fix_mode = False
        self._fix_done = False
        self._collectors: Dict[str, List[DataFrame]] = {}
        self._universe: Optional[DataFrame] = None

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def frame(self, root: ShapeID, strict: bool = False) -> FrameResult:
        """Frame all candidates of the dataset against ``root``.

        Equivalent of ``frame({shape, dataset})`` (frame.ts:36-61) with
        ``candidates`` defaulting to all subjects ∪ objects.

        The error channel is per-call: each invocation starts a fresh
        accumulator (one engine instance can frame several roots).
        """
        self._errors = []
        uni = self.universe()
        cand = uni.select(
            F.lit("r").alias("gid"),
            term_key(F.col("focus")).alias("fkey"),
            "focus", "ord",
            F.lit(None).cast("string").alias("refk"),
        )
        groups = self.spark.createDataFrame(
            [("r", 0, "", None)],
            "gid string, gord long, stk string, edge string",
        )
        res = self.compile(root, cand, groups, required=strict)
        matches = res.matches.select("focus", "ord", "value").orderBy("ord")
        errors = self._collect_errors()
        return FrameResult(matches=matches, errors=errors)

    def universe(self) -> DataFrame:
        if self._universe is None:
            self._universe = all_candidate_terms(self.triples).localCheckpoint(eager=True)
        return self._universe

    def _collect_errors(self) -> DataFrame:
        if not self._errors:
            return self.spark.createDataFrame([], ERROR_FIELDS)
        out = self._errors[0]
        for df in self._errors[1:]:
            out = out.unionAll(df)
        return out

    # ------------------------------------------------------------------
    # infrastructure
    # ------------------------------------------------------------------
    def _next_site(self) -> int:
        self._site += 1
        return self._site

    def _empty(self, schema: str) -> DataFrame:
        return self.spark.createDataFrame([], schema)

    def _emit(self, mismatches: DataFrame) -> None:
        if self._suppress_errors:
            return
        site = self._next_site()
        self._errors.append(
            mismatches.select(
                "code", "stack", "gord", "ord", F.lit(site).alias("site")
            )
        )

    @staticmethod
    def _stack_col(stk: Column, frame: Column) -> Column:
        return F.concat(
            F.lit("["),
            F.when(stk == "", frame).otherwise(F.concat(stk, F.lit(","), frame)),
            F.lit("]"),
        )

    @staticmethod
    def _frame_json(shape: Shape, edge: Column, focus: Optional[Column]) -> Column:
        """One stack frame ``{"shape":…, "edge":…, "focus":…}``.

        ``edge`` is the parent-provided JSON-encoded edge fragment
        column (nullable); ``focus`` a TERM column or None.
        """
        parts: List[Column] = [F.lit('{"shape":' + "")]
        base = F.concat(
            F.lit('{"shape":'), F.lit(_shape_display(shape)),
            F.when(edge.isNotNull(), F.concat(F.lit(',"edge":'), edge))
            .otherwise(F.lit("")),
        )
        if focus is not None:
            base = F.concat(
                base, F.lit(',"focus":'), json_quote_expr(n3_col(focus))
            )
        return F.concat(base, F.lit("}"))

    # ------------------------------------------------------------------
    # dispatch (frameShape, frame.ts:142-205)
    # ------------------------------------------------------------------
    def compile(self, sid: ShapeID, cand: DataFrame, groups: DataFrame,
                required: bool) -> Result:
        """Evaluate shape ``sid`` over per-site candidates.

        ``cand``: (gid, fkey, focus, ord, refk); ``groups``: (gid, gord,
        stk, edge, refk) — one row per evaluation group, ``stk`` is the
        ancestor stack prefix with dynamic foci already substituted,
        ``edge`` the JSON-encoded edge label for this shape's frame.
        """
        shape = self.catalog.get(sid)
        required = required and not shape.lenient

        if isinstance(shape, (RecordShape, ListShape)) and \
                sid.key() in self.recursive_ids:
            # recursion is cut at record/list shapes: sites join the
            # global fixpoint relation (inside the fixpoint loop this
            # reads the previous round's relation — semi-naive style)
            res = self._compile_recursive_site(shape, cand, groups)
        elif isinstance(shape, (ResourceShape, LiteralShape)):
            res = self._compile_node(shape, cand, groups)
        elif isinstance(shape, RecordShape):
            res = self._compile_record(shape, cand, groups, required)
        elif isinstance(shape, AnyOfShape):
            res = self._compile_anyof(shape, cand, groups, required)
        elif isinstance(shape, SetShape):
            res = self._compile_set(shape, cand, groups, required)
        elif isinstance(shape, OptionalShape):
            res = self._compile_optional(shape, cand, groups, required)
        elif isinstance(shape, ListShape):
            res = self._compile_list(shape, cand, groups, required)
        elif isinstance(shape, MapShape):
            res = self._compile_map(shape, cand, groups, required)
        else:
            raise TypeError(f"unknown shape {shape!r}")

        if shape.lenient:
            # lenient: mismatches are silently skipped, never errors,
            # even under strict (frame.ts:149,186-190)
            res = Result(res.matches, self._empty(MISMATCH_FIELDS), res.per_group)
        elif required:
            self._emit(res.mismatches)
        return res

    # ------------------------------------------------------------------
    # resource / literal (frameNode, frame.ts:496-517; common.ts:21-92)
    # ------------------------------------------------------------------
    @staticmethod
    def _node_checks(shape, f: Column) -> Tuple[Column, Column]:
        """matchesTerm (common.ts:21-92): (fail condition, first failing
        check's error code) as column expressions over a TERM ``f``."""
        checks: List[Tuple[Column, int]] = []
        if isinstance(shape, ResourceShape):
            checks.append((~is_resource_col(f), ERR_TERM_TYPE))
            if shape.only_named:
                checks.append((f["kind"] != "iri", ERR_TERM_TYPE))
        else:
            checks.append((f["kind"] != "lit", ERR_TERM_TYPE))
            if shape.datatype:
                checks.append((
                    F.coalesce(f["dt"], F.lit("")) != shape.datatype,
                    ERR_LITERAL_DATATYPE,
                ))
            if shape.language:
                checks.append((
                    F.coalesce(f["lang"], F.lit("")) != shape.language,
                    ERR_LITERAL_LANGUAGE,
                ))
        if shape.value is not None:
            checks.append((~term_eq_const(f, shape.value), ERR_TERM_VALUE))

        fail = F.lit(False)
        code = F.lit(None).cast("int")
        for cond, c in reversed(checks):
            code = F.when(cond, F.lit(c)).otherwise(code)
        for cond, _ in checks:
            fail = fail | cond
        return fail, code

    def _compile_node(self, shape, cand: DataFrame, groups: DataFrame) -> Result:
        f = F.col("focus")
        fail, code = self._node_checks(shape, f)

        matched = cand.filter(~fail)
        failed = cand.filter(fail).withColumn("code", code)

        # mismatch diagnostics (matchesTerm's first failing check)
        cg = failed.join(groups, "gid")
        frame = self._frame_json(shape, F.col("edge"), f)
        mismatches = cg.select(
            "gid", "fkey", "focus", "ord", "gord", "code",
            self._stack_col(F.col("stk"), frame).alias("stack"),
        )

        self._capture_refs(shape, matched)

        value = self._node_value_expr(shape, f)
        if isinstance(shape, ResourceShape) and shape.vocabulary is not None:
            vmap = F.create_map(
                *[F.lit(x) for kv in shape.vocabulary
                  for x in (kv[1].key(), kv[0])]
            )
            raw = F.element_at(vmap, term_key(f))
            with_v = matched.withColumn("__vv", raw)
            missed = with_v.filter(F.col("__vv").isNull())
            if not self._suppress_errors:
                mg = missed.join(groups, "gid")
                self._emit(mg.select(
                    "gid", "fkey", "focus", "ord", "gord",
                    F.lit(ERR_VOCABULARY).alias("code"),
                    self._stack_col(
                        F.col("stk"), self._frame_json(shape, F.col("edge"), f)
                    ).alias("stack"),
                ))
            matched = with_v.filter(F.col("__vv").isNotNull())
            value = json_quote_expr(F.col("__vv"))

        matches = matched.select(
            "gid", "fkey", "focus", F.lit("").alias("vkey"), "ord",
            value.alias("value"),
        )
        return Result(matches, mismatches, per_group=False)

    def _node_value_expr(self, shape, f: Column) -> Column:
        """ValueMapper.mapByDefault → JSON fragment (value-mapping.ts)."""
        if isinstance(shape, ResourceShape):
            if shape.keep_as_term or shape.vocabulary is not None:
                return term_json_col(f)
            return F.when(
                f["kind"] == "bnode",
                json_quote_expr(F.concat(F.lit("_:"), f["value"])),
            ).otherwise(json_quote_expr(f["value"]))
        # literal
        if shape.keep_as_term:
            return term_json_col(f)
        dt = shape.effective_datatype()
        if dt == XSD_STRING:
            return json_quote_expr(f["value"])
        if dt == RDF_LANG_STRING and shape.language:
            return json_quote_expr(f["value"])
        if dt == XSD_BOOLEAN:
            return F.when(f["value"] != "false", F.lit("true")).otherwise(F.lit("false"))
        if dt in INTEGER_TYPES:
            return f["value"].cast(LongType()).cast(StringType())
        if dt in FRACTIONAL_TYPES:
            return f["value"].cast("double").cast(StringType())
        # no datatype / unconvertible datatype: value stays a term
        return term_json_col(f)

    # ------------------------------------------------------------------
    # record (frameRecord + frameProperties, frame.ts:207-316)
    # ------------------------------------------------------------------
    def subject_props(self) -> DataFrame:
        """Per-subject gathered property map: skey → map<pred,
        array<struct<tid,o>>> — the relational analog of the
        reference's SP hash index (rdf-dataset.ts:44-50), computed with
        ONE two-level aggregation for the whole engine.  Leaf-valued
        record properties evaluate against this map as pure codegen
        array expressions (zero joins per property)."""
        if getattr(self, "_sp_gather", None) is None:
            by_p = self.triples.groupBy(
                term_key(F.col("s")).alias("skey"), "p"
            ).agg(F.collect_list(F.struct("tid", "o")).alias("objs"))
            self._sp_gather = by_p.groupBy("skey").agg(
                F.map_from_entries(
                    F.collect_list(F.struct("p", "objs"))
                ).alias("__pmap")
            ).localCheckpoint(eager=False)
        return self._sp_gather

    def _fast_kind(self, prop: Property) -> Optional[Tuple[str, Shape, Shape]]:
        """Classify a property for the gathered fast path.

        Returns (kind, wrapper_shape, leaf_shape) with kind in
        {'plain', 'optional', 'set'} when the property is a
        forward-predicate (or self) path whose value is a leaf
        resource/literal shape — optionally under Optional/Set — and
        no ref collector targets it; None → general join path.
        """
        if not (isinstance(prop.path, PredicatePath) or is_self_path(prop.path)):
            return None

        def leaf_ok(sid) -> Optional[Shape]:
            s = self.catalog.get(sid)
            if not isinstance(s, (ResourceShape, LiteralShape)):
                return None
            if isinstance(s, ResourceShape) and s.vocabulary is not None:
                return None  # vocabulary misses need the error channel
            if sid.key() in self._collectors:
                return None  # computed-property reference capture
            return s

        direct = leaf_ok(prop.value_shape)
        if direct is not None:
            return ("plain", direct, direct)
        wrapper = self.catalog.get(prop.value_shape)
        if isinstance(wrapper, (OptionalShape, SetShape)) and \
                not is_self_path(prop.path):
            leaf = leaf_ok(wrapper.item_shape)
            if leaf is not None:
                kind = "optional" if isinstance(wrapper, OptionalShape) else "set"
                return (kind, wrapper, leaf)
        return None

    def _fast_stat(self, prop: Property, kind: str, wrapper: Shape,
                   leaf: Shape, cstk: Column) -> Column:
        """Property stat struct (ok, value, fcode, fstack) computed as
        array expressions over the gathered ``__pmap`` column —
        replicates _eval_property + leaf/optional/set semantics with
        zero joins."""
        if is_self_path(prop.path):
            objs = F.array(F.struct(F.col("ord").alias("tid"),
                                    F.col("focus").alias("o")))
        else:
            objs = F.coalesce(
                F.try_element_at(F.col("__pmap"), F.lit(prop.path.predicate)),
                F.array().cast(
                    "array<struct<tid:bigint,"
                    "o:struct<kind:string,value:string,dt:string,lang:string>>>"
                ),
            )
        objs = F.array_sort(objs)  # dataset order (tid is first field)

        def fail_of(x):
            cond, _ = self._node_checks(leaf, x["o"])
            return cond

        def code_of(x):
            _, code = self._node_checks(leaf, x["o"])
            return code

        matched = F.filter(objs, lambda x: ~fail_of(x))
        if leaf.lenient:
            # lenient leaf: mismatching candidates silently skipped
            failed = F.array().cast(
                "array<struct<tid:bigint,"
                "o:struct<kind:string,value:string,dt:string,lang:string>>>"
            )
        else:
            failed = F.filter(objs, fail_of)
        n = F.size(matched)
        first_m = F.try_element_at(matched, F.lit(1))
        second_tid = F.try_element_at(matched, F.lit(2))["tid"]
        fb = F.try_element_at(failed, F.lit(1))

        def leaf_frame(term: Column, with_edge: bool) -> Column:
            base = F.concat(
                F.lit('{"shape":' + _shape_display(leaf)),
                F.lit(',"edge":' + jstr(prop.name)) if with_edge else F.lit(""),
                F.lit(',"focus":'), json_quote_expr(n3_col(term)), F.lit("}"),
            )
            return base

        rec_stack = F.concat(F.lit("["), cstk, F.lit("]"))

        if kind == "plain":
            mism_first = fb.isNotNull() & ((n < 2) | (fb["tid"] < second_tid))
            ok = fb.isNull() & (n == 1)
            value = F.when(n == 1, self._node_value_expr(leaf, first_m["o"]))
            fcode = (
                F.when(mism_first, code_of(fb))
                .when(n == 0, F.lit(ERR_NO_PROPERTY_MATCHES))
                .when(n >= 2, F.lit(ERR_MULTIPLE_PROPERTY_MATCHES))
            )
            fstack = F.when(
                mism_first,
                F.concat(F.lit("["), cstk, F.lit(","),
                         leaf_frame(fb["o"], True), F.lit("]")),
            ).otherwise(rec_stack)
        elif kind == "optional":
            oframe = F.lit(
                '{"shape":{"type":"optional"},"edge":' + jstr(prop.name) + '}'
            )
            mism = F.lit(False) if wrapper.lenient else fb.isNotNull()
            mism_first = mism & ((n < 2) | (fb["tid"] < second_tid))
            ok = (n <= 1) & (F.lit(wrapper.lenient) | fb.isNull())
            value = F.when(n == 1, self._node_value_expr(leaf, first_m["o"]))
            if wrapper.empty_is_null:
                value = F.coalesce(value, F.lit("null"))
            fcode = (
                F.when(mism_first, code_of(fb))
                .when(n >= 2, F.lit(ERR_MULTIPLE_PROPERTY_MATCHES))
            )
            fstack = F.when(
                mism_first,
                F.concat(F.lit("["), cstk, F.lit(","), oframe, F.lit(","),
                         leaf_frame(fb["o"], False), F.lit("]")),
            ).otherwise(rec_stack)
        else:  # set
            sframe = F.lit(
                '{"shape":{"type":"set"},"edge":' + jstr(prop.name) + '}'
            )
            min_c = wrapper.min_count or 0
            max_c = wrapper.max_count
            bounds_ok = (n >= min_c) & (
                F.lit(True) if max_c is None else (n <= max_c)
            )
            inner_ok = fb.isNull() & bounds_ok
            ok = inner_ok
            value = F.when(
                inner_ok,
                F.concat(
                    F.lit("["),
                    F.array_join(
                        F.transform(
                            matched,
                            lambda x: self._node_value_expr(leaf, x["o"]),
                        ), ",",
                    ),
                    F.lit("]"),
                ),
            )
            if wrapper.lenient:
                # lenient set: a failing set yields nothing → the
                # property has no matches (code 203 at the record frame)
                fcode = F.when(~inner_ok, F.lit(ERR_NO_PROPERTY_MATCHES))
                fstack = rec_stack
            else:
                fcode = (
                    F.when(fb.isNotNull(), code_of(fb))
                    .when(n < min_c, F.lit(ERR_MIN_COUNT))
                    .otherwise(F.when(
                        F.lit(max_c is not None) & (n > (max_c or 0)),
                        F.lit(ERR_MAX_COUNT)))
                )
                fstack = F.when(
                    fb.isNotNull(),
                    F.concat(F.lit("["), cstk, F.lit(","), sframe, F.lit(","),
                             leaf_frame(fb["o"], False), F.lit("]")),
                ).otherwise(
                    F.concat(F.lit("["), cstk, F.lit(","), sframe, F.lit("]"))
                )
        return F.struct(
            ok.alias("ok"), value.cast("string").alias("value"),
            fcode.cast("int").alias("fcode"), fstack.alias("fstack"),
        )

    def _compile_record(self, shape: RecordShape, cand: DataFrame,
                        groups: DataFrame, required: bool) -> Result:
        site = self._next_site()
        c = cand.join(groups, "gid")
        f = F.col("focus")
        own_frame = self._frame_json(shape, F.col("edge"), f)
        cstk = F.when(F.col("stk") == "", own_frame).otherwise(
            F.concat(F.col("stk"), F.lit(","), own_frame)
        )

        nonres = c.filter(~is_resource_col(f)).select(
            "gid", "fkey", "focus", "ord", "gord",
            F.lit(ERR_NON_RESOURCE_TERM).alias("code"),
            F.concat(F.lit("["), cstk, F.lit("]")).alias("stack"),
        )

        rc = c.filter(is_resource_col(f)).select(
            "gid", "fkey", "focus", "ord", "gord", "refk",
            cstk.alias("cstk"),
            F.md5(F.concat_ws("\x1e", F.col("gid"), F.col("fkey"),
                              F.lit(str(site)))).alias("ckey"),
        )

        collecting = bool(shape.computed_properties)
        if collecting:
            rc = rc.withColumn("refk", F.col("ckey"))
            self._activate_collectors(shape)

        # classify properties: gathered fast path vs general join path
        fast_t = [self._fast_kind(p) for p in shape.type_properties]
        fast_r = [self._fast_kind(p) for p in shape.properties]
        needs_gather = any(x is not None for x in fast_t + fast_r)
        if needs_gather:
            sp = self.subject_props().withColumnRenamed("skey", "__sk")
            rc = rc.join(sp, F.col("fkey") == F.col("__sk"), "left") \
                .drop("__sk")
        rc = rc.localCheckpoint(eager=False)
        gated = required or bool(shape.type_properties)
        cstk_rc = F.col("cstk")

        # --- type properties (the gate, frame.ts:248-253)
        gate_ok = rc
        gate_fail_diag: Optional[DataFrame] = None
        tstats: List[Tuple[Property, object]] = []
        fast_gate_conds: List[Column] = []
        slow_gate_fail: List[DataFrame] = []
        for prop, fk in zip(shape.type_properties, fast_t):
            if fk is not None:
                st = self._fast_stat(prop, fk[0], fk[1], fk[2], cstk_rc)
                tstats.append((prop, ("fast", st)))
                fast_gate_conds.append(st)
            else:
                pdf = self._eval_property(rc, prop, required)
                tstats.append((prop, ("slow", pdf)))
                slow_gate_fail.append(pdf)
        if fast_gate_conds:
            cond = F.lit(True)
            for st in fast_gate_conds:
                cond = cond & st["ok"]
            gate_ok = gate_ok.filter(cond)
        for prop, entry in tstats:
            if entry[0] == "slow":
                pdf = entry[1]
                gate_ok = gate_ok.join(
                    pdf.filter(F.col("ok")).select(
                        F.col("ckey").alias("__gck")),
                    F.col("ckey") == F.col("__gck"), "left_semi",
                )

        # gate-failure diagnostics: first failing type property in
        # declaration order (fast conds inline; slow via join)
        if shape.type_properties:
            gf_code = F.lit(None).cast("int")
            gf_stack = F.lit(None).cast("string")
            gfail = rc
            for i, (prop, entry) in enumerate(tstats):
                if entry[0] == "fast":
                    st = entry[1]
                    gf_code = F.when(gf_code.isNotNull(), gf_code) \
                        .otherwise(F.when(~st["ok"], st["fcode"]))
                    gf_stack = F.when(gf_stack.isNotNull(), gf_stack) \
                        .otherwise(F.when(~st["ok"], st["fstack"]))
                else:
                    pdf = entry[1].select(
                        F.col("ckey").alias(f"__gk{i}"),
                        F.col("ok").alias(f"__go{i}"),
                        F.col("fcode").alias(f"__gc{i}"),
                        F.col("fstack").alias(f"__gs{i}"),
                    )
                    gfail = gfail.join(
                        pdf, F.col("ckey") == F.col(f"__gk{i}"), "left")
                    bad = ~F.coalesce(F.col(f"__go{i}"), F.lit(False))
                    gf_code = F.when(gf_code.isNotNull(), gf_code) \
                        .otherwise(F.when(bad, F.col(f"__gc{i}")))
                    gf_stack = F.when(gf_stack.isNotNull(), gf_stack) \
                        .otherwise(F.when(bad, F.col(f"__gs{i}")))
            gate_fail_diag = gfail.withColumn("__gfc", gf_code) \
                .withColumn("__gfs", gf_stack) \
                .filter(F.col("__gfc").isNotNull()) \
                .select("gid", "fkey", "focus", "ord", "gord",
                        F.col("__gfc").alias("code"),
                        F.col("__gfs").alias("stack"))

        if any(e[0] == "slow" for _, e in tstats):
            gate_ok = gate_ok.localCheckpoint(eager=False)

        # --- regular properties (strict once the gate matched)
        site_required = required or bool(shape.type_properties)
        rstats: List[Tuple[Property, object]] = []
        for prop, fk in zip(shape.properties, fast_r):
            if fk is not None:
                rstats.append((prop, ("fast", self._fast_stat(
                    prop, fk[0], fk[1], fk[2], cstk_rc))))
            else:
                pdf = self._eval_property(gate_ok, prop, site_required)
                rstats.append((prop, ("slow", pdf)))

        # fold: slow stats union into one map join; fast stats inline
        all_stats = tstats + rstats
        slow_entries = [(i, e[1]) for i, (_, e) in enumerate(all_stats)
                        if e[0] == "slow"]
        acc = gate_ok
        if slow_entries:
            stats = None
            for i, pdf in slow_entries:
                tagged = pdf.select(
                    "ckey", F.lit(i).alias("pidx"),
                    F.struct("ok", "value", "fcode", "fstack").alias("st"),
                )
                stats = tagged if stats is None else stats.unionAll(tagged)
            agg = stats.groupBy("ckey").agg(
                F.map_from_entries(
                    F.collect_list(F.struct("pidx", "st"))
                ).alias("__pm")
            ).withColumnRenamed("ckey", "__pmk")
            acc = gate_ok.join(agg, F.col("ckey") == F.col("__pmk"), "left")

        frags: List[Column] = []
        ok_all = F.lit(True)
        fail_code = F.lit(None).cast("int")
        fail_stack = F.lit(None).cast("string")
        for i, (prop, entry) in enumerate(all_stats):
            if entry[0] == "fast":
                st = entry[1]
                oki = st["ok"]
            else:
                st = F.try_element_at(F.col("__pm"), F.lit(i))
                oki = F.coalesce(st["ok"], F.lit(False))
            ok_all = ok_all & oki
            fail_code = F.when(
                fail_code.isNotNull(), fail_code
            ).otherwise(F.when(~oki, st["fcode"]))
            fail_stack = F.when(
                fail_stack.isNotNull(), fail_stack
            ).otherwise(F.when(~oki, st["fstack"]))
            if not prop.transient:
                frags.append(
                    F.when(
                        st["value"].isNotNull(),
                        F.concat(F.lit(jstr(prop.name) + ":"), st["value"]),
                    )
                )

        # computed properties (frame.ts:324-359, synthesize.ts:55-223)
        if collecting:
            acc, cfrags = self._computed_fragments(shape, acc)
            frags.extend(cfrags)
            self._deactivate_collectors(shape)

        value = F.concat(F.lit("{"), F.concat_ws(",", *frags) if frags else F.lit(""), F.lit("}"))
        matches = acc.filter(ok_all).select(
            "gid", "fkey", "focus", F.lit("").alias("vkey"), "ord",
            value.alias("value"),
        )

        # property failures of gate-passing candidates: unconditional
        # errors when gated (strictByType, frame.ts:248-253); plain
        # mismatches otherwise
        prop_fail = acc.filter(~ok_all).select(
            "gid", "fkey", "focus", "ord", "gord",
            F.col("ckey"),
            fail_code.alias("code"), fail_stack.alias("stack"),
        )
        if gated and not required and not self._suppress_errors:
            # (when required, the dispatch wrapper emits mismatches)
            self._emit(prop_fail.select("gid", "fkey", "focus", "ord",
                                        "gord", "code", "stack"))

        mism = nonres
        if gate_fail_diag is not None:
            mism = mism.unionAll(gate_fail_diag)
        mism = mism.unionAll(
            prop_fail.select("gid", "fkey", "focus", "ord", "gord",
                             "code", "stack")
        )
        return Result(matches, mism, per_group=False)

    def _eval_property(self, rc: DataFrame, prop: Property,
                       required: bool) -> DataFrame:
        """One property site: path join + exactly-one enforcement.

        Returns one row per record candidate: (ckey, ok, value, fcode,
        fstack, ford).
        """
        psite = self._next_site()
        childgid = F.md5(F.concat_ws("\x1e", F.col("ckey"), F.lit(str(psite))))

        src = rc.select(
            "ckey", F.col("focus").alias("node"), F.col("ord").alias("tord")
        )
        pout = eval_path(prop.path, src, ["ckey"], self.triples)

        meta = rc.select(
            "ckey", childgid.alias("cgid"), F.col("ord").alias("pord"),
            F.col("gord").alias("pgord"), F.col("cstk").alias("pstk"),
            F.col("refk").alias("prefk"),
        )
        childcand = pout.join(meta, "ckey").select(
            F.col("cgid").alias("gid"),
            term_key(F.col("node")).alias("fkey"),
            F.col("node").alias("focus"),
            F.col("tord").alias("ord"),
            F.col("prefk").alias("refk"),
        )
        childgroups = meta.select(
            F.col("cgid").alias("gid"), F.col("pgord").alias("gord"),
            F.col("pstk").alias("stk"),
            F.lit(jstr(prop.name)).alias("edge"),
        )
        cres = self.compile(prop.value_shape, childcand, childgroups, required)

        # one aggregation over the union of matches (is_m=1) and
        # mismatches (is_m=0) — halves the shuffle/analysis cost of the
        # per-property fold
        munion = cres.matches.select(
            "gid", F.lit(True).alias("is_m"), "ord", "value",
            F.lit(None).cast("int").alias("code"),
            F.lit(None).cast("string").alias("stack"),
        ).unionAll(cres.mismatches.select(
            "gid", F.lit(False).alias("is_m"), "ord",
            F.lit(None).cast("string").alias("value"), "code", "stack",
        ))
        magg = munion.groupBy("gid").agg(
            F.count(F.when(F.col("is_m"), 1)).alias("n"),
            F.min(F.when(F.col("is_m"), F.struct("ord", "value"))).alias("first_m"),
            F.try_element_at(
                F.array_sort(
                    F.collect_list(F.when(F.col("is_m"), F.struct("ord")))
                ), F.lit(2)
            ).alias("second_m"),
            F.min(F.when(~F.col("is_m"),
                         F.struct("ord", "code", "stack"))).alias("fm"),
        ).withColumnRenamed("gid", "__mg")
        out = meta.join(magg, F.col("cgid") == F.col("__mg"), "left")
        n = F.coalesce(F.col("n"), F.lit(0))
        fm = F.col("fm")
        second_ord = F.col("second_m")["ord"]
        rec_stack = F.concat(F.lit("["), F.col("pstk"), F.lit("]"))
        mismatch_first = fm.isNotNull() & (
            (n < 2) | (fm["ord"] < second_ord)
        )
        ok = fm.isNull() & (n == 1)
        fcode = (
            F.when(mismatch_first, fm["code"])
            .when(n == 0, F.lit(ERR_NO_PROPERTY_MATCHES))
            .when(n >= 2, F.lit(ERR_MULTIPLE_PROPERTY_MATCHES))
        )
        fstack = (
            F.when(mismatch_first, fm["stack"])
            .when(n == 0, rec_stack)
            .when(n >= 2, rec_stack)
        )
        ford = (
            F.when(mismatch_first, fm["ord"])
            .when(n == 0, F.lit(_BIG_ORD))
            .otherwise(second_ord)
        )
        return out.select(
            "ckey", ok.alias("ok"), F.col("first_m")["value"].alias("value"),
            fcode.alias("fcode"), fstack.alias("fstack"), ford.alias("ford"),
        )

    # ------------------------------------------------------------------
    # anyOf (frameAnyOf, frame.ts:390-427)
    # ------------------------------------------------------------------
    def _compile_anyof(self, shape: AnyOfShape, cand: DataFrame,
                       groups: DataFrame, required: bool) -> Result:
        own_frame = self._frame_json(shape, F.col("edge"), None)
        groups2 = groups.select(
            "gid", "gord",
            F.when(F.col("stk") == "", own_frame)
            .otherwise(F.concat(F.col("stk"), F.lit(","), own_frame)).alias("stk"),
            F.lit(None).cast("string").alias("edge"),
        )
        vres: List[Result] = []
        tagged: List[DataFrame] = []
        for i, vid in enumerate(shape.variants):
            r = self.compile(vid, cand, groups2, required=False)
            vres.append(r)
            tagged.append(
                r.matches.withColumn(
                    "vkey",
                    F.when(
                        F.col("vkey") == "",
                        F.lit(f"{i:04d}"),
                    ).otherwise(F.concat(F.lit(f"{i:04d}."), F.col("vkey"))),
                )
            )
        matches = tagged[0]
        for t in tagged[1:]:
            matches = matches.unionAll(t)

        covered_gids = matches.filter(F.col("fkey").isNull()).select("gid").distinct()
        percand = matches.filter(F.col("fkey").isNotNull()).select("gid", "fkey").distinct()
        unmatched = (
            cand.join(percand, ["gid", "fkey"], "left_anti")
            .join(covered_gids, "gid", "left_anti")
        )

        # diagnostic: the replay error = first variant's failure
        # (frame.ts:415-422)
        v0 = vres[0]
        if v0.per_group:
            diag = v0.mismatches.select(
                "gid", F.col("code").alias("dcode"), F.col("stack").alias("dstack")
            )
            um = unmatched.join(diag, "gid", "left")
        else:
            diag = v0.mismatches.select(
                "gid", "fkey", F.col("code").alias("dcode"),
                F.col("stack").alias("dstack"),
            )
            um = unmatched.join(diag, ["gid", "fkey"], "left")
        umg = um.join(groups2.select("gid", "gord", "stk"), "gid")
        mism = umg.select(
            "gid", "fkey", "focus", "ord", "gord",
            F.coalesce(F.col("dcode"), F.lit(ERR_SHAPE_MISMATCH)).alias("code"),
            F.coalesce(
                F.col("dstack"), F.concat(F.lit("["), F.col("stk"), F.lit("]"))
            ).alias("stack"),
        )
        return Result(matches, mism, per_group=False)

    # ------------------------------------------------------------------
    # set (frameSet, frame.ts:429-469)
    # ------------------------------------------------------------------
    def _compile_set(self, shape: SetShape, cand: DataFrame,
                     groups: DataFrame, required: bool) -> Result:
        own_frame = self._frame_json(shape, F.col("edge"), None)
        stk2 = F.when(F.col("stk") == "", own_frame).otherwise(
            F.concat(F.col("stk"), F.lit(","), own_frame)
        )
        groups2 = groups.select(
            "gid", "gord", stk2.alias("stk"),
            F.lit(None).cast("string").alias("edge"),
        )
        ires = self.compile(shape.item_shape, cand, groups2, required)

        magg = ires.matches.groupBy("gid").agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ord").alias("mord"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("vkey", "ord", "value"))),
                    lambda x: F.coalesce(x["value"], F.lit("null")),
                ),
                ",",
            ).alias("items"),
        )
        mmagg = ires.mismatches.groupBy("gid").agg(
            F.min(F.struct("ord", "code", "stack")).alias("fm"),
        )
        base = groups2.select(
            "gid", "gord",
            F.concat(F.lit("["), F.col("stk"), F.lit("]")).alias("setstack"),
        )
        out = base.join(magg, "gid", "left").join(mmagg, "gid", "left")
        n = F.coalesce(F.col("n"), F.lit(0))
        fm = F.col("fm")
        min_c = shape.min_count or 0
        max_c = shape.max_count if shape.max_count is not None else None

        ok = fm.isNull() & (n >= min_c)
        if max_c is not None:
            ok = ok & (n <= max_c)

        matches = out.filter(ok).select(
            "gid", F.lit(None).cast("string").alias("fkey"),
            F.lit(None).cast(
                "struct<kind:string,value:string,dt:string,lang:string>"
            ).alias("focus"),
            F.lit("").alias("vkey"),
            F.coalesce(F.col("mord"), F.col("gord")).alias("ord"),
            F.concat(F.lit("["), F.coalesce(F.col("items"), F.lit("")), F.lit("]")).alias("value"),
        )

        mism_inherit = out.filter(fm.isNotNull()).select(
            "gid", F.lit(None).cast("string").alias("fkey"),
            F.lit(None).cast(
                "struct<kind:string,value:string,dt:string,lang:string>"
            ).alias("focus"),
            fm["ord"].alias("ord"), "gord",
            fm["code"].alias("code"), fm["stack"].alias("stack"),
        )
        count_conds = [(fm.isNull() & (n < min_c), ERR_MIN_COUNT)]
        if max_c is not None:
            count_conds.append((fm.isNull() & (n > max_c), ERR_MAX_COUNT))
        mism = mism_inherit
        for cond, code in count_conds:
            mism = mism.unionAll(
                out.filter(cond).select(
                    "gid", F.lit(None).cast("string").alias("fkey"),
                    F.lit(None).cast(
                        "struct<kind:string,value:string,dt:string,lang:string>"
                    ).alias("focus"),
                    F.col("gord").alias("ord"), "gord",
                    F.lit(code).alias("code"), F.col("setstack").alias("stack"),
                )
            )
        return Result(matches, mism, per_group=True)

    # ------------------------------------------------------------------
    # optional (frameOptional, frame.ts:471-494)
    # ------------------------------------------------------------------
    def _compile_optional(self, shape: OptionalShape, cand: DataFrame,
                          groups: DataFrame, required: bool) -> Result:
        own_frame = self._frame_json(shape, F.col("edge"), None)
        stk2 = F.when(F.col("stk") == "", own_frame).otherwise(
            F.concat(F.col("stk"), F.lit(","), own_frame)
        )
        groups2 = groups.select(
            "gid", "gord", stk2.alias("stk"),
            F.lit(None).cast("string").alias("edge"),
        )
        # item framed non-strict; under a strict context the replay
        # (frame.ts:477-486) surfaces the diagnostics, which the
        # dispatch wrapper emits from our pass-through mismatches
        ires = self.compile(shape.item_shape, cand, groups2, required=False)

        has_match = ires.matches.select("gid").distinct()
        empty_value = (
            F.lit("null").alias("value") if shape.empty_is_null
            else F.lit(None).cast("string").alias("value")
        )
        empties = groups.join(has_match, "gid", "left_anti").select(
            "gid", F.lit(None).cast("string").alias("fkey"),
            F.lit(None).cast(
                "struct<kind:string,value:string,dt:string,lang:string>"
            ).alias("focus"),
            F.lit("").alias("vkey"),
            F.lit(_BIG_ORD).alias("ord"),
            empty_value,
        )
        matches = ires.matches.unionAll(empties)
        return Result(matches, ires.mismatches, per_group=False)

    # ------------------------------------------------------------------
    # recursive shapes: site join against the global fixpoint relation
    # ------------------------------------------------------------------
    def _compile_recursive_site(self, shape, cand: DataFrame,
                                groups: DataFrame) -> Result:
        gm = self._fixpoint_matches(shape.id)
        matches = cand.join(gm.select("fkey", F.col("value").alias("__gv")),
                            "fkey").select(
            "gid", "fkey", "focus", F.lit("").alias("vkey"), "ord",
            F.col("__gv").alias("value"),
        )
        cg = cand.join(gm.select("fkey"), "fkey", "left_anti").join(groups, "gid")
        frame = self._frame_json(shape, F.col("edge"), F.col("focus"))
        mism = cg.select(
            "gid", "fkey", "focus", "ord", "gord",
            F.lit(ERR_SHAPE_MISMATCH).alias("code"),
            self._stack_col(F.col("stk"), frame).alias("stack"),
        )
        return Result(matches, mism, per_group=False)

    def _fixpoint_matches(self, sid: ShapeID) -> DataFrame:
        if not self._fix_mode:
            self._ensure_fixpoint()
        return self._fix[sid.key()]

    def _ensure_fixpoint(self) -> None:
        """Semi-naive global evaluation of recursive record/list shapes.

        The (shape, term) memo table of the reference (frame.ts:89-102,
        228-236) becomes one global match relation per recursive shape,
        recomputed until stable; references between recursive shapes
        read the previous round's relation.  Terminates when the data
        reachable through recursive shapes is acyclic; remaining
        candidates are resolved as cyclic matches (see
        :meth:`_resolve_cycles`).
        """
        if self._fix_done:
            return
        targets = [
            s for s in self.catalog
            if s.id.key() in self.recursive_ids
            and isinstance(s, (RecordShape, ListShape))
        ]
        empty = self._empty(MATCH_FIELDS).select("fkey", "focus", "ord", "value")
        for s in targets:
            self._fix[s.id.key()] = empty

        uni = self.universe()
        cand = uni.select(
            F.lit("u").alias("gid"), term_key(F.col("focus")).alias("fkey"),
            "focus", "ord", F.lit(None).cast("string").alias("refk"),
        ).localCheckpoint(eager=False)
        groups = self.spark.createDataFrame(
            [("u", 0, "", None)],
            "gid string, gord long, stk string, edge string",
        )

        self._fix_mode = True
        prev_sig: Dict[str, Tuple[int, int]] = {k: (-1, 0) for k in self._fix}
        suppress_prev = self._suppress_errors
        self._suppress_errors = True
        try:
            for _ in range(self.max_fixpoint_iterations):
                new_fix: Dict[str, DataFrame] = {}
                sigs: Dict[str, Tuple[int, int]] = {}
                for s in targets:
                    if isinstance(s, RecordShape):
                        res = self._compile_record(s, cand, groups, required=False)
                    else:
                        res = self._compile_list(s, cand, groups, required=False)
                    gm = res.matches.select("fkey", "focus", "ord", "value") \
                        .localCheckpoint(eager=True)
                    new_fix[s.id.key()] = gm
                    agg = gm.agg(
                        F.count(F.lit(1)).alias("n"),
                        F.coalesce(
                            F.bit_xor(F.xxhash64(F.col("fkey"), F.col("value"))),
                            F.lit(0),
                        ).alias("h"),
                    ).collect()[0]
                    sigs[s.id.key()] = (agg["n"], agg["h"])
                self._fix.update(new_fix)
                if sigs == prev_sig:
                    break
                prev_sig = sigs
            else:
                raise RuntimeError("shape fixpoint did not converge")
        finally:
            self._fix_mode = False
            self._suppress_errors = suppress_prev
        self._resolve_cycles(cand, targets)
        self._fix_done = True

    def _resolve_cycles(self, cand: DataFrame, targets: List[Shape]) -> None:
        """Cyclic-data resolution (deferred import to keep module sizes
        sane); extends the fixpoint relations with ``@ref``/``@use``
        values for candidates on data cycles."""
        from .cycles import resolve_cycles

        resolve_cycles(self, cand, targets)

    # ------------------------------------------------------------------
    # list (frameList, frame.ts:519-628)
    # ------------------------------------------------------------------
    def _compile_list(self, shape: ListShape, cand: DataFrame,
                      groups: DataFrame, required: bool) -> Result:
        site = self._next_site()
        head_path = shape.head_path or PredicatePath(RDF_FIRST)
        tail_path = shape.tail_path or PredicatePath(RDF_REST)
        nil = shape.nil or Term("iri", RDF_NIL)

        c = cand.join(groups, "gid")
        f = F.col("focus")
        own_frame = self._frame_json(shape, F.col("edge"), f)
        lstk = F.concat(
            F.lit("["),
            F.when(F.col("stk") == "", own_frame)
            .otherwise(F.concat(F.col("stk"), F.lit(","), own_frame)),
            F.lit("]"),
        )
        base = c.select(
            "gid", "fkey", "focus", "ord", "gord", "refk",
            lstk.alias("lstk"),
            F.when(F.col("stk") == "", own_frame)
            .otherwise(F.concat(F.col("stk"), F.lit(","), own_frame)).alias("pfx"),
            F.md5(F.concat_ws("\x1e", F.col("gid"), F.col("fkey"),
                              F.lit(str(site)))).alias("ckey"),
        ).localCheckpoint(eager=False)

        nonres0 = base.filter(~is_resource_col(f))
        walk_fail: List[DataFrame] = [
            nonres0.select("ckey", F.lit(ERR_NON_RESOURCE_TERM).alias("code"),
                           F.col("lstk").alias("stack"),
                           F.col("ord").alias("ford"))
        ]
        heads_parts: List[DataFrame] = []
        done_parts: List[DataFrame] = []

        state = base.filter(is_resource_col(f)).select(
            "ckey", F.col("focus").alias("cur"), F.lit(0).alias("idx"),
            F.col("ord").alias("tord"),
        ).localCheckpoint(eager=True)
        meta = base.select("ckey", "gid", "fkey", "focus", "ord", "gord",
                           "refk", "lstk", "pfx")

        it = 0
        while not state.isEmpty():
            it += 1
            if it > self.max_list_length:
                walk_fail.append(
                    state.join(meta, "ckey").select(
                        "ckey", F.lit(ERR_CYCLIC_MATCH).alias("code"),
                        F.col("lstk").alias("stack"),
                        F.col("tord").alias("ford"),
                    )
                )
                break
            at_nil = state.filter(term_eq_const(F.col("cur"), nil))
            done_parts.append(at_nil.select("ckey", F.col("idx").alias("length")))
            live = state.filter(~term_eq_const(F.col("cur"), nil))
            bad = live.filter(~is_resource_col(F.col("cur")))
            walk_fail.append(
                bad.join(meta, "ckey").select(
                    "ckey", F.lit(ERR_NON_RESOURCE_TERM).alias("code"),
                    F.col("lstk").alias("stack"), F.col("tord").alias("ford"),
                )
            )
            live = live.filter(is_resource_col(F.col("cur")))
            if live.isEmpty():
                break

            hsrc = live.select("ckey", "idx", F.col("cur").alias("node"), "tord")
            hout = eval_path(head_path, hsrc, ["ckey", "idx"], self.triples)
            hagg = hout.groupBy("ckey", "idx").agg(
                F.count(F.lit(1)).alias("hn"),
                F.min(F.struct("tord", "node")).alias("h1"),
            )
            hj = live.join(hagg, ["ckey", "idx"], "left")
            hn = F.coalesce(F.col("hn"), F.lit(0))
            walk_fail.append(
                hj.filter(hn != 1).join(meta, "ckey").select(
                    "ckey",
                    F.when(hn == 0, F.lit(ERR_NO_LIST_HEAD))
                    .otherwise(F.lit(ERR_MULTIPLE_LIST_HEAD)).alias("code"),
                    F.col("lstk").alias("stack"), F.col("tord").alias("ford"),
                )
            )
            okh = hj.filter(hn == 1)
            heads_parts.append(
                okh.select("ckey", "idx", F.col("h1")["node"].alias("head"),
                           F.col("h1")["tord"].alias("htord"))
            )

            tsrc = okh.select("ckey", "idx", F.col("cur").alias("node"), "tord")
            tout = eval_path(tail_path, tsrc, ["ckey", "idx"], self.triples)
            tagg = tout.groupBy("ckey", "idx").agg(
                F.count(F.lit(1)).alias("tn"),
                F.min(F.struct("tord", "node")).alias("t1"),
            )
            tj = okh.join(tagg, ["ckey", "idx"], "left")
            tn = F.coalesce(F.col("tn"), F.lit(0))
            walk_fail.append(
                tj.filter(tn != 1).join(meta, "ckey").select(
                    "ckey",
                    F.when(tn == 0, F.lit(ERR_NO_LIST_TAIL))
                    .otherwise(F.lit(ERR_MULTIPLE_LIST_TAIL)).alias("code"),
                    F.col("tord").alias("ford"), F.col("lstk").alias("stack"),
                ).select("ckey", "code", "stack", "ford")
            )
            state = tj.filter(tn == 1).select(
                "ckey", F.col("t1")["node"].alias("cur"),
                (F.col("idx") + 1).alias("idx"),
                F.col("t1")["tord"].alias("tord"),
            ).localCheckpoint(eager=True)

        heads = (
            heads_parts[0] if heads_parts
            else self._empty("ckey string, idx int, head struct<kind:string,value:string,dt:string,lang:string>, htord long")
        )
        for hp in heads_parts[1:]:
            heads = heads.unionAll(hp)

        # item matching: one evaluation site per (list instance, index)
        isite = self._next_site()
        igid = F.md5(F.concat_ws("\x1e", F.col("ckey"),
                                 F.col("idx").cast("string"), F.lit(str(isite))))
        hm = heads.join(meta, "ckey")
        childcand = hm.select(
            igid.alias("gid"), term_key(F.col("head")).alias("fkey"),
            F.col("head").alias("focus"), F.col("htord").alias("ord"),
            "refk",
        )
        childgroups = hm.select(
            igid.alias("gid"), F.col("gord"),
            F.col("pfx").alias("stk"),
            F.col("idx").cast("string").alias("edge"),
        )
        ires = self.compile(shape.item_shape, childcand, childgroups, required)
        iagg = ires.matches.groupBy("gid").agg(
            F.count(F.lit(1)).alias("inn"),
            F.min(F.struct("ord", "value")).alias("iv"),
        )
        immagg = ires.mismatches.groupBy("gid").agg(
            F.min(F.struct("ord", "code", "stack")).alias("ifm"),
        )
        items = (
            hm.select("ckey", "idx", igid.alias("gid"), "lstk", "htord")
            .join(iagg, "gid", "left").join(immagg, "gid", "left")
        )
        inn = F.coalesce(F.col("inn"), F.lit(0))
        ifm = F.col("ifm")
        item_fail = items.filter(ifm.isNotNull() | (inn != 1)).select(
            "ckey",
            F.when(ifm.isNotNull(), ifm["code"])
            .when(inn == 0, F.lit(ERR_NO_LIST_ITEM))
            .otherwise(F.lit(ERR_MULTIPLE_LIST_ITEM)).alias("code"),
            F.when(ifm.isNotNull(), ifm["stack"])
            .otherwise(F.col("lstk")).alias("stack"),
            F.coalesce(ifm["ord"], F.col("htord")).alias("ford"),
        )
        walk_fail.append(item_fail)

        item_ok = items.filter(ifm.isNull() & (inn == 1)).select(
            "ckey", "idx", F.col("iv")["value"].alias("ivalue"),
        )
        assembled = item_ok.groupBy("ckey").agg(
            F.count(F.lit(1)).alias("ni"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "ivalue"))),
                    lambda x: F.coalesce(x["ivalue"], F.lit("null")),
                ), ",",
            ).alias("body"),
        )

        fails = walk_fail[0]
        for wf in walk_fail[1:]:
            fails = fails.unionAll(wf)
        first_fail = fails.groupBy("ckey").agg(
            F.min(F.struct("ford", "code", "stack")).alias("wf"),
        )

        done = (
            done_parts[0] if done_parts
            else self._empty("ckey string, length int")
        )
        for dp in done_parts[1:]:
            done = done.unionAll(dp)

        out = (
            meta.join(done, "ckey", "left")
            .join(assembled, "ckey", "left")
            .join(first_fail, "ckey", "left")
        )
        ni = F.coalesce(F.col("ni"), F.lit(0))
        complete = F.col("length").isNotNull() & F.col("wf").isNull() & (
            ni == F.col("length")
        )
        matches = out.filter(complete).select(
            "gid", "fkey", "focus", F.lit("").alias("vkey"), "ord",
            F.concat(F.lit("["), F.coalesce(F.col("body"), F.lit("")),
                     F.lit("]")).alias("value"),
        )
        mism = out.filter(~complete).select(
            "gid", "fkey", "focus",
            F.coalesce(F.col("wf")["ford"], F.col("ord")).alias("ord"), "gord",
            F.coalesce(F.col("wf")["code"], F.lit(ERR_NO_LIST_TAIL)).alias("code"),
            F.coalesce(F.col("wf")["stack"], F.col("lstk")).alias("stack"),
        )
        return Result(matches, mism, per_group=False)

    # ------------------------------------------------------------------
    # map (frameMap, frame.ts:642-696) — key/value via shape references
    # ------------------------------------------------------------------
    def _compile_map(self, shape: MapShape, cand: DataFrame,
                     groups: DataFrame, required: bool) -> Result:
        site = self._next_site()
        own_frame = self._frame_json(shape, F.col("edge"), None)
        stk2 = F.when(F.col("stk") == "", own_frame).otherwise(
            F.concat(F.col("stk"), F.lit(","), own_frame)
        )
        groups2 = groups.select(
            "gid", "gord", stk2.alias("stk"),
            F.lit(None).cast("string").alias("edge"),
        )
        cand2 = cand.withColumn(
            "refk",
            F.md5(F.concat_ws("\x1e", F.col("gid"), F.col("fkey"),
                              F.lit(str(site)))),
        )
        key_target = shape.key.target.key()
        self._collectors.setdefault(key_target, [])
        ires = self.compile(shape.item_shape, cand2, groups2, required)
        captured = self._collectors.pop(key_target, [])
        if not captured:
            keys = self._empty(
                "refk string, kfocus struct<kind:string,value:string,dt:string,lang:string>, kord long")
        else:
            keys = captured[0]
            for cdf in captured[1:]:
                keys = keys.unionAll(cdf)
        part = shape.key.part
        kf = F.col("kfocus")
        if part == "value":
            key_str = kf["value"]
        elif part == "datatype":
            key_str = kf["dt"]
        elif part == "language":
            key_str = kf["lang"]
        else:
            key_str = kf["value"]
        keys = keys.groupBy("refk").agg(
            F.max(F.struct("kord", kf.alias("kfocus"))).alias("kk")
        ).select("refk", F.col("kk")["kfocus"].alias("kfocus"))

        im = ires.matches.join(
            cand2.select(F.col("gid").alias("g2"), F.col("fkey").alias("f2"),
                         "refk"),
            (F.col("gid") == F.col("g2")) & (F.col("fkey") == F.col("f2")),
        ).join(keys, "refk", "left")
        kf = F.col("kfocus")
        key_col = (
            kf["value"] if part in (None, "value") else
            kf["dt"] if part == "datatype" else kf["lang"]
        )
        entries = im.select(
            "gid",
            F.concat(json_quote_expr(key_col), F.lit(":"),
                     F.coalesce(F.col("value"), F.lit("null"))).alias("entry"),
            "ord",
        )
        eagg = entries.groupBy("gid").agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ord", "entry"))),
                    lambda x: x["entry"],
                ), ",",
            ).alias("body"),
        )
        base = groups.select("gid", "gord")
        out = base.join(eagg, "gid", "left")
        matches = out.select(
            "gid", F.lit(None).cast("string").alias("fkey"),
            F.lit(None).cast(
                "struct<kind:string,value:string,dt:string,lang:string>"
            ).alias("focus"),
            F.lit("").alias("vkey"), F.col("gord").alias("ord"),
            F.concat(F.lit("{"), F.coalesce(F.col("body"), F.lit("")),
                     F.lit("}")).alias("value"),
        )
        mmagg = ires.mismatches.groupBy("gid").agg(
            F.min(F.struct("ord", "code", "stack")).alias("fm"))
        mism = base.join(mmagg, "gid").select(
            "gid", F.lit(None).cast("string").alias("fkey"),
            F.lit(None).cast(
                "struct<kind:string,value:string,dt:string,lang:string>"
            ).alias("focus"),
            F.col("fm")["ord"].alias("ord"), "gord",
            F.col("fm")["code"].alias("code"), F.col("fm")["stack"].alias("stack"),
        )
        matches = matches.join(mism.select("gid"), "gid", "left_anti")
        return Result(matches, mism, per_group=True)

    # ------------------------------------------------------------------
    # computed properties + reference collection (synthesize.ts)
    # ------------------------------------------------------------------
    def _activate_collectors(self, shape: RecordShape) -> None:
        for cp in shape.computed_properties:
            for target in self._open_ref_targets(cp.value_shape):
                self._collectors.setdefault(target, [])

    def _deactivate_collectors(self, shape: RecordShape) -> None:
        pass  # collector DFs are consumed by _computed_fragments

    def _open_ref_targets(self, sid: ShapeID) -> List[str]:
        """findOpenReferencedShapes (synthesize.ts:225-259), restricted
        to node-shape targets (the part the fixtures and map keys use)."""
        shape = self.catalog.get(sid)
        if isinstance(shape, (ResourceShape, LiteralShape)):
            if shape.value is None:
                return [sid.key()]
            return []
        if isinstance(shape, RecordShape):
            out: List[str] = []
            for p in shape.all_properties():
                out.extend(self._open_ref_targets(p.value_shape))
            return out
        if isinstance(shape, SetShape):
            return self._open_ref_targets(shape.item_shape)
        return []

    def _capture_refs(self, shape, matched: DataFrame) -> None:
        key = shape.id.key()
        if key in self._collectors:
            self._collectors[key].append(
                matched.filter(F.col("refk").isNotNull()).select(
                    "refk", F.col("focus").alias("kfocus"),
                    F.col("ord").alias("kord"),
                )
            )

    def _computed_fragments(
        self, shape: RecordShape, acc: DataFrame
    ) -> Tuple[DataFrame, List[Column]]:
        frags: List[Column] = []
        for j, cp in enumerate(shape.computed_properties):
            vshape = self.catalog.get(cp.value_shape)
            if isinstance(vshape, (ResourceShape, LiteralShape)) and \
                    vshape.value is not None:
                const = self._constant_value_json(vshape)
                frags.append(F.lit(jstr(cp.name) + ":" + const))
                continue
            targets = self._open_ref_targets(cp.value_shape)
            if not targets:
                raise NotImplementedError(
                    f"computed property {cp.name}: unsupported synth shape")
            target = targets[0]
            captured = self._collectors.pop(target, [])
            if not captured:
                continue
            cdf = captured[0]
            for extra in captured[1:]:
                cdf = cdf.unionAll(extra)
            # last write wins (frame.ts:186-190 ref assignment ordering)
            picked = cdf.groupBy("refk").agg(
                F.max(F.struct("kord", "kfocus")).alias("kk")
            ).select(
                F.col("refk").alias(f"__rk{j}"),
                F.col("kk")["kfocus"].alias(f"__kf{j}"),
            )
            acc = acc.join(picked, acc["ckey"] == picked[f"__rk{j}"], "left")
            valcol = self._synthesized_value(vshape, F.col(f"__kf{j}"))
            frags.append(
                F.when(
                    F.col(f"__kf{j}").isNotNull(),
                    F.concat(F.lit(jstr(cp.name) + ":"), valcol),
                )
            )
        return acc, frags

    def _synthesized_value(self, vshape, kfocus: Column) -> Column:
        """synthesizeLiteral/Resource from a captured raw term
        (synthesize.ts:129-204) followed by fromRdf value mapping."""
        if isinstance(vshape, LiteralShape):
            dt = vshape.effective_datatype()
            v = kfocus["value"]
            if dt == XSD_STRING or (dt == RDF_LANG_STRING and vshape.language):
                return json_quote_expr(v)
            if dt == XSD_BOOLEAN:
                return F.when(v != "false", F.lit("true")).otherwise(F.lit("false"))
            if dt in INTEGER_TYPES:
                return v.cast("long").cast("string")
            if dt in FRACTIONAL_TYPES:
                return v.cast("double").cast("string")
            return json_quote_expr(v)
        # resource
        return F.when(
            kfocus["kind"] == "bnode",
            json_quote_expr(F.concat(F.lit("_:"), kfocus["value"])),
        ).otherwise(json_quote_expr(kfocus["value"]))

    def _constant_value_json(self, vshape) -> str:
        const = vshape.value
        if isinstance(vshape, ResourceShape):
            if vshape.keep_as_term:
                return jstr({"@term": {"kind": const.kind, "value": const.value}})
            return jstr(("_:" + const.value) if const.kind == "bnode" else const.value)
        dt = const.dt
        if dt == XSD_STRING or const.lang:
            return jstr(const.value)
        if dt == XSD_BOOLEAN:
            return "true" if const.value != "false" else "false"
        if dt in INTEGER_TYPES:
            return str(int(const.value))
        if dt in FRACTIONAL_TYPES:
            return str(float(const.value))
        return jstr(const.value)
