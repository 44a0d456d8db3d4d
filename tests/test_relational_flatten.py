"""Relational flatten emitter vs the reference-semantics interpreter.

The emitter (ramp_shapes_spark/relational_flatten.py) must produce the
same triple set as pyflatten (blank-node isomorphism) for every shape
inside its fragment, per framed value.  Reference semantics:
flatten.ts:200-248 (records), 386-443 (set/optional), 302-357 (paths).
"""

import json

import pytest

from pyspark.sql import functions as F

from ramp_shapes_spark.compare import triple_sets_isomorphic
from ramp_shapes_spark.pyflatten import flatten_py
from ramp_shapes_spark.relational_flatten import (
    UnsupportedShape, flatten_relational, supports_shape,
)
from ramp_shapes_spark.shapes import (
    InversePath, PredicatePath, SELF_PATH, ShapeBuilder, prop,
)
from ramp_shapes_spark.terms import (
    RDF_TYPE, XSD_DOUBLE, XSD_INTEGER, XSD_STRING, from_row, iri,
)

EX = "http://example.com/t#"


def _kg_like_catalog():
    b = ShapeBuilder()
    mention = b.record(
        EX + "Mention",
        type_properties=[prop("type", RDF_TYPE,
                              b.constant(iri(EX + "Mention")),
                              transient=True)],
        properties=[
            prop("entity", EX + "entity", b.resource(only_named=True)),
            prop("surface", EX + "surface", b.literal(datatype=XSD_STRING)),
            prop("score", EX + "score", b.literal(datatype=XSD_DOUBLE)),
        ],
    )
    turn = b.record(
        EX + "Turn",
        type_properties=[prop("type", RDF_TYPE,
                              b.constant(iri(EX + "Turn")), transient=True)],
        properties=[
            prop("id", SELF_PATH, b.resource(only_named=True)),
            prop("idx", EX + "idx", b.literal(datatype=XSD_INTEGER)),
            prop("tool", EX + "tool",
                 b.optional(b.literal(datatype=XSD_STRING))),
            prop("by", InversePath(PredicatePath(EX + "authored")),
                 b.resource(only_named=True)),
            prop("mentions", EX + "mentions", b.set_of(mention)),
        ],
    )
    return b.catalog, turn


VALUES = [
    {"id": "turn:a:1", "idx": 3, "tool": "bash", "by": "user:alice",
     "mentions": [
         {"entity": "entity:e1", "surface": "acme-00001", "score": 0.93},
         {"entity": "entity:e2", "surface": "the acme", "score": 1.0},
     ]},
    {"id": "turn:a:2", "idx": 0, "by": "user:bob", "mentions": []},
]


def _spark_triples(spark, catalog, root, values):
    df = spark.createDataFrame(
        [(str(i), json.dumps(v)) for i, v in enumerate(values)],
        "seed string, value string",
    )
    out = flatten_relational(df, catalog, root, seed_col="seed")
    rows = out.orderBy("seed", "tid").collect()
    by_seed = {}
    for r in rows:
        by_seed.setdefault(r["seed"], []).append(
            (from_row(r["s"]), r["p"], from_row(r["o"])))
    return by_seed


def test_relational_matches_interpreter(spark):
    catalog, turn = _kg_like_catalog()
    assert supports_shape(catalog, turn)
    got = _spark_triples(spark, catalog, turn, VALUES)
    for i, v in enumerate(VALUES):
        want = flatten_py(catalog, turn, v)
        assert triple_sets_isomorphic(got.get(str(i), []), want), (
            f"value {i}: got {got.get(str(i))} want {want}")


def test_relational_bnode_ids_byte_identical(spark):
    """Either execution path must emit the SAME graph (ids included) so
    materialized fingerprints don't depend on which path ran."""
    from ramp_shapes_spark.pyflatten import deterministic_bnode_generator
    catalog, turn = _kg_like_catalog()
    got = _spark_triples(spark, catalog, turn, VALUES)
    for i, v in enumerate(VALUES):
        want = flatten_py(catalog, turn, v,
                          deterministic_bnode_generator(str(i)))
        gset = {(s.key(), p, o.key()) for s, p, o in got.get(str(i), [])}
        wset = {(s.key(), p, o.key()) for s, p, o in want}
        assert gset == wset, f"value {i}: {gset ^ wset}"


def test_distinct_bnodes_across_rows_and_elements(spark):
    catalog, turn = _kg_like_catalog()
    got = _spark_triples(spark, catalog, turn, VALUES)
    bnodes = set()
    for triples in got.values():
        for s, p, o in triples:
            for t in (s, o):
                if t.kind == "bnode":
                    bnodes.add(t.value)
    # 2 mentions in row 0, 0 in row 1 → exactly 2 distinct blank nodes
    assert len(bnodes) == 2


def test_unsupported_falls_back():
    # recursive shapes remain outside the fragment → interpreter path
    b = ShapeBuilder()
    rec_id = iri(EX + "R")
    b.record(
        EX + "R",
        properties=[prop("next", EX + "next", b.optional(rec_id))],
    )
    with pytest.raises(UnsupportedShape):
        from ramp_shapes_spark.relational_flatten import compile_flatten_exprs
        compile_flatten_exprs(b.catalog, rec_id)
    assert not supports_shape(b.catalog, rec_id)


def _term_catalog():
    """keepAsTerm and vocabulary leaves (value-mapping.ts:25-35, 67-91)
    inside the relational fragment: direct, optional, set and list
    positions."""
    from ramp_shapes_spark.terms import lit

    b = ShapeBuilder()
    vocab_status = b.resource(vocabulary=(
        ("open", iri(EX + "StatusOpen")),
        ("closed", iri(EX + "StatusClosed")),
    ))
    doc = b.record(
        EX + "Doc",
        type_properties=[prop("type", RDF_TYPE,
                              b.constant(iri(EX + "Doc")), transient=True)],
        properties=[
            prop("id", SELF_PATH, b.resource(only_named=True)),
            prop("raw", EX + "raw",
                 b.literal(datatype=XSD_STRING, keep_as_term=True)),
            prop("origin", EX + "origin", b.resource(keep_as_term=True)),
            prop("status", EX + "status", vocab_status),
            prop("alts", EX + "alts",
                 b.set_of(b.literal(keep_as_term=True))),
            prop("hist", EX + "hist", b.list_of(vocab_status)),
            prop("note", EX + "note",
                 b.optional(b.resource(keep_as_term=True))),
        ],
    )
    return b.catalog, doc


TERM_VALUES = [
    {"id": "doc:1",
     "raw": {"@term": {"kind": "lit", "value": "hello",
                       "dt": "http://www.w3.org/2001/XMLSchema#string"}},
     "origin": {"@term": {"kind": "iri", "value": "src:web"}},
     "status": "open",
     "alts": [
         {"@term": {"kind": "lit", "value": "bonjour",
                    "dt": "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString",
                    "lang": "fr"}},
         {"@term": {"kind": "lit", "value": "42",
                    "dt": "http://www.w3.org/2001/XMLSchema#integer"}},
     ],
     "hist": ["closed", "open"],
     "note": {"@term": {"kind": "bnode", "value": "b7"}}},
    {"id": "doc:2",
     "raw": {"@term": {"kind": "lit", "value": "x",
                       "dt": "http://www.w3.org/2001/XMLSchema#string"}},
     "origin": {"@term": {"kind": "bnode", "value": "o1"}},
     "status": "closed", "alts": [], "hist": []},
]


def test_keepasterm_vocab_matches_interpreter(spark):
    catalog, doc = _term_catalog()
    assert supports_shape(catalog, doc)
    got = _spark_triples(spark, catalog, doc, TERM_VALUES)
    for i, v in enumerate(TERM_VALUES):
        want = flatten_py(catalog, doc, v)
        assert triple_sets_isomorphic(got.get(str(i), []), want), (
            f"value {i}: got {sorted(got.get(str(i), []), key=str)} "
            f"want {sorted(want, key=str)}")


def test_keepasterm_vocab_bnodes_byte_identical(spark):
    from ramp_shapes_spark.pyflatten import deterministic_bnode_generator
    catalog, doc = _term_catalog()
    got = _spark_triples(spark, catalog, doc, TERM_VALUES)
    for i, v in enumerate(TERM_VALUES):
        want = flatten_py(catalog, doc, v,
                          deterministic_bnode_generator(str(i)))
        gset = {(s.key(), p, o.key()) for s, p, o in got.get(str(i), [])}
        wset = {(s.key(), p, o.key()) for s, p, o in want}
        assert gset == wset, f"value {i}: {gset ^ wset}"


def _list_catalog():
    """List-bearing shapes (flatten.ts:470-512; list1/list-cyclic fixture
    family): leaf item lists, record item lists, a custom head/tail list,
    and sibling properties before AND after each list so both match-phase
    and generate-phase counter offsets are exercised."""
    b = ShapeBuilder()
    step = b.record(
        EX + "Step",
        properties=[
            prop("verb", EX + "verb", b.literal(datatype=XSD_STRING)),
            prop("arg", EX + "arg",
                 b.optional(b.literal(datatype=XSD_STRING))),
        ],
    )
    plan = b.record(
        EX + "Plan",
        type_properties=[prop("type", RDF_TYPE,
                              b.constant(iri(EX + "Plan")), transient=True)],
        properties=[
            prop("id", SELF_PATH, b.resource(only_named=True)),
            prop("tags", EX + "tags",
                 b.list_of(b.literal(datatype=XSD_STRING))),
            prop("steps", EX + "steps", b.list_of(step)),
            prop("alt", EX + "alt",
                 b.list_of(b.literal(datatype=XSD_STRING),
                           head_path=PredicatePath(EX + "h"),
                           tail_path=PredicatePath(EX + "t"))),
            prop("note", EX + "note",
                 b.optional(b.literal(datatype=XSD_STRING))),
            prop("extra", EX + "extra", b.set_of(step)),
        ],
    )
    return b.catalog, plan


LIST_VALUES = [
    {"id": "plan:1", "tags": ["a", "b", "c"],
     "steps": [{"verb": "read", "arg": "f.txt"}, {"verb": "run"}],
     "alt": ["x"], "note": "n1",
     "extra": [{"verb": "cleanup"}]},
    {"id": "plan:2", "tags": [], "steps": [], "alt": [], "extra": []},
    {"id": "plan:3", "tags": ["only"],
     "steps": [{"verb": "a"}, {"verb": "b"}, {"verb": "c"}],
     "alt": ["p", "q"], "extra": []},
]


def test_list_flatten_matches_interpreter(spark):
    catalog, plan = _list_catalog()
    assert supports_shape(catalog, plan)
    got = _spark_triples(spark, catalog, plan, LIST_VALUES)
    for i, v in enumerate(LIST_VALUES):
        want = flatten_py(catalog, plan, v)
        assert triple_sets_isomorphic(got.get(str(i), []), want), (
            f"value {i}: got {sorted(got.get(str(i), []), key=str)} "
            f"want {sorted(want, key=str)}")


def test_list_flatten_bnodes_byte_identical(spark):
    """Counters must replicate the interpreter's interleaved match-phase
    (item + head node) / generate-phase (tail nodes) sequence exactly."""
    from ramp_shapes_spark.pyflatten import deterministic_bnode_generator
    catalog, plan = _list_catalog()
    got = _spark_triples(spark, catalog, plan, LIST_VALUES)
    for i, v in enumerate(LIST_VALUES):
        want = flatten_py(catalog, plan, v,
                          deterministic_bnode_generator(str(i)))
        gset = {(s.key(), p, o.key()) for s, p, o in got.get(str(i), [])}
        wset = {(s.key(), p, o.key()) for s, p, o in want}
        assert gset == wset, f"value {i}: {gset ^ wset}"


def test_list_flatten_plan_has_no_python(spark):
    catalog, plan = _list_catalog()
    df = spark.createDataFrame(
        [(json.dumps(LIST_VALUES[0]),)], "value string")
    out = flatten_relational(df, catalog, plan)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in p
    assert "MapInPandas" not in p
    assert "ArrowEvalPython" not in p


def _union_catalog():
    """strict-union fixture family (test-data/shapes/strict-union.ttl):
    heterogeneous leaf unions, set-vs-scalar cardinality unions and
    nested unions — the anyOf fragment of the relational emitter."""
    from ramp_shapes_spark.terms import XSD_BOOLEAN, lit

    b = ShapeBuilder()
    string_or_int = b.any_of([
        b.literal(datatype=XSD_STRING), b.literal(datatype=XSD_INTEGER)])
    set_or_single = b.any_of([
        b.set_of(b.literal(datatype=XSD_INTEGER)),
        b.literal(datatype=XSD_INTEGER)])
    nested = b.any_of([
        b.any_of([b.literal(datatype=XSD_INTEGER),
                  b.literal(datatype=XSD_BOOLEAN)]),
        b.literal(datatype=XSD_STRING)])
    status = b.any_of([b.constant(lit("O")), b.constant(lit("F"))])
    items = b.record(
        EX + "Items",
        type_properties=[prop("type", RDF_TYPE,
                              b.constant(iri(EX + "Items")),
                              transient=True)],
        properties=[
            prop("id", SELF_PATH, b.resource(only_named=True)),
            prop("atomic", EX + "atomic", b.set_of(string_or_int)),
            prop("differentCardinality", EX + "dc", b.set_of(set_or_single)),
            prop("nestedUnion", EX + "nested", b.set_of(nested)),
            prop("status", EX + "status", status),
        ],
    )
    return b.catalog, items


UNION_VALUES = [
    {"id": "it:1", "atomic": ["s2", 1, "s5", 3],
     "differentCardinality": [[1, 2], 7, []],
     "nestedUnion": [4, True, "x"], "status": "O"},
    {"id": "it:2", "atomic": [], "differentCardinality": [5],
     "nestedUnion": [False], "status": "F"},
]


def test_anyof_union_matches_interpreter(spark):
    catalog, items = _union_catalog()
    assert supports_shape(catalog, items)
    got = _spark_triples(spark, catalog, items, UNION_VALUES)
    for i, v in enumerate(UNION_VALUES):
        want = flatten_py(catalog, items, v)
        assert triple_sets_isomorphic(got.get(str(i), []), want), (
            f"value {i}: got {sorted((s.key(), p, o.key()) for s, p, o in got.get(str(i), []))} "
            f"want {sorted((s.key(), p, o.key()) for s, p, o in want)}")


def test_anyof_union_plan_has_no_python(spark):
    """The union-bearing shape must flatten entirely JVM-side."""
    catalog, items = _union_catalog()
    df = spark.createDataFrame(
        [("0", json.dumps(UNION_VALUES[0]))], "seed string, value string")
    out = flatten_relational(df, catalog, items, seed_col="seed")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert "ArrowEvalPython" not in plan


def _map_catalog():
    """Map-shape flatten: record items keyed by a referenced part
    (frame.ts:642-696 on the frame side; flatten.ts:514-565 here)."""
    from ramp_shapes_spark.shapes import ShapeReference

    b = ShapeBuilder()
    name_key = b.literal(datatype=XSD_STRING)
    nation = b.record(
        EX + "Nation",
        type_properties=[prop("type", RDF_TYPE,
                              b.constant(iri(EX + "Nation")),
                              transient=True)],
        properties=[prop("name", EX + "name", name_key)],
    )
    region = b.record(
        EX + "Region",
        properties=[
            prop("id", SELF_PATH, b.resource(only_named=True)),
            prop("name", EX + "name", b.literal(datatype=XSD_STRING)),
            prop("nations", EX + "hasNation",
                 b.map_of(ShapeReference(target=name_key, part="value"),
                          nation)),
            prop("codes", EX + "code",
                 b.map_of(ShapeReference(target=name_key, part="value"),
                          b.literal(datatype=XSD_STRING))),
        ],
    )
    return b.catalog, region


MAP_VALUES = [
    {"id": "reg:1", "name": "europe",
     "nations": {"france": {"name": "france"},
                 "spain": {"name": "spain"}},
     "codes": {"a": "EU", "b": "EUR"}},
    {"id": "reg:2", "name": "void", "nations": {}, "codes": {}},
]


def test_map_flatten_matches_interpreter(spark):
    catalog, region = _map_catalog()
    assert supports_shape(catalog, region)
    got = _spark_triples(spark, catalog, region, MAP_VALUES)
    for i, v in enumerate(MAP_VALUES):
        want = flatten_py(catalog, region, v)
        assert triple_sets_isomorphic(got.get(str(i), []), want), (
            f"value {i}")


def test_map_flatten_bnodes_byte_identical(spark):
    from ramp_shapes_spark.pyflatten import deterministic_bnode_generator
    catalog, region = _map_catalog()
    got = _spark_triples(spark, catalog, region, MAP_VALUES)
    for i, v in enumerate(MAP_VALUES):
        want = flatten_py(catalog, region, v,
                          deterministic_bnode_generator(str(i)))
        gset = {(s.key(), p, o.key()) for s, p, o in got.get(str(i), [])}
        wset = {(s.key(), p, o.key()) for s, p, o in want}
        assert gset == wset, f"value {i}: {gset ^ wset}"


# ---------------------------------------------------------------------------
# composite property paths (flatten.ts:302-357 generatePropertyPath)
# ---------------------------------------------------------------------------

def _path_catalog():
    """Every composite-path construct the generate fragment covers:
    sequence chains (fresh intermediate bnodes), inverse inside a
    sequence, alternative-first, closure-as-single-step, a set over a
    sequence path (per-item path bnodes), a nested record behind a
    sequence path, a transient constant over a sequence path, and a
    LIST alongside — so path bnode counters interleave with list tail
    counters in one record."""
    from ramp_shapes_spark.shapes import (
        AlternativePath, OneOrMorePath, SequencePath, ZeroOrOnePath,
    )

    b = ShapeBuilder()
    child = b.record(
        EX + "Child",
        properties=[prop("cn", EX + "cn", b.literal(datatype=XSD_STRING))],
    )
    root = b.record(
        EX + "PathRoot",
        type_properties=[prop(
            "t",
            SequencePath((PredicatePath(RDF_TYPE),
                          PredicatePath(EX + "subtype"))),
            b.constant(iri(EX + "PathRoot")), transient=True)],
        properties=[
            prop("id", SELF_PATH, b.resource(only_named=True)),
            # 2-step chain to a literal: one intermediate bnode
            prop("via", SequencePath((PredicatePath(EX + "a"),
                                      PredicatePath(EX + "b"))),
                 b.literal(datatype=XSD_STRING)),
            # 3-step chain with an INVERSE middle step
            prop("inv3",
                 SequencePath((PredicatePath(EX + "x"),
                               InversePath(PredicatePath(EX + "y")),
                               PredicatePath(EX + "z"))),
                 b.resource(only_named=True)),
            # alternative: first branch generates
            prop("alt", AlternativePath((
                SequencePath((PredicatePath(EX + "p"),
                              PredicatePath(EX + "q"))),
                PredicatePath(EX + "r"))),
                 b.literal(datatype=XSD_INTEGER)),
            # closures: one inner step
            prop("zoo", ZeroOrOnePath(PredicatePath(EX + "w")),
                 b.optional(b.literal(datatype=XSD_STRING))),
            prop("oom", OneOrMorePath(SequencePath(
                (PredicatePath(EX + "m"), PredicatePath(EX + "n")))),
                 b.literal(datatype=XSD_STRING)),
            # set over a sequence path: per-item intermediates
            prop("tags", SequencePath((PredicatePath(EX + "tag"),
                                       PredicatePath(EX + "label"))),
                 b.set_of(b.literal(datatype=XSD_STRING))),
            # record behind a sequence path (edge bnodes precede body)
            prop("kid", SequencePath((PredicatePath(EX + "has"),
                                      PredicatePath(EX + "kid"))),
                 child),
            # list AFTER the path properties: tail counters continue
            prop("items", EX + "items",
                 b.list_of(b.literal(datatype=XSD_STRING))),
        ],
    )
    return b.catalog, root


PATH_VALUES = [
    {"id": "pr:1", "via": "v1", "inv3": "node:n1", "alt": 7, "zoo": "z",
     "oom": "deep", "tags": ["t1", "t2", "t3"],
     "kid": {"cn": "c1"}, "items": ["i1", "i2"]},
    {"id": "pr:2", "via": "v2", "inv3": "node:n2", "alt": 0,
     "oom": "d2", "tags": [], "kid": {"cn": "c2"}, "items": []},
]


def test_sequence_paths_match_interpreter(spark):
    catalog, root = _path_catalog()
    assert supports_shape(catalog, root)
    got = _spark_triples(spark, catalog, root, PATH_VALUES)
    for i, v in enumerate(PATH_VALUES):
        want = flatten_py(catalog, root, v)
        assert triple_sets_isomorphic(got.get(str(i), []), want), (
            f"value {i}:\n got {got.get(str(i), [])}\n want {want}")


def test_sequence_paths_bnodes_byte_identical(spark):
    from ramp_shapes_spark.pyflatten import deterministic_bnode_generator
    catalog, root = _path_catalog()
    got = _spark_triples(spark, catalog, root, PATH_VALUES)
    for i, v in enumerate(PATH_VALUES):
        want = flatten_py(catalog, root, v,
                          deterministic_bnode_generator(str(i)))
        gset = {(s.key(), p, o.key()) for s, p, o in got.get(str(i), [])}
        wset = {(s.key(), p, o.key()) for s, p, o in want}
        assert gset == wset, f"value {i}: {sorted(gset ^ wset)}"


def test_literal_under_inverse_path_falls_back():
    """A literal leaf reached through an inverse-final path would need
    the literal in subject position — interpreter error 403; the
    relational fragment rejects the shape statically."""
    b = ShapeBuilder()
    rid = b.record(
        EX + "BadInv",
        properties=[
            prop("id", SELF_PATH, b.resource(only_named=True)),
            prop("v", InversePath(PredicatePath(EX + "of")),
                 b.literal(datatype=XSD_STRING)),
        ],
    )
    assert not supports_shape(b.catalog, rid)


# ---------------------------------------------------------------------------
# map value references (flatten.ts:514-565 + synthesize.ts:55-198)
# ---------------------------------------------------------------------------

def _value_ref_catalog(part):
    """Map whose entries store only a referenced PART of each item; the
    item record is rebuilt by synthesis at flatten time: a constant, a
    self-subject from the KEY, the referenced value, and an
    empty-synthesizable optional."""
    from ramp_shapes_spark.shapes import ShapeReference
    from ramp_shapes_spark.terms import lit as mklit

    b = ShapeBuilder()
    key_shape = b.literal(datatype=XSD_STRING)
    val_shape = b.literal(datatype=XSD_INTEGER)
    entry = b.record(
        EX + "Entry",
        properties=[
            prop("k", EX + "key", key_shape),
            prop("v", EX + "val", val_shape),
            prop("kind", EX + "kind", b.constant(mklit("entry"))),
            prop("note", EX + "note",
                 b.optional(b.literal(datatype=XSD_STRING))),
        ],
    )
    m = b.map_of(ShapeReference(target=key_shape, part="value"), entry,
                 value=ShapeReference(target=val_shape, part=part))
    root = b.record(
        EX + "MapRoot",
        properties=[
            prop("id", SELF_PATH, b.resource(only_named=True)),
            prop("entries", EX + "entry", m),
        ],
    )
    return b.catalog, root


MAP_REF_VALUES = [
    {"id": "mr:1", "entries": {"alpha": 1, "beta": 2}},
    {"id": "mr:2", "entries": {}},
]


@pytest.mark.parametrize("part", ["value", None])
def test_map_value_ref_matches_interpreter(spark, part):
    catalog, root = _value_ref_catalog(part)
    assert supports_shape(catalog, root)
    vals = MAP_REF_VALUES if part is None else [
        {"id": v["id"],
         "entries": {k: str(x) for k, x in v["entries"].items()}}
        for v in MAP_REF_VALUES
    ]
    got = _spark_triples(spark, catalog, root, vals)
    for i, v in enumerate(vals):
        want = flatten_py(catalog, root, v)
        assert triple_sets_isomorphic(got.get(str(i), []), want), (
            f"value {i}:\n got {got.get(str(i), [])}\n want {want}")


def test_map_value_ref_bnodes_byte_identical(spark):
    from ramp_shapes_spark.pyflatten import deterministic_bnode_generator
    catalog, root = _value_ref_catalog(None)
    got = _spark_triples(spark, catalog, root, MAP_REF_VALUES)
    for i, v in enumerate(MAP_REF_VALUES):
        want = flatten_py(catalog, root, v,
                          deterministic_bnode_generator(str(i)))
        gset = {(s.key(), p, o.key()) for s, p, o in got.get(str(i), [])}
        wset = {(s.key(), p, o.key()) for s, p, o in want}
        assert gset == wset, f"value {i}: {sorted(gset ^ wset)}"


# ---------------------------------------------------------------------------
# keepAsTerm anyOf variants (flatten.ts:363-384 over term wrappers)
# ---------------------------------------------------------------------------

def _term_anyof_catalog():
    """Union mixing a plain int, a keepAsTerm literal and a keepAsTerm
    resource, plus a set-of-keepAsTerm variant — the wrapper objects
    discriminate from scalars by their VARIANT runtime type."""
    b = ShapeBuilder()
    u = b.any_of([
        b.literal(datatype=XSD_INTEGER),
        b.literal(keep_as_term=True, language="en"),
        b.resource(keep_as_term=True, only_named=True),
    ])
    su = b.any_of([
        b.set_of(b.literal(keep_as_term=True)),
        b.literal(datatype=XSD_STRING),
    ])
    root = b.record(
        EX + "TermUnion",
        properties=[
            prop("id", SELF_PATH, b.resource(only_named=True)),
            prop("val", EX + "val", u),
            prop("many", EX + "many", su),
        ],
    )
    return b.catalog, root


TERM_ANYOF_VALUES = [
    {"id": "tu:1", "val": 42, "many": "plain"},
    {"id": "tu:2",
     "val": {"@term": {"kind": "lit", "value": "hello",
                       "dt": "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString",
                       "lang": "en"}},
     "many": [{"@term": {"kind": "lit", "value": "a",
                         "dt": "http://www.w3.org/2001/XMLSchema#string"}},
              {"@term": {"kind": "lit", "value": "b",
                         "dt": "http://www.w3.org/2001/XMLSchema#string"}}]},
    {"id": "tu:3", "val": {"@term": {"kind": "iri", "value": "node:n9"}},
     "many": []},
]


def test_keepasterm_anyof_matches_interpreter(spark):
    catalog, root = _term_anyof_catalog()
    assert supports_shape(catalog, root)
    got = _spark_triples(spark, catalog, root, TERM_ANYOF_VALUES)
    for i, v in enumerate(TERM_ANYOF_VALUES):
        want = flatten_py(catalog, root, v)
        assert triple_sets_isomorphic(got.get(str(i), []), want), (
            f"value {i}:\n got {got.get(str(i), [])}\n want {want}")
