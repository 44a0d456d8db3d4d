"""Shape-driven subgraph extraction (subgraph.py) — the Spark-native
analog of the reference's ``generateQuery`` endpoint fetch
(generate-query.ts:25-114).

Core guarantee under test: framing against the extracted subgraph
produces EXACTLY the matches of framing against the full graph, while
the subgraph excludes shape-irrelevant triples.
"""

import json

from pyspark.sql import functions as F

from ramp_shapes_spark.dataset import triples_df
from ramp_shapes_spark.frame import FrameEngine
from ramp_shapes_spark.shapes import (
    AlternativePath, InversePath, PredicatePath, SequencePath,
    ShapeBuilder, ZeroOrMorePath, prop,
)
from ramp_shapes_spark.subgraph import roots_of_type, shape_subgraph
from ramp_shapes_spark.terms import (
    RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE, XSD_STRING, iri, lit,
)

EX = "http://example.com/sg#"


def _matches(spark, catalog, triples, root):
    engine = FrameEngine(spark, catalog, triples,
                         diagnostics=False, track_errors=False)
    res = engine.frame(root)
    rows = res.matches.select("focus", "value").collect()
    return sorted((tuple(r["focus"]), r["value"]) for r in rows)


def _assert_frame_equal(spark, catalog, triples, sub, root):
    assert (_matches(spark, catalog, triples, root)
            == _matches(spark, catalog, sub, root))


def test_record_subgraph_prunes_unrelated(spark):
    b = ShapeBuilder()
    nation = b.record(
        EX + "Nation",
        type_properties=[prop("t", RDF_TYPE, b.constant(iri(EX + "Nation")),
                              transient=True)],
        properties=[prop("name", EX + "name",
                         b.literal(datatype=XSD_STRING))],
    )
    supplier = b.record(
        EX + "Supplier",
        type_properties=[prop("t", RDF_TYPE,
                              b.constant(iri(EX + "Supplier")),
                              transient=True)],
        properties=[
            prop("name", EX + "name", b.literal(datatype=XSD_STRING)),
            prop("nation", EX + "locatedIn", nation),
        ],
    )
    data = [
        (iri("s1"), RDF_TYPE, iri(EX + "Supplier")),
        (iri("s1"), EX + "name", lit("acme")),
        (iri("s1"), EX + "locatedIn", iri("n1")),
        (iri("n1"), RDF_TYPE, iri(EX + "Nation")),
        (iri("n1"), EX + "name", lit("fr")),
        # distractors the shape never traverses
        (iri("n1"), EX + "inRegion", iri("r1")),
        (iri("r1"), EX + "name", lit("europe")),
        (iri("x"), EX + "other", lit("junk")),
    ]
    triples = triples_df(spark, data)
    sub = shape_subgraph(triples, b.catalog, supplier)
    # name-predicate triples of unreachable subjects ARE fetched in
    # universe mode (unconstrained subject variable, like CONSTRUCT),
    # but inRegion/other predicates never appear in the shape
    preds = {r["p"] for r in sub.select("p").distinct().collect()}
    assert EX + "inRegion" not in preds and EX + "other" not in preds
    _assert_frame_equal(spark, b.catalog, triples, sub, supplier)

    # seeded extraction prunes by reachability too: r1's name triple
    # (same predicate, unreachable subject) drops out
    roots = roots_of_type(triples, EX + "Supplier", RDF_TYPE)
    sub2 = shape_subgraph(triples, b.catalog, supplier, roots=roots)
    subjects = {r["s"]["value"] for r in sub2.select("s").collect()}
    assert subjects == {"s1", "n1"}
    _assert_frame_equal(spark, b.catalog, triples, sub2, supplier)


def test_exactly_one_violations_preserved(spark):
    """The walk keeps ALL triples of a traversed (node, path) pair, so
    a duplicate-valued property still fails exactly-one on the
    subgraph — the non-monotone case a naive top-1 fetch would hide."""
    b = ShapeBuilder()
    thing = b.record(
        EX + "Thing",
        type_properties=[prop("t", RDF_TYPE, b.constant(iri(EX + "Thing")),
                              transient=True)],
        properties=[prop("name", EX + "name",
                         b.literal(datatype=XSD_STRING))],
    )
    data = [
        (iri("ok"), RDF_TYPE, iri(EX + "Thing")),
        (iri("ok"), EX + "name", lit("one")),
        (iri("dup"), RDF_TYPE, iri(EX + "Thing")),
        (iri("dup"), EX + "name", lit("first")),
        (iri("dup"), EX + "name", lit("second")),
    ]
    triples = triples_df(spark, data)
    sub = shape_subgraph(triples, b.catalog, thing)
    assert sub.filter(
        F.col("s")["value"] == "dup").count() == 3  # both names kept
    _assert_frame_equal(spark, b.catalog, triples, sub, thing)


def test_recursive_shape_fixpoint_fetches_all_levels(spark):
    """Unlike the reference's CONSTRUCT (recursion broken,
    generate-query.ts:323-381), the walk re-enqueues recursive
    references until the frontier is exhausted — every nesting level
    of the data lands in the subgraph."""
    b = ShapeBuilder()
    # two-pass construction for the self-reference
    from ramp_shapes_spark.shapes import Property, RecordShape
    tree_id = iri(EX + "TreeNode")
    child_opt = b.optional(tree_id, EX + "TreeChildOpt")
    tree = RecordShape(
        id=tree_id,
        type_properties=(Property("t", PredicatePath(RDF_TYPE),
                                  b.constant(iri(EX + "TreeNode")),
                                  transient=True),),
        properties=(
            Property("name", PredicatePath(EX + "name"),
                     b.literal(datatype=XSD_STRING)),
            Property("child", PredicatePath(EX + "child"), child_opt),
        ),
    )
    b.catalog.add(tree)
    depth = 6
    data = []
    for i in range(depth):
        data.append((iri(f"t{i}"), RDF_TYPE, iri(EX + "TreeNode")))
        data.append((iri(f"t{i}"), EX + "name", lit(f"level{i}")))
        if i + 1 < depth:
            data.append((iri(f"t{i}"), EX + "child", iri(f"t{i+1}")))
    # disconnected distractor chain, reachable only from its own root
    data += [
        (iri("u0"), RDF_TYPE, iri(EX + "TreeNode")),
        (iri("u0"), EX + "name", lit("other")),
    ]
    triples = triples_df(spark, data)
    roots = triples.filter(
        (F.col("p") == RDF_TYPE) & (F.col("s")["value"] == "t0")
    ).select(F.col("s").alias("node"))
    sub = shape_subgraph(triples, b.catalog, tree_id, roots=roots)
    got = {r["s"]["value"] for r in sub.select("s").collect()}
    assert got == {f"t{i}" for i in range(depth)}  # all levels, no u0
    # frame over the seeded subgraph reproduces the t0 match exactly
    engine_full = FrameEngine(spark, b.catalog, triples,
                              diagnostics=False, track_errors=False)
    full = engine_full.frame(tree_id, candidates=[iri("t0")])
    engine_sub = FrameEngine(spark, b.catalog, sub,
                             diagnostics=False, track_errors=False)
    subr = engine_sub.frame(tree_id, candidates=[iri("t0")])
    want = json.loads(full.matches.collect()[0]["value"])
    got_v = json.loads(subr.matches.collect()[0]["value"])
    assert got_v == want
    # sanity: the fixture really nests all 6 levels
    d, v = 0, want
    while v.get("child"):
        v, d = v["child"], d + 1
    assert d == depth - 1


def test_closure_path_seeded_bfs(spark):
    b = ShapeBuilder()
    walker = b.record(
        EX + "Head",
        type_properties=[prop("t", RDF_TYPE, b.constant(iri(EX + "Head")),
                              transient=True)],
        properties=[prop("reach", ZeroOrMorePath(PredicatePath(EX + "next")),
                         b.set_of(b.resource(only_named=True)))],
    )
    data = [(iri("a0"), RDF_TYPE, iri(EX + "Head"))]
    for i in range(5):
        data.append((iri(f"a{i}"), EX + "next", iri(f"a{i+1}")))
    # second chain, not reachable from the seeded head
    for i in range(5):
        data.append((iri(f"b{i}"), EX + "next", iri(f"b{i+1}")))
    triples = triples_df(spark, data)
    roots = roots_of_type(triples, EX + "Head", RDF_TYPE)
    sub = shape_subgraph(triples, b.catalog, walker, roots=roots)
    edge_srcs = {r["s"]["value"]
                 for r in sub.filter(F.col("p") == EX + "next").collect()}
    assert edge_srcs == {f"a{i}" for i in range(5)}  # b-chain pruned
    _assert_frame_equal(spark, b.catalog, triples, sub, walker)


def test_alternative_and_inverse_paths(spark):
    b = ShapeBuilder()
    shape = b.record(
        EX + "P",
        type_properties=[prop("t", RDF_TYPE, b.constant(iri(EX + "P")),
                              transient=True)],
        properties=[
            prop("place",
                 AlternativePath((PredicatePath(EX + "city"),
                                  SequencePath((PredicatePath(EX + "addr"),
                                                PredicatePath(EX + "town"))))),
                 b.resource(only_named=True)),
            prop("boss", InversePath(PredicatePath(EX + "manages")),
                 b.optional(b.resource(only_named=True))),
        ],
    )
    data = [
        (iri("p1"), RDF_TYPE, iri(EX + "P")),
        (iri("p1"), EX + "city", iri("c1")),
        (iri("m1"), EX + "manages", iri("p1")),
        (iri("p2"), RDF_TYPE, iri(EX + "P")),
        (iri("p2"), EX + "addr", iri("ad1")),
        (iri("ad1"), EX + "town", iri("c2")),
        # distractor: manages edge to a non-candidate
        (iri("m2"), EX + "manages", iri("zz")),
    ]
    triples = triples_df(spark, data)
    roots = roots_of_type(triples, EX + "P", RDF_TYPE)
    sub = shape_subgraph(triples, b.catalog, shape, roots=roots)
    pairs = {(r["s"]["value"], r["o"]["value"]) for r in sub.collect()}
    assert ("m2", "zz") not in pairs
    assert ("m1", "p1") in pairs          # inverse step fetched
    assert ("ad1", "c2") in pairs         # sequence tail fetched
    _assert_frame_equal(spark, b.catalog, triples, sub, shape)


def test_list_shape_spine_and_heads(spark):
    b = ShapeBuilder()
    holder = b.record(
        EX + "Holder",
        type_properties=[prop("t", RDF_TYPE, b.constant(iri(EX + "Holder")),
                              transient=True)],
        properties=[prop("items", EX + "items",
                         b.list_of(b.literal(datatype=XSD_STRING)))],
    )
    def cons(name, head, tail):
        return [(iri(name), RDF_FIRST, lit(head)),
                (iri(name), RDF_REST, iri(tail) if tail else iri(RDF_NIL))]
    data = [
        (iri("h"), RDF_TYPE, iri(EX + "Holder")),
        (iri("h"), EX + "items", iri("l0")),
        *cons("l0", "x", "l1"), *cons("l1", "y", None),
        # distractor list nobody references
        *cons("z0", "junk", None),
    ]
    triples = triples_df(spark, data)
    roots = roots_of_type(triples, EX + "Holder", RDF_TYPE)
    sub = shape_subgraph(triples, b.catalog, holder, roots=roots)
    subs = {r["s"]["value"] for r in sub.select("s").collect()}
    assert subs == {"h", "l0", "l1"}  # z0 pruned
    _assert_frame_equal(spark, b.catalog, triples, sub, holder)


def test_empty_roots_empty_subgraph(spark):
    b = ShapeBuilder()
    thing = b.record(
        EX + "T",
        properties=[prop("name", EX + "name",
                         b.literal(datatype=XSD_STRING))],
    )
    triples = triples_df(spark, [(iri("a"), EX + "name", lit("x"))])
    roots = triples.filter(F.lit(False)).select(F.col("s").alias("node"))
    sub = shape_subgraph(triples, b.catalog, thing, roots=roots)
    assert sub.count() == 0
