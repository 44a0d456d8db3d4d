"""RDF-star quoted-triple (Quad) and Variable term support.

The reference's term union is ``NamedNode | BlankNode | Literal |
Variable | DefaultGraph | Quad`` (rdf-model.ts:5); the shape engine
never special-cases the last three — they are simply neither resources
(frame.ts:718 ``isResourceTerm``) nor literals, so resource/literal
shapes reject them, while dataset plumbing (equality, hashing, dedup,
joins) carries them by structural equality (``equalQuads``,
rdf-model.ts:286-296).  This engine encodes a quad's components into
the flat term struct's ``value`` as the reference ``toString``
serialization (rdf-model.ts:223-234) — injective, so struct equality
IS structural quad equality and no engine stage needs changes.
"""

import json

from ramp_shapes_spark.dataset import triples_df
from ramp_shapes_spark.frame import (
    ERR_NON_RESOURCE_TERM, ERR_TERM_TYPE, FrameEngine,
)
from ramp_shapes_spark.pyframe import frame_py
from ramp_shapes_spark.shapes import ShapeBuilder, prop
from ramp_shapes_spark.terms import (
    DEFAULT_GRAPH, RDF_TYPE, iri, lit, quad, variable,
)
from ramp_shapes_spark.ttl import parse_turtle
from ramp_shapes_spark.turtle_write import serialize_turtle

EX = "http://example.com/star#"


# -- term model ------------------------------------------------------------

def test_quad_structural_equality():
    a = quad(iri(EX + "s"), iri(EX + "p"), lit("v"))
    b = quad(iri(EX + "s"), iri(EX + "p"), lit("v"))
    c = quad(iri(EX + "s"), iri(EX + "p"), lit("w"))
    assert a == b and hash(a) == hash(b)
    assert a != c
    assert a.key() == b.key() != c.key()
    # graph component participates in equality (equalQuads includes it)
    g = quad(iri(EX + "s"), iri(EX + "p"), lit("v"), g=iri(EX + "g"))
    assert g != a
    # nested quoted triples recurse
    n1 = quad(a, iri(EX + "says"), iri(EX + "x"))
    n2 = quad(b, iri(EX + "says"), iri(EX + "x"))
    assert n1 == n2


def test_tostring_parity():
    # rdf-model.ts:223-234 layout: '<< ' + s + ' ' + p + ' ' + o + ' '
    # (+ graph + ' ' when non-default) + '>>'
    q = quad(iri(EX + "s"), iri(EX + "p"), iri(EX + "o"))
    assert q.n3() == f"<< <{EX}s> <{EX}p> <{EX}o> >>"
    qg = quad(iri(EX + "s"), iri(EX + "p"), iri(EX + "o"), g=iri(EX + "g"))
    assert qg.n3() == f"<< <{EX}s> <{EX}p> <{EX}o> <{EX}g> >>"
    assert variable("who").n3() == "?who"
    assert DEFAULT_GRAPH.n3() == "(default graph)"
    assert not quad(iri("s"), iri("p"), iri("o")).is_resource
    assert not variable("v").is_resource


# -- Turtle-star parse + write ----------------------------------------------

TTL_STAR = """
@prefix ex: <http://example.com/star#> .
<< ex:bob ex:age "23"^^<http://www.w3.org/2001/XMLSchema#integer> >>
    ex:certainty "0.9" .
ex:alice ex:claims << ex:bob ex:age "23"^^<http://www.w3.org/2001/XMLSchema#integer> >> .
"""


def test_turtle_star_parse():
    trips = parse_turtle(TTL_STAR)
    inner = quad(iri(EX + "bob"), iri(EX + "age"),
                 lit("23", dt="http://www.w3.org/2001/XMLSchema#integer"))
    assert trips[0] == (inner, EX + "certainty", lit("0.9"))
    assert trips[1] == (iri(EX + "alice"), EX + "claims", inner)
    # the same quoted triple in subject and object position is ONE term
    assert trips[0][0] == trips[1][2]


def test_turtle_star_write_roundtrip():
    trips = parse_turtle(TTL_STAR)
    text = serialize_turtle(trips, prefixes={"ex": EX})
    back = parse_turtle(text)
    assert sorted(back, key=lambda t: (t[0].key(), t[1], t[2].key())) == \
        sorted(trips, key=lambda t: (t[0].key(), t[1], t[2].key()))


# -- engine behavior ---------------------------------------------------------

def _star_setup(spark):
    """Graph annotating a quoted triple; Stmt frames the annotation.

    Reference semantics for quad terms in object position: they match
    NEITHER resource nor literal shapes — ``matchesTerm``
    (common.ts:21-47) accepts only NamedNode/BlankNode for resource
    shapes and Literal for literal shapes, keepAsTerm notwithstanding.
    Stmt is type-gated, so ``strictByType`` (frame.ts:249) makes every
    property required: the non-matching quad value surfaces as code 221
    even through the optional wrapper (frameOptional re-frames the item
    with required=true on mismatch, frame.ts:435-440).  The quoted
    triple itself still participates in dataset dedup/candidates by
    structural equality.
    """
    b = ShapeBuilder()
    stmt = b.record(
        EX + "Stmt",
        type_properties=[prop("t", RDF_TYPE, b.constant(iri(EX + "Stmt")),
                              transient=True)],
        properties=[
            # optional keepAsTerm resource over a quad-valued predicate:
            # never matches (quad is non-resource) → null
            prop("about", EX + "about",
                 b.optional(b.resource(keep_as_term=True))),
            prop("certainty", EX + "certainty", b.literal()),
        ],
    )
    inner = quad(iri(EX + "bob"), iri(EX + "age"), lit("23"))
    triples = [
        (iri(EX + "st1"), RDF_TYPE, iri(EX + "Stmt")),
        (iri(EX + "st1"), EX + "about", inner),
        (iri(EX + "st1"), EX + "certainty", lit("0.9")),
        # duplicate assertion of the quoted triple must dedup away
        (iri(EX + "st1"), EX + "about",
         quad(iri(EX + "bob"), iri(EX + "age"), lit("23"))),
    ]
    return b, stmt, triples


def test_quad_object_rejected_by_shapes_but_deduped(spark):
    b, stmt, triples = _star_setup(spark)
    df = triples_df(spark, triples)
    # structural dedup: the two identical quoted-triple rows collapse
    assert df.count() == 3
    engine = FrameEngine(spark, b.catalog, df)
    res = engine.frame(stmt)
    # quad value fails the (type-gated, hence required) resource shape
    assert res.matches.count() == 0
    first = res.first_error()
    assert first is not None and first[0] == ERR_TERM_TYPE

    # interpreter parity: same code, thrown (reference throws RampError)
    try:
        frame_py(b.catalog, triples, stmt)
        raised = None
    except Exception as exc:
        raised = getattr(exc, "code", None)
    assert raised == ERR_TERM_TYPE


def test_quad_candidate_is_non_resource(spark):
    """A record framed AT a quad term → code 205 (frame.ts:222-226)."""
    b, stmt, triples = _star_setup(spark)
    inner = quad(iri(EX + "bob"), iri(EX + "age"), lit("23"))
    engine = FrameEngine(spark, b.catalog, triples_df(spark, triples))
    res = engine.frame(stmt, candidates=[inner])
    assert res.matches.count() == 0
    first = res.first_error()
    assert first is not None and first[0] == ERR_NON_RESOURCE_TERM

    # interpreter parity (same guard in pyframe.frame_record)
    try:
        frame_py(b.catalog, triples, stmt, candidates=[inner])
        raised = None
    except Exception as exc:  # RampError
        raised = getattr(exc, "code", None)
    assert raised == ERR_NON_RESOURCE_TERM
