"""Property-based frame∘flatten roundtrip (hypothesis).

The reference's core contract is that ``frame`` and ``flatten`` are
exact inverses (README.md:20-24; the fixture suite pins 23 hand-picked
cases).  Here hypothesis generates arbitrary values for a composite
shape — record with required/optional/set/list/anyOf properties over
string and integer literals — and checks the roundtrip:

* at high example count against the validated pure-Python
  reference-semantics oracle (pyflatten → pyframe), and
* at a smaller example count through the DISTRIBUTED path
  (flatten_triples' JVM emitter → FrameEngine), batching each example
  list into one DataFrame.

Strategy scope: text excludes surrogates (not encodable) and control
characters; integers are int64 (the engine's relational layer types
xsd:integer columns as LongType).
"""

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ramp_shapes_spark.pyflatten import (
    deterministic_bnode_generator, flatten_py,
)
from ramp_shapes_spark.pyframe import encode_refs, frame_py
from ramp_shapes_spark.shapes import ShapeBuilder, prop
from ramp_shapes_spark.terms import (
    RDF_TYPE, XSD_INTEGER, XSD_STRING, iri,
)

EX = "http://example.com/prop#"


def _build():
    b = ShapeBuilder()
    doc = b.record(
        EX + "Doc",
        type_properties=[prop("t", RDF_TYPE, b.constant(iri(EX + "Doc")),
                              transient=True)],
        properties=[
            prop("name", EX + "name", b.literal(datatype=XSD_STRING)),
            prop("tags", EX + "tag",
                 b.set_of(b.literal(datatype=XSD_STRING))),
            prop("nick", EX + "nick",
                 b.optional(b.literal(datatype=XSD_STRING))),
            prop("kind", EX + "kind",
                 b.any_of([b.literal(datatype=XSD_STRING),
                           b.literal(datatype=XSD_INTEGER)])),
            prop("nums", EX + "nums",
                 b.list_of(b.literal(datatype=XSD_INTEGER))),
        ],
    )
    return b, doc


_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
    max_size=30,
)
_int64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)

_value = st.fixed_dictionaries(
    {
        "name": _text,
        # set semantics deduplicate at the graph level, so distinct
        # items roundtrip exactly
        "tags": st.lists(_text, unique=True, max_size=4),
        "kind": st.one_of(_text, _int64),
        "nums": st.lists(_int64, max_size=4),
    },
    optional={"nick": _text},
)


def _canon(v) -> str:
    out = dict(encode_refs(v))  # drops UNDEFINED (absent optional) keys
    out["tags"] = sorted(out["tags"])        # set: order-free
    if out.get("nick") is None:
        out.pop("nick", None)                # optional: absent == empty
    return json.dumps(out, sort_keys=True, ensure_ascii=False)


@settings(max_examples=250, deadline=None)
@given(_value)
def test_python_oracle_roundtrip(value):
    b, doc = _build()
    triples = flatten_py(b.catalog, doc, value,
                         deterministic_bnode_generator("prop"))
    framed = frame_py(b.catalog, triples, doc)
    assert [_canon(f) for f in framed] == [_canon(value)]


@settings(max_examples=2, deadline=None, derandomize=True, database=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_value, min_size=1, max_size=6))
def test_spark_roundtrip_batch(spark, values):
    from pyspark.sql import functions as F

    from ramp_shapes_spark.flatten import flatten_triples
    from ramp_shapes_spark.frame import FrameEngine

    b, doc = _build()
    rows = [(str(i), json.dumps(v, ensure_ascii=False))
            for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "seed string, value string")
    triples = flatten_triples(df, b.catalog, doc, seed_col="seed")
    engine = FrameEngine(spark, b.catalog, triples,
                         diagnostics=False, track_errors=False)
    res = engine.frame(doc)
    got = sorted(_canon(json.loads(r["value"]))
                 for r in res.matches.collect())
    assert got == sorted(_canon(v) for v in values)
