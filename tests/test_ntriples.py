"""Distributed N-Triples reader/writer (ntriples.py): roundtrip term
equality, escape handling via the single-pass JSON decode, strict-mode
loud failures, and comment/blank skipping."""

import pytest

from ramp_shapes_spark.dataset import triples_df
from ramp_shapes_spark.ntriples import read_ntriples, write_ntriples
from ramp_shapes_spark.terms import (
    RDF_LANG_STRING, RDF_TYPE, XSD_INTEGER, XSD_STRING, bnode, iri, lit,
)

EX = "http://example.com/nt#"


def _key(row):
    def t(x):
        return (x["kind"], x["value"], x["dt"], x["lang"])
    return (t(row["s"]), row["p"], t(row["o"]))


def test_roundtrip_struct_equality(spark, tmp_path):
    data = [
        (iri("http://a"), RDF_TYPE, iri(EX + "Thing")),
        (iri("http://a"), EX + "name", lit('quo"te \\ back\nnew\ttab')),
        (iri("http://a"), EX + "label", lit("héllo→世界", lang="en-US")),
        (iri("http://a"), EX + "n", lit("42", dt=XSD_INTEGER)),
        (bnode("b1"), EX + "ref", iri("http://a")),
        (iri("http://a"), EX + "b", bnode("b1")),
        (iri("http://a"), EX + "empty", lit("")),
    ]
    triples = triples_df(spark, data)
    path = str(tmp_path / "out.nt")
    write_ntriples(triples, path)
    back = read_ntriples(spark, path)
    want = {((s.kind, s.value, s.dt, s.lang), p,
             (o.kind, o.value, o.dt, o.lang)) for (s, p, o) in data}
    got = {_key(r) for r in back.collect()}
    assert got == want


def test_parse_canonical_forms(spark, tmp_path):
    text = "\n".join([
        "# a comment",
        "",
        '<http://s> <http://p> "plain" .',
        '<http://s> <http://p2> "x"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        '<http://s> <http://p3> "hi"@en .',
        "_:b0 <http://p4> _:b1 .",
        '<http://s> <http://p5> "u\\u00e9" .',  # \\uXXXX UCHAR
        '<http://s><http://p6><http://o>.',  # hmm: no spaces — invalid per our master
    ])
    # drop the last (no-whitespace) line: the master regex requires
    # whitespace between terms, as every serializer emits
    text = "\n".join(text.split("\n")[:-1]) + "\n"
    f = tmp_path / "in.nt"
    f.write_text(text, encoding="utf-8")
    got = {_key(r) for r in read_ntriples(spark, str(f)).collect()}
    assert (("iri", "http://s", None, None), "http://p",
            ("lit", "plain", XSD_STRING, None)) in got
    assert (("iri", "http://s", None, None), "http://p2",
            ("lit", "x", XSD_INTEGER, None)) in got
    assert (("iri", "http://s", None, None), "http://p3",
            ("lit", "hi", RDF_LANG_STRING, "en")) in got
    assert (("bnode", "b0", None, None), "http://p4",
            ("bnode", "b1", None, None)) in got
    assert (("iri", "http://s", None, None), "http://p5",
            ("lit", "ué", XSD_STRING, None)) in got
    assert len(got) == 5


def test_duplicates_deduplicate(spark, tmp_path):
    f = tmp_path / "dup.nt"
    f.write_text('<http://s> <http://p> "v" .\n'
                 '<http://s> <http://p> "v" .\n', encoding="utf-8")
    df = read_ntriples(spark, str(f))
    assert df.count() == 1
    # tid is a stable content hash
    a = df.collect()[0]["tid"]
    b = read_ntriples(spark, str(f)).collect()[0]["tid"]
    assert a == b


@pytest.mark.parametrize("bad", [
    "garbage line .",
    '<http://s> <http://p> "unterminated .',
    '<http://s> <http://p> "bad\\qescape" .',   # invalid ECHAR
    '<http://s> <http://p> "astral\\U0001F600" .',  # unsupported UCHAR
    '<http://s> <http://p> missing-dot "x"',
])
def test_strict_raises_on_malformed(spark, tmp_path, bad):
    f = tmp_path / "bad.nt"
    f.write_text('<http://ok> <http://p> "fine" .\n' + bad + "\n",
                 encoding="utf-8")
    with pytest.raises(ValueError, match="malformed"):
        read_ntriples(spark, str(f))
    # non-strict keeps the good rows and drops the malformed ones
    assert read_ntriples(spark, str(f), strict=False).count() == 1


def test_writer_rejects_non_rdf_terms(spark, tmp_path):
    from ramp_shapes_spark.terms import variable
    triples = triples_df(
        spark, [(variable("v"), EX + "p", lit("x"))])
    with pytest.raises(Exception, match="unsupported term kind"):
        write_ntriples(triples, str(tmp_path / "x.nt"))


def test_stream_ntriples_ingest(spark, tmp_path):
    """Two drops (second contains a malformed line): valid triples
    land exactly-once in per-batch bucketed tables, the bad line in
    the dead-letter sink."""
    import glob
    import os

    from ramp_shapes_spark.streaming.ingest import stream_ntriples_ingest

    inp = tmp_path / "drops"
    inp.mkdir()
    root = str(tmp_path / "kg")
    (inp / "drop1.nt").write_text(
        '<http://a> <http://p> "one" .\n'
        '<http://a> <http://p2> <http://b> .\n', encoding="utf-8")
    q = stream_ntriples_ingest(spark, str(inp), root, n_buckets=4)
    q.awaitTermination(120)
    (inp / "drop2.nt").write_text(
        '<http://c> <http://p> "two" .\n'
        'this line is garbage\n', encoding="utf-8")
    q = stream_ntriples_ingest(spark, str(inp), root, n_buckets=4)
    q.awaitTermination(120)

    batch_dirs = sorted(glob.glob(os.path.join(root, "batches", "*", "data")))
    assert len(batch_dirs) == 2
    total = sum(spark.read.parquet(d).count() for d in batch_dirs)
    assert total == 3
    dead = sorted(glob.glob(os.path.join(root, "deadletter", "*")))
    assert len(dead) == 1
    bad_lines = spark.read.text(dead[0]).collect()
    assert [r["value"] for r in bad_lines] == ["this line is garbage"]


def test_nquads_roundtrip_and_default_graph(spark, tmp_path):
    from pyspark.sql import functions as F

    from ramp_shapes_spark.ntriples import read_nquads, write_nquads

    text = "\n".join([
        "# quads",
        '<http://s> <http://p> "three terms" .',              # default graph
        '<http://s> <http://p> "in g1" <http://g1> .',
        '_:b0 <http://p> <http://o> _:g2 .',                  # bnode graph
        '<http://s> <http://p2> "lit with @ and <>"@en <http://g1> .',
    ])
    f = tmp_path / "in.nq"
    f.write_text(text + "\n", encoding="utf-8")
    df = read_nquads(spark, str(f))
    got = {(r["s"]["value"], r["p"], r["o"]["value"],
            r["g"]["kind"], r["g"]["value"]) for r in df.collect()}
    assert got == {
        ("http://s", "http://p", "three terms", "dgraph", ""),
        ("http://s", "http://p", "in g1", "iri", "http://g1"),
        ("b0", "http://p", "http://o", "bnode", "g2"),
        ("http://s", "http://p2", "lit with @ and <>", "iri", "http://g1"),
    }
    # writer roundtrip: re-serialize and re-parse
    out = tmp_path / "out.nq"
    write_nquads(df, str(out))
    again = {(r["s"]["value"], r["p"], r["o"]["value"],
              r["g"]["kind"], r["g"]["value"])
             for r in read_nquads(spark, str(out)).collect()}
    assert again == got
    # graph slicing is a plain column filter
    g1 = df.filter((F.col("g")["kind"] == "iri")
                   & (F.col("g")["value"] == "http://g1"))
    assert g1.count() == 2


def test_nquads_strict_rejects_bad_graph_term(spark, tmp_path):
    from ramp_shapes_spark.ntriples import read_nquads

    f = tmp_path / "bad.nq"
    f.write_text('<http://s> <http://p> "v" "not-a-graph" .\n',
                 encoding="utf-8")
    with pytest.raises(ValueError, match="malformed"):
        read_nquads(spark, str(f))


def test_strict_rejects_json_only_solidus_escape(spark, tmp_path):
    r"""``\/`` is a legal JSON escape but not an N-Triples ECHAR — the
    strict reader must flag it instead of silently decoding to ``/``
    (round-5 review).  ``\\/`` (escaped backslash then slash) stays
    legal."""
    import pytest

    from ramp_shapes_spark.ntriples import read_ntriples

    bad = tmp_path / "bad.nt"
    bad.write_text('<http://x/s> <http://x/p> "a\\/b" .\n')
    with pytest.raises(ValueError, match="malformed"):
        read_ntriples(spark, str(bad))

    good = tmp_path / "good.nt"
    good.write_text('<http://x/s> <http://x/p> "a\\\\/b" .\n')
    rows = read_ntriples(spark, str(good)).collect()
    assert len(rows) == 1
    assert rows[0]["o"]["value"] == "a\\/b"
