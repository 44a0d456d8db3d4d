"""Distributed N-Triples source/sink — pure column expressions.

N-Triples (W3C RDF 1.1) is the line-oriented RDF interchange format:
one triple per line, no cross-line state — which makes it the ONLY
standard RDF syntax that splits cleanly at 100 TB (Turtle/TriG need a
stateful parser per document; ttl.py handles those driver-side for
fixtures and shape configs).  The reference consumes such files
through N3.js; here both directions are JVM-side column programs over
``spark.read.text`` / ``DataFrameWriter.text`` — no Python in either
path, arbitrary line-split parallelism.

Reader design:

* one anchored master regex splits each line into subject / predicate /
  object lexemes; the object lexeme is discriminated by its first
  characters (``<`` iri, ``_:`` bnode, ``"`` literal);
* escape decoding (ECHAR ``\\t \\b \\n \\r \\f \\" \\\\`` + UCHAR
  ``\\uXXXX``) is a SINGLE pass: the lexeme is wrapped as a JSON
  string and decoded with ``from_json`` — the escape grammars are
  identical, and chained ``replace`` calls cannot decode escapes
  correctly (``\\\\n`` must yield backslash + ``n``, not a newline).
  An invalid sequence makes ``from_json`` return null, which doubles
  as the malformed-row detector;
* ``strict=True`` (default) runs one validation action and raises with
  sample lines if any non-comment line failed to parse — a malformed
  dump should fail loudly, not silently shrink;
* plain literals normalize to ``xsd:string`` and ``@lang`` to
  ``rdf:langString`` (the engine's term normalization, terms.py:144);
* limitations, rejected LOUDLY in strict mode rather than mis-parsed:
  ``\\U........`` (supplementary-plane UCHAR) and ``\\'`` escapes
  (legal but emitted by no mainstream serializer), and bnode labels
  containing ``.``.  The converse JSON-only escape ``\\/`` (legal JSON,
  illegal N-Triples ECHAR) is explicitly flagged invalid rather than
  silently decoded.

Writer: canonical form — ``xsd:string`` literals print plain,
``@lang`` for language strings, ``^^<dt>`` otherwise; raw tab stays
raw (legal inside N-Triples literals).  Non-RDF term kinds (variables,
quads, default-graph) poison the write with ``raise_error`` instead of
silently dropping rows.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .terms import RDF_LANG_STRING, XSD_STRING

# IRIREF body: no angle brackets / quote / braces / pipe / caret /
# backtick / space / control chars; backslash only via UCHAR (decoded
# later; an invalid escape surfaces as a null value)
_IRI = r'[^<>"{}|^`\x00-\x20]*'
_BNODE = r"_:[A-Za-z0-9_][A-Za-z0-9_-]*"
_LIT = r'"(?:[^"\\]|\\.)*"'
_LANG = r"[a-zA-Z]+(?:-[a-zA-Z0-9]+)*"

_MASTER = (
    r"^[ \t]*(<" + _IRI + r">|" + _BNODE + r")"
    r"[ \t]+<(" + _IRI + r")>"
    r"[ \t]+(.*?)[ \t]*\.[ \t]*$"
)
_OBJECT_OK = (
    r"^(?:<" + _IRI + r">|" + _BNODE + r"|" + _LIT
    + r"(?:\^\^<" + _IRI + r">|@" + _LANG + r")?)$"
)


def _decode(col) -> F.Column:
    """Single-pass ECHAR/UCHAR unescape via the JSON string grammar;
    null on any invalid sequence."""
    return F.from_json(
        F.concat(F.lit('{"v":"'), col, F.lit('"}')),
        "v string",
        {"allowUnquotedControlChars": "true"},
    )["v"]


def _term(kind, value, dt=None, lang=None) -> F.Column:
    null_s = F.lit(None).cast("string")
    return F.struct(
        kind.alias("kind"), value.alias("value"),
        (dt if dt is not None else null_s).alias("dt"),
        (lang if lang is not None else null_s).alias("lang"),
    )


def parse_ntriples_lines(lines: DataFrame,
                         line_col: str = "line") -> DataFrame:
    """Core parser: a pure column transformation from raw text lines to
    the input columns plus ``(s, p, o, invalid)`` — comment/blank lines
    dropped, every other line either parsed or flagged.  Input columns
    other than ``line_col`` pass through untouched (the N-Quads reader
    rides its graph lexeme alongside).  Being expression-only it
    composes with BOTH batch and Structured Streaming inputs
    (``readStream.text`` → this → a dead-letter split on ``invalid``;
    see streaming/ingest.py:stream_ntriples_ingest)."""
    passthrough = list(lines.columns)
    content = lines.filter(
        ~F.trim(line_col).startswith("#") & (F.trim(line_col) != ""))

    parsed = content.select(
        *passthrough,
        F.regexp_extract(line_col, _MASTER, 1).alias("__subj"),
        F.regexp_extract(line_col, _MASTER, 2).alias("__pred"),
        F.regexp_extract(line_col, _MASTER, 3).alias("__obj"),
    )

    s_col = F.when(
        F.col("__subj").startswith("<"),
        _term(F.lit("iri"),
              _decode(F.regexp_extract("__subj", r"^<(.*)>$", 1))),
    ).otherwise(_term(F.lit("bnode"), F.substring("__subj", 3, 1 << 20)))

    p_col = _decode(F.col("__pred"))

    obj = F.col("__obj")
    lit_value = _decode(
        F.regexp_extract("__obj", r'^"((?:[^"\\]|\\.)*)"', 1))
    dt_raw = F.nullif(
        F.regexp_extract("__obj", r"\^\^<(" + _IRI + r")>$", 1), F.lit(""))
    lang = F.nullif(
        F.regexp_extract(
            "__obj", r'^"(?:[^"\\]|\\.)*"@(' + _LANG + r")$", 1),
        F.lit(""))
    lit_dt = (
        F.when(lang.isNotNull(), F.lit(RDF_LANG_STRING))
        .when(dt_raw.isNotNull(), _decode(dt_raw))  # null if bad escape
        .otherwise(F.lit(XSD_STRING))
    )
    o_col = (
        F.when(obj.startswith("<"),
               _term(F.lit("iri"),
                     _decode(F.regexp_extract("__obj", r"^<(.*)>$", 1))))
        .when(obj.startswith("_:"),
              _term(F.lit("bnode"), F.substring("__obj", 3, 1 << 20)))
        .otherwise(_term(F.lit("lit"), lit_value, lit_dt, lang))
    )

    # \/ is a legal JSON escape but NOT an N-Triples ECHAR — the JSON
    # decode would silently accept it, so flag any lexeme where a '/'
    # follows an odd number of backslashes (strip \\ pairs, then look
    # for a remaining \/)
    def _bad_solidus(c: F.Column) -> F.Column:
        return F.replace(c, F.lit("\\\\"), F.lit("")).contains("\\/")

    rows = parsed.select(
        *passthrough,
        s_col.alias("s"), p_col.alias("p"), o_col.alias("o"),
        ((F.col("__subj") == "") | ~obj.rlike(_OBJECT_OK)
         | _bad_solidus(F.col("__subj")) | _bad_solidus(F.col("__pred"))
         | _bad_solidus(F.col("__obj"))).alias("__bad"),
    )
    invalid = (
        F.col("__bad")
        | F.col("s")["value"].isNull() | F.col("p").isNull()
        | F.col("o")["value"].isNull()
        | ((F.col("o")["kind"] == "lit") & F.col("o")["dt"].isNull())
    )
    return rows.select(*passthrough, "s", "p", "o",
                       invalid.alias("invalid"))


def dataset_from_parsed(parsed: DataFrame) -> DataFrame:
    """Valid parsed rows → canonical ``(tid, s, p, o)``: duplicate
    statements deduplicate (rdf-dataset insert semantics, dataset.py)
    and tids are content hashes, stable across recomputation/retries."""
    return (
        parsed.filter(~F.col("invalid")).select("s", "p", "o")
        .dropDuplicates(["s", "p", "o"])
        .select(
            F.xxhash64(F.col("s")["kind"], F.col("s")["value"], F.col("p"),
                       F.col("o")["kind"], F.col("o")["value"],
                       F.col("o")["dt"], F.col("o")["lang"]).alias("tid"),
            "s", "p", "o",
        )
    )


def read_ntriples(spark: SparkSession, path: str,
                  strict: bool = True) -> DataFrame:
    """Parse N-Triples file(s) into the engine's canonical
    ``(tid, s, p, o)`` layout.  Line-parallel distributed parse;
    ``strict=True`` raises with sample lines if anything failed to
    parse."""
    rows = parse_ntriples_lines(
        spark.read.text(path).select(F.col("value").alias("line")))
    if strict:
        bad = rows.filter("invalid").select("line").limit(5).collect()
        if bad:
            sample = "\n  ".join(r["line"] for r in bad)
            raise ValueError(
                f"read_ntriples: malformed N-Triples line(s) in {path} "
                f"(first up to 5):\n  {sample}")
    return dataset_from_parsed(rows)


def _nt_escape(col) -> F.Column:
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    return F.replace(out, F.lit("\r"), F.lit("\\r"))


def nt_term_col(term) -> F.Column:
    """N-Triples lexical form of a TERM struct column (canonical:
    plain ``xsd:string``, ``@lang`` for language strings)."""
    return (
        F.when(term["kind"] == "iri",
               F.concat(F.lit("<"), term["value"], F.lit(">")))
        .when(term["kind"] == "bnode",
              F.concat(F.lit("_:"), term["value"]))
        .when(term["kind"] == "lit", F.concat(
            F.lit('"'), _nt_escape(term["value"]), F.lit('"'),
            F.when(term["lang"].isNotNull(),
                   F.concat(F.lit("@"), term["lang"]))
            .when(term["dt"] == XSD_STRING, F.lit(""))
            .otherwise(F.concat(F.lit("^^<"), term["dt"], F.lit(">"))),
        ))
        # vars/quads/default-graph are not N-Triples terms: poison the
        # write instead of silently dropping rows
        .otherwise(F.raise_error(F.concat(
            F.lit("write_ntriples: unsupported term kind "),
            term["kind"])))
    )


def write_ntriples(triples: DataFrame, path: str,
                   partitions: Optional[int] = None) -> None:
    """Serialize ``(s, p, o)`` rows as ``.nt`` text, one document per
    partition (each line is self-contained, so any partitioning is
    valid output)."""
    out = triples.select(F.concat(
        nt_term_col(F.col("s")), F.lit(" <"), F.col("p"), F.lit("> "),
        nt_term_col(F.col("o")), F.lit(" ."),
    ).alias("value"))
    if partitions:
        out = out.repartition(partitions)
    out.write.mode("overwrite").text(path)


# ---------------------------------------------------------------------------
# N-Quads: the same line grammar with an optional graph-label term
# (iri or bnode) before the terminating dot — the named-graph analog
# of the reference's Quad.graph position (rdf-model.ts Quad; absent
# label == the default graph, terms.py:156).
# ---------------------------------------------------------------------------

_MASTER_Q = (
    r"^[ \t]*(<" + _IRI + r">|" + _BNODE + r")"
    r"[ \t]+<(" + _IRI + r")>"
    r"[ \t]+(.*?)"
    r"(?:[ \t]+(<" + _IRI + r">|" + _BNODE + r"))?[ \t]*\.[ \t]*$"
)


def read_nquads(spark: SparkSession, path: str,
                strict: bool = True) -> DataFrame:
    """Parse N-Quads file(s) into ``(tid, s, p, o, g)``; ``g`` is a
    TERM struct — the graph label, or the default-graph term when the
    line has three terms (plain N-Triples lines are valid N-Quads).
    The triple columns reuse the N-Triples decoding path; callers that
    want one graph slice filter on ``g`` before framing (a plain
    column filter, pushdown-friendly)."""
    lines = spark.read.text(path).select(F.col("value").alias("line"))
    content = lines.filter(
        ~F.trim("line").startswith("#") & (F.trim("line") != ""))
    # re-assemble a triple-only line for the shared parser, keeping the
    # graph lexeme aside
    split = content.select(
        "line",
        F.regexp_extract("line", _MASTER_Q, 1).alias("subj"),
        F.regexp_extract("line", _MASTER_Q, 2).alias("pred"),
        F.regexp_extract("line", _MASTER_Q, 3).alias("obj"),
        F.nullif(F.regexp_extract("line", _MASTER_Q, 4),
                 F.lit("")).alias("glex"),
    )
    triple_lines = split.select(
        "line", "glex",
        F.concat(F.col("subj"), F.lit(" <"), F.col("pred"), F.lit("> "),
                 F.col("obj"), F.lit(" .")).alias("__tline"),
        (F.col("subj") == "").alias("__nomatch"),
    )
    parsed = parse_ntriples_lines(
        triple_lines.select(F.col("__tline").alias("line"),
                            "glex", F.col("line").alias("orig"),
                            "__nomatch"),
    )
    # parse_ntriples_lines keeps only its ``line`` projection — re-join
    # is avoided by recomputing on the same row set: select carries the
    # extra columns through because the parser projects from its input
    g_col = (
        F.when(F.col("glex").isNull(),
               _term(F.lit("dgraph"), F.lit("")))
        .when(F.col("glex").startswith("<"),
              _term(F.lit("iri"),
                    _decode(F.regexp_extract("glex", r"^<(.*)>$", 1))))
        .otherwise(_term(F.lit("bnode"), F.substring("glex", 3, 1 << 20)))
    )
    rows = parsed.select(
        F.col("orig").alias("line"), "s", "p", "o",
        g_col.alias("g"),
        (F.col("invalid") | F.col("__nomatch")
         | (F.col("glex").isNotNull() & g_col["value"].isNull())
         ).alias("invalid"),
    )
    if strict:
        bad = rows.filter("invalid").select("line").limit(5).collect()
        if bad:
            sample = "\n  ".join(r["line"] for r in bad)
            raise ValueError(
                f"read_nquads: malformed N-Quads line(s) in {path} "
                f"(first up to 5):\n  {sample}")
    good = rows.filter(~F.col("invalid")).select("s", "p", "o", "g")
    return (
        good.dropDuplicates(["s", "p", "o", "g"])
        .select(
            F.xxhash64(F.col("s")["kind"], F.col("s")["value"], F.col("p"),
                       F.col("o")["kind"], F.col("o")["value"],
                       F.col("o")["dt"], F.col("o")["lang"],
                       F.col("g")["kind"], F.col("g")["value"])
            .alias("tid"),
            "s", "p", "o", "g",
        )
    )


def write_nquads(quads: DataFrame, path: str,
                 partitions: Optional[int] = None) -> None:
    """Serialize ``(s, p, o, g)`` rows as N-Quads text; default-graph
    rows print as plain triples."""
    g = F.col("g")
    g_lex = (
        F.when(g["kind"] == "dgraph", F.lit(""))
        .otherwise(F.concat(F.lit(" "), nt_term_col(g)))
    )
    out = quads.select(F.concat(
        nt_term_col(F.col("s")), F.lit(" <"), F.col("p"), F.lit("> "),
        nt_term_col(F.col("o")), g_lex, F.lit(" ."),
    ).alias("value"))
    if partitions:
        out = out.repartition(partitions)
    out.write.mode("overwrite").text(path)
