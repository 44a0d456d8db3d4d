"""Column-expression helpers shared by the frame/flatten compilers.

Everything here stays JVM-side (whole-stage codegen): JSON assembly is
done with string concatenation over `to_json`-escaped fragments rather
than Python UDFs, so the hot path never crosses the Python boundary.
"""

from __future__ import annotations

import json
from typing import Optional, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

from .terms import Term


def json_quote_expr(col: Column) -> Column:
    """JSON string literal (with full escaping) of a string column.

    Uses the JVM JSON writer via ``to_json(struct(v))`` and strips the
    ``{"v":`` wrapper — correct escaping for every control character
    without leaving whole-stage codegen.
    """
    j = F.to_json(F.struct(col.alias("v")))
    return F.substring(j, F.lit(6), F.length(j) - F.lit(6))


def n3_escape(col: Column) -> Column:
    """Reference ``escapeRdfValue`` (rdf-model.ts)."""
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    return out


def n3_col(term: Column) -> Column:
    """Reference display form of a TERM struct (rdf-model.ts:202-236)."""
    return (
        F.when(term["kind"] == "iri", F.concat(F.lit("<"), term["value"], F.lit(">")))
        .when(term["kind"] == "bnode", F.concat(F.lit("_:"), term["value"]))
        .when(term["kind"] == "var", F.concat(F.lit("?"), term["value"]))
        .when(term["kind"] == "dgraph", F.lit("(default graph)"))
        # quad terms carry their reference toString form in ``value``
        .when(term["kind"] == "quad", term["value"])
        .otherwise(
            F.concat(
                F.lit('"'), n3_escape(term["value"]), F.lit('"'),
                F.when(term["lang"].isNotNull(), F.concat(F.lit("@"), term["lang"]))
                .otherwise(F.concat(F.lit("^^<"), term["dt"], F.lit(">"))),
            )
        )
    )


def term_key(term: Column) -> Column:
    """Collision-free flat string key of a TERM struct."""
    return F.concat_ws(
        "\x1f", term["kind"], term["value"],
        F.coalesce(term["dt"], F.lit("\x00")),
        F.coalesce(term["lang"], F.lit("\x00")),
    )


def term_eq_const(term: Column, const: Term) -> Column:
    cond = (term["kind"] == const.kind) & (term["value"] == const.value)
    cond = cond & (
        term["dt"].isNull() if const.dt is None else (term["dt"] == const.dt)
    )
    cond = cond & (
        term["lang"].isNull() if const.lang is None else (term["lang"] == const.lang)
    )
    return cond


def is_resource_col(term: Column) -> Column:
    return term["kind"].isin("iri", "bnode")


def term_json_col(term: Column) -> Column:
    """``keepAsTerm`` JSON encoding of a TERM struct column."""
    return F.concat(
        F.lit('{"@term":{"kind":'), json_quote_expr(term["kind"]),
        F.lit(',"value":'), json_quote_expr(term["value"]),
        F.when(term["dt"].isNotNull(),
               F.concat(F.lit(',"dt":'), json_quote_expr(term["dt"])))
        .otherwise(F.lit("")),
        F.when(term["lang"].isNotNull(),
               F.concat(F.lit(',"lang":'), json_quote_expr(term["lang"])))
        .otherwise(F.lit("")),
        F.lit("}}"),
    )


def jstr(value) -> str:
    return json.dumps(value, ensure_ascii=False)


# ---------------------------------------------------------------------------
# SQL-expression-STRING builders.
#
# The frame compiler composes thousands of scalar expressions; building
# them as ``Column`` objects costs one Py4J roundtrip per node (~2 ms on
# a microVM → tens of seconds per query just to *construct* the plan).
# Building them as SQL strings is pure Python; the JVM parses the final
# expression once per ``F.expr``/``selectExpr`` call.  Semantics are
# identical — both forms resolve to the same Catalyst trees.
# ---------------------------------------------------------------------------

TERM_SQL = "struct<kind:string,value:string,dt:string,lang:string>"
NULL_TERM_SQL = f"CAST(NULL AS {TERM_SQL})"
OBJS_SQL = f"array<struct<tid:bigint,o:{TERM_SQL}>>"
EMPTY_OBJS_SQL = f"CAST(array() AS {OBJS_SQL})"


def s_str(v: str) -> str:
    """SQL single-quoted string literal with full escaping (backslash,
    quote, control characters via ``\\uXXXX``)."""
    out = []
    for ch in v:
        o = ord(ch)
        if ch == "\\":
            out.append("\\\\")
        elif ch == "'":
            out.append("\\'")
        elif o < 32 or o == 127:
            out.append("\\u%04X" % o)
        else:
            out.append(ch)
    return "'" + "".join(out) + "'"


def s_json_quote(e: str) -> str:
    """String variant of :func:`json_quote_expr`."""
    j = f"to_json(struct(({e}) AS v))"
    return f"substring({j}, 6, length({j}) - 6)"


def s_n3(t: str) -> str:
    """String variant of :func:`n3_col` (term display form)."""
    esc = f"({t}).value"
    for a, b in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r")):
        esc = f"replace({esc}, {s_str(a)}, {s_str(b)})"
    return (
        f"CASE WHEN ({t}).kind = 'iri' THEN concat('<', ({t}).value, '>') "
        f"WHEN ({t}).kind = 'bnode' THEN concat('_:', ({t}).value) "
        f"WHEN ({t}).kind = 'var' THEN concat('?', ({t}).value) "
        f"WHEN ({t}).kind = 'dgraph' THEN '(default graph)' "
        f"WHEN ({t}).kind = 'quad' THEN ({t}).value "
        f"ELSE concat('\"', {esc}, '\"', "
        f"CASE WHEN ({t}).lang IS NOT NULL THEN concat('@', ({t}).lang) "
        f"ELSE concat('^^<', ({t}).dt, '>') END) END"
    )


def s_term_key(t: str) -> str:
    """String variant of :func:`term_key`."""
    nul = s_str("\x00")
    return (
        f"concat_ws({s_str(chr(31))}, ({t}).kind, ({t}).value, "
        f"coalesce(({t}).dt, {nul}), coalesce(({t}).lang, {nul}))"
    )


def s_term_eq_const(t: str, const: Term) -> str:
    parts = [
        f"({t}).kind = {s_str(const.kind)}",
        f"({t}).value = {s_str(const.value)}",
        f"({t}).dt IS NULL" if const.dt is None
        else f"({t}).dt = {s_str(const.dt)}",
        f"({t}).lang IS NULL" if const.lang is None
        else f"({t}).lang = {s_str(const.lang)}",
    ]
    return "(" + " AND ".join(parts) + ")"


def s_is_resource(t: str) -> str:
    return f"(({t}).kind IN ('iri', 'bnode'))"


def s_term_json(t: str) -> str:
    """String variant of :func:`term_json_col`."""
    return (
        "concat('{\"@term\":{\"kind\":', " + s_json_quote(f"({t}).kind")
        + ", ',\"value\":', " + s_json_quote(f"({t}).value")
        + f", CASE WHEN ({t}).dt IS NOT NULL THEN concat(',\"dt\":', "
        + s_json_quote(f"({t}).dt") + ") ELSE '' END"
        + f", CASE WHEN ({t}).lang IS NOT NULL THEN concat(',\"lang\":', "
        + s_json_quote(f"({t}).lang") + ") ELSE '' END, '}}')"
    )
