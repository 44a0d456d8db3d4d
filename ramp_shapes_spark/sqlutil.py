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
    """Reference display form of a TERM struct (rdf-model.ts:202-218)."""
    return (
        F.when(term["kind"] == "iri", F.concat(F.lit("<"), term["value"], F.lit(">")))
        .when(term["kind"] == "bnode", F.concat(F.lit("_:"), term["value"]))
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
