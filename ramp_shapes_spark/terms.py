"""RDF term model for the Spark-native shape engine.

The scalar unit of the engine is the RDF *term*, represented everywhere
(driver catalogs, DataFrame columns, test fixtures) as a 4-field struct
``(kind, value, dt, lang)`` with ``kind in {'iri', 'bnode', 'lit',
'var', 'dgraph', 'quad'}``.

The last three mirror the reference's full RDF/JS term union
(rdf-model.ts:5: ``NamedNode | BlankNode | Literal | Variable |
DefaultGraph | Quad``).  A *quad* term (RDF-star quoted triple) keeps
the flat struct by storing the reference ``toString`` serialization of
its components in ``value`` — the serialization is injective (IRIs are
angle-bracketed, literals escaped), so the struct's structural equality
coincides with the reference's recursive ``equalQuads``
(rdf-model.ts:286-296), and every engine stage (dedup keys, joins,
group-bys) treats quads correctly with zero changes.  Shape matching
needs no special cases either: ``var``/``dgraph``/``quad`` are neither
resources nor literals, so resource/literal shapes reject them exactly
as the reference's ``isResourceTerm`` (frame.ts:718) and
``termType === 'Literal'`` checks do.

Semantics follow the reference term model (ramp-shapes
``src/rdf/rdf-model.ts:5-130``): equality is structural over
(kind, value, datatype, language); a literal defaults to ``xsd:string``
or ``rdf:langString`` when a language tag is present
(rdf-model.ts:56-65).  Unlike the reference's random blank-node IDs
(rdf-model.ts:160-168) every generated ID in this engine is
content-derived and deterministic, which is required for distributed
reproducibility.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Optional

from pyspark.sql.types import StringType, StructField, StructType

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"
RAMP_NS = "http://ramp-shapes.github.io/schema#"

RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"
RDF_LANG_STRING = RDF_NS + "langString"

XSD_STRING = XSD_NS + "string"
XSD_BOOLEAN = XSD_NS + "boolean"
XSD_INTEGER = XSD_NS + "integer"
XSD_NON_NEGATIVE_INTEGER = XSD_NS + "nonNegativeInteger"
XSD_DECIMAL = XSD_NS + "decimal"
XSD_DOUBLE = XSD_NS + "double"
XSD_DATETIME = XSD_NS + "dateTime"

INTEGER_TYPES = frozenset({XSD_INTEGER, XSD_NON_NEGATIVE_INTEGER})
FRACTIONAL_TYPES = frozenset({XSD_DECIMAL, XSD_DOUBLE})
NUMBER_TYPES = INTEGER_TYPES | FRACTIONAL_TYPES

# Spark-side canonical term struct.  ``dt``/``lang`` are null except for
# literals; for literals ``dt`` is always set (never null) and ``lang``
# is null unless the literal is language-tagged.
TERM_TYPE = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("value", StringType(), False),
        StructField("dt", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)


@dataclass(frozen=True)
class Term:
    """Driver-side term value; mirrors one row of :data:`TERM_TYPE`."""

    kind: str  # 'iri' | 'bnode' | 'lit' | 'var' | 'dgraph' | 'quad'
    value: str
    dt: Optional[str] = None
    lang: Optional[str] = None

    def __post_init__(self) -> None:
        if self.kind not in ("iri", "bnode", "lit", "var", "dgraph",
                             "quad"):
            raise ValueError(f"bad term kind {self.kind!r}")

    @property
    def is_resource(self) -> bool:
        return self.kind in ("iri", "bnode")

    def as_row(self) -> tuple:
        return (self.kind, self.value, self.dt, self.lang)

    def key(self) -> str:
        """Canonical collision-free string key for hashing / group ids.

        Must stay byte-identical to the SQL-side
        :func:`ramp_shapes_spark.sqlutil.term_key` (nulls encode as
        ``\\x00``) — python-computed keys join against SQL-computed
        keys in the vocabulary maps and the cycle resolver.
        """
        return "\x1f".join(
            (self.kind, self.value, self.dt or "\x00", self.lang or "\x00")
        )

    def n3(self) -> str:
        """Reference-compatible display form (rdf-model.ts:202-236)."""
        if self.kind == "iri":
            return f"<{self.value}>"
        if self.kind == "bnode":
            return f"_:{self.value}"
        if self.kind == "var":
            return f"?{self.value}"
        if self.kind == "dgraph":
            return "(default graph)"
        if self.kind == "quad":
            # value IS the reference toString form ``<< s p o [g ]>>``
            return self.value
        lit = '"' + _escape_rdf(self.value) + '"'
        if self.lang:
            return lit + "@" + self.lang
        return lit + f"^^<{self.dt}>"


def _escape_rdf(value: str) -> str:
    return (
        value.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )


def iri(value: str) -> Term:
    return Term("iri", value)


def bnode(value: str) -> Term:
    return Term("bnode", value)


def lit(value: str, dt: Optional[str] = None, lang: Optional[str] = None) -> Term:
    """Literal with the reference's datatype defaulting rules."""
    if lang:
        return Term("lit", value, RDF_LANG_STRING, lang)
    return Term("lit", value, dt or XSD_STRING, None)


def variable(name: str) -> Term:
    """SPARQL variable term (rdf-model.ts:77-91)."""
    return Term("var", name)


DEFAULT_GRAPH = Term("dgraph", "")
"""Singleton default-graph term (rdf-model.ts:93-106)."""


def quad(s: Term, p: Term, o: Term, g: Term = DEFAULT_GRAPH) -> Term:
    """RDF-star quoted-triple term (rdf-model.ts:108-130).

    Components are serialized into ``value`` with the reference's
    ``toString`` layout (``<< s p o [g ]>>``, graph omitted when it is
    the default graph, rdf-model.ts:223-234); equality over the struct
    is therefore the reference's structural ``equalQuads``.  Nested
    quoted triples recurse naturally (the child's ``n3()`` is its own
    ``<< ... >>`` string).
    """
    if p.kind not in ("iri", "var"):
        raise ValueError(f"quad predicate must be iri/var, got {p.kind!r}")
    if s.kind not in ("iri", "bnode", "var", "quad"):
        raise ValueError(f"bad quad subject kind {s.kind!r}")
    inner = f"{s.n3()} {p.n3()} {o.n3()} "
    if g.kind != "dgraph":
        inner += f"{g.n3()} "
    return Term("quad", f"<< {inner}>>")


def from_row(row) -> Term:
    """Rebuild a :class:`Term` from a Spark Row / tuple / dict."""
    if isinstance(row, Term):
        return row
    if isinstance(row, dict):
        return Term(row["kind"], row["value"], row.get("dt"), row.get("lang"))
    return Term(row[0], row[1], row[2], row[3])


def term_json(term: Term) -> dict:
    """JSON encoding used for `keepAsTerm` values in framed output."""
    out = {"@term": {"kind": term.kind, "value": term.value}}
    if term.dt is not None:
        out["@term"]["dt"] = term.dt
    if term.lang is not None:
        out["@term"]["lang"] = term.lang
    return out


def deterministic_bnode(*parts: str) -> Term:
    """Content-derived blank node (replaces the reference's random IDs)."""
    digest = hashlib.sha1("\x1f".join(parts).encode("utf-8")).hexdigest()[:20]
    return Term("bnode", "d" + digest)
