"""Minimal Turtle parser for fixture graphs and shape definitions.

The engine's data plane never parses Turtle at scale — triples arrive
from upstream extraction stages as DataFrames.  This parser exists for
(a) loading the (KB-sized) shape definition graphs on the driver and
(b) loading the reference test fixtures (``test-data/**/*.ttl`` in the
reference repo) into triple DataFrames for correctness tests.

Supported subset (everything the reference fixtures use): ``@prefix``,
prefixed names (incl. empty prefix), IRIs, labeled blank nodes, blank
node property lists ``[ ... ]``, collections ``( ... )``, ``a``,
string/integer/decimal/double/boolean literals, ``^^`` datatypes,
``@lang`` tags, ``;`` / ``,`` separators and ``#`` comments.

Triples are emitted in document order; the emission index doubles as
the dataset insertion order that the reference engine exposes through
its iteration semantics (rdf-dataset.ts:97-129).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from .terms import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    Term,
    bnode,
    iri,
    lit,
    quad,
)

Triple = Tuple[Term, str, Term]  # (subject, predicate IRI, object)

_TOKEN_RE = re.compile(
    r"""
      (?P<WS>\s+|\#[^\n]*)
    | (?P<QUOTE><<|>>)
    | (?P<IRIREF><[^<>"{}|^`\\\s]*>)
    | (?P<STRING>"(?:[^"\\]|\\.)*")
    | (?P<LANGTAG>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
    | (?P<DTSEP>\^\^)
    | (?P<DOUBLE>[+-]?(?:\d+\.\d*|\.\d+|\d+)[eE][+-]?\d+)
    | (?P<DECIMAL>[+-]?\d*\.\d+)
    | (?P<INTEGER>[+-]?\d+)
    | (?P<BLANK>_:[A-Za-z0-9_](?:[A-Za-z0-9_.-]*[A-Za-z0-9_-])?)
    | (?P<PNAME>(?:[A-Za-z][A-Za-z0-9_.-]*)?:(?:[A-Za-z0-9_](?:[A-Za-z0-9_.-]*[A-Za-z0-9_-])?)?)
    | (?P<KEYWORD>@prefix|@base|a\b|true\b|false\b)
    | (?P<PUNCT>[;,.\[\]()])
    """,
    re.VERBOSE,
)

_STRING_ESCAPES = {
    "t": "\t",
    "n": "\n",
    "r": "\r",
    "b": "\b",
    "f": "\f",
    '"': '"',
    "'": "'",
    "\\": "\\",
}


def _unescape(raw: str) -> str:
    out = []
    i = 0
    while i < len(raw):
        ch = raw[i]
        if ch == "\\" and i + 1 < len(raw):
            nxt = raw[i + 1]
            if nxt in _STRING_ESCAPES:
                out.append(_STRING_ESCAPES[nxt])
                i += 2
                continue
            if nxt == "u":
                out.append(chr(int(raw[i + 2 : i + 6], 16)))
                i += 6
                continue
            if nxt == "U":
                out.append(chr(int(raw[i + 2 : i + 10], 16)))
                i += 10
                continue
        out.append(ch)
        i += 1
    return "".join(out)


class TurtleParser:
    def __init__(self, text: str) -> None:
        self.tokens: List[Tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN_RE.match(text, pos)
            if not m:
                raise ValueError(f"turtle: bad token at {text[pos:pos + 30]!r}")
            pos = m.end()
            kind = m.lastgroup
            if kind != "WS":
                self.tokens.append((kind, m.group()))
        self.i = 0
        self.prefixes: Dict[str, str] = {}
        self.triples: List[Triple] = []
        self._blank_counter = 0

    # -- token helpers -------------------------------------------------
    def _peek(self) -> Optional[Tuple[str, str]]:
        return self.tokens[self.i] if self.i < len(self.tokens) else None

    def _next(self) -> Tuple[str, str]:
        tok = self.tokens[self.i]
        self.i += 1
        return tok

    def _expect(self, text: str) -> None:
        kind, val = self._next()
        if val != text:
            raise ValueError(f"turtle: expected {text!r}, found {val!r}")

    def _fresh_bnode(self) -> Term:
        self._blank_counter += 1
        return bnode(f"g{self._blank_counter}")

    # -- grammar -------------------------------------------------------
    def parse(self) -> List[Triple]:
        while self._peek() is not None:
            kind, val = self._peek()
            if val == "@prefix":
                self._next()
                _, pname = self._next()
                if not pname.endswith(":"):
                    raise ValueError(f"turtle: bad prefix decl {pname!r}")
                _, iriref = self._next()
                self.prefixes[pname[:-1]] = iriref[1:-1]
                self._expect(".")
            else:
                self._parse_statement()
        return self.triples

    def _parse_statement(self) -> None:
        subject = self._parse_term(as_subject=True)
        self._parse_predicate_object_list(subject)
        self._expect(".")

    def _parse_predicate_object_list(self, subject: Term) -> None:
        while True:
            predicate = self._parse_predicate()
            while True:
                obj = self._parse_term()
                self.triples.append((subject, predicate, obj))
                nxt = self._peek()
                if nxt and nxt[1] == ",":
                    self._next()
                    continue
                break
            nxt = self._peek()
            if nxt and nxt[1] == ";":
                self._next()
                nxt = self._peek()
                # allow trailing ';' before '.' or ']'
                if nxt and nxt[1] in (".", "]"):
                    break
                continue
            break

    def _parse_predicate(self) -> str:
        kind, val = self._next()
        if val == "a":
            return RDF_TYPE
        if kind == "IRIREF":
            return val[1:-1]
        if kind == "PNAME":
            return self._expand_pname(val).value
        raise ValueError(f"turtle: bad predicate {val!r}")

    def _expand_pname(self, pname: str) -> Term:
        prefix, _, local = pname.partition(":")
        if prefix not in self.prefixes:
            raise ValueError(f"turtle: unknown prefix {prefix!r}")
        return iri(self.prefixes[prefix] + local)

    def _parse_term(self, as_subject: bool = False) -> Term:
        kind, val = self._next()
        if kind == "IRIREF":
            return iri(_unescape(val[1:-1]))
        if kind == "PNAME":
            return self._expand_pname(val)
        if kind == "BLANK":
            return bnode(val[2:])
        if val == "<<":
            # Turtle-star quoted triple (RDF-star CG report §3.3);
            # allowed in both subject and object position, becomes an
            # opaque quad term (terms.py) the engine carries through
            # dedup/joins by structural equality.
            qs = self._parse_term(as_subject=True)
            qp = iri(self._parse_predicate())
            qo = self._parse_term()
            self._expect(">>")
            return quad(qs, qp, qo)
        if val == "[":
            node = self._fresh_bnode()
            if self._peek() and self._peek()[1] != "]":
                self._parse_predicate_object_list(node)
            self._expect("]")
            return node
        if val == "(":
            items: List[Term] = []
            while self._peek() and self._peek()[1] != ")":
                items.append(self._parse_term())
            self._expect(")")
            return self._emit_collection(items)
        if as_subject:
            raise ValueError(f"turtle: bad subject {val!r}")
        if kind == "STRING":
            value = _unescape(val[1:-1])
            nxt = self._peek()
            if nxt and nxt[0] == "LANGTAG":
                self._next()
                return lit(value, lang=nxt[1][1:])
            if nxt and nxt[0] == "DTSEP":
                self._next()
                dt = self._parse_predicate()  # IRI or pname
                return lit(value, dt=dt)
            return lit(value)
        if kind == "INTEGER":
            return lit(val, dt=XSD_INTEGER)
        if kind == "DECIMAL":
            return lit(val, dt=XSD_DECIMAL)
        if kind == "DOUBLE":
            return lit(val, dt=XSD_DOUBLE)
        if val in ("true", "false"):
            return lit(val, dt=XSD_BOOLEAN)
        raise ValueError(f"turtle: bad term {val!r}")

    def _emit_collection(self, items: List[Term]) -> Term:
        if not items:
            return iri(RDF_NIL)
        nodes = [self._fresh_bnode() for _ in items]
        for idx, item in enumerate(items):
            self.triples.append((nodes[idx], RDF_FIRST, item))
            tail = nodes[idx + 1] if idx + 1 < len(items) else iri(RDF_NIL)
            self.triples.append((nodes[idx], RDF_REST, tail))
        return nodes[0]


def parse_turtle(text: str) -> List[Triple]:
    return TurtleParser(text).parse()


def parse_turtle_file(path: str) -> List[Triple]:
    with open(path, "r", encoding="utf-8") as fh:
        return parse_turtle(fh.read())
