"""Turtle writer with reference-parity blank grouping.

Closes the last SURVEY §2 row (Turtle write + blank grouping).  The
reference splits the feature in two: ``groupBlanks`` (rdf/
blank-grouping.ts:27-220) owns the *structure* — deciding which blank
nodes inline as nested ``[ ... ]`` groups and which rdf:first/rest
chains collapse to ``( ... )`` lists — while the actual text is
delegated to the external N3.js writer (examples/turtle-blank.ts:1-40).
This module mirrors the grouping semantics exactly and ships its own
text emitter; byte parity is therefore defined against THIS engine's
Turtle parser (:mod:`ramp_shapes_spark.ttl`) via parse-back roundtrip,
not against N3.js.

Grouping semantics (blank-grouping.ts): the pass is ORDER-SENSITIVE
over the quad sequence.  A blank object ``b`` referenced at position
``i`` inlines iff its own quads start at exactly ``i + 1``
(``minIndex(b) == i + 1``) and the inlined span consumes every
occurrence of ``b`` (``next > maxIndex(b)``); list collapsing
additionally requires each chain node's quads to be a contiguous
``first``/``rest`` pair.  Cycles are rejected via the visiting set.
This engine's flatten emits blanks in exactly that generation order
(relational_flatten static counters / pyflatten), so grouped output is
the common case, and quads that do not satisfy the window test fall
back to plain triples — output is always complete and correct.

Scale design: Turtle text is a PRESENTATION sink, not a pipeline stage.
The distributed writer partitions triples by the flatten ``seed`` (a
seed's blank nodes never escape its own triple set, so every partition
serializes independently and in parallel) and emits one Turtle document
per partition via ``mapInPandas``; Python-per-row cost is accepted here
by design — the same trade the reference makes by streaming quads
through a single-process JS writer.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple, Union

from .terms import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_STRING,
    Term,
)

Triple = Tuple[Term, str, Term]


class BlankGroup:
    """``[ p o ; ... ]`` — mirrors blank-grouping.ts:13-18."""

    __slots__ = ("content",)

    def __init__(self, content: Sequence["GroupedTriple"]):
        self.content = list(content)


class BlankList:
    """``( item ... )`` — mirrors blank-grouping.ts:20-25."""

    __slots__ = ("items",)

    def __init__(self, items: Sequence[Union[Term, "BlankGroup", "BlankList"]]):
        self.items = list(items)


GroupedObject = Union[Term, BlankGroup, BlankList]
GroupedTriple = Tuple[Term, str, GroupedObject]


def _blank_ranges(quads: Sequence[Triple]) -> Tuple[Dict[str, int], Dict[str, int]]:
    """min/max quad index at which each blank label occurs
    (blank-grouping.ts:190-220, computeBlankRanges)."""
    mn: Dict[str, int] = {}
    mx: Dict[str, int] = {}
    for i, (s, _p, o) in enumerate(quads):
        for t in (s, o):
            if t.kind == "bnode":
                mn[t.value] = min(mn.get(t.value, i), i)
                mx[t.value] = max(mx.get(t.value, i), i)
    return mn, mx


def group_blanks(quads: Sequence[Triple]) -> List[GroupedTriple]:
    """Single order-sensitive pass turning inlinable blank objects into
    :class:`BlankGroup` / :class:`BlankList` structures
    (blank-grouping.ts:27-57, groupBlanks)."""
    mn, mx = _blank_ranges(quads)
    visiting: set = set()

    def try_child(term: Term, start: int):
        """(next, child) — blank-grouping.ts:72-99,
        tryWriteChildGroupOrList.  ``None`` signals a cycle."""
        next_i = start
        if not (term.kind == "bnode" and mn.get(term.value) == start - 1):
            return next_i, None

        list_out: List[GroupedObject] = []
        next_list = try_list(term, next_i, list_out)
        if next_list is None:
            return None
        if next_list > next_i and next_list > mx[term.value]:
            return next_list, BlankList(list_out)

        group_out: List[GroupedTriple] = []
        next_group = try_group(term, next_i, group_out)
        if next_group is None:
            return None
        if next_group > next_i and next_group > mx[term.value]:
            return next_group, BlankGroup(group_out)
        return next_i, None

    def try_group(subject: Optional[Term], start: int,
                  out: List[GroupedTriple]):
        """blank-grouping.ts:101-131, tryWriteBlankGroup."""
        if subject is not None:
            if subject.value in visiting:
                return None
            visiting.add(subject.value)
        i = start
        while i < len(quads):
            s, p, o = quads[i]
            if subject is not None and s != subject:
                # parity note: the reference keeps the subject in the
                # visiting set on this exit (blank-grouping.ts:112-114
                # returns without deleting); the set is cleared per
                # top-level quad, so mirroring it exactly is safe
                return i
            result = try_child(o, i + 1)
            if result is None:
                return None
            next_i, child = result
            if child is None and o.kind == "iri" and o.value == RDF_NIL:
                child = BlankList([])
            out.append((s, p, child if child is not None else o))
            i = next_i
        if subject is not None:
            visiting.discard(subject.value)
        return len(quads)

    def try_list(head: Term, start: int,
                 out: List[GroupedObject]):
        """blank-grouping.ts:133-186, tryWriteBlankList."""
        if mn.get(head.value, start) < start - 1:
            return start
        current = head
        i = start
        while i < len(quads):
            if current.value in visiting:
                return None
            visiting.add(current.value)

            found_first = False
            s, p, o = quads[i]
            if s == current and p == RDF_FIRST:
                result = try_child(o, i + 1)
                if result is None:
                    return None
                next_i, child = result
                found_first = True
                i = next_i
                out.append(child if child is not None else o)

            found_nil = False
            next_item: Optional[Term] = None
            if found_first and i < len(quads) and mx[current.value] <= i:
                rs, rp, ro = quads[i]
                if rs == current and rp == RDF_REST:
                    if ro.kind == "iri" and ro.value == RDF_NIL:
                        found_nil = True
                        i += 1
                    elif ro.kind == "bnode" and mn.get(ro.value) == i:
                        next_item = ro
                        i += 1

            visiting.discard(current.value)
            if found_nil:
                return i
            if next_item is not None:
                current = next_item
            else:
                return start
        return start

    out: List[GroupedTriple] = []
    i = 0
    while i < len(quads):
        s, p, o = quads[i]
        child = None
        if o.kind == "bnode":
            visiting.clear()
            result = try_child(o, i + 1)
            if result is not None and result[1] is not None:
                i = result[0]
                child = result[1]
        if child is not None:
            out.append((s, p, child))
        else:
            out.append((s, p, o))
            i += 1
    return out


# --------------------------------------------------------------------
# text emission


_TURTLE_ESCAPES = {
    "\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t",
}


def _escape(value: str) -> str:
    return "".join(_TURTLE_ESCAPES.get(c, c) for c in value)


class TurtleSerializer:
    """Renders grouped triples as Turtle text.

    Formatting rules: consecutive triples sharing a subject join with
    ``;``; same (subject, predicate) join with ``,``; ``rdf:type``
    renders as ``a``; groups/lists nest with two-space indentation
    (the reference example normalizes N3.js output the same way,
    turtle-blank.ts:44-80)."""

    def __init__(self, prefixes: Optional[Dict[str, str]] = None):
        # longest-namespace-first so nested namespaces compact correctly
        self.prefixes = dict(prefixes or {})
        self._by_len = sorted(
            self.prefixes.items(), key=lambda kv: -len(kv[1]))

    def _iri(self, value: str) -> str:
        if value == RDF_TYPE:
            return "a"
        for pfx, ns in self._by_len:
            if value.startswith(ns):
                local = value[len(ns):]
                # conservative pname locals: anything outside the safe
                # set falls back to <...>
                if local and all(
                    c.isalnum() or c in "_-" for c in local
                ):
                    return f"{pfx}:{local}"
        return f"<{value}>"

    def _term(self, t: Term) -> str:
        if t.kind == "iri":
            return self._iri(t.value)
        if t.kind == "bnode":
            return f"_:{t.value}"
        if t.kind == "quad":
            # quad terms store the reference toString serialization
            # ``<< <s> <p> o >>`` — already valid Turtle-star (IRIs in
            # full <...> form, literals escaped), so emit verbatim
            return t.value
        if t.kind in ("var", "dgraph"):
            raise ValueError(
                f"term kind {t.kind!r} has no Turtle serialization")
        body = f'"{_escape(t.value)}"'
        if t.lang:
            return f"{body}@{t.lang}"
        if t.dt and t.dt != XSD_STRING:
            return f"{body}^^{self._iri(t.dt)}"
        return body

    def _object(self, o: GroupedObject, indent: int) -> str:
        if isinstance(o, BlankList):
            if not o.items:
                return "( )"
            items = " ".join(self._object(x, indent) for x in o.items)
            return f"( {items} )"
        if isinstance(o, BlankGroup):
            if not o.content:
                return "[ ]"
            pad = "  " * (indent + 1)
            lines = self._predicate_object_lines(o.content, indent + 1)
            inner = (" ;\n" + pad).join(lines)
            return "[\n" + pad + inner + "\n" + "  " * indent + "]"
        return self._term(o)

    def _predicate_object_lines(
        self, triples: Sequence[GroupedTriple], indent: int,
    ) -> List[str]:
        """``pred obj, obj`` lines for a run of same-subject triples."""
        lines: List[str] = []
        last_pred: Optional[str] = None
        for _s, p, o in triples:
            rendered = self._object(o, indent)
            if p == last_pred and lines:
                lines[-1] += f", {rendered}"
            else:
                lines.append(f"{self._iri(p)} {rendered}")
                last_pred = p
        return lines

    def serialize(self, grouped: Sequence[GroupedTriple]) -> str:
        out: List[str] = []
        for pfx, ns in sorted(self.prefixes.items()):
            out.append(f"@prefix {pfx}: <{ns}> .")
        if out:
            out.append("")
        i = 0
        while i < len(grouped):
            subject = grouped[i][0]
            j = i
            while j < len(grouped) and grouped[j][0] == subject:
                j += 1
            lines = self._predicate_object_lines(grouped[i:j], 1)
            subj = self._term(subject)
            if len(lines) == 1:
                out.append(f"{subj} {lines[0]} .")
            else:
                body = (" ;\n  ").join(lines)
                out.append(f"{subj} {body} .")
            i = j
        return "\n".join(out) + "\n"


def serialize_turtle(
    quads: Iterable[Triple],
    prefixes: Optional[Dict[str, str]] = None,
) -> str:
    """Group blanks, then render — the reference's
    ``quadsToTurtleString`` (examples/turtle-blank.ts:3-41) with the
    engine's own emitter."""
    return TurtleSerializer(prefixes).serialize(group_blanks(list(quads)))


def _rows_to_terms(pdf) -> List[Triple]:
    quads: List[Triple] = []
    for s, p, o in zip(pdf["s"], pdf["p"], pdf["o"]):
        quads.append((
            Term(s["kind"], s["value"], s.get("dt"), s.get("lang")),
            p,
            Term(o["kind"], o["value"], o.get("dt"), o.get("lang")),
        ))
    return quads


def write_turtle(
    triples,
    path: str,
    prefixes: Optional[Dict[str, str]] = None,
    n_documents: int = 1,
    order_cols: Sequence[str] = ("tid",),
    partition_col: Optional[str] = None,
):
    """Distributed Turtle sink: one Turtle document per partition.

    ``triples`` is a (…, s, p, o) DataFrame in TERM layout.  When
    ``partition_col`` is given (e.g. the flatten ``seed``) rows are
    hash-partitioned on it so every blank-node neighborhood lands in
    exactly one document; otherwise the frame is coalesced to
    ``n_documents`` partitions.  Rows are sorted by ``order_cols``
    within each partition — generation order is what makes the
    reference's window test inline blanks.
    """
    from pyspark.sql import functions as F  # noqa: F401

    cols = [c for c in triples.columns if c in {"s", "p", "o",
                                                partition_col, *order_cols}]
    df = triples.select(*dict.fromkeys(cols))
    if partition_col is not None:
        df = df.repartition(max(n_documents, 1), partition_col)
    else:
        df = df.coalesce(max(n_documents, 1))
    df = df.sortWithinPartitions(*([partition_col] if partition_col else []),
                                 *order_cols)

    pfx = dict(prefixes or {})

    def emit(batches):
        import pandas as pd
        quads: List[Triple] = []
        for pdf in batches:
            quads.extend(_rows_to_terms(pdf))
        text = serialize_turtle(quads, pfx) if quads else ""
        yield pd.DataFrame({"value": [text]})

    docs = df.mapInPandas(emit, "value string")
    docs.filter("value != ''").write.mode("overwrite").text(path)
    return path
