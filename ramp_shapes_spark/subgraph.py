"""Shape-driven subgraph extraction: the Spark-native ``generateQuery``.

The reference's ``generateQuery`` (generate-query.ts:25-114) exists to
solve a scale problem: framing needs only the triples the shape's
property paths can traverse, so instead of downloading a whole store it
emits a SPARQL CONSTRUCT query and lets an endpoint return exactly the
shape-relevant subgraph (both shipped examples, examples/wikidata-query
and examples/iiif, work this way).  On Spark the store IS a DataFrame,
so the same idea becomes a first-class pruning operator: walk the shape
tree over the triples table, collecting exactly the triples each
property path could touch, and frame against that (typically tiny)
subset instead of the full 100 TB table.

Two improvements over the reference's query generator, both enabled by
running inside the engine rather than through SPARQL text:

* **Recursion is a fixpoint, not a break.**  The reference must break
  recursive shape references (generate-query.ts:323-381) because SPARQL
  has no unbounded recursion, so its CONSTRUCT under-fetches nested
  levels of recursive shapes.  Here a recursive reference simply
  re-enqueues the target shape with the new frontier; per-shape
  processed-node sets make the walk a semi-naive fixpoint that
  terminates on the (finite) term universe and fetches EVERY level.
* **Demand-driven roots.**  The CONSTRUCT query starts from an
  unconstrained subject variable; pass ``roots`` (a 1-column ``node``
  DataFrame of seed terms) to restrict the walk to triples reachable
  from those seeds — the frame-time candidate set — which turns every
  path step into a frontier equi-join instead of a predicate scan.

Guarantee (tested in tests/test_subgraph.py): for any shape,
``frame(shape, subgraph)`` produces exactly the matches of
``frame(shape, full_graph)`` — the walk keeps *all* triples of a
traversed (frontier-node, predicate) pair, so non-monotone constraints
(exactly-one counts, set cardinality bounds, strict type gates) see the
same local neighborhood in both graphs.

Scale design: predicate equality filters reach the parquet scan
(PushedFilters); the output is a ``left_semi`` join of the original
table against the collected tid set, so the subgraph rows keep their
storage order and the join key is one long column; frontier DataFrames
are deduplicated on the flat term key and eagerly checkpointed before
fan-out so closure loops and multi-child shapes never recompute a
lineage chain; with small seed sets every frontier join is
broadcast-able and Catalyst picks that automatically under AQE.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dataset import term_key_col
from .shapes import (
    AlternativePath,
    AnyOfShape,
    InversePath,
    ListShape,
    MapShape,
    OneOrMorePath,
    OptionalShape,
    PredicatePath,
    PropertyPath,
    RecordShape,
    SequencePath,
    SetShape,
    Shape,
    ShapeCatalog,
    ShapeID,
    ZeroOrMorePath,
    ZeroOrOnePath,
)
from .terms import RDF_FIRST, RDF_REST

MAX_CLOSURE_ITERATIONS = 200
_CHECKPOINT_EVERY = 4

#: Sentinel frontier: "every term in the graph" — the unconstrained
#: subject variable of the reference's CONSTRUCT query.  A predicate
#: step from the universe is a plain filter (no join), and a closure
#: from the universe converges in one application (every reachable
#: intermediate is already a source).
UNIVERSE = None


def _dedup_nodes(df: DataFrame) -> DataFrame:
    """One row per distinct term in ``node``."""
    return (
        df.groupBy(term_key_col(F.col("node")).alias("__k"))
        .agg(F.first("node").alias("node"))
        .select("node")
    )


def _minus(df: DataFrame, seen: Optional[DataFrame]) -> DataFrame:
    if seen is None:
        return df
    return df.join(
        seen.select(term_key_col(F.col("node")).alias("__sk")),
        term_key_col(df["node"]) == F.col("__sk"),
        "left_anti",
    )


def _union_nodes(a: Optional[DataFrame], b: Optional[DataFrame]):
    if a is None or b is None:
        return a if b is None else b
    return _dedup_nodes(a.unionAll(b))


class _Walk:
    """One extraction run: accumulates matched tids and walks shapes."""

    def __init__(self, triples: DataFrame, catalog: ShapeCatalog,
                 predicate_bucket: Optional[Tuple[str, int]] = None) -> None:
        self.triples = triples
        self.catalog = catalog
        self.bucket = predicate_bucket
        self.tids: List[DataFrame] = []
        # shape key -> processed frontier (UNIVERSE once walked with it)
        self.processed: Dict[str, Optional[DataFrame]] = {}
        self._rounds = 0

    # -- frontier bookkeeping ------------------------------------------

    def _materialize(self, frontier: DataFrame) -> DataFrame:
        """Eager checkpoint before a frontier fans out (multi-child
        shapes, closure loops): cuts lineage and pins one computation,
        so task retries can't observe two versions of the frontier."""
        return frontier.localCheckpoint(eager=True)

    def enqueue(self, work: List[Tuple[ShapeID, Optional[DataFrame]]],
                shape_id: ShapeID, frontier: Optional[DataFrame]) -> None:
        work.append((shape_id, frontier))

    # -- path walking --------------------------------------------------

    def step(self, predicate: str, frontier: Optional[DataFrame],
             reverse: bool) -> Tuple[DataFrame, DataFrame]:
        """One predicate application; returns (tids, endpoints)."""
        src, dst = ("o", "s") if reverse else ("s", "o")
        t = self.triples.filter(F.col("p") == F.lit(predicate))
        if self.bucket is not None:
            # pin the predicate's partition bucket: the hash of a
            # literal constant-folds, so Catalyst prunes every other
            # pbucket partition from the scan (materialize.py layout)
            col, n = self.bucket
            t = t.filter(
                F.col(col)
                == F.pmod(F.xxhash64(F.lit(predicate)),
                          F.lit(n)).cast("int"))
        if frontier is UNIVERSE:
            return (t.select("tid"),
                    _dedup_nodes(t.select(F.col(dst).alias("node"))))
        j = t.join(
            frontier.select(term_key_col(F.col("node")).alias("__fk")),
            term_key_col(t[src]) == F.col("__fk"),
            "inner",
        )
        return (j.select("tid"),
                _dedup_nodes(j.select(F.col(dst).alias("node"))))

    def walk_path(self, path: PropertyPath, frontier: Optional[DataFrame],
                  reverse: bool = False) -> Optional[DataFrame]:
        """Collect the triples ``path`` traverses from ``frontier``;
        return the endpoint frontier (UNIVERSE when unconstrained)."""
        if isinstance(path, PredicatePath):
            tids, endpoints = self.step(path.predicate, frontier, reverse)
            self.tids.append(tids)
            return endpoints
        if isinstance(path, InversePath):
            return self.walk_path(path.inverse, frontier, not reverse)
        if isinstance(path, SequencePath):
            parts = path.sequence if not reverse else tuple(
                reversed(path.sequence))
            current = frontier
            for part in parts:
                current = self.walk_path(part, current, reverse)
            return current
        if isinstance(path, AlternativePath):
            if frontier is not UNIVERSE and len(path.alternatives) > 1:
                frontier = self._materialize(frontier)
            branch_ends = [self.walk_path(alt, frontier, reverse)
                           for alt in path.alternatives]
            if any(e is UNIVERSE for e in branch_ends):
                return UNIVERSE
            endpoints = branch_ends[0]
            for e in branch_ends[1:]:
                endpoints = _union_nodes(endpoints, e)
            return endpoints
        if isinstance(path, ZeroOrOnePath):
            if frontier is UNIVERSE:
                self.walk_path(path.path, UNIVERSE, reverse)
                return UNIVERSE
            frontier = self._materialize(frontier)
            e = self.walk_path(path.path, frontier, reverse)
            return _union_nodes(frontier, e)
        if isinstance(path, (ZeroOrMorePath, OneOrMorePath)):
            inner = path.path
            if frontier is UNIVERSE:
                # one application from the universe collects every
                # triple any iteration could touch (each reachable
                # intermediate is itself a universe member)
                e = self.walk_path(inner, UNIVERSE, reverse)
                return UNIVERSE if isinstance(path, ZeroOrMorePath) else e
            return self._walk_closure(inner, frontier, reverse,
                                      include_start=isinstance(
                                          path, ZeroOrMorePath))
        raise TypeError(f"unknown path {path!r}")

    def _walk_closure(self, inner: PropertyPath, frontier: DataFrame,
                      reverse: bool, include_start: bool) -> DataFrame:
        """Seeded BFS: apply ``inner`` until no new nodes; collect the
        traversed triples of every round.  Demand-driven — only the
        reachable component moves, never the all-source relation."""
        frontier = self._materialize(_dedup_nodes(frontier))
        seen = frontier
        reached: Optional[DataFrame] = None
        current = frontier
        for i in range(MAX_CLOSURE_ITERATIONS):
            e = self.walk_path(inner, current, reverse)
            # inner is closure-inner: UNIVERSE can't come back out of a
            # concrete frontier (no sub-path maps concrete → UNIVERSE)
            assert e is not UNIVERSE
            new = self._materialize(_minus(_dedup_nodes(e), seen))
            reached = _union_nodes(reached, e)
            if new.isEmpty():
                break
            seen = _union_nodes(seen, new)
            if (i + 1) % _CHECKPOINT_EVERY == 0:
                seen = self._materialize(seen)
                reached = self._materialize(reached)
            current = new
        else:
            raise RuntimeError(
                f"closure did not converge in {MAX_CLOSURE_ITERATIONS} "
                f"rounds")
        if include_start:
            return _union_nodes(frontier, reached)
        return reached if reached is not None else frontier.limit(0)

    # -- shape walking -------------------------------------------------

    def walk_shape(self, shape: Shape, frontier: Optional[DataFrame],
                   work: List[Tuple[ShapeID, Optional[DataFrame]]]) -> None:
        if isinstance(shape, RecordShape):
            # frontier arrives materialized from run(); safe to fan out
            props = tuple(shape.type_properties) + tuple(shape.properties)
            for p in props:
                endpoints = self.walk_path(p.path, frontier)
                self.enqueue(work, p.value_shape, endpoints)
            # computed properties synthesize from already-framed values
            # (synthesize.ts) — no graph traversal of their own
            return
        if isinstance(shape, AnyOfShape):
            for v in shape.variants:
                self.enqueue(work, v, frontier)
            return
        if isinstance(shape, (SetShape, OptionalShape)):
            self.enqueue(work, shape.item_shape, frontier)
            return
        if isinstance(shape, MapShape):
            # key/value references point INTO the framed item value —
            # no additional triples beyond the item walk
            self.enqueue(work, shape.item_shape, frontier)
            return
        if isinstance(shape, ListShape):
            head = shape.head_path or PredicatePath(RDF_FIRST)
            tail = shape.tail_path or PredicatePath(RDF_REST)
            if frontier is UNIVERSE:
                items = self.walk_path(head, UNIVERSE)
                self.walk_path(tail, UNIVERSE)
                self.enqueue(work, shape.item_shape, items)
                return
            # node frontier -> all list spine nodes via tail*, then one
            # head step per spine node
            spine = self._materialize(
                self._walk_closure(tail, frontier, False,
                                   include_start=True))
            items = self.walk_path(head, spine)
            self.enqueue(work, shape.item_shape, items)
            return
        # resource / literal leaves (incl. constants, vocabulary,
        # keepAsTerm): value tests only, no traversal
        return

    # -- fixpoint driver ----------------------------------------------

    def run(self, root: ShapeID,
            roots: Optional[DataFrame]) -> DataFrame:
        work: List[Tuple[ShapeID, Optional[DataFrame]]] = [(root, roots)]
        from .shapes import LiteralShape, ResourceShape
        while work:
            shape_id, frontier = work.pop()
            shape = self.catalog.get(shape_id)
            if isinstance(shape, (ResourceShape, LiteralShape)):
                # leaves never traverse — skip the frontier
                # materialization entirely
                continue
            key = shape_id.key()
            prev = self.processed.get(key, _UNSEEN)
            if prev is UNIVERSE:
                continue  # already walked unconstrained — maximal
            if frontier is UNIVERSE:
                self.processed[key] = UNIVERSE
            else:
                frontier = _dedup_nodes(frontier)
                if prev is not _UNSEEN:
                    frontier = _minus(frontier, prev)
                frontier = self._materialize(frontier)
                if prev is not _UNSEEN:
                    # the emptiness probe is the fixpoint termination
                    # test — only revisits (recursive references) need
                    # it; a first visit walks regardless (an empty
                    # frontier just yields empty joins)
                    if frontier.isEmpty():
                        continue
                    self.processed[key] = self._materialize(
                        _union_nodes(prev, frontier))
                else:
                    self.processed[key] = frontier
            self.walk_shape(shape, frontier, work)
        if not self.tids:
            return self.triples.limit(0)
        all_tids = self.tids[0]
        for t in self.tids[1:]:
            all_tids = all_tids.unionAll(t)
        return self.triples.join(
            all_tids.distinct(), on="tid", how="left_semi")


class _Unseen:
    pass


_UNSEEN = _Unseen()


def shape_subgraph(triples: DataFrame, catalog: ShapeCatalog,
                   root: ShapeID,
                   roots: Optional[DataFrame] = None,
                   predicate_bucket: Optional[Tuple[str, int]] = None,
                   ) -> DataFrame:
    """Triples subset sufficient to frame ``root`` — see module doc.

    ``roots``: optional 1-column ``node`` (term struct) DataFrame of
    seed terms; ``None`` walks from the unconstrained universe exactly
    like the reference's CONSTRUCT query subject variable.

    ``predicate_bucket``: optional ``(column, n_buckets)`` of a
    predicate-hash partition column (the materialize.py sink layout);
    every predicate step then pins its bucket so the scan prunes all
    other partitions.
    """
    return _Walk(triples, catalog, predicate_bucket).run(root, roots)


def roots_of_type(triples: DataFrame, type_iri: str,
                  rdf_type: str = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                  predicate_bucket: Optional[Tuple[str, int]] = None,
                  ) -> DataFrame:
    """Convenience seed set: all subjects with ``rdf:type <type_iri>``
    — the usual frame candidate set for a type-gated record shape."""
    t = triples.filter(
        (F.col("p") == F.lit(rdf_type))
        & (F.col("o")["kind"] == F.lit("iri"))
        & (F.col("o")["value"] == F.lit(type_iri))
    )
    if predicate_bucket is not None:
        col, n = predicate_bucket
        t = t.filter(
            F.col(col)
            == F.pmod(F.xxhash64(F.lit(rdf_type)), F.lit(n)).cast("int"))
    return _dedup_nodes(t.select(F.col("s").alias("node")))
