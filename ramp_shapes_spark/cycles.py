"""Cyclic-data resolution for the distributed frame fixpoint.

The global fixpoint in :mod:`ramp_shapes_spark.frame` resolves every
candidate whose value is *acyclic*; candidates on true data cycles
(e.g. the ``cyclic1`` fixture: selector → range → start → selector)
never stabilize because their values would be infinite.  The reference
engine handles these with a visiting-set + hole-patching mechanism
(frame.ts:111-127, 813-829) that is inherently sequential per
evaluation root.

Distributed strategy: cycles are *residual* — at web scale nearly all
of the graph frames acyclically and is handled by the fixpoint; what
remains is the small set of gate-passing candidates of recursive record
shapes that stayed unresolved.  We collect each residual's K-hop
triple neighborhood (bounded) to the driver and run the exact
reference-semantics interpreter (:mod:`ramp_shapes_spark.pyframe`) on
it, which produces the ``@ref``/``@use`` encoded values.  The result
rows are appended to the global match relations.

Scale guard: ``MAX_RESIDUAL_PAIRS`` bounds the driver collect; at
production scale residuals beyond that indicate pathological data and
raise instead of silently OOMing the driver.  (A follow-up could shard
residual connected components through ``applyInPandas``.)
"""

from __future__ import annotations

import json
from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pyframe import Graph, PyFrame, Mismatch, CyclicMatch, encode_refs, _stack_frame
from .shapes import PredicatePath, RecordShape, ResourceShape, Shape
from .sqlutil import term_key
from .terms import Term, from_row

MAX_RESIDUAL_PAIRS = 100_000
NEIGHBORHOOD_HOPS = 4
# per-hop bound on the driver collect: a Zipf-hub node inside the
# K-hop neighborhood would otherwise pull its entire adjacency to the
# driver (count first, raise past the cap — same contract as
# MAX_RESIDUAL_PAIRS: pathological data fails loudly, never OOMs)
MAX_NEIGHBORHOOD_TRIPLES = 250_000


def resolve_cycles(engine, cand: DataFrame, targets: List[Shape]) -> None:
    # candidates that pass a constant type gate but are unresolved
    pending: List[tuple] = []  # (shape, Term)
    for shape in targets:
        if not isinstance(shape, RecordShape) or not shape.type_properties:
            continue
        gate = None
        for tp in shape.type_properties:
            vshape = engine.catalog.get(tp.value_shape)
            if not (isinstance(tp.path, PredicatePath)
                    and isinstance(vshape, ResourceShape)
                    and vshape.value is not None):
                gate = None
                break
            cond = engine.triples.filter(
                (F.col("p") == tp.path.predicate)
                & (term_key(F.col("o")) == vshape.value.key())
            ).select(term_key(F.col("s")).alias("fkey")).distinct()
            gate = cond if gate is None else gate.join(cond, "fkey", "left_semi")
        if gate is None:
            continue
        unresolved = gate.join(
            engine._fix[shape.id.key()].select("fkey"), "fkey", "left_anti"
        )
        rows = unresolved.limit(MAX_RESIDUAL_PAIRS + 1).collect()
        if len(rows) > MAX_RESIDUAL_PAIRS:
            raise RuntimeError(
                "cyclic residual exceeds driver bound; shard resolution needed"
            )
        term_rows = (
            cand.join(unresolved, "fkey", "left_semi")
            .select("focus").collect()
        )
        for r in term_rows:
            pending.append((shape, from_row(r["focus"])))

    if not pending:
        return

    # K-hop neighborhood of the residual terms (both directions)
    keys = {t.key() for _, t in pending}
    frontier_keys = set(keys)
    triples_local: dict = {}
    for _ in range(NEIGHBORHOOD_HOPS):
        if not frontier_keys:
            break
        key_col_s = term_key(F.col("s"))
        key_col_o = term_key(F.col("o"))
        fl = list(frontier_keys)
        hop_df = engine.triples.filter(
            key_col_s.isin(fl) | key_col_o.isin(fl)
        )
        n_hop = hop_df.limit(MAX_NEIGHBORHOOD_TRIPLES + 1).count()
        if n_hop > MAX_NEIGHBORHOOD_TRIPLES:
            raise RuntimeError(
                f"cyclic-residual neighborhood hop exceeds "
                f"{MAX_NEIGHBORHOOD_TRIPLES} triples (a high-degree node "
                f"is reachable from a residual cycle); shard resolution "
                f"needed")
        hop = hop_df.collect()
        new_keys = set()
        for row in hop:
            s = from_row(row["s"])
            o = from_row(row["o"])
            tk = (s.key(), row["p"], o.key())
            if tk not in triples_local:
                triples_local[tk] = (s, row["p"], o)
                for t in (s, o):
                    if t.key() not in keys:
                        new_keys.add(t.key())
                        keys.add(t.key())
        frontier_keys = new_keys

    graph = Graph(list(triples_local.values()))
    rows_by_shape: dict = {}
    for shape, term in pending:
        interp = PyFrame(engine.catalog, graph)
        stack = [_stack_frame(shape)]
        for match in interp.frame_shape(shape.id, False, [term], stack):
            if isinstance(match, (Mismatch, CyclicMatch)):
                continue
            value = json.dumps(encode_refs(match.value), ensure_ascii=False)
            rows_by_shape.setdefault(shape.id.key(), []).append(
                (term.key(), term.as_row(), 0, value)
            )

    for skey, rows in rows_by_shape.items():
        extra = engine.spark.createDataFrame(
            rows,
            "fkey string, focus struct<kind:string,value:string,dt:string,lang:string>, ord long, value string",
        )
        engine._fix[skey] = engine._fix[skey].unionAll(extra)
