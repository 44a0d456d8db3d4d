"""Property-path evaluation over a triples DataFrame.

Semantics mirror the reference path evaluator (frame.ts:361-388 fast
paths; frame.ts:730-802 general ``findByPath``): every step produces a
*set* of terms per source row, so each step deduplicates; closure paths
(``zeroOrMore``/``oneOrMore``) run a breadth-first frontier loop with
dedup against the seen set.

Spark mapping: a step is an equi-join of the working set against the
triples table on ``(node == s, p == const)`` (forward) or
``(node == o, p == const)`` (inverse); closures are a driver-side loop
of such joins with ``localCheckpoint`` every few rounds to cut lineage
(the standard iterative-algorithm pattern on Spark; same shape as
connected components).

Note: the reference's *general* path evaluator has a reversed-predicate
slow-path bug (frame.ts:739 adds ``q.object`` even when matching
``(null, p, source)``); this engine implements the documented SPARQL
semantics instead — the fixtures only exercise the correct fast path.

The working-set DataFrame contract: one column ``node`` (TERM) plus
arbitrary carry-through key columns; the result replaces ``node`` with
reached terms, carries ``tord`` (min tid along the final step, used as
the dataset-order surrogate) and deduplicates per (keys, node).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dataset import term_key_col
from .shapes import (
    AlternativePath,
    InversePath,
    OneOrMorePath,
    PredicatePath,
    PropertyPath,
    SequencePath,
    ZeroOrMorePath,
    ZeroOrOnePath,
)

MAX_CLOSURE_ITERATIONS = 200


def _dedup(df: DataFrame, keys: List[str]) -> DataFrame:
    """Keep one row per (keys, node) with the smallest tord."""
    return df.groupBy(*keys, "node").agg(F.min("tord").alias("tord"))


def _predicate_step(
    df: DataFrame, keys: List[str], predicate: str, triples: DataFrame,
    reverse: bool,
) -> DataFrame:
    src, dst = ("o", "s") if reverse else ("s", "o")
    t = triples.filter(F.col("p") == F.lit(predicate)).select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst"),
        F.col("tid").alias("__tid"),
    )
    joined = df.join(t, term_key_col(df["node"]) == term_key_col(t["__src"]))
    out = joined.select(*keys, F.col("__dst").alias("node"),
                        F.col("__tid").alias("tord"))
    return _dedup(out, keys)


def eval_path(
    path: PropertyPath,
    df: DataFrame,
    keys: List[str],
    triples: DataFrame,
    reverse: bool = False,
) -> DataFrame:
    """Evaluate ``path`` from every row of ``df`` (column ``node``).

    Returns a DataFrame with the same ``keys`` columns, reached terms in
    ``node`` and ``tord``.  ``df`` must already carry a ``tord`` column
    (source order; kept for empty-sequence identity).
    """
    if isinstance(path, PredicatePath):
        return _predicate_step(df, keys, path.predicate, triples, reverse)

    if isinstance(path, SequencePath):
        steps = list(path.sequence)
        if reverse:
            steps = [InversePath(s) for s in reversed(steps)]
        out = df
        if not steps:
            return _dedup(out.select(*keys, "node", "tord"), keys)
        for step in steps:
            out = eval_path(step, out, keys, triples, reverse=False)
        return out

    if isinstance(path, InversePath):
        return eval_path(path.inverse, df, keys, triples, reverse=not reverse)

    if isinstance(path, AlternativePath):
        outs = [
            eval_path(alt, df, keys, triples, reverse)
            for alt in path.alternatives
        ]
        union = outs[0]
        for other in outs[1:]:
            union = union.unionAll(other)
        return _dedup(union, keys)

    if isinstance(path, (ZeroOrMorePath, ZeroOrOnePath, OneOrMorePath)):
        inner = path.path
        include_self = isinstance(path, (ZeroOrMorePath, ZeroOrOnePath))
        once = isinstance(path, ZeroOrOnePath)

        seen = df.select(*keys, "node", "tord") if include_self else None
        frontier = df.select(*keys, "node", "tord")
        result = seen

        def row_key(dfx: DataFrame) -> "F.Column":
            return F.concat_ws(
                "\x1e", *[dfx[k] for k in keys], term_key_col(dfx["node"])
            )

        iterations = 0
        while True:
            iterations += 1
            step = eval_path(inner, frontier, keys, triples, reverse)
            if result is not None:
                seen_keys = result.select(
                    row_key(result).alias("__seen_k")
                ).distinct()
                new = (
                    step.withColumn("__k", row_key(step))
                    .join(seen_keys, F.col("__k") == F.col("__seen_k"),
                          "left_anti")
                    .drop("__k")
                )
            else:
                new = step
            # lazy checkpoint + count: ONE job per iteration materializes
            # the frontier, cuts lineage and probes emptiness together
            new = _dedup(new, keys).localCheckpoint(eager=False)
            if new.count() == 0:
                break
            result = _dedup(result.unionAll(new), keys) if result is not None else new
            if iterations % 4 == 0:
                # lazy: the next iteration's anti-join job materializes it
                result = result.localCheckpoint(eager=False)
            if once:
                break
            frontier = new
            if iterations >= MAX_CLOSURE_ITERATIONS:
                raise RuntimeError("property-path closure exceeded iteration cap")
        if result is None:
            # oneOrMore with no reachable terms
            return df.select(*keys, "node", "tord").limit(0)
        return _dedup(result, keys)

    raise TypeError(f"unknown path {path!r}")
