"""End-to-end KG-construction pipeline.

transcripts → vectorized mention detection/scoring → extraction triples
→ ``frame`` (shape-validated typed records + error channel) →
``flatten`` (canonical triples, deterministic blank nodes) → entity
canonicalization (connected components) → materialized partitioned
triple table with lineage manifests.

The frame/flatten roundtrip in the middle is the point of the engine:
the shape algebra validates cardinalities and types *as data flows*
(malformed turns become error rows, not job failures) and guarantees
that emitted triples are exactly the canonical projection of the typed
records — the same contract the reference library provides per-process,
here as a distributed pipeline stage.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ramp_shapes_spark.flatten import flatten_triples
from ramp_shapes_spark.frame import FrameEngine

from .canonicalize import canonical_entity_map
from .kgshapes import build_kg_catalog, kg
from .materialize import materialize_triples
from .mentions import detect_mentions, link_edges, score_links

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"


def _iri(col) -> F.Column:
    return F.struct(
        F.lit("iri").alias("kind"), col.alias("value"),
        F.lit(None).cast("string").alias("dt"),
        F.lit(None).cast("string").alias("lang"),
    )


def _lit(col, dt: str) -> F.Column:
    return F.struct(
        F.lit("lit").alias("kind"), col.cast("string").alias("value"),
        F.lit(dt).alias("dt"), F.lit(None).cast("string").alias("lang"),
    )


def extraction_triples(turns: DataFrame, scored: DataFrame) -> DataFrame:
    """Relational construction of the extraction graph (tid, s, p, o)."""
    turn_iri = F.concat(F.lit("turn:"), F.col("conv_id"), F.lit(":"),
                        F.col("turn_idx").cast("string"))
    conv_iri = F.concat(F.lit("conv:"), F.col("conv_id"))

    t = turns.select(
        turn_iri.alias("ti"), conv_iri.alias("ci"),
        "turn_idx", "role", "tool",
    )
    parts = [
        t.select(_iri(F.col("ti")).alias("s"), F.lit(RDF_TYPE).alias("p"),
                 _iri(F.lit(kg("Turn"))).alias("o")),
        t.select(_iri(F.col("ti")).alias("s"),
                 F.lit(kg("inConversation")).alias("p"),
                 _iri(F.col("ci")).alias("o")),
        t.select(_iri(F.col("ti")).alias("s"),
                 F.lit(kg("turnIndex")).alias("p"),
                 _lit(F.col("turn_idx"), XSD + "integer").alias("o")),
        t.select(_iri(F.col("ti")).alias("s"), F.lit(kg("role")).alias("p"),
                 _lit(F.col("role"), XSD + "string").alias("o")),
        t.filter(F.col("tool") != "").select(
            _iri(F.col("ti")).alias("s"), F.lit(kg("tool")).alias("p"),
            _lit(F.col("tool"), XSD + "string").alias("o")),
    ]

    m_turn_iri = F.concat(F.lit("turn:"), F.col("conv_id"), F.lit(":"),
                          F.col("turn_idx").cast("string"))
    mnode = F.concat(F.lit("mo:"), F.col("conv_id"), F.lit(":"),
                     F.col("turn_idx").cast("string"), F.lit(":"),
                     F.col("start").cast("string"))
    m = scored.select(
        m_turn_iri.alias("ti"), mnode.alias("mi"),
        "entity_id", "surface", "score",
    )
    parts.extend([
        m.select(_iri(F.col("ti")).alias("s"), F.lit(kg("mentions")).alias("p"),
                 _iri(F.col("mi")).alias("o")),
        m.select(_iri(F.col("mi")).alias("s"), F.lit(RDF_TYPE).alias("p"),
                 _iri(F.lit(kg("Mention"))).alias("o")),
        m.select(_iri(F.col("mi")).alias("s"), F.lit(kg("entity")).alias("p"),
                 _iri(F.col("entity_id")).alias("o")),
        m.select(_iri(F.col("mi")).alias("s"), F.lit(kg("surface")).alias("p"),
                 _lit(F.col("surface"), XSD + "string").alias("o")),
        m.select(_iri(F.col("mi")).alias("s"), F.lit(kg("score")).alias("p"),
                 _lit(F.round(F.col("score"), 4), XSD + "double").alias("o")),
    ])

    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return (
        out.dropDuplicates(["s", "p", "o"])
        .withColumn("tid", F.monotonically_increasing_id())
        .select("tid", "s", "p", "o")
    )


def canonicalize_triples(triples: DataFrame, node_map: DataFrame) -> DataFrame:
    """Rewrite entity object IRIs to their canonical representatives and
    append ``kg:canonicalEntity`` alias edges."""
    cmap = node_map.select(
        F.col("node").alias("__n"), F.col("canonical").alias("__c")
    )
    rewritten = (
        triples.join(cmap, triples["o"]["value"] == F.col("__n"), "left")
        .select(
            "tid", "s", "p",
            F.when(
                F.col("__c").isNotNull() & (F.col("o")["kind"] == "iri"),
                F.struct(
                    F.lit("iri").alias("kind"), F.col("__c").alias("value"),
                    F.lit(None).cast("string").alias("dt"),
                    F.lit(None).cast("string").alias("lang"),
                ),
            ).otherwise(F.col("o")).alias("o"),
        )
    )
    alias_edges = (
        node_map.filter(
            F.col("node").startswith("entity:")
            & (F.col("node") != F.col("canonical"))
        )
        .select(
            F.lit(0).cast("long").alias("tid"),
            _iri(F.col("node")).alias("s"),
            F.lit(kg("canonicalEntity")).alias("p"),
            _iri(F.col("canonical")).alias("o"),
        )
    )
    return rewritten.unionAll(alias_edges).dropDuplicates(["s", "p", "o"])


@dataclass
class PipelineResult:
    framed: DataFrame         # (focus, ord, value)
    frame_errors: DataFrame
    triples: DataFrame        # canonical (tid, s, p, o)
    metrics: Dict


def run_pipeline(
    spark: SparkSession,
    turns: DataFrame,
    workdir: Optional[str] = None,
    n_buckets: int = 16,
    input_fingerprint: str = "",
    hot_k: int = 64,
) -> PipelineResult:
    scored = score_links(detect_mentions(turns))
    ext = extraction_triples(turns, scored).persist()

    catalog, turn_shape = build_kg_catalog()
    engine = FrameEngine(spark, catalog, ext)
    framed = engine.frame(turn_shape)

    values = framed.matches.select(
        F.col("focus")["value"].alias("seed"), "value"
    )
    flat = flatten_triples(values, catalog, turn_shape, seed_col="seed")

    node_map = canonical_entity_map(link_edges(scored), hot_k=hot_k)
    canonical = canonicalize_triples(flat, node_map)

    metrics: Dict = {}
    if workdir is not None:
        metrics = materialize_triples(
            canonical, workdir, n_buckets=n_buckets,
            input_fingerprint=input_fingerprint, spark=spark,
        )
    return PipelineResult(
        framed=framed.matches, frame_errors=framed.errors,
        triples=canonical, metrics=metrics,
    )
