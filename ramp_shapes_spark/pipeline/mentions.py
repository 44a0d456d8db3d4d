"""Mention detection + entity-link scoring over conversation turns.

Both stages are PURE COLUMN EXPRESSIONS — no Python boundary at all
(the previous revision used Arrow-batched ``pandas_udf``s; guide-§4
rule: prefer built-ins, they remove the JVM→Python transpose and the
worker processes entirely).  Detection finds every surface-form match
with ``regexp_extract_all`` and recovers each match's character offset
with a running ``locate`` fold: matches are non-overlapping and
in-order, and the first literal occurrence of a matched string at or
after the scan cursor IS its match position (any earlier literal
occurrence would itself have been matched first — every matched string
is a full instance of the pattern), so the fold reproduces
``re.finditer`` starts exactly (verified by tests/test_mentions.py
against a row-by-row ``re`` reference).

Output of :func:`detect_mentions` is the *mention relation*::

    (conv_id, turn_idx, surface, start, mention_id, entity_id, score)

``mention_id`` identifies the surface form occurrence; ``entity_id``
the dictionary candidate — the canonicalization stage (connected
components over candidate-link edges) merges alias surfaces into one
canonical entity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# alias grammar of the synthetic corpus (datagen.ALIAS_PATTERNS); a real
# deployment would broadcast a marisa-trie of surface forms instead
_SURFACE_PATTERN = r"(?:the )?acme-?(\d{5})(?: inc| corp)?"


def detect_mentions(turns: DataFrame) -> DataFrame:
    """Detect entity-surface mentions in turn text.

    Single codegen pass; emits one row per (turn, mention occurrence)
    with the 0-based character offset of each match.
    """
    pat = _SURFACE_PATTERN.replace("\\", "\\\\")
    mention_entries = F.expr(f"""
        aggregate(
          regexp_extract_all(text, '{pat}', 0),
          struct(CAST(1 AS INT) AS cur,
                 CAST(array() AS
                      array<struct<surface:string,start:int>>) AS ms),
          (acc, m) -> struct(
            CAST(locate(m, text, acc.cur) + length(m) AS INT) AS cur,
            array_append(acc.ms, struct(
              m AS surface,
              CAST(locate(m, text, acc.cur) - 1 AS INT) AS start))),
          acc -> acc.ms)
    """)
    exploded = turns.select(
        "conv_id", "turn_idx", "role",
        F.explode(mention_entries).alias("m"),
    ).select(
        "conv_id", "turn_idx", "role",
        F.col("m.surface").alias("surface"),
        F.col("m.start").alias("start"),
    )
    # candidate entity id from the alias grammar; mention_id is the
    # surface-form node (pre-canonicalization)
    ent_num = F.regexp_extract("surface", r"(\d{5})", 1)
    alias_grade = (
        F.when(F.col("surface").startswith("the "), F.lit(2))
        .when(F.col("surface").contains("-"), F.lit(1))
        .otherwise(F.lit(0))
    )
    return exploded.select(
        "conv_id", "turn_idx", "role", "surface", "start",
        F.concat(F.lit("mention:"), F.regexp_replace("surface", r"\s+", "_"))
        .alias("mention_id"),
        F.concat(F.lit("entity:acme"), ent_num).alias("entity_id"),
        alias_grade.alias("alias_grade"),
    )


def score_links(mentions: DataFrame) -> DataFrame:
    """Link scoring: P(entity | mention, context) proxy.

    Pure double-arithmetic columns in the same operation order as the
    previous vectorized-pandas formulation (base + role prior + length
    bonus, then clip) — bit-identical doubles, zero Python.
    """
    base = F.lit(1.0) - F.col("alias_grade").cast("double") * F.lit(0.07)
    role_prior = (
        F.when(F.col("role") == "user", F.lit(0.0))
        .when(F.col("role") == "assistant", F.lit(0.02))
        .when(F.col("role") == "tool", F.lit(-0.03))
        .otherwise(F.lit(0.0))
    )
    length_bonus = (
        F.least(F.length("surface").cast("double"), F.lit(24.0))
        / F.lit(240.0)
    )
    score = F.least(
        F.greatest(base + role_prior + length_bonus, F.lit(0.0)),
        F.lit(1.0),
    )
    return mentions.withColumn("score", score)


def link_edges(scored: DataFrame, min_score: float = 0.5) -> DataFrame:
    """Candidate-link edge list for canonicalization:
    (src=mention_id, dst=entity_id, score)."""
    return (
        scored.filter(F.col("score") >= min_score)
        .groupBy("mention_id", "entity_id")
        .agg(F.max("score").alias("score"))
        .select(F.col("mention_id").alias("src"),
                F.col("entity_id").alias("dst"), "score")
    )
