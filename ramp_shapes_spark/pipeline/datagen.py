"""Deterministic synthetic conversation transcripts.

Input-table contract (BASELINE input_hint): one row per conversation
turn, columns ``(conv_id string, turn_idx int, role string,
text string, tool string, ts timestamp)``.

Everything is generated *relationally* from ``spark.range`` — column
expressions over the row id, no driver loops, no RNG state — so the
same (seed, n_conversations) always produces byte-identical tables at
any parallelism, and the embedded entity mentions are recomputable as
ground truth without parsing text.

Entity frequency is Zipf-shaped (rank r drawn via a power transform of
a uniform hash) so the canonicalization stage sees realistic skew: the
head entity appears in a double-digit percentage of mentions, which is
exactly what the salted connected-components path is for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SEED = 42
# each entity e has alias surface forms; alias 0 is canonical
ALIAS_PATTERNS = ["acme{e}", "acme-{e} inc", "the acme{e} corp"]

ROLES = ["user", "assistant", "tool"]
TOOLS = ["", "search", "calculator", "browser"]

FILLER = [
    "tell me about", "what is the status of", "compare", "I looked into",
    "the report covers", "results for", "please summarize", "notes on",
]


def _h(seed: int, *cols: Column) -> Column:
    """Stable 63-bit non-negative hash of columns."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def _zipf_rank(h: Column, n_entities: int, skew: float = 1.1) -> Column:
    """Map a uniform hash to a Zipf-ish rank in [0, n_entities).

    Uses the inverse-CDF power transform u^alpha: rank 0 is the hot
    head (~u^alpha mass near zero).
    """
    u = (h % 1_000_000_007).cast("double") / 1_000_000_007.0
    alpha = skew * 3.0
    return F.least(
        F.lit(n_entities - 1),
        F.floor(F.pow(u, F.lit(alpha)) * n_entities).cast("long"),
    )


def entity_surface(rank: Column, alias: Column) -> Column:
    e = F.format_string("%05d", rank)
    return (
        F.when(alias == 0, F.concat(F.lit("acme"), e))
        .when(alias == 1, F.concat(F.lit("acme-"), e, F.lit(" inc")))
        .otherwise(F.concat(F.lit("the acme"), e, F.lit(" corp")))
    )


def generate_transcripts(
    spark: SparkSession,
    n_conversations: int,
    seed: int = DEFAULT_SEED,
    n_entities: int = 1000,
    max_turns: int = 8,
    partitions: int = 32,
) -> DataFrame:
    """Transcript table; deterministic in (seed, n_conversations)."""
    # turns-per-conversation in [3, max_turns], derived from conv hash
    convs = (
        spark.range(0, n_conversations, 1, partitions)
        .select(
            F.col("id").alias("conv_n"),
            (3 + _h(seed, F.col("id")) % (max_turns - 2)).alias("n_turns"),
        )
    )
    turns = convs.select(
        "conv_n",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    conv_id = F.format_string("conv%08d", F.col("conv_n"))
    role_idx = F.col("turn_idx") % 3
    role = (
        F.when(role_idx == 0, "user")
        .when(role_idx == 1, "assistant")
        .otherwise("tool")
    )
    tool = F.when(
        role_idx == 2,
        F.element_at(
            F.array(*[F.lit(t) for t in TOOLS[1:]]),
            (_h(seed + 1, F.col("conv_n"), F.col("turn_idx")) % 3 + 1).cast("int"),
        ),
    ).otherwise(F.lit(""))

    # 1-3 mentions per turn, Zipf entity ranks, varied alias forms
    n_mentions = (1 + _h(seed + 2, F.col("conv_n"), F.col("turn_idx")) % 3)
    mention_cols = []
    for i in range(3):
        rank = _zipf_rank(
            _h(seed + 10 + i, F.col("conv_n"), F.col("turn_idx")), n_entities
        )
        alias = _h(seed + 20 + i, F.col("conv_n"), F.col("turn_idx")) % 3
        mention_cols.append(
            F.when(F.lit(i) < n_mentions, entity_surface(rank, alias))
            .otherwise(F.lit(None))
        )

    filler = F.element_at(
        F.array(*[F.lit(x) for x in FILLER]),
        (_h(seed + 3, F.col("conv_n"), F.col("turn_idx")) % len(FILLER) + 1).cast("int"),
    )
    text = F.concat_ws(
        " ",
        filler,
        mention_cols[0],
        F.when(mention_cols[1].isNotNull(), F.lit("and")),
        mention_cols[1],
        F.when(mention_cols[2].isNotNull(), F.lit("versus")),
        mention_cols[2],
        F.lit("in turn"),
        F.col("turn_idx").cast("string"),
    )

    ts = F.timestamp_seconds(
        F.lit(1_700_000_000)
        + F.col("conv_n") * 3600
        + F.col("turn_idx") * 60
    )

    return turns.select(
        conv_id.alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def ground_truth_mentions(
    spark: SparkSession,
    n_conversations: int,
    seed: int = DEFAULT_SEED,
    n_entities: int = 1000,
    max_turns: int = 8,
    partitions: int = 32,
) -> DataFrame:
    """Recompute the embedded mentions relationally (no text parsing):
    (conv_id, turn_idx, rank, alias, surface) — the pipeline's exact
    extraction ground truth."""
    convs = (
        spark.range(0, n_conversations, 1, partitions)
        .select(
            F.col("id").alias("conv_n"),
            (3 + _h(seed, F.col("id")) % (max_turns - 2)).alias("n_turns"),
        )
    )
    turns = convs.select(
        "conv_n",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    n_mentions = (1 + _h(seed + 2, F.col("conv_n"), F.col("turn_idx")) % 3)
    parts = []
    for i in range(3):
        rank = _zipf_rank(
            _h(seed + 10 + i, F.col("conv_n"), F.col("turn_idx")), n_entities
        )
        alias = _h(seed + 20 + i, F.col("conv_n"), F.col("turn_idx")) % 3
        parts.append(
            turns.filter(F.lit(i) < n_mentions).select(
                F.format_string("conv%08d", F.col("conv_n")).alias("conv_id"),
                F.col("turn_idx").cast("int").alias("turn_idx"),
                rank.alias("rank"),
                alias.cast("int").alias("alias"),
                entity_surface(rank, alias).alias("surface"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    # identical (entity, alias) embedded twice in one turn dedups at
    # extraction (a surface occurs once as a mention relation)
    return out.dropDuplicates(["conv_id", "turn_idx", "rank", "alias"])
