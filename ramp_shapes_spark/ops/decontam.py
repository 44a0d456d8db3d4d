"""Benchmark decontamination and repetition-quality operators.

Two standard training-data hygiene passes the reference library has no
analog for (it is a per-process shape engine) but a 100 TB corpus
pipeline needs as first-class citizens:

* :func:`ngram_decontaminate` — drop/flag training documents that share
  a word n-gram with a held-out evaluation set (the GPT-3/PaLM-style
  "13-gram overlap" decontamination rule, parameterized n);
* :func:`repetition_stats` — Gopher-style repetition quality signals
  (distinct-token ratio, most-frequent-bigram coverage) computed as
  pure column expressions with no per-doc shuffle.

All token semantics are the shared ``tokens_col`` whitespace split so
results agree byte-for-byte with the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col


def word_ngrams(toks: Column, n: int) -> Column:
    """Array of space-joined word ``n``-grams (empty when the document
    has fewer than ``n`` tokens).  1-based slice so the SQL-oracle
    spelling ``w[i:i+n-1]`` is position-identical."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_decontaminate(train: DataFrame, eval_docs: DataFrame,
                        n: int = 5, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Flag training documents sharing at least one word ``n``-gram
    with the evaluation corpus.  Returns one row per CONTAMINATED
    training document: ``(doc_id, n_hit_grams)`` where ``n_hit_grams``
    counts the document's distinct n-grams that appear anywhere in the
    eval set.

    Scale shape: the eval side (benchmarks — thousands of documents,
    not billions) collapses to a distinct gram set and is explicitly
    ``broadcast()``; the train side is one narrow projection
    (per-doc ``array_distinct`` BEFORE the explode, so the exploded
    row count is bounded by distinct grams per doc) → broadcast-hash
    join → one aggregation keyed by doc id with map-side partial
    combine.  Exactly one shuffle, no train-side self-join, no skew
    risk (gram frequency never keys a shuffle).
    """
    from .dedup import spread

    # spread: both sides arrive as filtered slices of one small parquet
    # file (a single scan partition), which would serialize the whole
    # gram build onto one core
    eval_grams = (
        spread(eval_docs).select(
            F.explode(
                F.array_distinct(word_ngrams(tokens_col(F.col(text_col)), n))
            ).alias("gram")
        ).distinct()
    )
    train = spread(train)
    train_grams = train.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_ngrams(tokens_col(F.col(text_col)), n))
        ).alias("gram"),
    )
    return (
        train_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit_grams"))
    )


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document:
    ``(doc_id, n_tokens, distinct_x10k, top_bigram_x10k)`` where
    ``distinct_x10k`` is the distinct-token ratio and
    ``top_bigram_x10k`` the fraction of tokens covered by the single
    most frequent word bigram (count×2 / n_tokens), both in 1/10000
    fixed point (floor(x+0.5) rounding, the repo-wide convention).

    Scale shape: zero shuffle — the bigram mode is computed INSIDE the
    row via ``array_sort`` + a single ``aggregate`` fold over adjacent
    runs (no explode/groupBy per gram), so the whole operator is one
    codegen'd projection; documents hit the Zipf head only in their own
    row's array.  Empty/one-token documents yield 0 for both ratios.
    """
    toks = tokens_col(F.col(text_col))
    nt = F.size(toks)
    bigrams = F.array_sort(word_ngrams(toks, 2))
    # longest run of equal adjacent elements in the sorted gram array
    # == max bigram multiplicity, without leaving the row
    max_count = F.aggregate(
        bigrams,
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                 F.lit(0).alias("best")),
        lambda acc, g: F.struct(
            g.alias("prev"),
            F.when(g == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    distinct_x10k = F.when(
        nt > 0,
        F.floor(F.lit(10000.0) * F.size(F.array_distinct(toks)) / nt
                + F.lit(0.5)),
    ).otherwise(F.lit(0))
    top_bigram_x10k = F.when(
        nt > 0,
        F.floor(F.lit(20000.0) * max_count / nt + F.lit(0.5)),
    ).otherwise(F.lit(0))
    return docs.select(
        F.col(id_col),
        nt.cast("long").alias("n_tokens"),
        distinct_x10k.cast("long").alias("distinct_x10k"),
        top_bigram_x10k.cast("long").alias("top_bigram_x10k"),
    )
