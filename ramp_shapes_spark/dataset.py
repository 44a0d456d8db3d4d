"""Triple datasets as DataFrames.

The reference stores quads in an in-memory hash-indexed set
(``src/rdf/rdf-dataset.ts:4-129``); its SP/OP hash indexes exist to
serve "objects of (s, p)" / "subjects of (o, p)" lookups.  In this
engine the dataset is a plain triples DataFrame

    (tid: long, s: TERM, p: string, o: TERM)

and those index lookups become hash equi-joins that Catalyst plans
(broadcast when the probe side is small, shuffled-hash/sort-merge
otherwise).  ``tid`` is the document/ingest order of the triple; it
stands in for the reference's dataset insertion order, which leaks into
match-iteration order.

Deduplication on insert (rdf-dataset.ts:97-129) maps to
``dropDuplicates(['s','p','o'])``.
"""

from __future__ import annotations

from typing import Iterable, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from .terms import TERM_TYPE, Term
from .ttl import Triple, parse_turtle_file

TRIPLES_SCHEMA = StructType(
    [
        StructField("tid", LongType(), False),
        StructField("s", TERM_TYPE, False),
        StructField("p", StringType(), False),
        StructField("o", TERM_TYPE, False),
    ]
)


def triples_df(spark: SparkSession, triples: Iterable[Triple],
               dedup: bool = True) -> DataFrame:
    """Build a triples DataFrame from driver-side triples (fixtures)."""
    seen = set()
    rows: List[tuple] = []
    for s, p, o in triples:
        key = (s.key(), p, o.key())
        if dedup:
            if key in seen:
                continue
            seen.add(key)
        rows.append((len(rows), s.as_row(), p, o.as_row()))
    return spark.createDataFrame(rows, TRIPLES_SCHEMA)


def load_turtle_df(spark: SparkSession, path: str) -> DataFrame:
    return triples_df(spark, parse_turtle_file(path))


def term_key_col(col) -> "F.Column":
    """Collision-free string key of a TERM struct column (for joins on a
    single flat key instead of a 4-field struct)."""
    return F.concat_ws(
        "\x1f", col["kind"], col["value"],
        F.coalesce(col["dt"], F.lit("\x00")),
        F.coalesce(col["lang"], F.lit("\x00")),
    )


def all_candidate_terms(triples: DataFrame) -> DataFrame:
    """All subject and object terms with their first-seen ``tid`` as
    the iteration order (frame.ts:721-728 ``findAllCandidates``)."""
    both = triples.select(F.col("s").alias("focus"), "tid").unionAll(
        triples.select(F.col("o").alias("focus"), "tid")
    )
    return (
        both.groupBy("focus").agg(F.min("tid").alias("ord"))
    )
