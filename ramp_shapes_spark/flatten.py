"""Distributed flatten: framed-value DataFrame → triples DataFrame.

Flatten needs no cross-row information (each value emits its own
triples), so the distributed form is a ``mapInPandas`` over Arrow
batches running the reference-semantics emitter
(:mod:`ramp_shapes_spark.pyflatten`) per value — no shuffle, linear
scan, scales with input partitioning.  Blank node ids derive from a
per-row seed column so output is deterministic and collision-free
across executors.

Rows that fail to flatten (value does not match the shape) land in an
error side-channel (code + stack), mirroring the engine-wide
errors-as-data design.
"""

from __future__ import annotations

import json
from typing import Iterator, List, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

from .dataset import TRIPLES_SCHEMA
from .pyflatten import FlattenError, deterministic_bnode_generator, flatten_py
from .shapes import ShapeCatalog, ShapeID
from .terms import TERM_TYPE

FLATTEN_OUT_SCHEMA = StructType(
    [
        StructField("seed", StringType(), False),
        StructField("tid", LongType(), False),
        StructField("s", TERM_TYPE, True),
        StructField("p", StringType(), True),
        StructField("o", TERM_TYPE, True),
        StructField("err_code", IntegerType(), True),
        StructField("err_stack", StringType(), True),
    ]
)


def flatten_df(df: DataFrame, catalog: ShapeCatalog, root: ShapeID,
               value_col: str = "value",
               seed_col: Optional[str] = None) -> DataFrame:
    """Flatten every row's JSON value against ``root``.

    ``seed_col`` names a unique-per-row string column used to derive
    deterministic blank node ids; when absent, the sha1 of the value
    itself is used (identical values then share blank labels, which is
    harmless because their triple sets are identical too).

    Returns (seed, tid, s, p, o, err_code, err_stack); err rows have
    null s/p/o.
    """
    if seed_col is None:
        df = df.withColumn("__seed", F.sha1(F.col(value_col)))
        seed_col = "__seed"
    cols = df.select(F.col(seed_col).alias("seed"),
                     F.col(value_col).alias("val"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: List[tuple] = []
            for seed, raw in zip(batch["seed"], batch["val"]):
                try:
                    value = json.loads(raw)
                    triples = flatten_py(
                        catalog, root, value,
                        deterministic_bnode_generator(str(seed)),
                    )
                    for i, (s, p, o) in enumerate(triples):
                        out.append((seed, i, s.as_row(), p, o.as_row(),
                                    None, None))
                except FlattenError as e:
                    out.append((seed, 0, None, None, None, e.code,
                                json.dumps(e.stack)))
            yield pd.DataFrame(
                out, columns=["seed", "tid", "s", "p", "o",
                              "err_code", "err_stack"],
            )

    return cols.mapInPandas(run, FLATTEN_OUT_SCHEMA)


def flatten_triples(df: DataFrame, catalog: ShapeCatalog, root: ShapeID,
                    value_col: str = "value",
                    seed_col: Optional[str] = None) -> DataFrame:
    """Successful triples only, deduplicated, in the engine's canonical
    (tid, s, p, o) layout (rdf-dataset insert-dedup analog).

    Shapes inside the acyclic relational fragment compile to a pure
    JVM emitter (:mod:`ramp_shapes_spark.relational_flatten` — no
    Python in the hot path); anything else falls back to the
    Arrow-batched interpreter."""
    from .relational_flatten import UnsupportedShape, flatten_relational

    try:
        good = flatten_relational(df, catalog, root, value_col, seed_col)
    except UnsupportedShape:
        flat = flatten_df(df, catalog, root, value_col, seed_col)
        good = flat.filter(F.col("err_code").isNull())
    # tid is only an iteration-order surrogate; a partition-local id
    # avoids the global sort a row_number() would force at scale
    return (
        good.dropDuplicates(["s", "p", "o"])
        .select(F.monotonically_increasing_id().alias("tid"), "s", "p", "o")
    )
