"""JVM-literal construction of tiny DataFrames.

``spark.createDataFrame(small_list)`` parallelizes into defaultParallelism
partitions — on a 32-core session that is a 32-task job, each task spinning a
Python worker, to ship a handful of rows. Measured on this box: ~5s cold for
an 8-row alias map (tools/scaling_bench.py investigation). For the broadcast
dimensions the KG pipeline uses constantly (rule alias maps, canonical-name
mappings, pattern sets) that overhead dwarfs the data.

``literal_df`` instead inlines the rows as a Catalyst literal
array-of-structs exploded from a single-row range: one JVM-only task, zero
Python workers, zero shuffle — the plan carries the data. Use for <= ~10k
rows; beyond that, real parallelize wins (plan size grows linearly).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LITERAL_DF_MAX_ROWS = 10_000


def literal_df(
    spark: SparkSession, rows: Sequence[tuple], cols: Sequence[str]
) -> DataFrame:
    """Tiny DataFrame as a pure Catalyst literal (no Python workers).

    Values must be plain scalars (str/int/float/bool/None). Falls back to
    createDataFrame beyond LITERAL_DF_MAX_ROWS."""
    if len(rows) > LITERAL_DF_MAX_ROWS:
        return spark.createDataFrame(rows, list(cols))
    if not rows:
        raise ValueError("literal_df needs at least one row (or use an "
                         "explicit empty-schema createDataFrame)")
    structs = F.array(*[
        F.struct(*[F.lit(v).alias(c) for v, c in zip(row, cols)])
        for row in rows
    ])
    return (
        spark.range(0, 1, 1, 1)  # exactly one partition — one JVM task
        .select(F.explode(structs).alias("_s"))
        .select(*[F.col(f"_s.{c}").alias(c) for c in cols])
    )
