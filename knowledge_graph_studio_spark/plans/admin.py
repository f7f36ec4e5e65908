"""Administrative graph mutations (L6/L8/L9) as DataFrame rewrites.

Reference parity (file:line in /root/reference/src/whyhow_api):
  L8 graph cascade delete      services/crud/graph.py:23-66 (triples, nodes,
                               queries, graph in one transaction)
  L9 chunk (un)assignment      services/crud/chunks.py:562-721 ($push/$pull
                               with assigned / not_found / already partitions)

In a table world these are partition-level operations: a graph is a partition
key of nodes/edges, so cascade delete is a partition filter (or Iceberg
`DELETE FROM ... WHERE graph = ?`), and assignment is an array-column rewrite
of the matched rows. Each function returns the NEW table state — callers
overwrite the partition (snapshot-isolated commit in Iceberg terms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def delete_graph(df: DataFrame, graph: str) -> DataFrame:
    """L8: drop every row of one graph (apply to nodes AND edges tables;
    with Iceberg this compiles to a metadata-only partition drop)."""
    return df.filter(F.col("graph") != graph)


def assign_chunks(
    table: DataFrame, target_ids: list, chunk_ids: list[str],
    id_col: str = "node_id",
) -> tuple[DataFrame, DataFrame]:
    """L9 $push analog: union chunk_ids into the chunks array of the matched
    rows. Returns (new_table, report) where report partitions the request into
    assigned / already_assigned / not_found — the same tri-state response the
    reference builds (services/crud/chunks.py:562-652)."""
    ids = F.array(*[F.lit(i) for i in target_ids])
    adds = F.array(*[F.lit(c) for c in chunk_ids])
    matched = F.array_contains(ids, F.col(id_col))
    new_table = table.withColumn(
        "chunks",
        F.when(matched, F.array_sort(F.array_union("chunks", adds)))
        .otherwise(F.col("chunks")),
    )
    present = table.filter(matched).select(
        F.col(id_col).alias("target_id"),
        F.lit("assigned").alias("status"),
        F.array_sort(F.array_except(adds, "chunks")).alias("newly_added"),
        F.array_sort(F.array_intersect(adds, "chunks")).alias("already_assigned"),
    )
    found = {r["target_id"] for r in present.select("target_id").collect()}
    missing = [(i, "not_found", [], []) for i in target_ids if i not in found]
    report = present
    if missing:
        spark = table.sparkSession
        report = present.unionByName(spark.createDataFrame(
            missing, present.schema))
    return new_table, report


def unassign_chunks(
    table: DataFrame, target_ids: list, chunk_ids: list[str],
    id_col: str = "node_id",
) -> DataFrame:
    """L9 $pull analog: remove chunk_ids from the matched rows' chunks."""
    ids = F.array(*[F.lit(i) for i in target_ids])
    removes = F.array(*[F.lit(c) for c in chunk_ids])
    return table.withColumn(
        "chunks",
        F.when(F.array_contains(ids, F.col(id_col)),
               F.array_except("chunks", removes))
        .otherwise(F.col("chunks")),
    )
