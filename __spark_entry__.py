"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``knowledge_graph_studio_spark.driver_contract``;
the 4 remaining entries without an oracle (float-geometry top-k paths
kg_triple_topk / kg_query_text and the numpy-hyperplane ANN paths
ann_lsh_topk / ann_ivf_topk) get the driver's rows-only check, are
law-tested in tests/, and each has an oracle-paired hashed or structured
twin exercising the same plan operators. The flagship kg_pipeline_nodes /
kg_pipeline_edges entries are ORACLE-PAIRED as of round 4.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: KG-analog construction over sf0.001 documents —
    gazetteer mentions -> co-occurrence (subj, pred, obj) triples."""
    from knowledge_graph_studio_spark.driver_contract import flagship_entry

    return flagship_entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from knowledge_graph_studio_spark.driver_contract import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from knowledge_graph_studio_spark.driver_contract import ORACLE_SQL

    return dict(ORACLE_SQL)
