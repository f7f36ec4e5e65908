"""knowledge_graph_studio_spark — a from-scratch, PySpark-native knowledge-graph
construction engine with the capabilities of whyhow-ai/knowledge-graph-studio.

The reference (at /root/reference, read-only) is a FastAPI + MongoDB service; this
package re-expresses its dataflow semantics — chunking, mention detection,
schema-guided triple extraction, rule-based + connected-components entity
canonicalization, node/edge merge laws, and the query layer — as idiomatic Spark
DataFrame jobs with vectorized pandas/Arrow UDFs only where built-in Column
expressions cannot express the semantics.

Layout:
  textcore.py   pure-Python shared core (NO pyspark import): html→text, splitter,
                gazetteer extraction, merge laws — the byte-identical oracle.
  corpus.py     deterministic synthetic `pages` corpus generator.
  schema_model  KG schema / rules dataclasses (reference schemas/schemas.py).
  session.py    SparkSession builder with scale-oriented defaults.
  operators/    chunking, extraction, linking, dedup, similarity, textstats,
                multimodal.
  functions/    deterministic embedder, cosine/vector expressions, verbalization.
  plans/        query layer (structured filter, hydration, compression, export).
  sources/      readers (pages table, csv/json → object chunks, binary files).
  streaming/    Structured Streaming incremental ingest.
  io/           table catalog (parquet-backed, Iceberg-shaped), run manifest,
                resumable partition commits.
  pipeline.py   end-to-end build_graph orchestration.
"""

__version__ = "0.1.0"
