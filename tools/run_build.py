"""spark-submit entry point for the KG construction pipeline.

Cluster launch (the north rule's deployment shape):

    zip -r kgs.zip knowledge_graph_studio_spark
    spark-submit --py-files kgs.zip tools/run_build.py \
        --pages /data/pages --workdir /data/kg_out --buckets 256

Local smoke (synthesizes the input first):

    python tools/run_build.py --synthesize 2000 --workdir /tmp/kg_out

The job is resumable: rerunning with the same --workdir skips every bucket the
run manifest has already committed (pipeline.build_graph_resumable).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="path to the pages parquet/Iceberg table")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument("--synthesize", type=int, default=0,
                    help="generate N synthetic pages into --workdir/pages first")
    ap.add_argument("--workspace", default="default",
                    help="tenant workspace the build runs in")
    ap.add_argument("--created-by", default="default",
                    help="tenant user the build runs as")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from knowledge_graph_studio_spark.pipeline import build_graph_resumable

    # on a cluster, spark-submit provides the session config; locally fall
    # back to the tuned factory
    spark = SparkSession.getActiveSession()
    if spark is None:
        from knowledge_graph_studio_spark.session import get_spark

        spark = get_spark("kg-build")
    spark.sparkContext.setLogLevel("WARN")

    pages_path = args.pages
    if args.synthesize:
        from knowledge_graph_studio_spark.sources.pages import synthetic_pages

        pages_path = f"{args.workdir}/pages"
        synthetic_pages(spark, args.synthesize, seed=42).write.mode(
            "overwrite").parquet(pages_path)
    if not pages_path:
        ap.error("--pages or --synthesize required")

    t0 = time.time()
    out = build_graph_resumable(
        spark, pages_path, args.workdir, n_buckets=args.buckets,
        workspace=args.workspace, created_by=args.created_by)
    from knowledge_graph_studio_spark.io.catalog import GraphStatus

    print(json.dumps({
        "nodes": out["nodes"].count(),
        "edges": out["edges"].count(),
        "wall_sec": round(time.time() - t0, 2),
        "workdir": args.workdir,
        "status": GraphStatus(args.workdir).get("default"),
    }))


if __name__ == "__main__":
    main()
