"""spark-submit entry point for the KG construction pipeline.

Cluster launch (the north rule's deployment shape):

    zip -r kgs.zip knowledge_graph_studio_spark
    spark-submit --py-files kgs.zip \
        --conf spark.local.dir=/mnt/nvme/spark \
        tools/run_build.py \
        --pages /data/pages --workdir /data/kg_out --buckets 256

spark.local.dir must point at executor-local fast storage (NVMe on a real
cluster; tmpfs on this single-disk VM) — the link stage's salted aggregation
is shuffle-bound, and a shared slow spindle serializes it regardless of core
count (measured 2.5x at 16 cores). It is a JVM-launch-time setting, so the
attach path cannot apply it; it has to ride the submit command.

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
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip the steady-state executor warm-up build")
    ap.add_argument("--max-chunks", type=int, default=2048,
                    help="per-node/edge provenance cap (0 = uncapped exact "
                         "reference semantics; hot entities then carry "
                         "corpus-sized chunk arrays)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from knowledge_graph_studio_spark.pipeline import build_graph_resumable

    # Under spark-submit, ATTACH to the launched JVM (its --master /
    # --driver-memory / executor topology must win; building a session with
    # the local factory here would override the submitted cluster with
    # local[N] — see session.attach_submitted_session). Only a plain
    # `python tools/run_build.py` falls back to the tuned local factory.
    from knowledge_graph_studio_spark.session import (
        attach_submitted_session, get_spark,
    )

    spark = attach_submitted_session()
    if spark is None:
        spark = SparkSession.getActiveSession() or get_spark("kg-build")
    spark.sparkContext.setLogLevel("WARN")

    pages_path = args.pages
    if args.synthesize:
        from knowledge_graph_studio_spark.sources.pages import synthetic_pages

        pages_path = f"{args.workdir}/pages"
        synthetic_pages(spark, args.synthesize, seed=42).write.mode(
            "overwrite").parquet(pages_path)
    if not pages_path:
        ap.error("--pages or --synthesize required")

    # Size input splits for the PAGES scan to ~2 tasks per core (the
    # pipeline re-sizes them again for the much smaller triples table before
    # its link stage — see build_graph_resumable). A 100 TB table never hits
    # the clamp and keeps the 128 MB default.
    from knowledge_graph_studio_spark.session import size_input_splits

    size_input_splits(spark, pages_path)

    if not args.no_warmup:
        # Warm the JVM codegen paths and the per-core Python workers (import
        # pandas/pyarrow, compile the gazetteer regex) with a throwaway tiny
        # build before the timed one. On a real cluster the executors'
        # Python daemons are long-lived, so steady-state throughput is the
        # honest number; a cold N-worker spawn storm would otherwise bill
        # one-time startup proportionally to the CLUSTER size, not the job
        # size (same rationale and shape as tools/scaling_bench.py).
        from knowledge_graph_studio_spark.pipeline import build_graph
        from knowledge_graph_studio_spark.sources.pages import synthetic_pages

        cores = spark.sparkContext.defaultParallelism
        build_graph(spark, synthetic_pages(spark, 16 * cores, seed=1,
                                           partitions=2 * cores)
                    )["edges"].count()

    t0 = time.time()
    cap = args.max_chunks if args.max_chunks > 0 else None
    out = build_graph_resumable(
        spark, pages_path, args.workdir, n_buckets=args.buckets,
        workspace=args.workspace, created_by=args.created_by,
        max_chunks=cap, max_prop_vals=cap)
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
