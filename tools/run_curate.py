"""spark-submit entry point for the resumable curation pipeline — the
training-data twin of tools/run_build.py.

Cluster launch:

    zip -r kgs.zip knowledge_graph_studio_spark
    spark-submit --py-files kgs.zip \
        --conf spark.local.dir=/mnt/nvme/spark \
        tools/run_curate.py \
        --docs /data/crawl_docs --workdir /data/curated \
        --url-col url --ts-col warc_ts --fuzzy --pack-seq-len 2048

The job runs as three manifest-committed stage groups
(operators.curation.run_curation_job): clean -> filter+dedup ->
select+mix+pack, each materialized to parquet under --workdir. Rerunning
with the same --workdir resumes from the last committed group. Prints one
JSON line with group row counts and wall time.

Local smoke:

    python tools/run_curate.py --docs /root/testdata/sf0.01/documents.parquet \
        --workdir /tmp/curated --pack-seq-len 512
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
    ap.add_argument("--docs", required=True,
                    help="path to the documents parquet table")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--url-col", default=None)
    ap.add_argument("--ts-col", default=None)
    ap.add_argument("--eval", dest="eval_path", default=None,
                    help="heldout eval parquet (text column) for "
                         "decontamination")
    ap.add_argument("--fuzzy", action="store_true")
    ap.add_argument("--substr-k", type=int, default=None,
                    help="ExactSubstr window size (off when omitted)")
    ap.add_argument("--pack-seq-len", type=int, default=None)
    ap.add_argument("--mix", default=None,
                    help='JSON stratum rates, e.g. \'{"en": 1.0}\'')
    ap.add_argument("--stratum-col", default=None)
    ap.add_argument("--no-gopher", action="store_true")
    ap.add_argument("--gopher-min-words", type=int, default=None,
                    help="override the paper's 50-word floor (synthetic or "
                         "short-form corpora need a lower one)")
    ap.add_argument("--gopher-min-stop-hits", type=int, default=None)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "0")))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from knowledge_graph_studio_spark.operators.curation import (
        run_curation_job,
    )

    if args.cores:
        from knowledge_graph_studio_spark.session import get_spark
        spark = get_spark("curate", cores=args.cores)
    else:
        # under spark-submit the session comes preconfigured (--master etc.)
        spark = SparkSession.builder.appName("curate").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(args.docs)
    kw: dict = {}
    if args.url_col:
        kw["url_col"] = args.url_col
    if args.ts_col:
        kw["ts_col"] = args.ts_col
    if args.eval_path:
        kw["eval_df"] = spark.read.parquet(args.eval_path).select("text")
    if args.fuzzy:
        kw["fuzzy_dedup"] = True
    if args.substr_k:
        kw["substr_dedup_k"] = args.substr_k
    if args.pack_seq_len:
        kw["pack_seq_len"] = args.pack_seq_len
    if args.mix:
        kw["mix_rates"] = json.loads(args.mix)
        kw["stratum_col"] = args.stratum_col or "lang"
    if args.no_gopher:
        kw["gopher"] = False
    else:
        gk = {}
        if args.gopher_min_words is not None:
            gk["min_words"] = args.gopher_min_words
        if args.gopher_min_stop_hits is not None:
            gk["min_stop_hits"] = args.gopher_min_stop_hits
        if gk:
            kw["gopher_kwargs"] = gk

    t0 = time.time()
    out = run_curation_job(spark, docs, args.workdir, **kw)
    n = out["docs"].count()
    print(json.dumps({
        "metric": "curation_job_sec", "value": round(time.time() - t0, 3),
        "unit": "sec", "rows_out": n,
        "group_rows": {str(k): v for k, v in out["group_rows"].items()},
        "workdir": args.workdir,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
