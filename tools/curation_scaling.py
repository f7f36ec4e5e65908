"""Curation-funnel scaling probe: run the full 13-stage funnel (the
bench.py `curation_funnel` block, crawl-shaped urls/timestamps, DSIR +
packing tail) over a documents table at a given core count, fresh JVM,
and print one JSON line. Run it at two parallelism levels on the SAME
input (e.g. --cores 8 then --cores 32 over the x16 tiled corpus) to read
strong-scaling efficiency for the training-data surface the way
tools/scaling_bench.py does for the KG pipeline.

Usage:
    python tools/gen_sf.py --mult 16 --out /dev/shm/kg_sf_x16
    python tools/curation_scaling.py --sf-dir /dev/shm/kg_sf_x16 --cores 8
    python tools/curation_scaling.py --sf-dir /dev/shm/kg_sf_x16 --cores 32
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from knowledge_graph_studio_spark.operators.curation import curate_corpus
    from knowledge_graph_studio_spark.session import get_spark

    spark = get_spark("curation-scaling", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm-up

    docs = spark.read.parquet(f"{args.sf_dir.rstrip('/')}/documents.parquet")
    n = docs.count()
    uid = F.col("doc_id") % (n * 9 // 10)
    crawl = docs.select(
        "doc_id", "text", "lang",
        F.concat(F.lit("http://h"), (uid % 13).cast("string"),
                 F.lit(".dom"), (uid % 97).cast("string"),
                 F.lit(".com/p/"), uid.cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id"))
        .alias("warc_ts"))
    blocked = spark.createDataFrame([("dom13.com",), ("h7.dom29.com",)],
                                    "domain string")
    # FIXED eval set (a real heldout benchmark doesn't grow with the
    # crawl): only the first-replica id range contributes, so tiled
    # corpora (gen_sf.py) keep the same eval set at every multiplier —
    # otherwise at high K every distinct content is "contaminated" and
    # the funnel measures nothing past decontamination
    eval_df = (docs.filter(F.col("doc_id") < 5000)
               .filter(F.col("doc_id") % 31 == 5)
               .select(F.substring("text", 1, 120).alias("text")))

    t0 = time.time()
    out = curate_corpus(
        crawl, url_col="url", ts_col="warc_ts", eval_df=eval_df,
        blocked_domains=blocked, fuzzy_dedup=True,
        mix_rates={"en": 1.0, "de": 0.8, "fr": 0.6, "es": 0.5, "zh": 0.4},
        stratum_col="lang",
        dsir_target=docs.filter(F.col("lang") == "en")
        .filter(F.col("doc_id") % 7 == 0).select("text"),
        dsir_top_n=max(n // 3, 10), dsir_kwargs={"n_buckets": 4096},
        pack_seq_len=1024,
        gopher_kwargs={"min_words": 10, "min_stop_hits": 1})
    n_out = out["docs"].count()
    wall = time.time() - t0
    print(json.dumps({
        "metric": "curation_funnel_sec", "value": round(wall, 3),
        "unit": "sec", "cores": args.cores, "docs_in": n,
        "docs_out": n_out, "docs_per_sec": round(n / wall, 2),
        "sf_dir": args.sf_dir,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
