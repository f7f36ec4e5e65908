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
    ap.add_argument("--stage-walls", action="store_true",
                    help="time each stage's first materialization instead "
                         "of the headline wall (sequential counts over the "
                         "sealed stages — each count's delta is that "
                         "stage's cost, since a seal caches after its "
                         "first action). Drops the stages that run driver "
                         "actions at construction time (fuzzy dedup's "
                         "collapse probe + CC iterations, fit_dsir's "
                         "totals collect, pack's shard-offset collect): "
                         "those would materialize the whole prefix up "
                         "front and zero out the prefix deltas. Their "
                         "combined cost is (headline full-funnel wall - "
                         "this mode's wall) at the same core count")
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

    kwargs = dict(
        url_col="url", ts_col="warc_ts", eval_df=eval_df,
        blocked_domains=blocked, fuzzy_dedup=True,
        mix_rates={"en": 1.0, "de": 0.8, "fr": 0.6, "es": 0.5, "zh": 0.4},
        stratum_col="lang",
        dsir_target=docs.filter(F.col("lang") == "en")
        .filter(F.col("doc_id") % 7 == 0).select("text"),
        dsir_top_n=max(n // 3, 10), dsir_kwargs={"n_buckets": 4096},
        pack_seq_len=1024,
        gopher_kwargs={"min_words": 10, "min_stop_hits": 1})
    if args.stage_walls:
        # lazy-only funnel: fuzzy dedup (collapse probe + CC iterations),
        # the DSIR fit, and pack all run driver actions at construction
        # time, which would materialize the whole prefix before the first
        # stage count and zero out the deltas (see --help)
        kwargs["fuzzy_dedup"] = False
        kwargs["dsir_target"] = None
        kwargs["dsir_top_n"] = None
        kwargs["pack_seq_len"] = None

    stage_walls = None
    if args.stage_walls:
        # With AQE on, even a NON-eager localCheckpoint forces the
        # adaptive final-plan computation, which EXECUTES the plan's
        # shuffle-map stages as Spark jobs at construction time (measured:
        # the sealed sf0.01 funnel submits ~31 jobs before any action).
        # So a stage's real cost lives in its _seal call, not in a
        # post-hoc count — instrument the concrete DataFrame class and
        # attribute seal walls to stage names in construction order, then
        # add each stage's first-count delta (the unrun result stage).
        from pyspark.sql.classic.dataframe import DataFrame as _CDF
        seal_walls: list[float] = []
        _orig_lc = _CDF.localCheckpoint

        def _timed_lc(self, eager=True):
            s = time.time()
            r = _orig_lc(self, eager=eager)
            seal_walls.append(time.time() - s)
            return r

        _CDF.localCheckpoint = _timed_lc
        try:
            t0 = time.time()
            out = curate_corpus(crawl, **kwargs)
        finally:
            _CDF.localCheckpoint = _orig_lc
        sealed = [nm for nm in out["stages"] if nm != "input"]
        stage_walls = {}
        for nm, df in out["stages"].items():
            s0 = time.time()
            df.count()
            stage_walls[nm] = round(time.time() - s0, 3)
        if len(sealed) == len(seal_walls):
            for nm, w in zip(sealed, seal_walls):
                stage_walls[nm] = round(stage_walls[nm] + w, 3)
        else:  # unexpected seal cadence — report the raw list alongside
            stage_walls["_seal_walls"] = [round(w, 3) for w in seal_walls]
        n_out = out["docs"].count()
    else:
        t0 = time.time()
        out = curate_corpus(crawl, **kwargs)
        n_out = out["docs"].count()
    wall = time.time() - t0
    rec = {
        "metric": "curation_funnel_sec", "value": round(wall, 3),
        "unit": "sec", "cores": args.cores, "docs_in": n,
        "docs_out": n_out, "docs_per_sec": round(n / wall, 2),
        "sf_dir": args.sf_dir,
    }
    if stage_walls is not None:
        rec["stage_walls"] = stage_walls
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
