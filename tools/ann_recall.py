"""Recall-at-scale measurement for the ANN paths (VERDICT r3 #6).

ann_lsh_topk / ann_ivf_topk recall was previously asserted only at sf0.001
toy size; this tool measures recall@k against the exact brute-force scan at
sf0.1 (2,000 x 64-dim vectors) and, when present, the 16x-tiled corpus
(/dev/shm/kg_sf_x16, 32,000 vectors with verbatim duplicates — the honest
crawl shape), for the SHIPPED defaults:

  * LSH: n_planes=4, n_tables=16 (also EdgeAnnIndex.build's defaults)
  * IVF: n_cells=16, n_probe=12 (the driver-contract entry's RETUNED
    parameters — n_probe=4 measured 0.56 on these near-uniform synthetic
    embeddings, the worst case for coarse quantization), with the 1-step
    Lloyd refinement (VERDICT r3 #7)

Writes ANN_RECALL.json and rewrites the marked block in BASELINE.md.

Usage: python tools/ann_recall.py [--queries 32] [--k 10]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BEGIN = "<!-- ann-recall:begin -->"
END = "<!-- ann-recall:end -->"


def measure(spark, path: str, n_queries: int, k: int) -> dict:
    from pyspark.sql import functions as F

    from knowledge_graph_studio_spark.operators.similarity import (
        ann_ivf_topk, ann_lsh_topk, brute_force_topk,
    )

    e = spark.read.parquet(path).select("vec_id", "embedding").persist()
    n = e.count()
    # deterministic query sample, disjoint from the searched vectors
    qids = [r["vec_id"] for r in
            e.select("vec_id").orderBy(F.xxhash64("vec_id", F.lit(3)))
            .limit(n_queries).collect()]
    queries = (e.filter(F.col("vec_id").isin(qids))
               .select(F.col("vec_id").alias("qid"), "embedding"))
    vectors = e.filter(~F.col("vec_id").isin(qids))

    def topk(df):
        out: dict[int, set] = {}
        for r in df.collect():
            out.setdefault(r["qid"], set()).add(r["vec_id"])
        return out

    exact = topk(brute_force_topk(vectors, queries, k=k))
    lsh = topk(ann_lsh_topk(vectors, queries, k=k))
    ivf = topk(ann_ivf_topk(vectors, queries, k=k, n_cells=16, n_probe=12))

    def recall(approx):
        per_q = [len(approx.get(q, set()) & exact[q]) / max(len(exact[q]), 1)
                 for q in exact]
        return round(sum(per_q) / len(per_q), 4)

    e.unpersist()
    return {"path": path, "n_vectors": n - len(qids),
            "n_queries": len(qids), "k": k,
            "recall_lsh": recall(lsh), "recall_ivf": recall(ivf)}


def update_baseline(results: list[dict]) -> None:
    rows = ["| table | vectors | queries | k | LSH recall@k | IVF recall@k |",
            "|---|---|---|---|---|---|"]
    for r in results:
        name = os.path.basename(os.path.dirname(r["path"] + "/x"))
        rows.append(f"| {name} | {r['n_vectors']} | {r['n_queries']} | "
                    f"{r['k']} | {r['recall_lsh']} | {r['recall_ivf']} |")
    block = f"""{BEGIN}
## ANN recall at scale (VERDICT r3 #6)

Recall@k of the approximate top-k paths vs the exact brute-force scan, at
the SHIPPED defaults (LSH n_planes=4/n_tables=16 — the same family
EdgeAnnIndex uses; IVF n_cells=16/n_probe=12 with 1-step Lloyd-refined
centroids — retuned from n_probe=4, which measured 0.56 recall on these
near-uniform synthetic embeddings, coarse quantization's worst case;
clustered real corpora need a far lower probe fraction). Measured by
`tools/ann_recall.py` (raw JSON in
ANN_RECALL.json); queries are a deterministic hash-ordered sample held out
of the searched set.

{os.linesep.join(rows)}
{END}"""
    path = os.path.join(REPO, "BASELINE.md")
    text = open(path).read()
    if BEGIN in text:
        text = re.sub(re.escape(BEGIN) + ".*?" + re.escape(END), block,
                      text, flags=re.S)
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    open(path, "w").write(text)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--tables", nargs="*", default=[
        "/root/testdata/sf0.1/embeddings.parquet",
        "/dev/shm/kg_sf_x16/embeddings.parquet",
    ])
    args = ap.parse_args()

    from knowledge_graph_studio_spark.session import get_spark

    spark = get_spark("ann-recall", cores=16, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    results = [measure(spark, p, args.queries, args.k)
               for p in args.tables if os.path.exists(p)]
    spark.stop()
    with open(os.path.join(REPO, "ANN_RECALL.json"), "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps(results))
    update_baseline(results)


if __name__ == "__main__":
    main()
