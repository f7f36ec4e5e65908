"""Scale-up generator: tile the driver's sf0.1 tables K times with
key-offset replicas so the headline suite can be measured where shuffle and
join work dominate, not session startup (VERDICT r2 #8).

Tiling semantics (deterministic, FK-preserving):
  * fact/dim keys are offset by replica * (max_key + 1), so replica r's
    orders still join replica r's customers — cardinalities and join
    selectivities scale linearly, exactly like a bigger TPC-H SF.
  * region/nation keep their fixed cardinality (TPC-H dims don't scale).
  * documents/embeddings are tiled with fresh ids and UNCHANGED content —
    replica text/vectors are exact duplicates by construction, which is the
    honest web-crawl shape (crawls are full of verbatim duplicates) and
    makes the dedup operators work hardest: every original near-dup pair
    fans out across replicas, and the exact-dup groups grow to K members.
  * events get offset event_id/user_id and a per-replica +K-hours ts shift
    so windowed aggregations see K distinct busy periods.

Usage:
    python tools/gen_sf.py --mult 16 [--out /dev/shm/kg_sf_x16]
    SPARK_GRAFT_SF_DIR=/dev/shm/kg_sf_x16 python bench.py
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"

# key columns to offset per table: {table: {col: keyspace_table_or_None}}
# keyspace = the table whose max value defines the offset stride, so FK
# columns use the SAME stride as their parent key.
OFFSETS = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {"o_orderkey": ("orders", "o_orderkey"),
               "o_custkey": ("customer", "c_custkey")},
    "lineitem": {"l_orderkey": ("orders", "o_orderkey"),
                 "l_partkey": ("part", "p_partkey"),
                 "l_suppkey": ("supplier", "s_suppkey")},
    "events": {"event_id": ("events", "event_id"),
               "user_id": ("events", "user_id")},
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}
COPY_ONLY = ["region", "nation"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=16)
    ap.add_argument("--src", default=SRC)
    ap.add_argument("--out", default=None)
    ap.add_argument("--tables", default=None,
                    help="comma-separated subset to generate (default all) "
                         "— e.g. --tables documents for a funnel-only "
                         "corpus at high multipliers, skipping the "
                         "gigabyte-scale lineitem tiling")
    args = ap.parse_args()
    only = set(args.tables.split(",")) if args.tables else None
    out = args.out or f"/dev/shm/kg_sf_x{args.mult}"

    from pyspark.sql import functions as F

    from knowledge_graph_studio_spark.session import get_spark

    spark = get_spark("gen-sf", cores=32)
    spark.sparkContext.setLogLevel("ERROR")

    strides: dict[tuple[str, str], int] = {}
    for t, cols in OFFSETS.items():
        for _c, ks in cols.items():
            if ks not in strides:
                kt, kc = ks
                strides[ks] = int(
                    spark.read.parquet(f"{args.src}/{kt}.parquet")
                    .agg(F.max(F.col(kc).cast("long"))).collect()[0][0]) + 1

    for t in COPY_ONLY:
        if only is not None and t not in only:
            continue
        spark.read.parquet(f"{args.src}/{t}.parquet") \
            .write.mode("overwrite").parquet(f"{out}/{t}.parquet")

    reps = spark.range(args.mult).withColumnRenamed("id", "_rep")
    for t, cols in OFFSETS.items():
        if only is not None and t not in only:
            continue
        df = spark.read.parquet(f"{args.src}/{t}.parquet")
        tiled = df.crossJoin(F.broadcast(reps))
        for c, ks in cols.items():
            dt = dict(df.dtypes)[c]
            tiled = tiled.withColumn(
                c, (F.col(c).cast("long")
                    + F.col("_rep") * F.lit(strides[ks])).cast(dt))
        if t == "events":
            tiled = tiled.withColumn(
                "ts", F.col("ts") + F.make_interval(hours=F.col("_rep")
                                                    .cast("int")))
        n_out = max(32, 4 * args.mult)
        tiled.drop("_rep").repartition(n_out).write.mode("overwrite") \
            .parquet(f"{out}/{t}.parquet")
        print(f"{t}: x{args.mult} -> {out}/{t}.parquet", flush=True)
    spark.stop()
    print(out)


if __name__ == "__main__":
    main()
