"""Capture .explain("formatted") for named contract queries into
plans/r06/<query>_<tag>.txt (judge evidence for OPTIMIZATION_r06.md).

Usage: python tools/capture_plans.py <tag> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(outdir, exist_ok=True)

    from knowledge_graph_studio_spark.driver_contract import QUERIES
    from knowledge_graph_studio_spark.session import get_spark

    spark = get_spark("kg-capture-plans", cores=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
