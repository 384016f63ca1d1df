"""Dump .explain("formatted") for headline queries into plans/<tag>/.

Usage: PYTHONPATH=. python tools/dump_plans.py <tag> [sf_dir] [q1,q2,...]

Writes plans/<tag>/<query>_<suffix>.txt where <suffix> defaults to the
tag's phase ('before'/'after') — pass it via PLAN_SUFFIX. Uses the same
session config as bench.py so plan shapes match what the bench runs.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r06"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    from pyspark.sql import SparkSession

    import bench

    names = (
        sys.argv[3].split(",") if len(sys.argv) > 3 else list(bench.HEADLINE)
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("raptor-spark-plan-dump")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "64m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from raptor_spark.queries import QUERIES

    out_dir = os.path.join(_REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as e:
            plan = "ERROR building plan: %r" % e
        path = os.path.join(out_dir, "%s_%s.txt" % (name, suffix))
        with open(path, "w") as fh:
            fh.write(plan)
        print("wrote", path, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
