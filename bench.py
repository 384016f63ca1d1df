"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The flagship number is the full KG pipeline (synthesize -> reassemble ->
parse -> canonicalize -> dedup); per-query wall-clock for the other
headline operators is reported alongside. Triples/sec for the pipeline is
included under "extra". A small untimed warmup run (sf0.001) is executed
first so the timings measure steady-state throughput, not JVM JIT /
codegen / Python-worker startup.

``--scaling`` mode evidences the north rule's N -> 4N criterion in this
single-host sandbox: it re-runs the flagship in two subprocesses that
differ only in --master local[8] vs local[32], computes throughput
scaling efficiency eff = (rows/s @32) / (4 x rows/s @8), writes
BENCH/BASELINE.md, and prints one JSON line with both runs.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_QUERIES (comma list to
restrict the headline set).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

HEADLINE = [
    "kg_pipeline",
    "reassemble_sessions",
    "entity_link",
    "dedup_minhash",
    "dedup_jaccard",
    "embedding_topk",
    "serialize_grouped",
]

WARMUP_DIR = "/root/testdata/sf0.001"


def run_bench(sf_dir: str, cpus: str, headline) -> dict:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("raptor-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "64m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from raptor_spark.queries import QUERIES

    # untimed warmup: tiny input through the same plan shapes
    warm_dir = WARMUP_DIR if os.path.isdir(WARMUP_DIR) else sf_dir
    for name in headline:
        try:
            QUERIES[name](spark, warm_dir).count()
        except Exception:
            pass

    timings = {}
    extra = {}
    for name in headline:
        fn = QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        extra[name + "_rows"] = n

    total = round(sum(timings.values()), 3)
    if extra.get("kg_pipeline_rows") and timings.get("kg_pipeline"):
        extra["kg_triples_per_sec"] = int(
            extra["kg_pipeline_rows"] / timings["kg_pipeline"]
        )
    spark.stop()
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    return {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "extra": extra,
    }


def run_scaling(sf_dir: str) -> dict:
    """Flagship at local[8] vs local[32] (the sandbox proxy for N vs 4N
    executors per the driver instruction); writes BENCH/BASELINE.md."""
    runs = {}
    for cpus in ("8", "32"):
        env = dict(
            os.environ,
            SPARK_GRAFT_SF_DIR=sf_dir,
            SPARK_GRAFT_CPUS=cpus,
            SPARK_GRAFT_QUERIES="kg_pipeline",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        runs[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
    r8, r32 = runs["8"], runs["32"]
    rows = r32["extra"]["kg_pipeline_rows"]
    tput8 = rows / r8["queries"]["kg_pipeline"]
    tput32 = rows / r32["queries"]["kg_pipeline"]
    eff = tput32 / (4 * tput8)
    result = {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "queries": {
            "kg_pipeline_local8_sec": r8["queries"]["kg_pipeline"],
            "kg_pipeline_local32_sec": r32["queries"]["kg_pipeline"],
        },
        "sf": r32["sf"],
        "extra": {
            "rows": rows,
            "triples_per_sec_local8": int(tput8),
            "triples_per_sec_local32": int(tput32),
        },
    }
    os.makedirs(os.path.join(_REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(_REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(
            "# Scaling-efficiency evidence (north rule: N -> 4N >= 0.8)\n\n"
            "Sandbox proxy per driver instruction: the same flagship job\n"
            "(transcript synthesis -> reassembly -> 6-syntax parse ->\n"
            "canonicalize -> relabel -> salted dedup) on the same input at\n"
            "two parallelism levels, differing only in --master.\n\n"
            f"input: {sf_dir} (deterministic synthetic transcripts)\n\n"
            "| master | wall s | triples/s |\n|---|---|---|\n"
            f"| local[8]  | {r8['queries']['kg_pipeline']} | {int(tput8)} |\n"
            f"| local[32] | {r32['queries']['kg_pipeline']} | {int(tput32)} |\n\n"
            f"rows: {rows}\n\n"
            f"**efficiency = (rows/s @32) / (4 x rows/s @8) = {eff:.3f}**\n\n"
            "Measurement notes: steady-state (untimed sf0.001 warmup first\n"
            "— JVM JIT, whole-stage codegen compile, Python worker pool);\n"
            "single host, so local[32] also contends with the driver —\n"
            "a conservative lower bound vs a real 4N-executor cluster,\n"
            "where each executor owns its cores.\n"
        )
    return result


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    headline = [
        q
        for q in os.environ.get("SPARK_GRAFT_QUERIES", ",".join(HEADLINE)).split(",")
        if q
    ]
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
        return
    print(json.dumps(run_bench(sf_dir, cpus, headline)))


if __name__ == "__main__":
    main()
