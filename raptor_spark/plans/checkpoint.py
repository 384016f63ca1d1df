"""Resumable bucketed materialization with per-partition lineage manifests.

The job is keyed by conv_id buckets (``bucket = pmod(xxhash64(conv_id), N)``
— deterministic across runs and retries). Each completed bucket writes its
output under ``out_dir/triples/bucket=<b>/`` plus a manifest row
(bucket, convs, triples, errors, parse counters) under ``out_dir/manifest/``.
A rerun reads the manifest and anti-joins finished buckets out of the input,
so only unfinished work re-executes: Spark's task retry gives at-least-once
inside a run; the manifest gives cross-run resume (north-rule requirement;
the reference has no equivalent — it is a single-process stream).
"""

from __future__ import annotations

import os
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def with_bucket(df: DataFrame, n_buckets: int, col: str = "conv_id") -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(col)), F.lit(n_buckets)).cast("int")
    )


def finished_buckets(spark: SparkSession, out_dir: str) -> Optional[DataFrame]:
    manifest_path = os.path.join(out_dir, "manifest")
    if not os.path.isdir(manifest_path):
        return None
    try:
        return spark.read.parquet(manifest_path).select("bucket").distinct()
    except Exception:
        return None


def filter_unfinished(
    spark: SparkSession, transcripts: DataFrame, out_dir: str, n_buckets: int
) -> DataFrame:
    """Drop conversations whose bucket already has a manifest row."""
    bucketed = with_bucket(transcripts, n_buckets)
    done = finished_buckets(spark, out_dir)
    if done is None:
        return bucketed
    # the finished-bucket list is tiny (<= n_buckets rows): broadcast anti-join
    return bucketed.join(F.broadcast(done), "bucket", "left_anti")


def write_bucketed(
    triples: DataFrame,
    errors: DataFrame,
    out_dir: str,
    n_buckets: int,
    turns: Optional[DataFrame] = None,
    links: Optional[DataFrame] = None,
) -> DataFrame:
    """Write triples/errors (and links, when given) partitioned by bucket
    + append manifest rows.

    Returns the manifest DataFrame — the north-rule lineage counters per
    bucket: conversations, turns parsed, triples emitted, parse errors,
    link decisions.  ``turns`` is the transcript turn table (counted per
    bucket); ``links`` is the (conv_id, entity_uri, mentions) linking
    output, materialized under ``links/bucket=`` alongside the triples.
    """
    t = with_bucket(triples, n_buckets)
    e = with_bucket(errors, n_buckets)
    t.write.mode("append").partitionBy("bucket").parquet(
        os.path.join(out_dir, "triples")
    )
    e.write.mode("append").partitionBy("bucket").parquet(
        os.path.join(out_dir, "errors")
    )
    man_t = t.groupBy("bucket").agg(
        F.countDistinct("conv_id").alias("convs"),
        F.count(F.lit(1)).alias("triples"),
    )
    man_e = e.groupBy("bucket").agg(F.count(F.lit(1)).alias("errors"))
    manifest = man_t.join(man_e, "bucket", "full")
    if turns is not None:
        man_u = with_bucket(turns.select("conv_id"), n_buckets).groupBy(
            "bucket"
        ).agg(F.count(F.lit(1)).alias("turns"))
        manifest = manifest.join(man_u, "bucket", "full")
    else:
        manifest = manifest.withColumn("turns", F.lit(None).cast("long"))
    if links is not None:
        lk = with_bucket(links, n_buckets)
        lk.write.mode("append").partitionBy("bucket").parquet(
            os.path.join(out_dir, "links")
        )
        man_l = lk.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("link_decisions")
        )
        manifest = manifest.join(man_l, "bucket", "full")
    else:
        manifest = manifest.withColumn(
            "link_decisions", F.lit(None).cast("long")
        )
    manifest = manifest.na.fill(
        0, ["convs", "turns", "triples", "errors", "link_decisions"]
    ).withColumn("ts", F.current_timestamp())
    manifest.write.mode("append").parquet(os.path.join(out_dir, "manifest"))
    return manifest
