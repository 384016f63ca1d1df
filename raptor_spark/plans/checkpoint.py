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

try:  # moved in PySpark 3.4
    from pyspark.errors import AnalysisException
except ImportError:  # pragma: no cover
    from pyspark.sql.utils import AnalysisException


def with_bucket(
    df: DataFrame, n_buckets: int, col: str = "conv_id", bucket_fn=None
) -> DataFrame:
    """Deterministic conv_id -> bucket assignment. Default is xxhash64
    (cheap, JVM-side, well-mixed at 10^12 keys); ``bucket_fn(col_expr,
    n_buckets) -> Column`` overrides it — e.g. an md5-derived bucket the
    DuckDB oracle can reconstruct relationally (queries.resumable_manifest).
    The resume machinery only needs determinism across runs."""
    if bucket_fn is None:
        expr = F.pmod(F.xxhash64(F.col(col)), F.lit(n_buckets)).cast("int")
    else:
        expr = bucket_fn(F.col(col), n_buckets)
    return df.withColumn("bucket", expr)


def finished_buckets(spark: SparkSession, out_dir: str) -> Optional[DataFrame]:
    """(bucket, linked) for every bucket with a manifest row.

    ``linked`` records whether the linking stage has run for the bucket
    (see write_bucketed) — distinct from "linked with zero decisions".
    Manifests may mix schema generations (rows written before the
    linked/turns columns existed), so the read always merges schemas;
    legacy rows, which na.fill(0)'d link_decisions, are conservatively
    treated as linked only when decisions were recorded (re-linking a
    zero-decision bucket is append-idempotent: it writes no link rows).
    """
    manifest_path = os.path.join(out_dir, "manifest")
    if not os.path.isdir(manifest_path):
        return None
    try:
        df = spark.read.option("mergeSchema", "true").parquet(manifest_path)
    except AnalysisException:
        # a manifest dir with no readable parquet yet (run died before
        # the first manifest append) IS "nothing finished"; any OTHER
        # failure must propagate — mapping an IO hiccup to None would
        # silently re-materialize every finished bucket
        return None
    if "linked" in df.columns:
        linked = F.coalesce(F.col("linked"), F.col("link_decisions") > 0)
    elif "link_decisions" in df.columns:
        linked = F.col("link_decisions") > 0
    else:
        linked = F.lit(False)
    return df.groupBy("bucket").agg(
        F.max(F.coalesce(linked, F.lit(False))).alias("linked")
    )


def filter_unfinished(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    n_buckets: int,
    bucket_fn=None,
) -> DataFrame:
    """Drop conversations whose bucket already has a manifest row."""
    bucketed = with_bucket(transcripts, n_buckets, bucket_fn=bucket_fn)
    done = finished_buckets(spark, out_dir)
    if done is None:
        return bucketed
    # the finished-bucket list is tiny (<= n_buckets rows): broadcast anti-join
    return bucketed.join(
        F.broadcast(done.select("bucket")), "bucket", "left_anti"
    )


def write_bucketed(
    triples: DataFrame,
    errors: DataFrame,
    out_dir: str,
    n_buckets: int,
    turns: Optional[DataFrame] = None,
    links: Optional[DataFrame] = None,
    bucket_fn=None,
) -> DataFrame:
    """Write triples/errors (and links, when given) partitioned by bucket
    + append manifest rows.

    Returns the manifest DataFrame — the north-rule lineage counters per
    bucket: conversations, turns parsed, triples emitted, parse errors,
    link decisions.  ``turns`` is the transcript turn table (counted per
    bucket); ``links`` is the (conv_id, entity_uri, mentions) linking
    output, materialized under ``links/bucket=`` alongside the triples.

    Bucket data writes use DYNAMIC partition overwrite, not append: a
    run only carries unfinished buckets, so replacing exactly the
    partitions it writes makes a crash-replay idempotent — a run that
    died AFTER appending bucket data but BEFORE its manifest row would
    otherwise leave a duplicate copy under the bucket on resume. Dynamic
    overwrite alone cannot clear a partition the replay writes ZERO rows
    into, so when ``turns`` names the buckets this run owns, those
    partition directories are deleted up front — a bucket whose
    conversations all legitimately parse to zero triples then lands
    clean instead of surfacing a crashed predecessor's stale rows
    (round-6 ADVICE fix). The manifest itself stays append-only —
    readers aggregate it per bucket.
    """
    t = with_bucket(triples, n_buckets, bucket_fn=bucket_fn)
    e = with_bucket(errors, n_buckets, bucket_fn=bucket_fn)
    if turns is not None:
        import shutil

        owned = [
            r["bucket"]
            for r in with_bucket(
                turns.select("conv_id"), n_buckets, bucket_fn=bucket_fn
            ).select("bucket").distinct().collect()
        ]
        subs = ["triples", "errors"] + (["links"] if links is not None else [])
        for sub in subs:
            for bkt in owned:
                shutil.rmtree(
                    os.path.join(out_dir, sub, "bucket=%s" % bkt),
                    ignore_errors=True,
                )
    t.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("bucket").parquet(os.path.join(out_dir, "triples"))
    e.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("bucket").parquet(os.path.join(out_dir, "errors"))
    man_t = t.groupBy("bucket").agg(
        F.countDistinct("conv_id").alias("convs"),
        F.count(F.lit(1)).alias("triples"),
    )
    man_e = e.groupBy("bucket").agg(F.count(F.lit(1)).alias("errors"))
    manifest = man_t.join(man_e, "bucket", "full")
    fill = ["convs", "triples", "errors"]
    if turns is not None:
        # convs is counted from the INPUT (conversations consumed), not
        # from distinct conv_id in the triples output: a bucket whose
        # conversations all parse to zero triples is still finished and
        # must record how many it consumed
        man_u = with_bucket(
            turns.select("conv_id"), n_buckets, bucket_fn=bucket_fn
        ).groupBy("bucket").agg(
            F.count(F.lit(1)).alias("turns"),
            F.countDistinct("conv_id").alias("convs_in"),
        )
        manifest = (
            manifest.join(man_u, "bucket", "full")
            .withColumn("convs", F.coalesce("convs_in", F.lit(0)))
            .drop("convs_in")
        )
        fill.append("turns")
    else:
        # null, NOT 0: "turn counting didn't run" must stay
        # distinguishable from "bucket with zero turns"
        manifest = manifest.withColumn("turns", F.lit(None).cast("long"))
    if links is not None:
        lk = with_bucket(links, n_buckets, bucket_fn=bucket_fn)
        lk.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("bucket").parquet(os.path.join(out_dir, "links"))
        man_l = lk.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("link_decisions")
        )
        manifest = manifest.join(man_l, "bucket", "full")
        fill.append("link_decisions")
    else:
        # same null-vs-0 distinction for link decisions; `linked` below
        # is the explicit per-row record of whether linking ran
        manifest = manifest.withColumn(
            "link_decisions", F.lit(None).cast("long")
        )
    manifest = (
        manifest.na.fill(0, fill)
        .withColumn("linked", F.lit(links is not None))
        .withColumn("ts", F.current_timestamp())
        # materialize once: the manifest is both written and handed back
        # for inspection, and its lineage reaches through the parse stage —
        # without this, every downstream collect() re-runs the parse
        .localCheckpoint()
    )
    manifest.write.mode("append").parquet(os.path.join(out_dir, "manifest"))
    return manifest


def link_catchup(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    n_buckets: int,
    entities: DataFrame,
    link_fn,
    bucket_fn=None,
) -> Optional[DataFrame]:
    """Linking-only pass for buckets finished by a prior run WITHOUT
    entity linking (resuming an out_dir first written without entities
    must not leave links/ silently incomplete). Restricts the input to
    the finished-but-unlinked buckets, runs only ``link_fn`` (no parse,
    no triple rewrite), appends links/bucket= and linked=true manifest
    rows whose other counters stay null (that work did not run here).
    Returns the appended manifest rows, or None when every finished
    bucket is already linked."""
    fin = finished_buckets(spark, out_dir)
    if fin is None:
        return None
    unlinked = fin.filter(~F.col("linked")).select("bucket")
    if not unlinked.take(1):
        return None
    todo = with_bucket(transcripts, n_buckets, bucket_fn=bucket_fn).join(
        F.broadcast(unlinked), "bucket", "left_semi"
    )
    from pyspark.storagelevel import StorageLevel

    # persisted: the linking stage (mention explode + broadcast join +
    # scoring window) feeds BOTH the links/bucket= write and the
    # manifest counters — without this it runs twice
    lk = with_bucket(
        link_fn(todo.drop("bucket"), entities), n_buckets, bucket_fn=bucket_fn
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        lk.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("bucket").parquet(os.path.join(out_dir, "links"))
        null_long = F.lit(None).cast("long")
        man = (
            unlinked.join(
                lk.groupBy("bucket").agg(
                    F.count(F.lit(1)).alias("link_decisions")
                ),
                "bucket",
                "left",
            )
            .select(
                "bucket",
                null_long.alias("convs"),
                null_long.alias("triples"),
                null_long.alias("errors"),
                null_long.alias("turns"),
                F.coalesce(F.col("link_decisions"), F.lit(0)).alias(
                    "link_decisions"
                ),
                F.lit(True).alias("linked"),
                F.current_timestamp().alias("ts"),
            )
            .localCheckpoint()
        )
    finally:
        lk.unpersist()
    man.write.mode("append").parquet(os.path.join(out_dir, "manifest"))
    return man
