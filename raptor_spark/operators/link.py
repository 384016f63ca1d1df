"""Entity linking over transcript turns (north-star stage).

Mention detection is a vectorized regex over turn text (whole-stage
codegen, no Python); candidate generation is a broadcast join against
the entity dictionary (small dimension side — never a shuffle of the
corpus); scoring ranks candidates per conversation by mention count
with a deterministic tie-break. The reference has no counterpart (it
is a syntax library); the stage comes from BASELINE.json's north_star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: mention pattern -> capture group 1 is the entity key
MENTION_PATTERN = r"http://ex\.org/customer/(\d+)"


def detect_mentions(
    transcripts: DataFrame, pattern: str = MENTION_PATTERN
) -> DataFrame:
    """(conv_id, key) — one row per mention occurrence in turn text."""
    return transcripts.select(
        "conv_id",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(pattern), F.lit(1))
        ).alias("key"),
    )


def link_entities(
    transcripts: DataFrame,
    entities: DataFrame,
    pattern: str = MENTION_PATTERN,
) -> DataFrame:
    """Best entity per conversation: (conv_id, entity_uri, mentions).

    ``entities`` must have columns (key, entity_uri) and be small enough
    to broadcast (an entity dictionary); the corpus side never shuffles
    until the per-conversation aggregation, which is partitioned by
    conv_id like every other stage of the job.
    """
    cand = (
        detect_mentions(transcripts, pattern)
        .join(F.broadcast(entities), "key")
        .groupBy("conv_id", "entity_uri")
        .agg(F.count(F.lit(1)).cast("long").alias("mentions"))
    )
    w = Window.partitionBy("conv_id").orderBy(
        F.desc("mentions"), F.asc("entity_uri")
    )
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("conv_id", "entity_uri", "mentions")
    )


def customer_entities(spark, sf_dir: str) -> DataFrame:
    """The TPC-H customer dictionary with minted URIs (the same
    deterministic minting scheme as q_uri_mint / q_kg_entity_link)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return cust.select(
        F.col("c_custkey").cast("string").alias("key"),
        F.concat(
            F.lit("http://ex.org/entity/"),
            F.md5(F.concat(F.lit("cust|"), F.col("c_name"))),
        ).alias("entity_uri"),
    )
