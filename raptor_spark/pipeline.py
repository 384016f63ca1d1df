"""End-to-end KG construction pipeline.

transcripts --reassemble--> documents --parse UDF--> triples+errors
          --canonicalize/relabel--> --salted dedup--> graph tables.

The three shuffles (conv_id reassembly, dedup aggregation, optional
bucketed write) are the only exchanges; everything between runs in
whole-stage codegen or one Arrow-batched Python stage. AQE is expected on
(skew-join/coalesce); hub-key skew in dedup can additionally be forced
two-phase via ``salt_buckets``.
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raptor_spark.operators.canonical import dedup_statements, relabel_bnodes
from raptor_spark.operators.parse import errors_of, parse_documents, triples_of
from raptor_spark.operators.reassemble import reassemble
from raptor_spark.plans import checkpoint as ckpt


def build_graph(
    transcripts: DataFrame,
    base_uri_col: Optional[str] = None,
    relabel: bool = True,
    global_dedup: bool = True,
    salt_buckets: int = 0,
    dedup: bool = True,
) -> Tuple[DataFrame, DataFrame]:
    """transcripts -> (triples, parse_errors).

    ``dedup=False`` keeps the raw statement stream (the reference's
    streaming parsers emit duplicates as-is; only the buffered abbrev
    serializers dedup) — used when comparing against rapper output."""
    extra = ("tool",) + ((base_uri_col,) if base_uri_col else ())
    docs = reassemble(transcripts, extra_cols=extra)
    parsed = parse_documents(docs, base_uri_col=base_uri_col)
    triples = triples_of(parsed)
    errors = errors_of(parsed)
    if relabel:
        triples = relabel_bnodes(triples)
    if dedup:
        triples = dedup_statements(
            triples, global_dedup=global_dedup, salt_buckets=salt_buckets
        )
    return triples, errors


def run_resumable(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    n_buckets: int = 64,
    base_uri_col: Optional[str] = None,
) -> DataFrame:
    """Resumable materialization: skip buckets already in the manifest,
    build the graph for the rest, write bucket-partitioned parquet +
    lineage counters. Returns the manifest of this run."""
    todo = ckpt.filter_unfinished(spark, transcripts, out_dir, n_buckets)
    triples, errors = build_graph(todo.drop("bucket"), base_uri_col=base_uri_col)
    return ckpt.write_bucketed(triples, errors, out_dir, n_buckets)
