"""Canonicalization + dedup column operators.

Pure column expressions (whole-stage-codegen friendly) for the term algebra
the reference applies at construction time (src/raptor_term.c:150-260),
plus the graph-materialization dedup, the Spark analogue of the abbrev
serializers' AVL-tree duplicate check (src/raptor_abbrev.c:354-397).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def normalize_lang(col):
    """Lowercase + '_' -> '-' (reference: src/raptor_term.c:241-250)."""
    return F.translate(F.lower(col), "_", "-")


def drop_xsd_string(dt_col):
    """xsd:string datatype -> NULL (reference: src/raptor_term.c:194-207)."""
    return F.when(dt_col == XSD_STRING, F.lit(None)).otherwise(dt_col)


def relabel_bnodes(triples: DataFrame) -> DataFrame:
    """Make document-scoped bnode labels globally unique: ``_:x`` in
    conversation C becomes ``_:C.x``.

    Deterministic (same input -> same labels, task retries safe — the
    reason we never use monotonically_increasing_id) and SQL-reproducible
    so oracles can reconstruct labels.
    """

    def rl(col):
        return F.when(
            col.startswith("_:"),
            F.concat(
                F.lit("_:"), F.col("conv_id"), F.lit("."), F.substring(col, 3, 2**30)
            ),
        ).otherwise(col)

    out = (
        triples.withColumn("subj", rl(F.col("subj")))
        .withColumn("graph", rl(F.col("graph")))
        .withColumn("subj_nt", rl(F.col("subj_nt")))
        .withColumn("graph_nt", rl(F.col("graph_nt")))
        .withColumn(
            "obj_lex",
            F.when(
                F.col("obj_kind") == 4,
                F.concat(F.col("conv_id"), F.lit("."), F.col("obj_lex")),
            ).otherwise(F.col("obj_lex")),
        )
        .withColumn("obj_nt", rl(F.col("obj_nt")))
    )
    # rendered bnode terms carry no escapes, so nt_line rebuilds by concat
    return out.withColumn(
        "nt_line",
        F.concat(
            F.concat_ws(
                " ",
                F.col("subj_nt"),
                F.col("pred_nt"),
                F.col("obj_nt"),
                F.col("graph_nt"),
            ),
            F.lit(" ."),
        ),
    )


def dedup_statements(
    triples: DataFrame, global_dedup: bool = False, salt_buckets: int = 0
) -> DataFrame:
    """Statement dedup on the canonical encoding.

    Per-conversation by default (bnode labels are conv-scoped); pass
    ``global_dedup=True`` after :func:`relabel_bnodes` for whole-graph
    materialization.

    ``salt_buckets > 0`` forces an explicit two-phase aggregation
    (partial dedup on (salt, key) then final) for skewed hub keys — the
    manual analogue of AQE skew handling; with AQE on, Spark's
    hash-aggregate is already two-phase, so the default path just uses
    dropDuplicates.
    """
    keys = ["nt_line"] if global_dedup else ["conv_id", "nt_line"]
    if salt_buckets and salt_buckets > 1:
        salted = triples.withColumn(
            "_salt", F.pmod(F.xxhash64(*keys), F.lit(salt_buckets))
        )
        partial = salted.dropDuplicates(["_salt"] + keys)
        return partial.dropDuplicates(keys).drop("_salt")
    return triples.dropDuplicates(keys)
