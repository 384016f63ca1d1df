"""dedup_statements: the plain and salted two-phase paths must agree,
and the salt must spread a hub key's copies (key-independent) — a salt
derived from the dedup keys gives every duplicate the same salt, which
re-concentrates the skewed key on one reducer and makes the two-phase
'spread' a structural no-op."""

from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401  (fixture)

SCHEMA = (
    "conv_id string, subj string, pred string, obj_kind int, "
    "obj_lex string, obj_datatype string, obj_lang string, graph string"
)


def _skewed(spark):  # noqa: F811
    # one hub statement duplicated 5000x across many partitions + a
    # tail of unique rows
    hub = spark.range(5000).select(
        F.lit("c0").alias("conv_id"),
        F.lit("http://ex/hub").alias("subj"),
        F.lit("http://ex/p").alias("pred"),
        F.lit(1).alias("obj_kind"),
        F.lit("http://ex/o").alias("obj_lex"),
        F.lit(None).cast("string").alias("obj_datatype"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(None).cast("string").alias("graph"),
    )
    tail = spark.range(200).select(
        F.lit("c0").alias("conv_id"),
        F.concat(F.lit("http://ex/s"), F.col("id")).alias("subj"),
        F.lit("http://ex/p").alias("pred"),
        F.lit(1).alias("obj_kind"),
        F.lit("http://ex/o").alias("obj_lex"),
        F.lit(None).cast("string").alias("obj_datatype"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(None).cast("string").alias("graph"),
    )
    return hub.unionByName(tail).repartition(16)


def test_salted_dedup_matches_plain(spark):  # noqa: F811
    from raptor_spark.operators.canonical import dedup_statements

    df = _skewed(spark)
    plain = {tuple(r) for r in dedup_statements(df).collect()}
    salted = {
        tuple(r) for r in dedup_statements(df, salt_buckets=8).collect()
    }
    assert salted == plain
    assert len(salted) == 201  # hub collapsed + 200 unique


def test_salt_is_key_independent(spark):  # noqa: F811
    """Copies of the SAME statement must receive MULTIPLE distinct
    salts when they span partitions — that spread IS the skew
    mitigation; a keys-derived salt would collapse this to 1."""
    df = _skewed(spark)
    salted = df.withColumn(
        "_salt", F.pmod(F.spark_partition_id(), F.lit(8))
    )
    n_salts = (
        salted.filter(F.col("subj") == "http://ex/hub")
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_salts > 1
