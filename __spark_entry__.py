"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship KG-construction pipeline at sf0.001.
queries()      — one entry per implemented operator (SURVEY.md §2 +
                 training-data ops), each (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB-equivalent SQL for every query (all entries have
                 oracles; the kernel parse path is covered end-to-end by
                 the kg_pipeline oracle reconstruction).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transcripts -> reassemble -> parse (6 syntaxes: NT, NQ,
    Turtle, TriG, RDF/XML, RDF/JSON) -> canonicalize -> dedup -> triples,
    over RDF-ized sf0.001 tables."""
    from raptor_spark.queries import q_kg_pipeline

    return q_kg_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from raptor_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from raptor_spark.queries import ORACLES

    return dict(ORACLES)
