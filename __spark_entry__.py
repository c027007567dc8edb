"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline (extract →
link → canonicalize → materialize over an interleaved spans corpus with
reference-fixture replay). ``queries()`` / ``oracle_sql()`` expose each
implemented operator from SURVEY.md §2 plus the training-data-pipeline
additions; bodies live in :mod:`nebula_importer_spark.contract`.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG pipeline over an interleaved corpus at sf0.001.

    The corpus derives from the driver's documents table, with the
    reference's person.csv golden fixture embedded as table_row spans so the
    emitted triples include the importer-parity mapping output.
    """
    from pyspark.sql import functions as F

    from nebula_importer_spark.fixtures import PERSON_CSV_LINES, person_spec
    from nebula_importer_spark.pipeline.corpus import synthetic_corpus
    from nebula_importer_spark.pipeline.run import run_pipeline

    corpus = synthetic_corpus(
        spark, n_docs=500, seed=42, fixture_rows=PERSON_CSV_LINES, partitions=8
    )
    result = run_pipeline(
        spark,
        corpus,
        fixture_node_specs=[person_spec()],
    )
    return result.triples


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from nebula_importer_spark.contract import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from nebula_importer_spark.contract import ORACLES

    return dict(ORACLES)
