"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline (corpus →
parse UDFs → linking → canonicalization → deduplicated triples) and
returns the triples DataFrame. ``queries()`` exposes one entry per
operator family from SURVEY.md §2 plus the training-data ops;
``oracle_sql()`` gives a DuckDB oracle for EVERY entry — including the
KG pipeline (golden VALUES tables computed by the independent
pure-Python oracle in kgpipe/golden.py), the stub-codec multimodal ops
(hashlib-computed VALUES) and LSH ANN (SQL port of the md5-hyperplane
signature). Zero rows-only checks.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ship_package(spark: SparkSession) -> None:
    """Make kgpipe importable on executors even when the driver-provided
    session lacks our session factory's addPyFile (--py-files contract)."""
    from kgpipe.session import _package_zip

    try:
        spark.sparkContext.addPyFile(_package_zip())
    except Exception:
        pass  # already added in this session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG pipeline at sf0.001-ish scale → triples."""
    _ship_package(spark)
    from kgpipe.corpus import corpus_to_dataframes, generate_corpus
    from kgpipe.pipeline import build_graph

    corpus = generate_corpus(n_hanzi=30, n_words=40, n_idioms=30, seed=42)
    cdf, sdf = corpus_to_dataframes(spark, corpus)
    return build_graph(spark, cdf, sdf).triples


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kgpipe.queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from kgpipe.queries import all_oracles

    return all_oracles()
