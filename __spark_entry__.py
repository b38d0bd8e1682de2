"""Driver contract for the spark-graft builder (PySpark target).

entry(spark) runs the flagship query at sf0.001; queries()/oracle_sql()
cover the operator inventory from SURVEY.md §2 plus the pipeline operators
(dedup / similarity / text analysis).  Implementation lives in
adtl_spark.queries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from adtl_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2 and the
    pipeline-operator extensions; each callable takes (spark, sf_dir)."""
    return Q.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins.  The one omitted entry
    (p14_uuid5) is non-SQL-expressible (DuckDB has no sha1) and takes the
    driver's rows-only check; every other query — including the LSH ANN
    and bucketed embedding-dedup paths, whose hyperplanes are mirrored
    as literals — is value-checked."""
    return Q.oracles()
