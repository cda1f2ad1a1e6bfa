"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the operator registry defined in
``dask_traj_spark.queries`` (one Spark implementation + one DuckDB
oracle per implemented operator from SURVEY.md §2).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: triclinic-MIC distances (the reference's canonical
    ``compute_distances`` query, G1) on the sf0.001 tables."""
    from dask_traj_spark import queries as q

    return q.queries()["g1_distances_mic_triclinic"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dask_traj_spark import queries as q

    return q.queries()


def oracle_sql() -> dict[str, str]:
    from dask_traj_spark import queries as q

    return q.oracle_sql()
