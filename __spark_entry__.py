"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship point-in-time retrieval on sf0.001;
``queries()``/``oracle_sql()`` expose the operator inventory (SURVEY §2)
over the driver test tables, implemented in ``my_feast_spark.workload``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# Python workers (mapInPandas/applyInPandasWithState) resolve pickled
# closures without this package, but keep it importable there too in case
# a future operator pickles a module-level reference.
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)

from my_feast_spark import workload  # noqa: E402
from my_feast_spark.session import apply_runtime_confs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Hourly per-user feature aggregation + point-in-time join with TTL —
    the reference's gold-build + get_historical_features critical path.
    """
    apply_runtime_confs(spark)
    return workload.q_pit_user_features(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out = {}
    for name, (fn, _sql) in workload.QUERIES.items():
        def _wrap(spark, sf_dir, _fn=fn):
            apply_runtime_confs(spark)
            return _fn(spark, sf_dir)
        out[name] = _wrap
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (None-valued entries omitted →
    driver records a weaker rows-only check). Generated oracles are
    lazy (workload._LazySQL) — resolved here, at the one consumer that
    actually needs every string."""
    out = {}
    for name, (_fn, sql) in workload.QUERIES.items():
        sql = workload.resolve_sql(sql)
        if sql is not None:
            out[name] = sql
    return out
