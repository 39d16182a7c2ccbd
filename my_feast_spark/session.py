"""SparkSession factory with the engine's canonical configuration.

The reference pins determinism-critical confs in its repo config
(`feature_repo/feature_store.yaml:12-17`: UTC session timezone, executor
sizing) and enables dynamic partition overwrite per job
(`ingest_taxy.py:62`). We centralize those here, plus scale-oriented
defaults: AQE (runtime re-planning, skew-join handling), partition-overwrite
dynamic mode, and Arrow for the pandas interchange path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that are safe (and necessary) to apply to an externally provided
#: session at runtime — e.g. the verification driver's session.
RUNTIME_CONFS: dict[str, str] = {
    # Determinism: all timestamp semantics pinned to UTC.
    "spark.sql.session.timeZone": "UTC",
    # The driver's events table stores TIMESTAMP(NANOS) which Spark refuses
    # by default; read as long and convert explicitly (sources/readers.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Partitioned overwrite replaces only touched partitions (reference
    # idiom: ingest_taxy.py:62, chicago_taxi_trips_silver.ipynb:29).
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # Runtime re-planning: coalesce small shuffle partitions, split skewed
    # ones — essential for the 100 TB target where static planning misses.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow-accelerated toPandas()/pandas UDFs.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Write timestamps as TIMESTAMP_MICROS, not the deprecated INT96:
    # INT96 columns carry NO parquet min/max statistics, which silently
    # defeats row-group skipping AND the file-stats sidecar
    # (sources/skipping.py) on every time column — the single most
    # common pruning predicate at 100 TB. Values are identical (the
    # engine already truncates to micros on read).
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
}


def session_confs(shuffle_partitions: int | None = None) -> dict[str, str]:
    """Full conf dict for building a fresh session."""
    confs = dict(RUNTIME_CONFS)
    if shuffle_partitions is not None:
        confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    return confs


def apply_runtime_confs(
    spark: SparkSession, warnings: list[str] | None = None
) -> list[str]:
    """Apply the engine's runtime-settable confs to an existing session;
    returns the list of rejected confs (empty when all applied).

    Used when the caller (e.g. the verification driver) owns the session.
    All confs in RUNTIME_CONFS are SQL confs and runtime-settable — but a
    session can still reject one (static conf on some build, a conf
    locked by the cluster admin). Silently skipping a
    determinism-critical conf like the UTC timezone would corrupt
    results downstream, so every rejection is reported: returned, and
    also appended to the caller's ``warnings`` list when given (for
    callers accumulating warnings across several setup steps). No
    process-global state — concurrent sessions each get their own list.
    """
    rejected: list[str] = []
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception as exc:
            rejected.append(f"conf {k}={v} rejected: {exc}")
    if warnings is not None:
        warnings.extend(rejected)
    return rejected


def get_session(
    app_name: str = "my_feast_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with the engine's canonical confs.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    for local runs; on a real cluster pass ``None`` with a configured
    spark-submit and only the SQL confs apply.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = SparkSession.builder.appName(app_name).master(master)
    builder = builder.config("spark.ui.enabled", "false")
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    for k, v in session_confs(shuffle_partitions).items():
        builder = builder.config(k, v)
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
