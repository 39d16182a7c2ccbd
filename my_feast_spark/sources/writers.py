"""Partitioned sinks — the reference's medallion write idiom (S8/S9).

``df.repartition(partition_cols).write.mode(...).partitionBy(...)`` —
the repartition-before-partitioned-write keeps one task per output
partition (no small-file explosion: N tasks x P partitions files
otherwise), the idiom used at every layer of the reference
(ingest_taxy.py:70-76, chicago_taxi_trips_silver.ipynb:70-76).
Dynamic partition overwrite is set session-wide (session.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    *,
    mode: str = "overwrite",
    fmt: str = "parquet",
    repartition: bool = True,
) -> None:
    partition_cols = list(partition_cols)
    out = df.repartition(*partition_cols) if (repartition and partition_cols) else df
    writer = out.write.mode(mode).format(fmt)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.save(path)
