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


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    *,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Save as a bucketed (and optionally sorted) catalog table.

    Bucketing is the co-located-join lever at 100 TB: two tables bucketed
    the same way on the join key join with NO Exchange (and with
    ``sort_cols`` no Sort) — the shuffle is paid once at write time and
    amortized over every subsequent join/aggregation on that key. Worth it
    for the big fact tables (events history, feature gold) that are joined
    repeatedly by the PIT retrieval; pointless for one-shot reads.
    """
    bucket_cols = list(bucket_cols)
    writer = df.write.mode(mode).format(fmt).bucketBy(
        num_buckets, bucket_cols[0], *bucket_cols[1:]
    )
    if sort_cols:
        sort_cols = list(sort_cols)
        writer = writer.sortBy(sort_cols[0], *sort_cols[1:])
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    *,
    mode: str = "overwrite",
    fmt: str = "parquet",
    repartition: bool = True,
    sort_within: Sequence[str] = (),
) -> None:
    """``sort_within``: cluster rows inside each file by these columns
    (e.g. the event timestamp) so parquet row-group min/max statistics
    become selective — readers with a time predicate skip whole row
    groups. Costs one sort at write time, pays on every pruned scan."""
    partition_cols = list(partition_cols)
    out = df.repartition(*partition_cols) if (repartition and partition_cols) else df
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    writer = out.write.mode(mode).format(fmt)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.save(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    compression: str | None = "gzip",
    target_rows_per_file: int | None = None,
) -> None:
    """JSON-Lines sink for corpus interchange. ``compression`` defaults
    to gzip (the convention for shipped text shards; pass ``None`` for
    plain). ``target_rows_per_file`` caps rows per output shard via
    ``maxRecordsPerFile`` — the knob that sizes shards for downstream
    loaders without a repartition shuffle (Spark splits a task's output
    across files when the cap is hit)."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if target_rows_per_file:
        writer = writer.option("maxRecordsPerFile", int(target_rows_per_file))
    writer.json(path)
