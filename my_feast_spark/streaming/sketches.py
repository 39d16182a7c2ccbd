"""Streaming sketch maintenance: incremental HyperLogLog profiles.

The batch sketch tier (operators/sketches.py) estimates per-group
distinct counts from m-register state. A live pipeline wants that
profile maintained AS DATA ARRIVES — "distinct users per event type,
updated every micro-batch" — without ever re-keying history. HLL makes
this the cheapest maintenance problem in the repo, because its merge
is an elementwise MAX:

* **replay-idempotent twice over**: the per-batch ``batch_id=N``
  partition overwrite (the ingest-family protocol) makes a crash
  replay rewrite the same directory; and even if a batch's registers
  were somehow duplicated across generations, max-merge absorbs them —
  the algebra itself is idempotent, unlike the count-based state of a
  CMS or the set state of the dedup indexes.
* **compaction for free**: :func:`streaming.ingest.compact_index`'s
  contract is "set semantics hold" (it folds generations with
  dropDuplicates). Register rows satisfy it: the read path takes
  ``max(rho)`` per (group, bucket), and a set-union of generations
  never loses a maximum. So the same crash-safe fresh-generation
  protocol that maintains the dedup indexes maintains the sketch —
  zero new maintenance code, one shared invariant.
* **per-batch cost is batch-sized**: each micro-batch writes only ITS
  OWN registers (<= m rows per group seen in the batch); the
  accumulated state read by :func:`read_hll_sketch` is bounded by
  m * |groups| * generations, and compaction keeps generations flat.

Batch/stream equality contract (driver-adjudicated by the
``streaming_sketch_ingest`` workload query): the max-merge of per-batch
registers equals the registers of the full input — mergeability is
exactly what ``tests/test_sketches.py::test_hll_registers_merge_by_max``
pins — so the maintained estimate is bit-identical to the one-shot
batch ``hll_group_distinct``, which the DuckDB oracle replays.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_feast_spark.operators.sketches import hll_estimate, hll_registers
from my_feast_spark.streaming.ingest import _fs_nonempty, compact_index


def hll_ingest_stream(
    sdf: DataFrame,
    *,
    sketch_path: str,
    checkpoint: str,
    value_col: str,
    group_cols: list[str],
    p: int = 12,
    compact_every: int | None = None,
    available_now: bool = False,
    trigger_interval: str | None = None,
):
    """Maintain a per-group HLL register table over a stream.

    Each micro-batch computes the registers of ITS rows only and
    overwrites ``sketch_path/batch_id=N`` (idempotent replay); the
    maintained sketch is the max-merge over all generations
    (:func:`read_hll_sketch`). ``compact_every=k`` folds the
    generations below the current batch every k batches via the shared
    :func:`compact_index` protocol. Returns the StreamingQuery.
    """

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        regs = hll_registers(
            batch_df.select(*group_cols, value_col),
            value_col, p=p, group_by=group_cols,
        )
        regs.write.mode("overwrite").parquet(
            os.path.join(sketch_path, f"batch_id={batch_id}")
        )
        if compact_every and batch_id % compact_every == compact_every - 1:
            compact_index(
                batch_df.sparkSession, sketch_path, exclude_from=batch_id
            )

    writer = (
        sdf.writeStream.foreachBatch(ingest_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_interval:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()


def read_hll_sketch(
    spark: SparkSession, sketch_path: str, *, group_cols: list[str],
) -> DataFrame:
    """The maintained register table: max-merge over every generation
    (live batches and compacted negative generations alike)."""
    if not _fs_nonempty(spark, sketch_path):
        raise FileNotFoundError(f"no sketch generations under {sketch_path}")
    return (
        spark.read.parquet(sketch_path)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_stream_estimate(
    spark: SparkSession, sketch_path: str, *, p: int,
    group_cols: list[str],
) -> DataFrame:
    """Per-group estimate from the maintained sketch — identical output
    contract to the batch ``hll_group_distinct``."""
    regs = read_hll_sketch(spark, sketch_path, group_cols=group_cols)
    return hll_estimate(regs, p=p, group_by=group_cols)
