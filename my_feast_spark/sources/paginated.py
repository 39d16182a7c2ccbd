"""Paginated-API source (S1) — the reference's Socrata offset/limit pull
re-expressed for Spark.

The reference's ingest scripts walk a REST API page by page on the
driver side (infra/on-prem/workspace-dev/fs-hadoop scripts; Socrata
``$offset``/``$limit`` paging) and land records as bronze files. That
shape is inherent to offset-paged APIs: pages are a serial cursor, so
the *fetch* cannot be distributed — what must scale is everything after
it. This reader therefore:

  1. walks pages on the driver (bounded memory: records are flushed to a
     parquet staging chunk every ``stage_every`` rows, never accumulated
     past that);
  2. returns ``spark.read.parquet(staging_dir)`` — a normal distributed
     scan over the staged chunks, with pushdown/pruning/partitioning like
     any other bronze table.

At 100 TB nobody pages 100 TB through one driver — you shard the
*cursor* (per-day / per-tenant API slices), run one ``read_paginated``
per slice (each its own staging prefix), and the union is just a
multi-path parquet scan. The per-slice reader is this exact code.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession


def read_paginated(
    spark: SparkSession,
    fetch_page: Callable[[int], Sequence[Mapping]],
    staging_dir: str,
    *,
    schema=None,
    stage_every: int = 10_000,
    max_records: int | None = None,
) -> DataFrame:
    """Pull an offset-paged record source into a staged parquet scan.

    ``fetch_page(offset)`` returns the records at that offset (empty /
    None ends the walk — the Socrata convention). ``schema`` (DDL string
    or StructType) pins types so a sparse first page can't mis-infer;
    omitted, types are inferred from the first staged chunk.
    ``max_records`` caps the pull (the reference scripts cap their
    backfills the same way).
    """
    os.makedirs(staging_dir, exist_ok=True)
    buf: list = []
    offset = 0
    part = 0

    def flush() -> None:
        nonlocal part, buf
        if not buf:
            return
        chunk = spark.createDataFrame(buf, schema=schema)
        chunk.write.mode("overwrite").parquet(
            os.path.join(staging_dir, f"chunk={part:05d}")
        )
        part += 1
        buf = []

    while True:
        page = fetch_page(offset)
        if not page:
            break
        page = list(page)
        if max_records is not None:
            page = page[: max_records - offset]
        buf.extend(page)
        offset += len(page)
        if len(buf) >= stage_every:
            flush()
        if max_records is not None and offset >= max_records:
            break
    flush()
    if part == 0:
        raise ValueError("paginated source returned no records")
    return spark.read.parquet(os.path.join(staging_dir, "chunk=*"))
