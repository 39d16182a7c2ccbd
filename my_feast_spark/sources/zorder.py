"""Z-order clustering rewrite for batch parquet tables.

The plain-parquet equivalent of Delta Lake's ``OPTIMIZE ... ZORDER BY``
(the reference standardizes its cloud tables on Delta —
/root/reference/CASE.MD:107 — where z-ordering is THE data-layout lever
for multi-column selective scans). A table naturally ordered by ingest
time answers time-range predicates with row-group skipping for free,
but a predicate on any OTHER column touches every row group because
each group's min/max spans the full domain. Interleaving the bits of
the clustering columns into one z-value and rewriting the table sorted
by it makes every row group cover a small HYPER-RECTANGLE of the key
space, so parquet footer statistics (which Spark's scan consults for
predicate pushdown) skip most groups for selective predicates on ANY
clustered column — no index structure, just layout.

How the z-value is built, all JVM-side expressions (whole-stage
codegen, no shuffle before the final range partitioning):

  1. each clustering column maps to a 16-bit rank: numeric/timestamp
     columns via ``width_bucket`` over the column's (min, max) — one
     broadcast 1-row aggregate — and string columns via
     ``width_bucket`` over a 63-bit ``xxhash64`` (hash order is not
     semantic order, but identical strings co-locate, which is what
     point predicates need);
  2. the 16-bit ranks interleave bit-by-bit into one BIGINT (a fixed
     32/48-expression shift-or tree for 2/3 columns);
  3. ``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` + write.
     Range partitioning samples the z distribution, so output files
     tile the z-curve evenly even under skew.

Scale shape: ONE pass over the table (the range exchange is the only
shuffle), same cost class as compact_table's rewrite. Schedule it like
compaction; it composes with hive partitioning (z-order WITHIN each
partition by passing ``partition_by``). Verification: the row-group
bounding boxes are directly measurable from parquet footers — see
``tests/test_zorder.py``, which asserts the clustered table's average
per-row-group rectangle area shrinks by an order of magnitude vs the
natural layout.

Limits (documented, not hidden): 16 bits per column caps distinguishable
ranks at 65536 — ample for row-group-level skipping (a 100 TB table has
~1e6 row groups); beyond 3 columns the curve's locality degrades (same
as Delta's guidance); NULLs rank to bucket 0.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits of rank kept per clustering column
Z_BITS = 16

_MASK63 = (1 << 63) - 1


def _rank16s(df: DataFrame, cols: Sequence[str]) -> list[Column]:
    """Map each column to [0, 2^16) — width_bucket over (min, max) for
    orderable numerics/timestamps, over a 63-bit hash for strings. All
    numeric bounds come from ONE fused min/max aggregate (a single
    column-pruned scan regardless of column count — at 100 TB the
    bounds pass must not multiply with the z-key width)."""
    dtypes = dict(df.dtypes)
    numeric = [c for c in cols if dtypes[c] != "string"]
    bounds: dict[str, tuple[float, float]] = {}
    if numeric:
        row = df.agg(*[
            f
            for c in numeric
            for f in (
                F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__hi_{c}"),
            )
        ]).collect()[0]
        for c in numeric:
            lo = row[f"__lo_{c}"]
            hi = row[f"__hi_{c}"]
            lo = lo if lo is not None else 0.0
            hi = hi if hi is not None else 1.0
            if hi <= lo:
                hi = lo + 1.0
            bounds[c] = (lo, hi)

    n = 1 << Z_BITS
    out = []
    for c in cols:
        if dtypes[c] == "string":
            v = F.xxhash64(F.col(c)).bitwiseAND(F.lit(_MASK63)).cast(
                "double"
            )
            lo, hi = 0.0, float(_MASK63)
        else:
            v = F.col(c).cast("double")
            lo, hi = bounds[c]
        # width_bucket returns 1..n+1 (n+1 for v == hi); clamp to [0, n)
        b = F.width_bucket(v, F.lit(lo), F.lit(hi), F.lit(n)) - F.lit(1)
        b = F.least(F.greatest(b, F.lit(0)), F.lit(n - 1))
        out.append(F.coalesce(b, F.lit(0)).cast("long"))
    return out


def zvalue(df: DataFrame, cols: Sequence[str]) -> Column:
    """Interleaved z-value of ``cols`` as one BIGINT expression."""
    if not 2 <= len(cols) <= 3:
        raise ValueError("z-ordering wants 2 or 3 columns")
    ranks = _rank16s(df, cols)
    k = len(ranks)
    z = F.lit(0).cast("long")
    # bit b of rank i lands at position b*k + i (MSB-first interleave)
    for b in range(Z_BITS - 1, -1, -1):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, b).bitwiseAND(F.lit(1))
            z = F.shiftleft(z, 1).bitwiseOR(bit)
    return z


def zorder_table(
    spark,
    path: str,
    cols: Sequence[str],
    *,
    out_path: str | None = None,
    num_files: int | None = None,
    partition_by: Sequence[str] = (),
    options: dict | None = None,
) -> str:
    """Rewrite the parquet table at ``path`` clustered on ``cols``.

    Writes to ``out_path`` (default ``path + "__zorder"``) and returns
    it — a layout rewrite is a full-table job, so the swap into place
    is left to the caller's orchestration (or wrap the output dir the
    way streaming/online.py swaps snapshots). ``num_files`` bounds the
    output fan-out (default: Spark's range-partition sampling decides);
    ``partition_by`` keeps a hive layout and z-orders within each
    partition (partition columns must not be in ``cols``); ``options``
    pass through to the parquet writer (e.g. ``parquet.block.size`` —
    the ROW-GROUP size is the skipping granularity, so size it to the
    selectivity you are optimizing for, not just the file size).
    """
    if set(partition_by) & set(cols):
        raise ValueError("partition_by and z-order cols must be disjoint")
    df = spark.read.parquet(path)
    z = zvalue(df, cols).alias("__z")
    zdf = df.select("*", z)
    parts = [F.col(c) for c in partition_by]
    if num_files:
        zdf = zdf.repartitionByRange(num_files, *parts, F.col("__z"))
    else:
        zdf = zdf.repartitionByRange(*parts, F.col("__z"))
    out = out_path or (path.rstrip("/") + "__zorder")
    writer = (
        zdf.sortWithinPartitions(*parts, F.col("__z"))
        .drop("__z")
        .write.mode("overwrite")
    )
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*list(partition_by))
    writer.parquet(out)
    return out
