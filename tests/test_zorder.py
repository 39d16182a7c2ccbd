"""Z-order clustering rewrite (sources/zorder.py): content preserved,
hive layout composes, and — the point — per-row-group bounding boxes
measured from the parquet footers shrink by an order of magnitude vs
the natural layout, which is exactly the statistic predicate pushdown
skips on."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from my_feast_spark.sources.zorder import zorder_table, zvalue


def _row_group_boxes(path, cols):
    """(min, max) per row group per column, from the parquet footers."""
    import pyarrow.parquet as pq

    boxes = []
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        for f in files:
            if f.startswith((".", "_")) or not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            idx = {md.schema.column(i).name: i
                   for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                box = {}
                for c in cols:
                    st = g.column(idx[c]).statistics
                    box[c] = (st.min, st.max)
                boxes.append(box)
    return boxes


def _avg_area(boxes, spans):
    total = 0.0
    for b in boxes:
        a = 1.0
        for c, (lo, hi) in b.items():
            a *= (hi - lo) / spans[c]
        total += a
    return total / len(boxes)


@pytest.fixture(scope="module")
def zsource(spark, tmp_path_factory):
    """200k rows with two independent uniform keys, written in natural
    (insertion) order with small row groups so footer statistics are
    fine-grained enough to measure clustering."""
    tmp = tmp_path_factory.mktemp("zorder")
    src = str(tmp / "natural")
    df = spark.range(200_000).select(
        F.col("id"),
        F.pmod(F.xxhash64(F.col("id") + 1), F.lit(10_000)).alias("a"),
        F.pmod(F.xxhash64(F.col("id") + 2), F.lit(10_000)).alias("b"),
        (F.col("id") % 5).alias("part"),
    )
    (
        df.repartition(4)
        .write.option("parquet.block.size", 65536)
        .mode("overwrite").parquet(src)
    )
    return str(tmp), src


def test_zorder_shrinks_row_group_boxes(spark, zsource):
    tmp, src = zsource
    out = zorder_table(
        spark, src, ["a", "b"], out_path=f"{tmp}/clustered", num_files=4,
        # same row-group granularity as the natural table — the fair
        # comparison, and the knob a deployment sizes to its selectivity
        options={"parquet.block.size": 65536},
    )
    spans = {"a": 10_000.0, "b": 10_000.0}
    nat = _avg_area(_row_group_boxes(src, ["a", "b"]), spans)
    zo = _avg_area(_row_group_boxes(out, ["a", "b"]), spans)
    # natural layout: every group spans ~the full (a, b) rectangle;
    # z-ordered: each group covers a small tile
    assert nat > 0.5, nat
    assert zo < nat / 10, (zo, nat)

    # losslessness: exact multiset equality
    src_rows = sorted(map(tuple, spark.read.parquet(src).collect()))
    out_rows = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert src_rows == out_rows


def test_zorder_respects_hive_partitions(spark, zsource):
    tmp, src = zsource
    out = zorder_table(
        spark, src, ["a", "b"], out_path=f"{tmp}/by_part",
        num_files=5, partition_by=["part"],
    )
    parts = sorted(
        d for d in os.listdir(out) if d.startswith("part=")
    )
    assert parts == [f"part={i}" for i in range(5)]
    got = sorted(map(tuple, spark.read.parquet(out)
                 .select("id", "a", "b", "part").collect()))
    want = sorted(map(tuple, spark.read.parquet(src)
                  .select("id", "a", "b", "part").collect()))
    assert got == want
    with pytest.raises(ValueError, match="disjoint"):
        zorder_table(spark, src, ["part", "a"], partition_by=["part"])


def test_zvalue_is_monotone_in_locality(spark):
    """Nearby (a, b) points get nearby z-values: the z of (0,0)-ish
    rows sorts far from the z of (max,max)-ish rows, and equal inputs
    get equal z (determinism)."""
    df = spark.createDataFrame(
        [(0, 0), (1, 1), (9_999, 9_998), (9_999, 9_999), (0, 0)],
        schema="a long, b long",
    )
    z = [r.z for r in df.select(zvalue(df, ["a", "b"]).alias("z")).collect()]
    assert z[0] == z[4]                  # deterministic
    assert max(z[0], z[1]) < min(z[2], z[3])  # corner separation
    with pytest.raises(ValueError, match="2 or 3"):
        zvalue(df, ["a"])


def test_zvalue_matches_bit_interleave_reference(spark):
    """The shift-or expression tree computes EXACTLY the MSB-first bit
    interleave of the 16-bit ranks — pinned against a pure-Python
    reference on a deterministic value sweep, for 2 and 3 columns."""
    from my_feast_spark.sources.zorder import Z_BITS

    def ref_z(ranks):
        z = 0
        for b in range(Z_BITS - 1, -1, -1):
            for r in ranks:
                z = (z << 1) | ((r >> b) & 1)
        return z

    # width_bucket over the observed (min, max) must reproduce the
    # engine-side rank; sweep values that hit bucket boundaries
    vals = [0, 1, 2, 3, 5, 7, 11, 1000, 32767, 32768, 65534, 65535]
    rows = [(a, b, c) for a in vals for b in (0, 65535)
            for c in (0, 1, 65535)]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    lo, hi, n = 0.0, 65535.0, 1 << Z_BITS

    def rank(v):
        # mirror of _rank16s: width_bucket(v, lo, hi, n) - 1, clamped
        import math
        b = int(math.floor((v - lo) / (hi - lo) * n)) + 1 if v < hi else n + 1
        b = b - 1
        return max(0, min(b, n - 1))

    got = [
        r.z for r in df.select(
            zvalue(df, ["a", "b", "c"]).alias("z")
        ).collect()
    ]
    want = [ref_z([rank(a), rank(b), rank(c)]) for a, b, c in rows]
    assert got == want
