"""File-level stats skipping (sources/skipping.py): the sidecar prunes
the file list before spark.read, results match the unpruned filter
exactly, staleness fails loudly, and the zorder pairing actually skips
on BOTH clustered columns."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from my_feast_spark.sources.skipping import (
    STATS_SIDECAR,
    scan_with_skipping,
    write_file_stats,
)
from my_feast_spark.sources.zorder import zorder_table


@pytest.fixture(scope="module")
def zstats_table(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("skip")
    src = str(tmp / "natural")
    df = spark.range(100_000).select(
        F.col("id"),
        F.pmod(F.xxhash64(F.col("id") + 1), F.lit(10_000)).alias("a"),
        F.pmod(F.xxhash64(F.col("id") + 2), F.lit(10_000)).alias("b"),
    )
    df.repartition(4).write.mode("overwrite").parquet(src)
    out = zorder_table(
        spark, src, ["a", "b"], out_path=str(tmp / "z"), num_files=16
    )
    write_file_stats(out, ["a", "b", "id"])
    return src, out


def test_skipping_scan_prunes_and_matches(spark, zstats_table):
    src, out = zstats_table
    for col in ("a", "b"):  # the zorder pairing: BOTH columns skip
        got_df, report = scan_with_skipping(
            spark, out, {col: (100, 400)}
        )
        assert report["files_total"] == 16
        assert report["files_skipped"] > 0, (col, report)
        got = sorted(map(tuple, got_df.select("id", "a", "b").collect()))
        want = sorted(map(tuple, (
            spark.read.parquet(src)
            .filter((F.col(col) >= 100) & (F.col(col) <= 400))
            .select("id", "a", "b").collect()
        )))
        assert got == want
    # the planned scan really reads only the surviving files
    got_df, report = scan_with_skipping(spark, out, {"a": (100, 400)})
    assert len(set(got_df.inputFiles())) == report["files_read"]


def test_one_sided_and_empty_ranges(spark, zstats_table):
    _src, out = zstats_table
    df, rep = scan_with_skipping(spark, out, {"a": (9_990, None)})
    assert rep["files_skipped"] > 0
    assert df.agg(F.min("a")).collect()[0][0] >= 9_990
    # a range beyond the domain skips EVERYTHING but stays schema-correct
    df0, rep0 = scan_with_skipping(spark, out, {"a": (20_000, 30_000)})
    assert rep0["files_read"] == 0
    assert df0.count() == 0
    assert set(df0.columns) == {"id", "a", "b"}


def test_stale_or_missing_sidecar_fails_loudly(spark, zstats_table):
    _src, out = zstats_table
    # missing sidecar
    with pytest.raises(RuntimeError, match="write_file_stats"):
        scan_with_skipping(spark, _src, {"a": (0, 1)})
    # stale sidecar: an append the stats never saw
    spark.range(5).select(
        F.col("id"), F.lit(1).cast("long").alias("a"),
        F.lit(1).cast("long").alias("b"),
    ).coalesce(1).write.mode("append").parquet(out)
    with pytest.raises(RuntimeError, match="stale"):
        scan_with_skipping(spark, out, {"a": (0, 1)})
    # re-sweeping heals
    write_file_stats(out, ["a", "b", "id"])
    df, rep = scan_with_skipping(spark, out, {"a": (0, 1)})
    assert rep["files_total"] == 17
    assert os.path.exists(os.path.join(out, STATS_SIDECAR))


def test_timestamp_stats_skip(spark, tmp_path):
    """Date/timestamp stats round-trip through str() in the sidecar;
    lexicographic comparison of the fixed format still prunes
    correctly."""
    import datetime as dt

    path = str(tmp_path / "ts_table")
    df = spark.range(10_000).select(
        F.col("id"),
        F.expr(
            "timestamp'2024-01-01 00:00:00' "
            "+ make_interval(0, 0, 0, 0, 0, 0, id)"
        ).alias("ts"),
    )
    # naturally time-ordered files: the classic ingest layout
    df.repartitionByRange(8, "ts").sortWithinPartitions("ts").write.mode(
        "overwrite"
    ).parquet(path)
    write_file_stats(path, ["ts"])
    lo = dt.datetime(2024, 1, 1, 0, 30)
    hi = dt.datetime(2024, 1, 1, 0, 40)
    got_df, rep = scan_with_skipping(spark, path, {"ts": (lo, hi)})
    assert rep["files_skipped"] >= 6, rep
    assert got_df.count() == 601  # inclusive bounds, 1s grid


def test_skipping_equals_full_filter_property(spark, tmp_path):
    """Property sweep (deterministic seeds, no hypothesis-Spark fixture
    overhead): for a grid of layouts × predicates, the pruned scan's
    rows ALWAYS equal the unpruned filter — pruning may only ever
    remove whole files the predicate provably misses."""
    from pyspark.sql import functions as F

    for seed in (1, 2, 3):
        path = str(tmp_path / f"t{seed}")
        df = spark.range(20_000).select(
            F.col("id"),
            F.pmod(F.xxhash64(F.col("id") + seed), F.lit(97)).alias("k"),
        )
        # three layouts: random, k-ordered, id-ordered
        if seed == 1:
            df.repartition(7).write.mode("overwrite").parquet(path)
        elif seed == 2:
            df.repartitionByRange(7, "k").sortWithinPartitions("k") \
              .write.mode("overwrite").parquet(path)
        else:
            df.repartitionByRange(7, "id").write.mode(
                "overwrite").parquet(path)
        write_file_stats(path, ["k", "id"])
        for lo, hi in ((0, 0), (10, 30), (96, 200), (None, 50),
                       (90, None), (200, 300)):
            got_df, rep = scan_with_skipping(spark, path, {"k": (lo, hi)})
            got = sorted(r.id for r in got_df.collect())
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (F.col("k") >= lo)
            if hi is not None:
                cond = cond & (F.col("k") <= hi)
            want = sorted(
                r.id for r in
                spark.read.parquet(path).filter(cond).collect()
            )
            assert got == want, (seed, lo, hi, rep)
            assert rep["files_read"] + rep["files_skipped"] == 7


def test_hive_partitioned_table_keeps_partition_columns(spark, tmp_path):
    """Reading an explicit file list drops hive partition inference
    unless basePath is set — the pruned scan must keep partition
    columns in its schema and values intact."""
    path = str(tmp_path / "hive")
    df = spark.range(8_000).select(
        F.col("id"),
        F.pmod(F.xxhash64(F.col("id") + 9), F.lit(1_000)).alias("k"),
        (F.col("id") % 3).alias("part"),
    )
    df.repartitionByRange(6, "k").write.mode("overwrite").partitionBy(
        "part"
    ).parquet(path)
    write_file_stats(path, ["k"])
    got_df, rep = scan_with_skipping(spark, path, {"k": (0, 100)})
    assert "part" in got_df.columns
    assert rep["files_skipped"] > 0
    got = sorted(map(tuple, got_df.select("id", "k", "part").collect()))
    want = sorted(map(tuple, (
        spark.read.parquet(path)
        .filter((F.col("k") >= 0) & (F.col("k") <= 100))
        .select("id", "k", "part").collect()
    )))
    assert got == want


def test_zorder_three_columns(spark, tmp_path):
    """3-column z-values keep locality on every axis: corner groups
    separate and content round-trips."""
    src = str(tmp_path / "src3")
    df = spark.range(30_000).select(
        F.col("id"),
        F.pmod(F.xxhash64(F.col("id") + 1), F.lit(1_000)).alias("a"),
        F.pmod(F.xxhash64(F.col("id") + 2), F.lit(1_000)).alias("b"),
        F.pmod(F.xxhash64(F.col("id") + 3), F.lit(1_000)).alias("c"),
    )
    df.repartition(4).write.mode("overwrite").parquet(src)
    out = zorder_table(
        spark, src, ["a", "b", "c"], out_path=str(tmp_path / "z3"),
        num_files=8, options={"parquet.block.size": 65536},
    )
    write_file_stats(out, ["a", "b", "c"])
    for col in ("a", "b", "c"):
        _df, rep = scan_with_skipping(spark, out, {col: (0, 60)})
        assert rep["files_skipped"] > 0, (col, rep)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, spark.read.parquet(src).collect()))
    assert got == want


def test_unresolvable_schemes_fail_loudly(spark):
    """IO routes through pyarrow.fs now (remote URIs are supported when
    pyarrow can back the scheme) — but a scheme pyarrow CANNOT resolve
    must still refuse loudly, never see an empty tree and emit an empty
    sidecar (silent full under-read)."""
    with pytest.raises(ValueError, match="cannot resolve"):
        write_file_stats("s3a://bucket/table", ["a"])
    with pytest.raises(ValueError, match="cannot resolve"):
        scan_with_skipping(spark, "abfss://c@a.dfs/table", {"a": (0, 1)})


def test_distributed_sweep_matches_serial_bytes(spark, tmp_path):
    """The footer sweep distributes when a session is passed (verdict
    round-12 #4): the Spark-job path must write the BYTE-identical
    sidecar the serial driver loop writes — same stats, same JSON — on
    a many-file hive-partitioned table, and a file:// URI (the remote-
    URI code path on the local scheme) must behave the same."""
    import datetime as dt

    path = str(tmp_path / "many")
    df = spark.range(50_000).selectExpr(
        "id",
        "CAST(id % 997 AS BIGINT) AS k",
        "CAST(id % 5 AS INT) AS part",
        "date_add(date'2024-03-01', CAST(id % 60 AS INT)) AS d",
    )
    df.repartition(8).write.mode("overwrite").partitionBy("part").parquet(
        path
    )

    serial = write_file_stats(path, ["k", "d"])
    with open(os.path.join(path, STATS_SIDECAR), "rb") as fh:
        serial_bytes = fh.read()
    distributed = write_file_stats(path, ["k", "d"], spark=spark)
    with open(os.path.join(path, STATS_SIDECAR), "rb") as fh:
        dist_bytes = fh.read()
    assert distributed == serial
    assert dist_bytes == serial_bytes
    assert len(serial) == 40  # 5 partitions x 8 files, all covered

    # the sidecar works end-to-end through a file:// URI
    uri = "file://" + path
    got_df, rep = scan_with_skipping(
        spark, uri, {"d": (dt.datetime(2024, 3, 10), None), "part": (2, 3)}
    )
    assert rep["files_total"] == 40
    assert rep["files_read"] == 16  # part prune: 2 of 5 partitions
    got = sorted(r.id for r in got_df.collect())
    want = sorted(
        r.id for r in spark.read.parquet(path)
        .filter((F.col("d") >= "2024-03-10") & F.col("part").isin(2, 3))
        .collect()
    )
    assert got == want


def test_partition_column_predicates_file_skip(spark, tmp_path):
    """Hive partition values parsed from directory names act as exact
    per-file stats, so a partition-column range predicate prunes files
    without opening anything under the excluded partitions."""
    path = str(tmp_path / "hive2")
    df = spark.range(6_000).select(
        F.col("id"),
        F.pmod(F.xxhash64(F.col("id")), F.lit(50)).alias("k"),
        (F.col("id") % 6).alias("part"),
    )
    df.repartition(2).write.mode("overwrite").partitionBy("part").parquet(
        path
    )
    write_file_stats(path, ["k"])
    got_df, rep = scan_with_skipping(spark, path, {"part": (0, 1)})
    # 6 partitions x 2 files: only part=0 and part=1 survive
    assert rep["files_read"] == 4 and rep["files_skipped"] == 8
    got = sorted(map(tuple, got_df.select("id", "k", "part").collect()))
    want = sorted(map(tuple, (
        spark.read.parquet(path).filter(F.col("part") <= 1)
        .select("id", "k", "part").collect()
    )))
    assert got == want


def test_decimal_bounds_never_mispruned(spark, tmp_path):
    """The review regression: decimal stats round-trip through str(), and
    a lexicographic comparison would wrongly prune ('150.00' < '20').
    Alignment must go numeric — and genuinely unknown type pairings must
    keep the file (conservative), never guess."""
    from decimal import Decimal

    path = str(tmp_path / "dec")
    spark.range(100).selectExpr(
        "id", "CAST(id + 50 AS DECIMAL(18,2)) AS amount"
    ).coalesce(2).write.mode("overwrite").parquet(path)
    write_file_stats(path, ["amount"])
    got_df, rep = scan_with_skipping(
        spark, path, {"amount": (Decimal("20"), None)}
    )
    # values run 50..149: NOTHING may be pruned by a >=20 predicate —
    # on builds where pyarrow can't extract decimal stats at all, the
    # column simply has no sidecar entry and everything is kept; on
    # builds where it can, the alignment must go numeric, never lex
    assert rep["files_skipped"] == 0
    assert got_df.count() == 100
    # a long column alongside still prunes numerically when asked via
    # a Decimal bound (the numeric-alignment path)
    path2 = str(tmp_path / "dec2")
    spark.range(100).selectExpr("id", "id + 50 AS amount").coalesce(2) \
        .write.mode("overwrite").parquet(path2)
    write_file_stats(path2, ["amount"])
    _df2, rep2 = scan_with_skipping(
        spark, path2, {"amount": (Decimal("1000"), None)}
    )
    assert rep2["files_read"] == 0
    _df3, rep3 = scan_with_skipping(
        spark, path2, {"amount": (Decimal("20"), None)}
    )
    assert rep3["files_skipped"] == 0 and _df3.count() == 100


def test_file_uri_is_normalized(spark, tmp_path):
    path = str(tmp_path / "uri")
    spark.range(10).selectExpr("id", "id % 3 AS k").coalesce(1) \
        .write.mode("overwrite").parquet(path)
    write_file_stats("file://" + path, ["k"])
    df, rep = scan_with_skipping(spark, "file://" + path, {"k": (0, 1)})
    assert rep["files_total"] == 1
    assert df.count() == 7


def test_date_column_vs_datetime_bound_never_mispruned(spark, tmp_path):
    """The round-12 review regression: a DATE column's sidecar stats
    str() to 'YYYY-MM-DD' while a datetime predicate bound str()s to
    'YYYY-MM-DD HH:MM:SS' — raw string comparison prunes a file whose
    date max equals the bound's calendar day, losing rows the row-level
    filter keeps (col >= midnight). Alignment must parse both sides and
    promote dates to midnight datetimes."""
    import datetime as dt

    path = str(tmp_path / "dates")
    df = spark.range(30).selectExpr(
        "id", "date_add(date'2024-01-01', CAST(id AS INT)) AS d"
    )
    df.repartitionByRange(3, "d").write.mode("overwrite").parquet(path)
    write_file_stats(path, ["d"])
    # bound lands exactly on a file's max date at midnight: the buggy
    # lexicographic compare saw '2024-01-05' < '2024-01-05 00:00:00'
    # and pruned the file containing the matching row
    lo = dt.datetime(2024, 1, 5, 0, 0, 0)
    got_df, rep = scan_with_skipping(spark, path, {"d": (lo, None)})
    got = sorted(r.id for r in got_df.collect())
    want = sorted(
        r.id for r in
        spark.read.parquet(path).filter(F.col("d") >= F.lit(lo)).collect()
    )
    assert got == want
    assert 4 in got, "2024-01-05 row must survive a midnight >= bound"
    # the upper-bound mirror: files past the day must still prune
    hi = dt.datetime(2024, 1, 3, 12, 0, 0)
    got_df2, rep2 = scan_with_skipping(spark, path, {"d": (None, hi)})
    assert rep2["files_skipped"] > 0, rep2
    got2 = sorted(r.id for r in got_df2.collect())
    want2 = sorted(
        r.id for r in
        spark.read.parquet(path).filter(F.col("d") <= F.lit(hi)).collect()
    )
    assert got2 == want2


def test_update_file_stats_sweeps_only_new_files(spark, tmp_path):
    """Incremental refresh (round 13): after appends the update sweeps
    ONLY uncovered files (report proves it), drops entries for deleted
    files, and the refreshed sidecar equals a from-scratch full sweep
    byte-for-byte; no sidecar -> loud error, never a silent first
    sweep."""
    from my_feast_spark.sources.skipping import update_file_stats

    path = str(tmp_path / "incr")
    spark.range(10_000).selectExpr(
        "id", "CAST(id % 97 AS BIGINT) AS k"
    ).repartition(4).write.mode("overwrite").parquet(path)

    with pytest.raises(RuntimeError, match="run write_file_stats"):
        update_file_stats(path, spark=spark)

    write_file_stats(path, ["k", "id"], spark=spark)
    # capture the ORIGINAL file set BEFORE appending: the victim must be
    # an original (sorted-name selection over the mixed listing can land
    # on an appended file — the uuids are unordered — which flips the
    # swept/removed counts; flaked once under a parallel-chunk run)
    originals = sorted(
        f for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )
    # append a new slice and delete one original file
    spark.range(10_000, 12_000).selectExpr(
        "id", "CAST(id % 97 AS BIGINT) AS k"
    ).repartition(2).write.mode("append").parquet(path)
    os.remove(os.path.join(path, originals[0]))

    rep = update_file_stats(path, spark=spark)
    assert rep["swept"] == 2 and rep["removed"] == 1 and rep["kept"] == 3
    assert rep["files_total"] == 5
    with open(os.path.join(path, STATS_SIDECAR), "rb") as fh:
        incr_bytes = fh.read()
    # a from-scratch sweep of the same layout produces identical bytes
    write_file_stats(path, ["k", "id"], spark=spark)
    with open(os.path.join(path, STATS_SIDECAR), "rb") as fh:
        full_bytes = fh.read()
    assert incr_bytes == full_bytes
    # and the refreshed sidecar serves a correct pruning scan
    got_df, srep = scan_with_skipping(spark, path, {"id": (10_500, None)})
    got = sorted(r.id for r in got_df.collect())
    want = sorted(
        r.id for r in spark.read.parquet(path)
        .filter(F.col("id") >= 10_500).collect()
    )
    assert got == want and srep["files_skipped"] > 0


def test_hadoop_s3_schemes_pass_the_allowlist():
    """Review-caught: s3a:// (the scheme Spark reads) was rejected by
    the allowlist while bare s3:// produced a Spark-unreadable base.
    s3a/s3n now map to pyarrow's s3 for the listing side and keep the
    original scheme in the spark base. No bucket is contacted here —
    assert the allowlist/mapping shape only."""
    from my_feast_spark.sources.skipping import _fs_and_path

    try:
        fs, p, base = _fs_and_path("s3a://bucket/table")
    except ValueError as exc:
        # pyarrow s3 init may fail in this offline container — but it
        # must be an s3-resolution failure, never the allowlist
        assert "not supported" not in str(exc)
    else:
        assert base == "s3a://bucket/table"  # spark keeps s3a
        assert p == "bucket/table"           # pyarrow-side path

    with pytest.raises(ValueError, match="not supported"):
        _fs_and_path("ftp://host/table")
