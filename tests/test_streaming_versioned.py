"""Streaming ingest into a versioned table: every micro-batch is one
atomic version, replays are exactly-once via the manifest txn record
(Delta's txnAppId/txnVersion lever), and the txn record survives
compaction — the crash sequence a directory-containment check would
turn into a duplicate."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from my_feast_spark.sources import versioned as V
from my_feast_spark.streaming.versioned import versioned_ingest_stream


def _feed(spark, in_dir, rows):
    spark.createDataFrame(rows).coalesce(1).write.mode("append").parquet(
        in_dir
    )


def _run_once(spark, in_dir, table, ckpt, **kw):
    sdf = spark.readStream.schema("k long, v long").parquet(in_dir)
    q = versioned_ingest_stream(
        sdf, table, checkpoint=ckpt, available_now=True, **kw
    )
    assert q.awaitTermination(120)


def test_each_batch_is_one_version_and_time_travels(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    # one checkpoint reused across runs -> incremental batches (a fresh
    # checkpoint would reprocess everything as one batch 0)
    _feed(spark, in_dir, [Row(k=1, v=10), Row(k=2, v=20)])
    _run_once(spark, in_dir, table, ckpt)
    _feed(spark, in_dir, [Row(k=3, v=30)])
    _run_once(spark, in_dir, table, ckpt)
    _feed(spark, in_dir, [Row(k=4, v=40), Row(k=5, v=50)])
    _run_once(spark, in_dir, table, ckpt)

    vs = V.list_versions(spark, table)
    assert len(vs) == 3
    # time travel across batch boundaries: cumulative contents
    assert V.read_version(spark, table, vs[0]).count() == 2
    assert V.read_version(spark, table, vs[1]).count() == 3
    assert V.read_version(spark, table, vs[2]).count() == 5
    got = {r["k"]: r["v"] for r in V.read_version(spark, table).collect()}
    assert got == {1: 10, 2: 20, 3: 30, 4: 40, 5: 50}


def test_replayed_batch_commits_exactly_once(spark, tmp_path):
    """Simulate the crash-between-publish-and-ack replay: the same
    (app, batch_id) append applied twice lands once; a LOWER id after a
    higher one is also skipped (monotonic record)."""
    table = str(tmp_path / "table")
    df1 = spark.createDataFrame([Row(k=1, v=10)])
    df2 = spark.createDataFrame([Row(k=2, v=20)])

    v0 = V.write_version(df1, table, txn=("app", 0))
    assert V.write_version(df1, table, txn=("app", 0)) == v0  # replay
    assert V.read_version(spark, table).count() == 1
    v1 = V.write_version(df2, table, txn=("app", 1))
    assert v1 == v0 + 1
    assert V.write_version(df2, table, txn=("app", 0)) == v1  # stale id
    assert V.read_version(spark, table).count() == 2
    # a DIFFERENT app's id-0 commit is independent
    V.write_version(spark.createDataFrame([Row(k=9, v=90)]), table,
                    txn=("other", 0))
    assert V.read_version(spark, table).count() == 3

    with pytest.raises(ValueError, match="appends only"):
        V.write_version(df1, table, mode="overwrite", txn=("app", 5))


def test_txn_record_survives_compaction(spark, tmp_path):
    """commit -> compact -> crash -> replay must NOT duplicate: the
    manifest txn map is carried through checkpoint_version (and
    upsert_version), unlike a directory-containment check which the
    compaction would blind."""
    table = str(tmp_path / "table")
    V.write_version(spark.createDataFrame([Row(k=1, v=10)]), table,
                    txn=("app", 0))
    V.write_version(spark.createDataFrame([Row(k=2, v=20)]), table,
                    txn=("app", 1))
    V.checkpoint_version(spark, table, num_files=1)  # collapses chain
    # the replay of batch 1 after the compaction: must be a no-op
    latest = V.list_versions(spark, table)[-1]
    assert V.write_version(
        spark.createDataFrame([Row(k=2, v=20)]), table, txn=("app", 1)
    ) == latest
    assert V.read_version(spark, table).count() == 2

    # upsert (content-preserving) also carries the record
    V.upsert_version(spark.createDataFrame([Row(k=1, v=11)]), table, ["k"])
    latest = V.list_versions(spark, table)[-1]
    assert V.write_version(
        spark.createDataFrame([Row(k=2, v=20)]), table, txn=("app", 1)
    ) == latest
    # ...but a PLAIN overwrite resets the history: batch 1 reapplies
    V.write_version(spark.createDataFrame([Row(k=7, v=70)]), table,
                    mode="overwrite")
    V.write_version(spark.createDataFrame([Row(k=2, v=20)]), table,
                    txn=("app", 1))
    got = {r["k"] for r in V.read_version(spark, table).collect()}
    assert got == {7, 2}


def test_stream_with_compaction_keeps_chain_bounded(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    for i in range(6):
        _feed(spark, in_dir, [Row(k=i, v=i * 10)])
        _run_once(spark, in_dir, table, ckpt, compact_chain_at=3,
                  compact_kwargs={"num_files": 1})

    jvm, fs = V._fs(spark, table)
    vs = V.list_versions(spark, table)
    chain = len(V._read_manifest(jvm, fs, table, vs[-1])["dirs"])
    assert chain < 3 or chain == 1
    assert V.read_version(spark, table).count() == 6
    # versions > 6: the compactions add overwrite commits
    assert len(vs) > 6
    # the skipping sidecar swept per batch composes with the log
    # (stats_cols smoke: rerun a fresh table with stats)
    table2 = str(tmp_path / "t2")
    ckpt2 = str(tmp_path / "ckpt2")
    in2 = str(tmp_path / "in2")
    os.makedirs(in2)
    _feed(spark, in2, [Row(k=1, v=10), Row(k=2, v=20)])
    sdf = spark.readStream.schema("k long, v long").parquet(in2)
    q = versioned_ingest_stream(
        sdf, table2, checkpoint=ckpt2, available_now=True,
        stats_cols=["k"],
    )
    assert q.awaitTermination(120)
    df, rep = V.read_version_with_skipping(spark, table2, {"k": (2, 2)})
    assert df.count() == 1
    assert rep["files_total"] >= 1


def test_compaction_keeps_the_skipping_sidecar(spark, tmp_path):
    """Review-caught: the compacted version must stay as skippable as
    the batch directories it replaced — commit_batch forwards the
    stream's stats_cols to checkpoint_if_due."""
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    for i in range(3):
        _feed(spark, in_dir, [Row(k=i * 10, v=i)])
        _run_once(spark, in_dir, table, ckpt, stats_cols=["k"],
                  compact_chain_at=2, compact_kwargs={"num_files": 1})
    # at least one compaction ran (3 batches, chain cap 2)
    jvm, fs = V._fs(spark, table)
    vs = V.list_versions(spark, table)
    assert len(vs) > 3
    # the skipping read works over the COMPACTED latest version
    df, rep = V.read_version_with_skipping(spark, table, {"k": (10, 10)})
    assert [r["k"] for r in df.collect()] == [10]
    assert rep["files_total"] >= 1


def test_compaction_version_race_does_not_fail_the_batch(
    spark, tmp_path, monkeypatch
):
    """Advice-caught: a concurrent writer landing between the batch
    append and the inline compaction makes checkpoint_if_due raise
    VersionConflictError — the micro-batch must NOT fail (the batch's
    own commit already landed; compaction is due again next batch)."""
    import warnings

    from my_feast_spark.streaming import versioned as sv

    calls = {"n": 0}

    def conflicted(*a, **kw):
        calls["n"] += 1
        raise V.VersionConflictError("concurrent writer won")

    monkeypatch.setattr(sv, "checkpoint_if_due", conflicted)

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    _feed(spark, in_dir, [Row(k=1, v=10), Row(k=2, v=20)])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _run_once(spark, in_dir, table, ckpt, compact_chain_at=2)
    assert calls["n"] == 1
    assert any("lost a version race" in str(x.message) for x in w)
    # the batch itself committed despite the failed compaction
    assert V.read_version(spark, table).count() == 2
    assert V.list_versions(spark, table) == [0]


def test_stream_appends_to_a_partitioned_table(spark, tmp_path):
    """Review-caught wedge: an operator partitions the table (or it was
    created partitioned) — the stream's plain appends must ADOPT the
    layout, not die on the mismatch check; and partition_by= on the
    stream itself partitions the table it creates."""
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    # the table pre-exists, hive-partitioned on day
    V.write_version(
        spark.createDataFrame([(0, 0, "d0")], ["k", "v", "day"]),
        table, partition_by=["day"],
    )
    _feed(spark, in_dir, [Row(k=1, v=10, day="d1"),
                          Row(k=2, v=20, day="d2")])
    sdf = spark.readStream.schema("k long, v long, day string").parquet(
        in_dir
    )
    q = versioned_ingest_stream(
        sdf, table, checkpoint=ckpt, available_now=True
    )
    assert q.awaitTermination(120)
    import json as _json

    vs = V.list_versions(spark, table)
    with open(f"{table}/_vlog/{vs[-1]}.json") as fh:
        assert _json.load(fh)["partition_by"] == ["day"]
    got = V.read_version(spark, table)
    assert got.count() == 3
    from pyspark.sql import functions as F

    files = {
        r.f for r in got.where(F.col("day") == "d1")
        .select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert files and all("day=d1" in f for f in files)

    # a stream CREATING a table with partition_by= partitions it
    table2 = str(tmp_path / "table2")
    sdf2 = spark.readStream.schema("k long, v long, day string").parquet(
        in_dir
    )
    q2 = versioned_ingest_stream(
        sdf2, table2, checkpoint=str(tmp_path / "ckpt2"),
        available_now=True, partition_by=["day"],
    )
    assert q2.awaitTermination(120)
    with open(f"{table2}/_vlog/0.json") as fh:
        assert _json.load(fh)["partition_by"] == ["day"]
