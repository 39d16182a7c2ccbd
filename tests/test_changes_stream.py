"""The versioned-table change feed as a Structured Streaming source
(sources/changes_stream.py — Delta's readChangeFeed stream, built on
the PySpark 4 Python Data Source API): offsets are commit versions,
partitions are files, workers yield Arrow batches, and replay of a
version range is exactly-once by construction (manifests and sidecars
are immutable)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from my_feast_spark.sources import versioned as V
from my_feast_spark.sources.changes_stream import read_changes_stream


def _run_available_now(sdf, out, ckpt):
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _rows(spark, out):
    return sorted(tuple(r) for r in spark.read.parquet(out).collect())


def test_changes_stream_backlog_resume_and_batch_parity(spark, tmp_path):
    """One AvailableNow run drains the backlog since starting_version
    and matches read_changes event-for-event; a resumed run with the
    SAME checkpoint emits only the commits that landed in between
    (exactly-once across restarts)."""
    path = str(tmp_path / "t")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    V.write_version(
        spark.createDataFrame([(k, k * 10) for k in (1, 2, 3, 4)],
                              ["k", "v"]), path)
    V.write_version(
        spark.createDataFrame([(5, 50), (6, 60)], ["k", "v"]),
        path, mode="append")
    V.upsert_version(
        spark.createDataFrame([(1, 11), (7, 70)], ["k", "v"]), path, ["k"])
    V.delete_version(spark, path, F.col("k") == 2)

    sdf = read_changes_stream(spark, path, starting_version=0)
    assert sdf.columns == ["k", "v", "_change_type", "_commit_version"]
    _run_available_now(sdf, out, ckpt)

    expected = sorted([
        (5, 50, "insert", 1), (6, 60, "insert", 1),
        (1, 10, "update_preimage", 2), (1, 11, "update_postimage", 2),
        (7, 70, "insert", 2),
        (2, 20, "delete", 3),
    ])
    assert _rows(spark, out) == expected
    # event-for-event parity with the batch reader over the same range
    batch = sorted(
        tuple(r) for r in V.read_changes(spark, path, 0, 3).collect()
    )
    assert batch == expected

    # two new commits; the checkpointed resume reads ONLY them —
    # a checkpoint commit advances the offset with zero events
    V.write_version(
        spark.createDataFrame([(8, 80)], ["k", "v"]), path, mode="append")
    V.checkpoint_version(spark, path)
    _run_available_now(sdf, out, ckpt)
    assert _rows(spark, out) == sorted(expected + [(8, 80, "insert", 4)])
    # ... and a third run with nothing new adds nothing
    _run_available_now(sdf, out, ckpt)
    assert _rows(spark, out) == sorted(expected + [(8, 80, "insert", 4)])


def test_changes_stream_defaults_to_latest(spark, tmp_path):
    """Without starting_version the stream begins at the table's
    latest version — history does not replay, only new commits flow
    (Delta's streaming default)."""
    path = str(tmp_path / "t")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    V.write_version(spark.createDataFrame([(1, 10)], ["k", "v"]), path)
    V.write_version(
        spark.createDataFrame([(2, 20)], ["k", "v"]), path, mode="append")

    sdf = read_changes_stream(spark, path)
    _run_available_now(sdf, out, ckpt)  # fixes initialOffset = v1
    V.write_version(
        spark.createDataFrame([(3, 30)], ["k", "v"]), path, mode="append")
    _run_available_now(sdf, out, ckpt)
    assert _rows(spark, out) == [(3, 30, "insert", 2)]


def test_changes_stream_hive_partition_columns_ride_the_path(
    spark, tmp_path
):
    """A hive-partitioned commit stores the partition column in the
    directory path, not the files — the feed reconstructs it (typed by
    the recorded schema) like read_version does."""
    path = str(tmp_path / "t")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    df = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02")], ["k", "d"])
    V.write_version(df, path, partition_by=["d"])
    V.write_version(
        spark.createDataFrame([(3, "2024-01-01")], ["k", "d"]),
        path, mode="append")

    sdf = read_changes_stream(spark, path, starting_version=0)
    _run_available_now(sdf, out, ckpt)
    assert _rows(spark, out) == [(3, "2024-01-01", "insert", 1)]


def test_changes_stream_fails_loud_on_overwrite_and_schema_change(
    spark, tmp_path
):
    """A commit the feed cannot describe (plain overwrite) or a
    mid-stream schema evolution fails the stream loudly at planning
    time (Delta's behavior) — never a silent wrong increment. A
    RESTARTED stream adopts the evolved schema."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    path = str(tmp_path / "t")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    V.write_version(spark.createDataFrame([(1, 10)], ["k", "v"]), path)
    sdf = read_changes_stream(spark, path)
    _run_available_now(sdf, out, ckpt)

    V.write_version(
        spark.createDataFrame([(9, 90)], ["k", "v"]), path,
        mode="overwrite")
    with pytest.raises(StreamingQueryException, match="change feed"):
        _run_available_now(sdf, out, ckpt)

    # schema evolution: the running stream (fixed schema) fails with
    # restart guidance...
    path2 = str(tmp_path / "t2")
    out2, ckpt2 = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    V.write_version(spark.createDataFrame([(1, 10)], ["k", "v"]), path2)
    sdf2 = read_changes_stream(spark, path2)
    _run_available_now(sdf2, out2, ckpt2)
    V.write_version(
        spark.createDataFrame([(2, 20, "en")], ["k", "v", "lang"]),
        path2, mode="append", merge_schema=True)
    with pytest.raises(StreamingQueryException, match="restart"):
        _run_available_now(sdf2, out2, ckpt2)
    # ...and a fresh stream (new schema, new checkpoint) serves the
    # evolved shape, old events NULL-extended
    sdf3 = read_changes_stream(spark, path2, starting_version=0)
    out3, ckpt3 = str(tmp_path / "out3"), str(tmp_path / "ckpt3")
    _run_available_now(sdf3, out3, ckpt3)
    assert _rows(spark, out3) == [(2, 20, "en", "insert", 1)]


def test_changes_stream_fails_loud_when_range_vacuumed(spark, tmp_path):
    """A stream resuming after vacuum reclaimed its unconsumed commits
    fails with re-seed guidance (Delta's deleted-files streaming
    failure), never a silent gap."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    path = str(tmp_path / "t")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    V.write_version(spark.createDataFrame([(1, 10)], ["k", "v"]), path)
    sdf = read_changes_stream(spark, path)
    _run_available_now(sdf, out, ckpt)  # offset fixed at v0

    V.write_version(
        spark.createDataFrame([(2, 20)], ["k", "v"]), path, mode="append")
    V.checkpoint_version(spark, path)
    V.vacuum(spark, path, keep_last=1, grace_seconds=0)  # drops v0/v1
    with pytest.raises(StreamingQueryException, match="vacuum"):
        _run_available_now(sdf, out, ckpt)


def test_changes_stream_hive_escaping_null_and_typed_values(
    spark, tmp_path
):
    """Hive path values round-trip the way Spark wrote them: URL
    escapes decoded (a ':' lands as %3A on disk), the NULL sentinel
    directory back to a real NULL, and non-string partition columns
    cast from the path by the recorded schema."""
    path = str(tmp_path / "t")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    V.write_version(
        spark.createDataFrame([(0, "seed", 0)], ["k", "d", "b"]),
        path, partition_by=["d", "b"])
    sdf = read_changes_stream(spark, path, starting_version=0)
    V.write_version(
        spark.createDataFrame(
            [(1, "a:b", 7), (2, None, 8)], ["k", "d", "b"]),
        path, mode="append")
    _run_available_now(sdf, out, ckpt)
    got = sorted(
        ((r.k, r.d, r.b, r._change_type, r._commit_version)
         for r in spark.read.parquet(out).collect()),
        key=lambda t: t[0],
    )
    assert got == [(1, "a:b", 7, "insert", 1), (2, None, 8, "insert", 1)]


def test_changes_stream_survives_vacuum_of_consumed_prefix(
    spark, tmp_path
):
    """vacuum dropping only already-consumed manifests must NOT kill
    the stream: sidecar commits never need their parent's manifest, so
    the lazy walk stops at the offset without touching it."""
    path = str(tmp_path / "t")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    V.write_version(spark.createDataFrame([(1, 10)], ["k", "v"]), path)
    sdf = read_changes_stream(spark, path)
    _run_available_now(sdf, out, ckpt)  # offset fixed at v0

    V.upsert_version(spark.createDataFrame([(1, 11)], ["k", "v"]),
                     path, ["k"])
    V.upsert_version(spark.createDataFrame([(2, 20)], ["k", "v"]),
                     path, ["k"])
    V.vacuum(spark, path, keep_last=2, grace_seconds=0)  # drops v0 only
    _run_available_now(sdf, out, ckpt)
    assert _rows(spark, out) == sorted([
        (1, 10, "update_preimage", 1), (1, 11, "update_postimage", 1),
        (2, 20, "insert", 2),
    ])


def test_changes_stream_offset_ahead_of_head_is_loud(spark, tmp_path):
    """startingVersion past the table head fails with guidance, never
    an opaque KeyError."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    path = str(tmp_path / "t")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    V.write_version(spark.createDataFrame([(1, 10)], ["k", "v"]), path)
    V.write_version(spark.createDataFrame([(2, 20)], ["k", "v"]),
                    path, mode="append")
    sdf = read_changes_stream(spark, path, starting_version=100)
    with pytest.raises(StreamingQueryException, match="ahead of the table"):
        _run_available_now(sdf, out, ckpt)


# ---- APPLY CHANGES: the consumer half of CDC replication --------------


def test_apply_changes_version_nets_and_records_target_truth(
    spark, tmp_path
):
    """apply_changes_version nets the event stream per key (last
    deciding event by commit wins: insert-then-delete applies as
    nothing, delete-then-reinsert as the final row), no-op deletes of
    absent keys vanish, and the commit's OWN sidecar records ops and
    preimages against the TARGET's state — so a diverged mirror's feed
    still tells its truth."""
    src = str(tmp_path / "src")
    # source history: v0 {1,2,3}; v1 upsert(1->11, +4); v2 delete(2);
    # v3 upsert(+5); v4 delete(5)  -> head {1:11, 3:30, 4:40}
    V.write_version(
        spark.createDataFrame([(k, k * 10) for k in (1, 2, 3)],
                              ["k", "v"]), src)
    V.upsert_version(spark.createDataFrame([(1, 11), (4, 40)],
                                           ["k", "v"]), src, ["k"])
    V.delete_version(spark, src, F.col("k") == 2)
    V.upsert_version(spark.createDataFrame([(5, 50)], ["k", "v"]),
                     src, ["k"])
    V.delete_version(spark, src, F.col("k") == 5)

    # target: a DIVERGED mirror seeded from v0 then drifted (k=2 was
    # already dropped locally, k=1 holds a stale value)
    dst = str(tmp_path / "dst")
    V.write_version(
        spark.createDataFrame([(1, 999), (3, 30)], ["k", "v"]), dst)

    events = V.read_changes(spark, src, 0, 4)
    ver = V.apply_changes_version(events, dst, ["k"])
    assert ver == 1
    got = sorted((r.k, r.v) for r in V.read_version(spark, dst).collect())
    # k=5: inserted then deleted across the range -> nets to nothing;
    # k=2: net delete of a key the target no longer has -> no-op
    assert got == [(1, 11), (3, 30), (4, 40)]

    # the mirror's own feed: ops/preimages relative to the TARGET —
    # k=1 update with the target's stale 999 preimage, k=4 insert,
    # no event at all for the no-op delete of k=2 or the transient k=5
    own = sorted(
        (r.k, r._change_type, r.v)
        for r in V.read_changes(spark, dst, 0, 1).collect()
    )
    assert own == [
        (1, "update_postimage", 11),
        (1, "update_preimage", 999),
        (4, "insert", 40),
    ]

    # replay-by-content: applying the SAME events again changes the
    # table content not at all (the streaming consumer's contract)
    V.apply_changes_version(events, dst, ["k"])
    assert sorted(
        (r.k, r.v) for r in V.read_version(spark, dst).collect()
    ) == got

    # empty net -> None, no commit
    head = V.list_versions(spark, dst)[-1]
    assert V.apply_changes_version(
        V.read_changes(spark, src, 4, 4), dst, ["k"]) is None
    assert V.list_versions(spark, dst)[-1] == head

    # loud guards: missing feed columns / source-evolved extras
    with pytest.raises(ValueError, match="_commit_version"):
        V.apply_changes_version(
            spark.createDataFrame([(1, 1)], ["k", "v"]), dst, ["k"])
    evolved = events.withColumn("lang", F.lit("en"))
    with pytest.raises(V.SchemaEvolutionError, match="evolve the target"):
        V.apply_changes_version(evolved, dst, ["k"])


def test_mirror_changes_stream_replicates_and_chains(spark, tmp_path):
    """End-to-end CDC replication: seed pins offset-then-snapshot,
    the stream applies source commits incrementally, a re-run with the
    same checkpoint is a no-op, and the mirror is itself a servable
    CDC source (feeds chain)."""
    from my_feast_spark.streaming import mirror_changes_stream

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    V.write_version(
        spark.createDataFrame([(k, k * 10) for k in (1, 2, 3)],
                              ["k", "v"]), src)
    V.upsert_version(spark.createDataFrame([(1, 11)], ["k", "v"]),
                     src, ["k"])

    def src_rows():
        return sorted(
            (r.k, r.v) for r in V.read_version(spark, src).collect()
        )

    def dst_rows():
        return sorted(
            (r.k, r.v) for r in V.read_version(spark, dst).collect()
        )

    q = mirror_changes_stream(
        spark, src, dst, ["k"], checkpoint=ckpt, available_now=True)
    q.awaitTermination(180)
    assert dst_rows() == src_rows()  # seed snapshot covers v0-v1

    # new source commits flow through on the next run
    V.upsert_version(spark.createDataFrame([(4, 40)], ["k", "v"]),
                     src, ["k"])
    V.delete_version(spark, src, F.col("k") == 2)
    q = mirror_changes_stream(
        spark, src, dst, ["k"], checkpoint=ckpt, available_now=True,
        seed=False, starting_version=1)
    q.awaitTermination(180)
    assert dst_rows() == src_rows() == [(1, 11), (3, 30), (4, 40)]

    # replay with the same checkpoint: content-idempotent no-op
    head = V.list_versions(spark, dst)[-1]
    q = mirror_changes_stream(
        spark, src, dst, ["k"], checkpoint=ckpt, available_now=True,
        seed=False, starting_version=1)
    q.awaitTermination(180)
    assert dst_rows() == src_rows()
    assert V.list_versions(spark, dst)[-1] == head  # nothing new applied

    # the mirror chains: its own change feed serves the applied commits
    mirrored = V.read_changes(spark, dst, 0)
    assert {r._change_type for r in mirrored.collect()} <= {
        "insert", "update_preimage", "update_postimage", "delete"}
    # seeding guard: a second seed into the same target is loud
    with pytest.raises(ValueError, match="seed=False"):
        mirror_changes_stream(
            spark, src, dst, ["k"], checkpoint=ckpt, available_now=True)


def test_apply_changes_guards_ties_and_noop_batches(spark, tmp_path):
    """Intra-commit key ties refuse loudly (an arbitrary winner would
    silently diverge the mirror — Delta's multiple-source-rows MERGE
    error); a batch netting to ONLY no-op deletes of absent keys
    commits nothing (probe-confirmed contract: no spurious
    content-identical versions)."""
    src = str(tmp_path / "src")
    # an append that deliberately duplicates a key (the log permits it;
    # keyed consumers must refuse)
    V.write_version(spark.createDataFrame([(1, 10)], ["k", "v"]), src)
    V.write_version(
        spark.createDataFrame([(2, 20), (2, 21)], ["k", "v"]),
        src, mode="append")
    dst = str(tmp_path / "dst")
    V.write_version(spark.createDataFrame([(1, 10)], ["k", "v"]), dst)
    with pytest.raises(ValueError, match="multiple deciding"):
        V.apply_changes_version(V.read_changes(spark, src, 0), dst, ["k"])

    # transient key: inserted in v1', deleted in v2' — nets to a delete
    # of a key the target never had -> None, no commit, no version churn
    src2 = str(tmp_path / "src2")
    V.write_version(spark.createDataFrame([(1, 10)], ["k", "v"]), src2)
    V.write_version(spark.createDataFrame([(9, 90)], ["k", "v"]),
                    src2, mode="append")
    V.delete_version(spark, src2, F.col("k") == 9)
    dst2 = str(tmp_path / "dst2")
    V.write_version(spark.createDataFrame([(1, 10)], ["k", "v"]), dst2)
    head = V.list_versions(spark, dst2)[-1]
    assert V.apply_changes_version(
        V.read_changes(spark, src2, 0), dst2, ["k"]) is None
    assert V.list_versions(spark, dst2)[-1] == head


def test_mirror_seed_is_crash_recoverable_and_loud_on_empty_source(
    spark, tmp_path
):
    """The seed commit records its pinned source version, so a crash
    between seed and first checkpoint recovers by rerunning seed=True;
    an empty source fails loudly, and seeding over a non-seed head
    keeps the explicit-resume guidance."""
    from my_feast_spark.streaming import mirror_changes_stream

    with pytest.raises(FileNotFoundError, match="nothing to mirror"):
        mirror_changes_stream(
            spark, str(tmp_path / "nosrc"), str(tmp_path / "nodst"),
            ["k"], checkpoint=str(tmp_path / "nock"))

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    V.write_version(spark.createDataFrame([(1, 10)], ["k", "v"]), src)
    V.write_version(spark.createDataFrame([(2, 20)], ["k", "v"]),
                    src, mode="append")

    # emulate crash-after-seed: seed manually the way the helper does,
    # recording the pinned version, with NO stream checkpoint written
    V.write_version(
        V.read_version(spark, src, 1), dst,
        _manifest_extra={"mirror_starting_version": 1})
    V.write_version(spark.createDataFrame([(3, 30)], ["k", "v"]),
                    src, mode="append")  # lands "mid-crash"

    # rerun with seed=True: resumes from the RECORDED pin — the
    # mid-crash commit replays into the feed, nothing lost
    q = mirror_changes_stream(
        spark, src, dst, ["k"], checkpoint=ckpt, available_now=True)
    assert q.awaitTermination(180)
    assert sorted(
        (r.k, r.v) for r in V.read_version(spark, dst).collect()
    ) == [(1, 10), (2, 20), (3, 30)]

    # once applies landed the head is no longer the seed commit:
    # seed=True now demands the explicit seed=False resume
    with pytest.raises(ValueError, match="seed=False"):
        mirror_changes_stream(
            spark, src, dst, ["k"],
            checkpoint=str(tmp_path / "ckpt2"))


def test_read_changes_between_resolves_the_timestamp_axis(
    spark, tmp_path
):
    """The timestamp-axis feed resolves commit publish times through
    the manifests' committed_at (the TIMESTAMP AS OF contract) and
    keeps the (since, until] event semantics."""
    import json as _json

    path = str(tmp_path / "t")
    V.write_version(spark.createDataFrame([(1, 10)], ["k", "v"]), path)
    V.write_version(spark.createDataFrame([(2, 20)], ["k", "v"]),
                    path, mode="append")
    V.upsert_version(spark.createDataFrame([(1, 11)], ["k", "v"]),
                     path, ["k"])

    def committed_at(v):
        with open(f"{path}/_vlog/{v}.json") as fh:
            return _json.load(fh)["committed_at"]

    # "changes since just after v0 landed": both later commits
    got = sorted(
        (r.k, r._change_type, r._commit_version)
        for r in V.read_changes_between(
            spark, path, committed_at(0)).collect()
    )
    assert got == [
        (1, "update_postimage", 2), (1, "update_preimage", 2),
        (2, "insert", 1),
    ]
    # bounded window ending at v1's publish time excludes the upsert
    sub = sorted(
        (r.k, r._change_type)
        for r in V.read_changes_between(
            spark, path, committed_at(0), committed_at(1)).collect()
    )
    assert sub == [(2, "insert")]
    # a window before retained history is the version_at_timestamp error
    with pytest.raises(ValueError, match="oldest retained"):
        V.read_changes_between(spark, path, committed_at(0) - 10_000)
