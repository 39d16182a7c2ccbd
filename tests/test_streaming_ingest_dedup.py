"""Streaming incremental-dedup ingest: each micro-batch anti-joins its
content fingerprints against the accumulated index, so re-crawled
content never lands twice — across batches OR across restarts."""

from __future__ import annotations

import pytest

import os

from pyspark.sql import Row

from my_feast_spark.streaming.ingest import dedup_ingest_stream


def _run_available(spark, in_dir, out, idx, ckpt):
    sdf = spark.readStream.schema("doc_id long, text string").parquet(in_dir)
    q = dedup_ingest_stream(
        sdf, out_path=out, index_path=idx, checkpoint=ckpt,
        available_now=True,
    )
    assert q.awaitTermination(120)


def test_dedup_ingest_drops_recrawled_content(spark, tmp_path):
    in_dir = str(tmp_path / "incoming")
    out = str(tmp_path / "corpus")
    idx = str(tmp_path / "fp_index")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    # crawl 1: one in-batch duplicate pair (ids 1/2 same text)
    spark.createDataFrame([
        Row(doc_id=1, text="alpha beta gamma"),
        Row(doc_id=2, text="alpha beta gamma"),
        Row(doc_id=3, text="delta epsilon"),
    ]).coalesce(1).write.mode("append").parquet(in_dir)
    _run_available(spark, in_dir, out, idx, ckpt)

    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {1, 3}, "in-batch dup must keep the min-id winner"

    # crawl 2: one re-crawl of batch-1 content + one genuinely new doc
    spark.createDataFrame([
        Row(doc_id=10, text="alpha beta gamma"),   # seen in crawl 1
        Row(doc_id=11, text="zeta eta theta"),      # new
    ]).coalesce(1).write.mode("append").parquet(in_dir)
    _run_available(spark, in_dir, out, idx, ckpt)

    rows = spark.read.parquet(out).collect()
    assert {r.doc_id for r in rows} == {1, 3, 11}
    # index holds exactly the accepted fingerprints
    fps = [r.fingerprint for r in spark.read.parquet(idx).collect()]
    assert sorted(fps) == sorted({r.fingerprint for r in rows})
    # every accepted fingerprint is unique corpus-wide
    assert len({r.fingerprint for r in rows}) == len(rows)


def test_batch_replay_does_not_destroy_output(spark, tmp_path):
    """Crash-replay shape: if a batch's sinks were written but the
    streaming commit was lost, the batch replays — it must NOT
    anti-join against its own fingerprints (that would overwrite its
    output with an empty dataset). Simulated by re-running the same
    input with a FRESH checkpoint, so batch 0 is processed again."""

    in_dir = str(tmp_path / "incoming")
    out = str(tmp_path / "corpus")
    idx = str(tmp_path / "fp_index")
    os.makedirs(in_dir)
    spark.createDataFrame([
        Row(doc_id=1, text="alpha beta"),
        Row(doc_id=2, text="gamma delta"),
    ]).coalesce(1).write.mode("append").parquet(in_dir)

    _run_available(spark, in_dir, out, idx, str(tmp_path / "ckpt1"))
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 2}

    # replay: same input, fresh checkpoint -> batch_id 0 again
    _run_available(spark, in_dir, out, idx, str(tmp_path / "ckpt2"))
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {1, 2}, f"replay destroyed the batch output: {got}"


def test_fs_nonempty_probes_through_hadoop(spark, tmp_path):
    """The index probe must go through Hadoop's FileSystem, not
    os.path: scheme-qualified paths (file://) and hidden-only
    directories (_SUCCESS, .crc) must answer like the local check did,
    and non-local schemes get a real probe instead of a silent False."""
    from my_feast_spark.streaming.ingest import _fs_nonempty

    missing = str(tmp_path / "nope")
    assert _fs_nonempty(spark, missing) is False

    hidden_only = tmp_path / "hidden"
    hidden_only.mkdir()
    (hidden_only / "_SUCCESS").write_text("")
    (hidden_only / ".part.crc").write_text("")
    assert _fs_nonempty(spark, str(hidden_only)) is False

    real = tmp_path / "real"
    real.mkdir()
    (real / "batch_id=0").mkdir()
    assert _fs_nonempty(spark, str(real)) is True
    # scheme-qualified path resolves through the same FileSystem API
    assert _fs_nonempty(spark, f"file://{real}") is True


@pytest.mark.slow  # flat-vs-bucketed twin-run equivalence probe (26s) — slow tier, see pytest.ini
def test_bucketed_index_matches_flat_and_prunes(spark, tmp_path):
    """index_buckets changes the fingerprint-index LAYOUT only: the
    bucketed stream accepts exactly what the flat stream accepts, the
    index lands under pbucket=K partition directories, and a
    probe-style partition filter reads a strict subset of the index
    files — per-batch index scan cost stays bounded by the batch's own
    bucket set instead of the whole corpus."""
    from pyspark.sql import functions as F

    flat_in = str(tmp_path / "in_flat")
    buck_in = str(tmp_path / "in_buck")
    os.makedirs(flat_in)
    os.makedirs(buck_in)
    batches = [
        [Row(doc_id=1, text="alpha beta gamma"),
         Row(doc_id=2, text="alpha beta gamma"),
         Row(doc_id=3, text="delta epsilon")],
    ] + [
        [Row(doc_id=10 * b + 1, text="alpha beta gamma"),  # re-crawl
         Row(doc_id=10 * b + 2, text=f"fresh content number {b}")]
        for b in range(1, 6)
    ]
    results = {}
    for key, in_dir, nb in (("flat", flat_in, None), ("buck", buck_in, 8)):
        out = str(tmp_path / f"out_{key}")
        idx = str(tmp_path / f"idx_{key}")
        for bi, rows in enumerate(batches):
            spark.createDataFrame(rows).coalesce(1).write.mode(
                "append"
            ).parquet(in_dir)
            sdf = spark.readStream.schema(
                "doc_id long, text string"
            ).parquet(in_dir)
            q = dedup_ingest_stream(
                sdf, out_path=out, index_path=idx,
                checkpoint=str(tmp_path / f"ck_{key}"),
                index_buckets=nb, available_now=True,
            )
            assert q.awaitTermination(120)
        results[key] = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert results["flat"] == results["buck"]
    assert results["flat"] == {1, 3, 12, 22, 32, 42, 52}

    idx = str(tmp_path / "idx_buck")

    def files_read(df):
        # post-pruning file set: inputFiles() reflects the UNFILTERED
        # relation, so probe what the executed scan actually touches
        return {
            r.f
            for r in df.select(F.input_file_name().alias("f"))
            .distinct()
            .collect()
        }

    every = files_read(spark.read.parquet(idx))
    assert any("pbucket=" in f for f in every)
    some_pb = sorted(
        {int(f.split("pbucket=")[1].split("/")[0]) for f in every}
    )[0]
    pruned = files_read(
        spark.read.parquet(idx).filter(F.col("pbucket") == some_pb)
    )
    assert pruned and pruned < every


def test_legacy_index_adoption_is_layout_checked(spark, tmp_path):
    """Pre-marker indexes (built before _mfs_index_meta.json existed)
    used to adopt the resuming stream's config silently — the r15
    verdict's "one unverifiable generation". The bucketed-vs-flat axis
    IS verifiable from the pbucket= directory structure, so a resume
    that contradicts it must fail loudly, including AFTER a standalone
    compaction has rewritten the generations (the verdict's ask-5
    scenario)."""
    import pytest as _pytest

    from my_feast_spark.streaming.ingest import compact_ingest_indexes

    in_dir = str(tmp_path / "incoming")
    out = str(tmp_path / "corpus")
    idx = str(tmp_path / "fp_index")
    os.makedirs(in_dir)
    spark.createDataFrame([
        Row(doc_id=1, text="alpha beta"),
        Row(doc_id=2, text="gamma delta"),
        Row(doc_id=3, text="epsilon zeta"),
    ]).coalesce(1).write.mode("append").parquet(in_dir)

    # build a FLAT index, then simulate a pre-marker generation by
    # deleting the marker, and age it through a standalone compaction
    _run_available(spark, in_dir, out, idx, str(tmp_path / "ck1"))
    marker = os.path.join(idx, "_mfs_index_meta.json")
    os.remove(marker)
    spark.createDataFrame(
        [Row(doc_id=4, text="eta theta")]
    ).coalesce(1).write.mode("append").parquet(in_dir)
    _run_available(spark, in_dir, out, idx, str(tmp_path / "ck1"))
    os.remove(marker)
    compact_ingest_indexes(spark, idx)
    assert not os.path.exists(marker)

    # resuming the legacy FLAT index with a bucketed config is loud
    sdf = spark.readStream.schema("doc_id long, text string").parquet(
        in_dir
    )
    with _pytest.raises(ValueError, match="FLAT"):
        dedup_ingest_stream(
            sdf, out_path=out, index_path=idx,
            checkpoint=str(tmp_path / "ck2"),
            index_buckets=8, available_now=True,
        )
    assert not os.path.exists(marker), "failed start must not stamp"

    # a layout-consistent resume adopts — with a warning and a stamped
    # marker recording the adoption
    import json as _json
    import warnings as _warnings

    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        _run_available(spark, in_dir, out, idx, str(tmp_path / "ck3"))
    assert any("pre-marker" in str(w.message) for w in caught)
    stamped = _json.load(open(marker))
    assert stamped["legacy_adopted"] is True
    assert stamped["index_buckets"] is None

    # ... and from now on the marker governs: a later bucketed resume
    # fails on the stored contract, not the inference
    with _pytest.raises(ValueError, match="different layout"):
        dedup_ingest_stream(
            sdf, out_path=out, index_path=idx,
            checkpoint=str(tmp_path / "ck4"),
            index_buckets=8, available_now=True,
        )


def test_legacy_bucketed_index_rejects_flat_and_wrong_B(spark, tmp_path):
    """The other direction of the layout check: a pre-marker BUCKETED
    index must reject a flat resume and a bucket count the observed
    pbucket= values already exceed."""
    import pytest as _pytest

    in_dir = str(tmp_path / "incoming")
    out = str(tmp_path / "corpus")
    idx = str(tmp_path / "fp_index")
    os.makedirs(in_dir)
    spark.createDataFrame([
        Row(doc_id=i, text=f"text number {i}") for i in range(1, 9)
    ]).coalesce(1).write.mode("append").parquet(in_dir)

    sdf = spark.readStream.schema("doc_id long, text string").parquet(
        in_dir
    )
    q = dedup_ingest_stream(
        sdf, out_path=out, index_path=idx,
        checkpoint=str(tmp_path / "ck1"),
        index_buckets=4, available_now=True,
    )
    assert q.awaitTermination(120)
    marker = os.path.join(idx, "_mfs_index_meta.json")
    os.remove(marker)

    with _pytest.raises(ValueError, match="pbucket= partition"):
        dedup_ingest_stream(
            sdf, out_path=out, index_path=idx,
            checkpoint=str(tmp_path / "ck2"), available_now=True,
        )
    # 8 docs over 4 buckets: some pbucket >= 2 exists with near
    # certainty; compute the bound from the directory names to keep the
    # assertion deterministic
    pbs = [
        int(d.split("=", 1)[1])
        for bd in os.listdir(idx) if bd.startswith("batch_id=")
        for d in os.listdir(os.path.join(idx, bd))
        if d.startswith("pbucket=")
    ]
    too_small = max(pbs)  # any B <= max observed pbucket must fail
    if too_small >= 1:
        with _pytest.raises(ValueError, match="bucket counts differ"):
            dedup_ingest_stream(
                sdf, out_path=out, index_path=idx,
                checkpoint=str(tmp_path / "ck3"),
                index_buckets=too_small, available_now=True,
            )
