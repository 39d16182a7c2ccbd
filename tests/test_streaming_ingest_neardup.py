"""Streaming NEAR-dup ingest: each micro-batch's MinHash band buckets
collide against the accumulated signature index, so re-crawled
near-duplicates (not just byte-identical content) never land twice —
across batches or across restarts."""

from __future__ import annotations

import os

from pyspark.sql import Row

from my_feast_spark.streaming.ingest import near_dedup_ingest_stream

#: near-identical long texts: ~20 shared tokens, one token differs ->
#: 3-gram Jaccard (and its signature estimate) well above 0.5
BASE = ("the quick brown fox jumps over the lazy dog while rain falls "
        "softly on the quiet green valley below tonight")
NEAR = BASE.replace("tonight", "today")
OTHER = ("completely different content about spark shuffles partitions "
         "exchanges codegen broadcast joins and adaptive execution plans")
SHORT = "tiny"  # < n tokens: no shingles, always accepted


def _run(spark, in_dir, out, idx, ckpt):
    sdf = spark.readStream.schema("doc_id long, text string").parquet(in_dir)
    q = near_dedup_ingest_stream(
        sdf, out_path=out, index_path=idx, checkpoint=ckpt,
        threshold=0.5, available_now=True,
    )
    assert q.awaitTermination(180)


def test_near_dups_drop_across_batches(spark, tmp_path):
    in_dir = str(tmp_path / "incoming")
    out = str(tmp_path / "corpus")
    idx = str(tmp_path / "mh_index")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    # crawl 1: an in-batch near-dup pair + a distinct doc + a short doc
    spark.createDataFrame([
        Row(doc_id=1, text=BASE),
        Row(doc_id=2, text=NEAR),     # near-dup of 1, same batch
        Row(doc_id=3, text=OTHER),
        Row(doc_id=4, text=SHORT),    # < n tokens: unconditionally kept
    ]).coalesce(1).write.mode("append").parquet(in_dir)
    _run(spark, in_dir, out, idx, ckpt)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 3, 4}

    # crawl 2: a near-dup of batch-1 content + a genuinely new doc
    spark.createDataFrame([
        Row(doc_id=10, text=NEAR),    # near-dup of accepted doc 1
        Row(doc_id=11, text="entirely novel words about feature stores "
                            "materialization and online serving layers"),
    ]).coalesce(1).write.mode("append").parquet(in_dir)
    _run(spark, in_dir, out, idx, ckpt)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 3, 4, 11}

    # the index holds band rows and signatures for ACCEPTED signed docs
    # only (the short doc has no signature)
    sig_docs = {r.doc for r in spark.read.parquet(f"{idx}/sigs").collect()}
    assert sig_docs == {1, 3, 11}
    band_docs = {r.doc for r in spark.read.parquet(f"{idx}/bands").collect()}
    assert band_docs == {1, 3, 11}


def test_replay_is_idempotent(spark, tmp_path):
    """A crash between the sink writes and the streaming commit replays
    the batch: it must neither self-reject (anti-join against its own
    index rows) nor double-write."""
    in_dir = str(tmp_path / "incoming")
    out = str(tmp_path / "corpus")
    idx = str(tmp_path / "mh_index")
    os.makedirs(in_dir)
    spark.createDataFrame([
        Row(doc_id=1, text=BASE),
        Row(doc_id=2, text=OTHER),
    ]).coalesce(1).write.mode("append").parquet(in_dir)

    _run(spark, in_dir, out, idx, str(tmp_path / "ckpt1"))
    # replay: same input, fresh checkpoint -> batch 0 again
    _run(spark, in_dir, out, idx, str(tmp_path / "ckpt2"))
    rows = spark.read.parquet(out).collect()
    assert {r.doc_id for r in rows} == {1, 2}
    assert len(rows) == 2, "replay double-appended"


def test_no_pinned_blocks_survive_batches(spark, tmp_path):
    """Each batch pins its signature checkpoint for the batch's joins
    and must release it before returning."""
    in_dir = str(tmp_path / "incoming")
    os.makedirs(in_dir)
    spark.createDataFrame(
        [Row(doc_id=1, text=BASE), Row(doc_id=2, text=OTHER)]
    ).coalesce(1).write.mode("append").parquet(in_dir)
    base = {
        int(k)
        for k in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    _run(spark, in_dir, str(tmp_path / "c"), str(tmp_path / "i"),
         str(tmp_path / "k"))
    now = {
        int(k)
        for k in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    assert now - base == set(), "ingest batch leaked checkpoint blocks"
