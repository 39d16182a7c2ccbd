"""Streaming HLL maintenance (streaming/sketches.py): batch/stream
equality, per-batch generation layout + replay idempotence, and flat
state under in-stream compaction."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from my_feast_spark.operators.sketches import hll_group_distinct
from my_feast_spark.streaming.sketches import (
    hll_ingest_stream,
    hll_stream_estimate,
    read_hll_sketch,
)

P = 9


def _run_batches(spark, tmp, batches, *, compact_every=None, tag=""):
    base = os.path.join(tmp, f"hll{tag}")
    in_dir = os.path.join(base, "in")
    os.makedirs(in_dir)
    sk = os.path.join(base, "sketch")
    ckpt = os.path.join(base, "ckpt")
    for b in batches:
        b.coalesce(1).write.mode("append").parquet(in_dir)
        sdf = spark.readStream.schema("g string, v string").parquet(in_dir)
        q = hll_ingest_stream(
            sdf, sketch_path=sk, checkpoint=ckpt, value_col="v",
            group_cols=["g"], p=P, compact_every=compact_every,
            available_now=True,
        )
        assert q.awaitTermination(300)
    return sk


def _mk(spark, lo, hi, g="a"):
    return spark.range(lo, hi).select(
        F.lit(g).alias("g"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("v"),
    )


def test_stream_equals_batch(spark, tmp_path):
    tmp = str(tmp_path)
    parts = [_mk(spark, 0, 700), _mk(spark, 500, 1_200),
             _mk(spark, 1_100, 2_000)]
    sk = _run_batches(spark, tmp, parts, tag="eq")
    full = parts[0].unionByName(parts[1]).unionByName(parts[2])
    want = {
        (r["g"], r["registers_md5"], r["est_distinct"])
        for r in hll_group_distinct(full, "v", ["g"], p=P).collect()
    }
    got = {
        (r["g"], r["registers_md5"], r["est_distinct"])
        for r in hll_stream_estimate(
            spark, sk, p=P, group_cols=["g"]
        ).collect()
    }
    assert got == want


def test_generation_layout_and_replay_idempotence(spark, tmp_path):
    """Each batch owns a batch_id=N dir; rewriting one (the crash
    replay) leaves the maintained sketch unchanged."""
    tmp = str(tmp_path)
    parts = [_mk(spark, 0, 400), _mk(spark, 300, 800)]
    sk = _run_batches(spark, tmp, parts, tag="replay")
    gens = sorted(
        d for d in os.listdir(sk) if d.startswith("batch_id=")
    )
    assert gens == ["batch_id=0", "batch_id=1"]
    before = {
        (r["g"], r["bucket"], r["rho"])
        for r in read_hll_sketch(spark, sk, group_cols=["g"]).collect()
    }
    # simulate the at-least-once replay of batch 1: same rows, same dir
    from my_feast_spark.operators.sketches import hll_registers

    hll_registers(
        parts[1].select("g", "v"), "v", p=P, group_by=["g"]
    ).write.mode("overwrite").parquet(os.path.join(sk, "batch_id=1"))
    after = {
        (r["g"], r["bucket"], r["rho"])
        for r in read_hll_sketch(spark, sk, group_cols=["g"]).collect()
    }
    assert after == before


def test_compaction_keeps_state_flat_and_equal(spark, tmp_path):
    """8 batches with compact_every=2: generation count stays bounded,
    maintained estimate unchanged vs an uncompacted twin."""
    tmp = str(tmp_path)
    parts = [_mk(spark, i * 150, (i + 1) * 150 + 20) for i in range(8)]
    sk_c = _run_batches(spark, tmp, parts, compact_every=2, tag="c")
    sk_u = _run_batches(spark, tmp, parts, tag="u")

    def gens(path):
        return [d for d in os.listdir(path) if d.startswith("batch_id=")]

    assert len(gens(sk_u)) == 8
    assert len(gens(sk_c)) <= 3  # folded negatives + the newest live ids

    est = lambda p: sorted(  # noqa: E731
        (r["g"], r["registers_md5"], r["est_distinct"])
        for r in hll_stream_estimate(
            spark, p, p=P, group_cols=["g"]
        ).collect()
    )
    assert est(sk_c) == est(sk_u)


def test_read_missing_sketch_is_loud(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="no sketch generations"):
        read_hll_sketch(
            spark, str(tmp_path / "absent"), group_cols=["g"]
        )
