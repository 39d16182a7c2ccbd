"""Streaming materialization test: foreachBatch merge keeps the online
snapshot at latest-per-entity as new gold files arrive."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from my_feast_spark.core import Entity, Feature, FeatureStore, FeatureView, FileSource
from my_feast_spark.streaming import materialize_stream, read_event_stream

TS = dt.datetime


@pytest.fixture()
def gold_dir(spark, tmp_path):
    d = str(tmp_path / "gold_stream")
    batch1 = spark.createDataFrame([
        Row(driver_id="d1", event_timestamp=TS(2024, 1, 1, 10), avg_fare=10.0),
        Row(driver_id="d2", event_timestamp=TS(2024, 1, 1, 10), avg_fare=7.0),
    ])
    batch1.write.mode("overwrite").parquet(d)
    return d


def test_materialize_stream_tracks_latest(spark, gold_dir, tmp_path):
    fs = FeatureStore(str(tmp_path / "repo"), spark=spark)
    fs.apply([
        Entity(name="driver", value_type="STRING", join_keys=["driver_id"]),
        FeatureView(
            name="driver_hourly",
            entities=["driver"],
            features=[Feature("avg_fare", "DOUBLE")],
            source=FileSource(path=gold_dir, timestamp_field="event_timestamp"),
        ),
    ])

    stream = read_event_stream(spark, gold_dir)
    q = materialize_stream(
        fs, "driver_hourly", stream,
        checkpoint=str(tmp_path / "ckpt"), available_now=True,
    )
    q.awaitTermination(120)

    out = fs.get_online_features(
        [{"driver_id": "d1"}, {"driver_id": "d2"}], ["driver_hourly:avg_fare"]
    )
    assert out["avg_fare"] == [10.0, 7.0]

    # a later capture file arrives: d1 advances, d3 appears
    spark.createDataFrame([
        Row(driver_id="d1", event_timestamp=TS(2024, 1, 1, 12), avg_fare=12.5),
        Row(driver_id="d3", event_timestamp=TS(2024, 1, 1, 12), avg_fare=3.0),
    ]).write.mode("append").parquet(gold_dir)

    q2 = materialize_stream(
        fs, "driver_hourly", read_event_stream(spark, gold_dir),
        checkpoint=str(tmp_path / "ckpt"), available_now=True,
    )
    q2.awaitTermination(120)

    out = fs.get_online_features(
        [{"driver_id": "d1"}, {"driver_id": "d2"}, {"driver_id": "d3"}],
        ["driver_hourly:avg_fare"],
    )
    # d1 advanced to the newer hour; d2 unchanged (merge, not replace)
    assert out["avg_fare"] == [12.5, 7.0, 3.0]

    # an OLD row arriving late must not regress the snapshot
    spark.createDataFrame([
        Row(driver_id="d1", event_timestamp=TS(2024, 1, 1, 9), avg_fare=1.0),
    ]).write.mode("append").parquet(gold_dir)
    q3 = materialize_stream(
        fs, "driver_hourly", read_event_stream(spark, gold_dir),
        checkpoint=str(tmp_path / "ckpt"), available_now=True,
    )
    q3.awaitTermination(120)
    out = fs.get_online_features([{"driver_id": "d1"}], ["driver_hourly:avg_fare"])
    assert out["avg_fare"] == [12.5]

def test_batch_then_stream_materialize_preserves_entities(spark, tmp_path):
    """Regression: batch materialize writes the snapshot (WITH a created
    column on the view), then streaming materialization of a later capture
    must MERGE — entities absent from the micro-batch must survive. The
    old bare-except treated the schema mismatch as 'first batch' and
    silently dropped them."""
    gold = str(tmp_path / "gold")
    spark.createDataFrame([
        Row(driver_id="d1", event_timestamp=TS(2024, 1, 1, 10),
            created=TS(2024, 1, 1, 10, 5), avg_fare=10.0),
        Row(driver_id="d2", event_timestamp=TS(2024, 1, 1, 10),
            created=TS(2024, 1, 1, 10, 5), avg_fare=7.0),
    ]).write.mode("overwrite").parquet(gold)

    fs = FeatureStore(str(tmp_path / "repo"), spark=spark)
    fs.apply([
        Entity(name="driver", value_type="STRING", join_keys=["driver_id"]),
        FeatureView(
            name="driver_hourly",
            entities=["driver"],
            features=[Feature("avg_fare", "DOUBLE")],
            source=FileSource(
                path=gold, timestamp_field="event_timestamp",
                created_timestamp_column="created",
            ),
        ),
    ])
    fs.materialize(TS(2024, 1, 1), TS(2024, 1, 2), ["driver_hourly"])
    out = fs.get_online_features(
        [{"driver_id": "d1"}, {"driver_id": "d2"}], ["driver_hourly:avg_fare"]
    )
    assert out["avg_fare"] == [10.0, 7.0]

    # new capture: only d1 advances — d2 must NOT vanish
    spark.createDataFrame([
        Row(driver_id="d1", event_timestamp=TS(2024, 1, 1, 12),
            created=TS(2024, 1, 1, 12, 5), avg_fare=12.5),
    ]).write.mode("append").parquet(gold)
    q = materialize_stream(
        fs, "driver_hourly", read_event_stream(spark, gold),
        checkpoint=str(tmp_path / "ckpt2"), available_now=True,
    )
    q.awaitTermination(120)
    out = fs.get_online_features(
        [{"driver_id": "d1"}, {"driver_id": "d2"}], ["driver_hourly:avg_fare"]
    )
    assert out["avg_fare"] == [12.5, 7.0]


def test_streaming_merge_preserves_bucketed_layout(spark, tmp_path):
    """materialize_stream on a store configured with online_store.buckets
    writes/keeps the __pbucket layout + sidecar across micro-batch
    merges, and lookups stay correct."""
    import os

    import pyspark.sql.functions as F
    from pyspark.sql import Row

    from my_feast_spark.core import (
        Entity, Feature, FeatureStore, FeatureView, FileSource,
    )
    from my_feast_spark.streaming.online import materialize_stream

    TS = dt.datetime
    gold = str(tmp_path / "gold_sb")
    spark.createDataFrame([
        Row(driver_id="d1", event_timestamp=TS(2024, 1, 1, 9),
            created=TS(2024, 1, 1, 9), avg_fare=1.0),
    ]).write.parquet(gold)
    repo = tmp_path / "repo_sb"
    os.makedirs(repo)
    (repo / "feature_store.yaml").write_text(
        "project: p\nprovider: local\nonline_store:\n  buckets: 4\n"
    )
    fs = FeatureStore(str(repo), spark=spark)
    fs.apply([
        Entity(name="driver", value_type="STRING", join_keys=["driver_id"]),
        FeatureView(
            name="v", entities=["driver"],
            features=[Feature("avg_fare", "FLOAT")],
            source=FileSource(path=gold, timestamp_field="event_timestamp",
                              created_timestamp_column="created"),
        ),
    ])
    in_dir = str(tmp_path / "stream_in")
    os.makedirs(in_dir)
    ckpt = str(tmp_path / "ck_sb")

    def push(rows):
        spark.createDataFrame(rows).coalesce(1).write.mode("append").parquet(
            in_dir
        )
        sdf = spark.readStream.schema(
            "driver_id string, event_timestamp timestamp, "
            "created timestamp, avg_fare double"
        ).parquet(in_dir)
        q = materialize_stream(fs, "v", sdf, checkpoint=ckpt,
                               available_now=True)
        assert q.awaitTermination(120)

    push([Row(driver_id="d1", event_timestamp=TS(2024, 1, 1, 10),
              created=TS(2024, 1, 1, 10), avg_fare=5.0),
          Row(driver_id="d7", event_timestamp=TS(2024, 1, 1, 10),
              created=TS(2024, 1, 1, 10), avg_fare=7.0)])
    push([Row(driver_id="d1", event_timestamp=TS(2024, 1, 1, 11),
              created=TS(2024, 1, 1, 11), avg_fare=9.0)])

    snap_dir = fs._online_path("v")
    assert any(d.startswith("__pbucket=") for d in os.listdir(snap_dir))
    assert fs._read_online_buckets(snap_dir) == 4
    got = fs.get_online_features(
        [{"driver_id": "d1"}, {"driver_id": "d7"}], ["v:avg_fare"]
    )
    assert got["avg_fare"] == [9.0, 7.0]

    # incremental merge: a batch touching ONLY d1's bucket must leave
    # every other bucket directory untouched on disk (per-batch cost is
    # the touched buckets, not the store)
    def bucket_files():
        out = {}
        for d in os.listdir(snap_dir):
            if d.startswith("__pbucket="):
                p = os.path.join(snap_dir, d)
                out[d] = sorted(
                    (f, os.path.getmtime(os.path.join(p, f)))
                    for f in os.listdir(p) if not f.startswith((".", "_"))
                )
        return out

    before = bucket_files()
    push([Row(driver_id="d1", event_timestamp=TS(2024, 1, 1, 12),
              created=TS(2024, 1, 1, 12), avg_fare=11.0)])
    after = bucket_files()
    # d1 and d2 must hash to different buckets for the assertion below
    import pyspark.sql.functions as F2
    pbs = {
        r.k: r.pb
        for r in spark.createDataFrame(
            [Row(k="d1"), Row(k="d7")]
        ).select(
            "k", F2.pmod(F2.xxhash64("k"), F2.lit(4)).alias("pb")
        ).collect()
    }
    assert pbs["d1"] != pbs["d7"], "fixture needs distinct buckets"
    d1_dir, d2_dir = f"__pbucket={pbs['d1']}", f"__pbucket={pbs['d7']}"
    assert after[d2_dir] == before[d2_dir], "untouched bucket rewritten"
    assert after[d1_dir] != before[d1_dir]
    got = fs.get_online_features(
        [{"driver_id": "d1"}, {"driver_id": "d7"}], ["v:avg_fare"]
    )
    assert got["avg_fare"] == [11.0, 7.0]
