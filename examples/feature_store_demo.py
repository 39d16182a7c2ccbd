"""End-to-end feature-store walkthrough — the reference's notebook flow
as one runnable script.

Mirrors, step by step, what a user of the reference does across
chicago_taxi_trips_hourly_gold.ipynb + explore_features.ipynb:
gold build (:73-99) → apply definitions (:132-166) → discovery (:404-412)
→ historical point-in-time retrieval (explore_features.ipynb:426-443) →
materialize (:473-479) → online lookup (explore_features.ipynb:608-616).

Run:  python examples/feature_store_demo.py [sf_dir] [repo_dir]
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from my_feast_spark import (
    Entity,
    Feature,
    FeatureStore,
    FeatureView,
    FileSource,
    get_session,
    time_bucket_agg,
)
from my_feast_spark.sources.readers import load_table
from my_feast_spark.sources.writers import write_partitioned


def main(sf_dir: str = "/root/testdata/sf0.001", repo_dir: str | None = None) -> dict:
    spark = get_session(app_name="feature-store-demo")
    repo_dir = repo_dir or tempfile.mkdtemp(prefix="mfs_demo_")

    # 1. Gold build: hourly per-user features from the event stream table
    events = load_table(spark, sf_dir, "events")
    gold = time_bucket_agg(
        events, ["user_id"], "ts",
        {
            "avg_value": ("avg", "value"),
            "sum_value": ("sum", "value"),
            "cnt_events": ("count", "value"),
        },
        bucket="hour", bucket_col="event_timestamp",
    ).withColumn("created", F.col("event_timestamp"))
    gold_path = os.path.join(repo_dir, "gold", "f_user_events_hourly")
    write_partitioned(
        gold.withColumn("created_date", F.to_date("event_timestamp")),
        gold_path, ["created_date"], sort_within=["event_timestamp"],
    )

    # 2. Register entity + feature view
    fs = FeatureStore(os.path.join(repo_dir, "repo"), spark=spark)
    fs.apply([
        Entity(name="user", value_type="INT64", join_keys=["user_id"]),
        FeatureView(
            name="user_events_hourly",
            entities=["user"],
            features=[
                Feature("avg_value", "DOUBLE"),
                Feature("sum_value", "DOUBLE"),
                Feature("cnt_events", "INT64"),
            ],
            source=FileSource(
                path=gold_path,
                timestamp_field="event_timestamp",
                created_timestamp_column="created",
            ),
            ttl=dt.timedelta(days=2),
        ),
    ])

    # 3. Discovery
    views = [fv.name for fv in fs.list_feature_views()]
    entities = [e.name for e in fs.list_entities()]

    # 4. Historical PIT retrieval: enrich each purchase with features as-of
    probes = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("event_timestamp")
    )
    hist = fs.get_historical_features(
        probes,
        ["user_events_hourly:avg_value", "user_events_hourly:cnt_events"],
    )
    hist_df = hist.to_spark_df()
    n_hist = hist_df.count()

    # 5. Materialize latest vectors to the online store, then look some up
    fs.materialize(
        dt.datetime(2024, 1, 1), dt.datetime(2025, 1, 1), ["user_events_hourly"]
    )
    some_users = [r.user_id for r in probes.select("user_id").distinct().limit(3).collect()]
    online = fs.get_online_features(
        [{"user_id": u} for u in some_users],
        ["user_events_hourly:avg_value"],
    )

    out = {
        "views": views,
        "entities": entities,
        "historical_rows": n_hist,
        "online": online,
    }
    print(out)
    return out


if __name__ == "__main__":
    main(*sys.argv[1:])
