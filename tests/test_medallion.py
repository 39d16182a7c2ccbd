"""Medallion pipeline integration tests (SURVEY §3.2, FIXTURES.md B1/B2/B5).

Both reference chains end-to-end on fixture data:
  taxi:    bronze(map payload) → dynamic key discovery → map-pivot silver
           → hourly gold, with partitioned writes at each hop;
  weather: bronze(JSON string) → typed silver (casts, CASE decode,
           coalesce) → hourly gold with priority-collapse.
Also pins dynamic partition overwrite: rewriting one `created` partition
leaves the others untouched.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from my_feast_spark.functions.scalar import priority_collapse
from my_feast_spark.sources.readers import (
    discover_map_keys,
    map_pivot,
    parse_json_column,
)
from my_feast_spark.sources.writers import write_partitioned

D1, D2 = dt.date(2022, 4, 1), dt.date(2022, 4, 2)
TS = dt.datetime


@pytest.fixture()
def taxi_bronze(spark):
    rows = [
        Row(created=D1, Body={"trip_id": "t1", "taxi_id": "a", "fare": "10.0",
                              "trip_start_timestamp": "2022-04-01 10:05:00"}),
        Row(created=D1, Body={"trip_id": "t2", "taxi_id": "a", "fare": "14.0",
                              "trip_start_timestamp": "2022-04-01 10:55:00",
                              "tips": "2.0"}),  # extra key in some rows only
        Row(created=D2, Body={"trip_id": "t3", "taxi_id": "b", "fare": "7.5",
                              "trip_start_timestamp": "2022-04-02 09:00:00"}),
    ]
    return spark.createDataFrame(rows)


def test_taxi_chain_bronze_silver_gold(spark, taxi_bronze, tmp_path):
    bronze_path = str(tmp_path / "bronze")
    write_partitioned(taxi_bronze, bronze_path, ["created"], mode="append")
    bronze = spark.read.parquet(bronze_path)

    # dynamic schema discovery (two-job op) + map pivot
    keys = discover_map_keys(bronze, "Body")
    assert keys == ["fare", "taxi_id", "tips", "trip_id", "trip_start_timestamp"]
    silver = map_pivot(bronze, "Body", keys, keep=["created"]).select(
        "created", "trip_id", "taxi_id",
        F.col("fare").cast("double").alias("fare"),
        F.col("tips").cast("double").alias("tips"),
        F.to_timestamp("trip_start_timestamp").alias("trip_start"),
    )
    silver_path = str(tmp_path / "silver")
    write_partitioned(silver, silver_path, ["created"], mode="overwrite")
    silver = spark.read.parquet(silver_path)
    assert silver.where(F.col("tips").isNull()).count() == 2  # missing key -> NULL

    gold = (
        silver.groupBy("taxi_id", F.date_trunc("hour", "trip_start").alias("hour_ts"))
        .agg(F.avg("fare").alias("avg_fare"), F.count(F.lit(1)).alias("trips"))
    )
    got = {(r.taxi_id, r.hour_ts): (r.avg_fare, r.trips) for r in gold.collect()}
    assert got == {
        ("a", TS(2022, 4, 1, 10)): (12.0, 2),
        ("b", TS(2022, 4, 2, 9)): (7.5, 1),
    }


def test_dynamic_partition_overwrite_touches_only_written_partition(
    spark, taxi_bronze, tmp_path
):
    path = str(tmp_path / "dyn")
    write_partitioned(taxi_bronze, path, ["created"], mode="overwrite")
    # rewrite ONLY the D2 partition with a single replacement row
    patch = spark.createDataFrame(
        [Row(created=D2, Body={"trip_id": "t3fix", "taxi_id": "b"})]
    )
    write_partitioned(patch, path, ["created"], mode="overwrite")
    back = spark.read.parquet(path)
    assert back.where(F.col("created") == D1).count() == 2  # untouched
    d2 = back.where(F.col("created") == D2).collect()
    assert len(d2) == 1 and d2[0].Body["trip_id"] == "t3fix"


WEATHER_SCHEMA = (
    "station_name string, measurement_timestamp string, air_temperature string, "
    "total_rain string, precipitation_type string, measurement_id string"
)


@pytest.fixture()
def weather_bronze(spark):
    import json

    def body(mid, ts, temp, rain, ptype):
        return json.dumps({
            "station_name": "Oak", "measurement_timestamp": ts,
            "air_temperature": temp, "total_rain": rain,
            "precipitation_type": ptype, "measurement_id": mid,
        })

    rows = [
        Row(Body=body("m1", "2022-04-01 10:05:00", "11.5", "0.0", "0")),
        Row(Body=body("m2", "2022-04-01 10:25:00", "12.5", "1.2", "60")),
        Row(Body=body("m3", "2022-04-01 10:45:00", "10.0", "3.0", "70")),
        Row(Body=body("m4", "2022-04-01 11:05:00", "9.0", None, None)),
    ]
    return spark.createDataFrame(rows)


def test_weather_chain_bronze_silver_gold(spark, weather_bronze):
    parsed = parse_json_column(weather_bronze, "Body", WEATHER_SCHEMA)
    flat = parsed.select("value.*")
    silver = flat.select(
        "measurement_id", "station_name",
        F.to_timestamp("measurement_timestamp").alias("timestamp"),
        F.col("air_temperature").cast("double").alias("air_temperature"),
        # CASE decode (chicago_weather_silver.py:23-27)
        F.when(F.col("precipitation_type") == "0", "no")
        .when(F.col("precipitation_type") == "60", "rain")
        .when(F.col("precipitation_type") == "70", "snow")
        .otherwise(F.col("precipitation_type"))
        .alias("precipitation_type"),
        # NULL coalesce (chicago_weather_hourly_fs.py:36-37)
        F.coalesce(F.col("total_rain").cast("double"), F.lit(0.0)).alias("total_rain"),
    )
    gold = (
        silver.groupBy(F.date_trunc("hour", "timestamp").alias("event_timestamp"))
        .agg(
            F.avg("air_temperature").alias("avg_temp"),
            F.collect_set("precipitation_type").alias("ptypes"),
            F.sum("total_rain").alias("total_rain"),
        )
        .withColumn(
            "precipitation",
            priority_collapse(F.col("ptypes"), ["snow", "rain"], "no"),
        )
    )
    got = {r.event_timestamp: r for r in gold.collect()}
    h10, h11 = got[TS(2022, 4, 1, 10)], got[TS(2022, 4, 1, 11)]
    assert h10.precipitation == "snow"       # snow > rain > no
    assert h10.total_rain == pytest.approx(4.2)
    assert round(h10.avg_temp, 4) == round((11.5 + 12.5 + 10.0) / 3, 4)
    assert h11.precipitation == "no"         # null ptype drops from the set
    assert h11.total_rain == 0.0             # coalesced
