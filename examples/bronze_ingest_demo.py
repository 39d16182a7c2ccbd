"""Bronze-ingest walkthrough — every source family the engine scans,
chained into one medallion flow.

The reference's ingest surface is (a) a paginated Socrata API pulled
driver-side (ingest scripts), (b) Event-Hub-captured Avro files
(chicago_weather_bronze.py:10-12), and (c) CSV drops that arrive
untyped. This demo runs all three against local stand-ins and lands one
silver table:

  1. paginated API  -> staged-parquet bronze chunks (sources/paginated.py)
  2. Avro capture   -> avro_scan (native jar when present, else the
                       distributed pure-Python container decode)
  3. CSV w/ header  -> all-string scan -> typed silver casts
  4. union -> silver -> partitioned parquet write (dynamic overwrite)

Run:  python examples/bronze_ingest_demo.py [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from my_feast_spark import get_session
from my_feast_spark.sources.avro_io import avro_scan, write_avro_file
from my_feast_spark.sources.paginated import read_paginated
from my_feast_spark.sources.readers import read_csv_header
from my_feast_spark.sources.writers import write_partitioned


AVRO_SCHEMA = {
    "type": "record",
    "name": "Reading",
    "fields": [
        {"name": "station_id", "type": "long"},
        {"name": "day", "type": "string"},
        {"name": "temp", "type": "double"},
        {"name": "note", "type": ["null", "string"]},
    ],
}


def main(out_dir: str | None = None) -> dict:
    spark = get_session(app_name="bronze-ingest-demo")
    out_dir = out_dir or tempfile.mkdtemp(prefix="mfs_bronze_")

    # 1. paginated API -> staged bronze (serial cursor, bounded buffering)
    api_rows = [
        {"station_id": i % 4, "day": f"2024-01-{(i % 9) + 1:02d}",
         "temp": 10.0 + (i % 15)}
        for i in range(450)
    ]
    api_df = read_paginated(
        spark,
        lambda off: api_rows[off:off + 200],
        os.path.join(out_dir, "stage_api"),
        schema="station_id long, day string, temp double",
        stage_every=200,
    ).withColumn("src", F.lit("api"))

    # 2. Avro capture files -> avro_scan
    cap_dir = os.path.join(out_dir, "capture")
    os.makedirs(cap_dir, exist_ok=True)
    cap_rows = [
        {"station_id": i % 4, "day": f"2024-02-{(i % 9) + 1:02d}",
         "temp": 5.0 + (i % 20), "note": None if i % 3 else "qc"}
        for i in range(300)
    ]
    for part in range(3):
        write_avro_file(
            os.path.join(cap_dir, f"part-{part}.avro"),
            AVRO_SCHEMA, cap_rows[part::3],
        )
    cap_df = (
        avro_scan(spark, cap_dir)
        .select("station_id", "day", "temp")
        .withColumn("src", F.lit("capture"))
    )

    # 3. untyped CSV drop -> silver casts
    csv_path = os.path.join(out_dir, "drop.csv")
    with open(csv_path, "w") as fh:
        fh.write("station_id,day,temp\n")
        for i in range(50):
            fh.write(f"{i % 4},2024-03-{(i % 9) + 1:02d},{20 + i % 5}.5\n")
    csv_df = read_csv_header(spark, csv_path).select(
        F.col("station_id").cast("long").alias("station_id"),
        F.col("day").alias("day"),
        F.col("temp").cast("double").alias("temp"),
    ).withColumn("src", F.lit("csv"))

    # 4. union -> silver daily aggregate -> partitioned write
    bronze = api_df.unionByName(cap_df).unionByName(csv_df)
    silver = bronze.groupBy("station_id", "day").agg(
        F.round(F.avg("temp"), 4).alias("avg_temp"),
        F.count(F.lit(1)).alias("n_readings"),
    )
    silver_path = os.path.join(out_dir, "silver_daily")
    write_partitioned(silver, silver_path, ["day"])

    back = spark.read.parquet(silver_path)
    result = {
        "bronze_rows": bronze.count(),
        "bronze_by_src": {
            r.src: r.n for r in
            bronze.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()
        },
        "silver_rows": back.count(),
        "partitions": len([
            d for d in os.listdir(silver_path) if d.startswith("day=")
        ]),
    }
    return result


if __name__ == "__main__":
    print(main(*sys.argv[1:]))
