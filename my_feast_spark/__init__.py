"""my_feast_spark — a PySpark-native feature-store / analytics engine.

A from-scratch, Spark-first implementation of the query and data-processing
capabilities of the reference feature-store platform (danielfaioli/my-feast):
medallion batch pipelines, point-in-time-correct historical feature
retrieval, registry/catalog API, materialization + online lookup, streaming
ingest — plus large-scale training-data-pipeline operators (deduplication,
similarity search, text analysis, multimodal plumbing).

Everything is expressed through the DataFrame API so Catalyst/Tungsten pick
the physical plan; Python stays on the driver except for a small number of
Arrow-batched Pandas UDFs in the extension operators.
"""

from my_feast_spark.core import Entity, Feature, FeatureStore, FeatureView, FileSource
from my_feast_spark.operators.aggregations import (
    latest_per_key,
    scd2_intervals,
    scd2_lookup,
    time_bucket_agg,
)
from my_feast_spark.operators.asof_join import point_in_time_join
from my_feast_spark.session import get_session, session_confs

__all__ = [
    "Entity",
    "Feature",
    "FeatureStore",
    "FeatureView",
    "FileSource",
    "get_session",
    "latest_per_key",
    "scd2_intervals",
    "scd2_lookup",
    "point_in_time_join",
    "session_confs",
    "time_bucket_agg",
]

__version__ = "0.1.0"
