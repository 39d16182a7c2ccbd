from my_feast_spark.operators.asof_join import point_in_time_join
from my_feast_spark.operators.aggregations import latest_per_key, time_bucket_agg

__all__ = ["point_in_time_join", "time_bucket_agg", "latest_per_key"]
