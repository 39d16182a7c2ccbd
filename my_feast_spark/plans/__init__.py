from my_feast_spark.plans.retrieval import RetrievalJob, build_historical_retrieval

__all__ = ["RetrievalJob", "build_historical_retrieval"]
