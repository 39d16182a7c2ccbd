from my_feast_spark.core.model import Entity, Feature, FeatureView, FileSource
from my_feast_spark.core.store import FeatureStore

__all__ = ["Entity", "Feature", "FeatureView", "FileSource", "FeatureStore"]
