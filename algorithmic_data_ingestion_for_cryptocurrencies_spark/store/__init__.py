from .feature_store import FeatureStore  # noqa: F401
