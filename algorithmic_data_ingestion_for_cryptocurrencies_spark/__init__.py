"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference crypto ingestion platform
(`MrMenth0l/algorithmic-data-ingestion-for-cryptocurrencies`), rebuilt
Spark-first: DataFrame/SQL + Catalyst + Structured Streaming.

Layout
------
- ``session``    : tuned SparkSession factory (UTC, AQE, Arrow).
- ``schemas``    : canonical domain StructTypes + coerce helpers.
- ``functions``  : scalar helpers (time normalization, cleaning).
- ``operators``  : rolling windows, EWM, TA indicators, order-book
                   microstructure, resample, as-of joins, labels,
                   dedup / similarity / text analysis.
- ``sources``    : partitioned Parquet lake read/write.
- ``store``      : feature store (point / batch / range reads, gaps,
                   retention).
- ``streaming``  : Structured Streaming ingest, stateful continuity,
                   dedup streams.
- ``datasets``   : training-matrix builders.
"""

__version__ = "0.1.0"
