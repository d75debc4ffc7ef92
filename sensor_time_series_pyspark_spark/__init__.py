"""sensor_time_series_pyspark_spark — a PySpark-native sensor time-series
analytics engine.

A ground-up, idiomatic-Spark rebuild of the capabilities of the reference
repo ``badkoubeh/sensor-time-series-pyspark`` (seven ad-hoc scripts; see
SURVEY.md): star-schema ETL with long→wide pivot, dimension joins,
imputation, window features, per-series forecasting via Arrow-batched
pandas UDFs, and ML pipelines — plus the large-scale training-data
operators the reference lacks (dedup, similarity search, text analysis,
multimodal columns, structured streaming ingestion).

Design stance (SURVEY.md §7):
- DataFrame-in → DataFrame-out operators; no SparkSession at import time.
- Declarative plans: let Catalyst push filters/prune columns/pick joins.
- AQE on; broadcast hints only where Spark can't see smallness.
- Pandas UDFs (Arrow) only where built-ins genuinely can't express the
  semantics (per-series model fitting); never row-at-a-time Python UDFs.
"""

__version__ = "0.1.0"
