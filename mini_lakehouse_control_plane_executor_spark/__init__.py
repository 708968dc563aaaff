"""mini_lakehouse_control_plane_executor_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query + data-processing capabilities of the
reference mini-lakehouse (Go/Rust coordinator+worker system) as an idiomatic
Spark library:

- ``session``     — SparkSession factory tuned for the test harness.
- ``table``       — Delta-style JSON transaction log: ACID append commits with
                    optimistic concurrency, txn-id idempotency, snapshot
                    isolation / time travel, compaction.
- ``plans``       — structured-query (filter/projection/group_by/aggregates)
                    → DataFrame translation, mirroring the reference's
                    ``SimpleQuery`` REST surface.
- ``functions``   — filter-grammar parser + scalar helpers (text stats,
                    vector math) built on ``pyspark.sql.functions``.
- ``operators``   — beyond-reference operators for training-data pipelines:
                    dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard),
                    embedding similarity search, text analysis, multimodal
                    column plumbing.
- ``streaming``   — Structured Streaming versions of the event-table
                    aggregations (watermarks, windows, stateful ops).

Everything is DataFrame/Catalyst-first; Python UDFs appear only as
Arrow-batched pandas UDFs where built-ins genuinely cannot express the op.
"""

from mini_lakehouse_control_plane_executor_spark.session import get_spark
from mini_lakehouse_control_plane_executor_spark.table.catalog import LakehouseSession

__all__ = ["get_spark", "LakehouseSession"]
__version__ = "0.1.0"
