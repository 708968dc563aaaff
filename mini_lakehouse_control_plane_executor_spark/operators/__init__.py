"""Beyond-reference operators for large-scale training-data pipelines.

The reference implements none of these (SURVEY §2.6) — they are the
engine's north star additions, each designed Spark-first: built-in
column expressions (JVM/codegen) wherever possible, deterministic
md5-derived hashing so every result is reproducible AND expressible in
ANSI SQL for the DuckDB oracle, and join topologies that survive 100 TB
(LSH banding prunes the quadratic candidate space before any pair join).
"""

from mini_lakehouse_control_plane_executor_spark.operators import dedup, similarity, text

__all__ = ["dedup", "similarity", "text"]
