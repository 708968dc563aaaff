"""SparkSession factory.

Local-mode settings mirror what we would set on a real cluster: AQE on
(runtime re-planning, skew-join splitting, partition coalescing), shuffle
partitions sized to the parallelism actually available instead of the
200 default, Arrow enabled for the pandas-UDF slow path, UTC session
timezone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from mini_lakehouse_control_plane_executor_spark.vendor import ensure_protobuf


def get_spark(
    app_name: str = "mini_lakehouse_control_plane_executor_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the singleton SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` then to all local cores.
    ``shuffle_partitions`` defaults to ``cpus`` — on a real cluster this
    would be ~2-3× total executor cores; AQE coalesces down from there.
    """
    # Before the JVM launches: make google.protobuf importable (vendored
    # shim when the real package is absent) so the PYTHONPATH the JVM —
    # and therefore every Python worker it spawns, including the
    # transformWithStateInPandas state-server workers — inherits can
    # import the StateMessage protobuf stubs.
    ensure_protobuf()
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Required for DataSourceReader.pushFilters (the minilake
        # Python data source prunes snapshot files via log stats).
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # INT96 (the legacy default) carries NO parquet min/max stats;
        # TIMESTAMP_MICROS does — required for time-range file pruning
        # in the table layer, and the modern ecosystem default anyway.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # RocksDB state store: required by transformWithStateInPandas
        # (multiple column families) and the right default at scale —
        # the HDFS-backed provider keeps every key in executor heap,
        # RocksDB spills to local disk with changelog checkpointing.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    # Deployment-specific overrides without code edits: every
    # SPARK_GRAFT_CONF_<key> env var (key with '.' encoded as '__',
    # e.g. SPARK_GRAFT_CONF_spark__sql__shuffle__partitions=512) is
    # applied LAST, so cluster operators can retune any scale-dependent
    # knob above (shuffle partitions, broadcast threshold, codec …)
    # per environment while the local defaults stay bench-comparable.
    for env_k, env_v in os.environ.items():
        if env_k.startswith("SPARK_GRAFT_CONF_"):
            builder = builder.config(
                env_k[len("SPARK_GRAFT_CONF_"):].replace("__", "."), env_v
            )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
