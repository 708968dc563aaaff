"""Async job lifecycle + execution metrics (reference
QueryExecutionMetrics parity: distributed_query_executor.go:510-524)."""

import threading
import time

from pyspark.sql import functions as F

from mini_lakehouse_control_plane_executor_spark.plans.query import Aggregate, SimpleQuery
from mini_lakehouse_control_plane_executor_spark.table.schema import Field

SCHEMA = [Field("k", "int64"), Field("v", "string"), Field("x", "float64")]


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
        (F.col("id") * 1.5).alias("x"),
    )


def test_async_job_metrics(lake, spark):
    lake.create_table("jm", SCHEMA)
    lake.insert("jm", _df(spark, 0, 1000))
    q = SimpleQuery(
        table_name="jm",
        filter="k >= 100",
        group_by=["v"],
        aggregates=[Aggregate("count", "*", "n")],
        limit=5,
    )
    job_id = lake.submit_async(q)
    rows = lake.job_result(job_id)
    assert len(rows) == 5 and all(r["n"] == 1 for r in rows)

    info = lake.job_status(job_id)
    assert info.status == "COMPLETED" and info.finished_ms is not None
    m = info.metrics
    assert m["input_files"] >= 1
    assert m["input_bytes"] > 0
    assert m["input_rows"] == 1000
    assert m["output_rows"] == 5
    assert m["spark_jobs"] >= 1
    assert m["num_tasks"] >= 1
    assert info.to_json()["metrics"] == m


def test_job_lifecycle_observable(lake, spark, monkeypatch):
    """RUNNING is observable while the query executes; COMPLETED after."""
    lake.create_table("jl", SCHEMA)
    lake.insert("jl", _df(spark, 0, 10))

    gate = threading.Event()
    real_query = lake.query

    def slow_query(q):
        gate.wait(10)
        return real_query(q)

    monkeypatch.setattr(lake, "query", slow_query)
    job_id = lake.submit_async(SimpleQuery(table_name="jl"))
    deadline = time.time() + 5
    while lake.job_status(job_id).status == "PENDING" and time.time() < deadline:
        time.sleep(0.01)
    assert lake.job_status(job_id).status == "RUNNING"
    gate.set()
    assert len(lake.job_result(job_id)) == 10
    assert lake.job_status(job_id).status == "COMPLETED"


def test_failed_job_surfaces_error(lake, spark):
    job_id = lake.submit_async(SimpleQuery(table_name="does_not_exist"))
    import pytest

    with pytest.raises(RuntimeError, match="does_not_exist"):
        lake.job_result(job_id)
    assert lake.job_status(job_id).status == "FAILED"
