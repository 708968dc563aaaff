"""Structured-logging parity (``pkg/observability/logging.go:79-148``):
control-plane events emit one JSON object per line with bound
correlation fields (job_id, txn_id, table_name, version, duration), so
a log shipper can reconstruct a job's lifecycle without regexes."""

import json
import logging

import pytest
from pyspark.sql import functions as F

from mini_lakehouse_control_plane_executor_spark.observability import (
    LOGGER_NAME,
    StructuredLogger,
)
from mini_lakehouse_control_plane_executor_spark.table.schema import Field


class _Capture(logging.Handler):
    def __init__(self):
        super().__init__()
        self.records = []

    def emit(self, record):
        self.records.append(json.loads(record.getMessage()))

    def by_event(self, event):
        return [r for r in self.records if r["event"] == event]


@pytest.fixture()
def cap():
    logger = logging.getLogger(LOGGER_NAME)
    handler = _Capture()
    prev_level = logger.level
    logger.addHandler(handler)
    logger.setLevel(logging.INFO)
    yield handler
    logger.removeHandler(handler)
    logger.setLevel(prev_level)


def test_field_binding_is_immutable(cap):
    base = StructuredLogger().with_table_name("t")
    child = base.with_job_id("j1").with_duration_ms(12)
    child.info("x")
    base.info("y")
    x, y = cap.records
    assert x["table_name"] == "t" and x["job_id"] == "j1" and x["duration_ms"] == 12
    assert y["table_name"] == "t" and "job_id" not in y  # binding didn't leak back
    assert {"ts", "level", "event"} <= set(x)


def test_job_lifecycle_logged(cap, lake, spark):
    lake.create_table("ol", [Field("k", "int64"), Field("v", "string")])
    df = spark.range(0, 10).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    lake.insert("ol", df, txn_id="ins-1")

    created = cap.by_event("table_created")
    assert created and created[0]["table_name"] == "ol"
    commits = cap.by_event("commit_applied")
    assert any(r["txn_id"] == "ins-1" and r["table_name"] == "ol" for r in commits)
    assert all("version" in r and "adds" in r for r in commits)

    job_id = lake.submit_async({"table_name": "ol", "filter": "k >= 5"})
    lake.job_wait(job_id)
    sub = cap.by_event("job_submitted")
    assert any(r["job_id"] == job_id for r in sub)
    done = [r for r in cap.by_event("job_completed") if r["job_id"] == job_id]
    assert done and done[0]["output_rows"] == 5 and done[0]["duration_ms"] >= 0

    bad = lake.submit_async({"table_name": "ol", "projection": ["nope"]})
    with pytest.raises(RuntimeError):
        lake.job_wait(bad)
    failed = [r for r in cap.by_event("job_failed") if r["job_id"] == bad]
    assert failed and failed[0]["level"] == "error" and failed[0]["error"]


def test_commit_conflict_and_compaction_logged(cap, lake, spark):
    lake.create_table("oc", [Field("k", "int64"), Field("v", "string")])
    df = spark.range(0, 5).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    for _ in range(3):
        lake.insert("oc", df.coalesce(1))
    t = lake.table("oc")

    from mini_lakehouse_control_plane_executor_spark.table.log import CommitConflictError

    with pytest.raises(CommitConflictError):
        t.log.commit(base_version=1, txn_id="stale", schema=t.fields)
    conflicts = cap.by_event("commit_conflict")
    assert any(r["txn_id"] == "stale" and r["base_version"] == 1 for r in conflicts)

    assert lake.compact("oc", force=True) is not None
    started = cap.by_event("compaction_started")
    completed = cap.by_event("compaction_completed")
    assert started and started[0]["table_name"] == "oc"
    assert completed and completed[0]["txn_id"] == started[0]["txn_id"]
    assert completed[0]["version"] > 0
    # The session's run id IS the commit txn — one id end to end.
    assert any(
        r["txn_id"] == started[0]["txn_id"] for r in cap.by_event("commit_applied")
    )


def test_span_tree_and_error_recording(cap):
    """OTel-shaped spans (``tracing.go:26-135``): trace/span/parent ids
    link into a tree, durations land on span_end, an escaping exception
    becomes an ERROR span that still re-raises."""
    from mini_lakehouse_control_plane_executor_spark import observability as obs

    with obs.span("outer", table_name="t") as outer:
        with obs.span("inner") as inner:
            assert obs.current_span() is inner
            inner.set_attributes(rows=7)
        assert obs.current_span() is outer
    assert obs.current_span() is None

    with pytest.raises(ValueError):
        with obs.span("boom"):
            raise ValueError("injected")

    starts = cap.by_event("span_start")
    ends = cap.by_event("span_end")
    assert [s["span_name"] for s in starts] == ["outer", "inner", "boom"]
    by_name = {e["span_name"]: e for e in ends}
    assert by_name["inner"]["parent_span_id"] == starts[0]["span_id"]
    assert by_name["inner"]["trace_id"] == starts[0]["trace_id"]
    assert by_name["inner"]["rows"] == 7
    assert "parent_span_id" not in starts[0]
    assert by_name["outer"]["status"] == "OK"
    assert by_name["boom"]["status"] == "ERROR"
    assert "injected" in by_name["boom"]["error"]
    assert all(e["duration_ms"] >= 0 for e in ends)


def test_async_job_emits_query_span(cap, lake, spark):
    """The async job runner wraps execution in a query_execute span
    carrying job_id/status/output_rows — the trace a shipper joins with
    the span-free r4 lifecycle events."""
    lake.create_table("sp", [Field("id", "int64", False)])
    lake.insert("sp", spark.range(0, 5).select("id"))
    job_id = lake.submit_async({"table_name": "sp"})
    lake.job_wait(job_id)
    ends = [
        e
        for e in cap.by_event("span_end")
        if e["span_name"] == "query_execute" and e.get("job_id") == job_id
    ]
    assert len(ends) == 1
    assert ends[0]["status"] == "OK" and ends[0]["job_status"] == "COMPLETED"
    assert ends[0]["output_rows"] == 5
    assert ends[0]["trace_id"]

    bad = lake.submit_async({"table_name": "sp", "filter": "nope > 1"})
    try:
        lake.job_wait(bad)
    except RuntimeError:
        pass
    errs = [
        e
        for e in cap.by_event("span_end")
        if e["span_name"] == "query_execute" and e.get("job_id") == bad
    ]
    assert len(errs) == 1 and errs[0]["status"] == "ERROR" and errs[0]["error"]
    assert errs[0]["job_status"] == "FAILED"
