"""End-to-end user walkthrough — ``python -m mini_lakehouse_control_plane_executor_spark.demo``.

Parity with the reference's ``demo/demo.sh`` + ``demo/fault-tolerance-demo.sh``
user journey (create → insert → query over every API surface → concurrent
writer conflict → compaction → time travel → restore), compressed into one
runnable script against a throwaway root. Each step prints what it did and
the script exits non-zero if any assertion fails — it doubles as a smoke
test and is exercised by tests/test_demo.py.

Surfaces driven:
  1. Python API        LakehouseSession create/insert/read
  2. REST              POST /queries (async job), GET /queries/{id}/results
  3. SQL               attach_sql_views + spark.sql
  4. gRPC messages     MetadataServicer over real proto3 bytes
                       (api.protowire; a grpc.Server binding needs grpcio)
  5. OCC               two racing writers, conflict retried, both land
  6. Compaction        small files bin-packed, old versions intact
  7. Time travel       read(version=), timestampAsOf
  8. RESTORE           back to a prior version, forward-commit only
 10. SHALLOW CLONE     metadata-only copy, pinned snapshot, zero data moved
"""

from __future__ import annotations

import json
import tempfile
import threading
import time
import urllib.request


def _step(n: int, title: str) -> None:
    print(f"\n=== [{n}] {title} " + "=" * max(0, 50 - len(title)))


def main() -> int:
    from mini_lakehouse_control_plane_executor_spark.api import grpc_api as g
    from mini_lakehouse_control_plane_executor_spark.api import protowire as pw
    from mini_lakehouse_control_plane_executor_spark.api.rest import LakehouseRestServer
    from mini_lakehouse_control_plane_executor_spark.session import get_spark
    from mini_lakehouse_control_plane_executor_spark.table.catalog import LakehouseSession
    from mini_lakehouse_control_plane_executor_spark.table.schema import Field

    spark = get_spark("lakehouse-demo")
    root = tempfile.mkdtemp(prefix="lakehouse-demo-")
    lake = LakehouseSession(spark, root)
    print(f"lakehouse root: {root}")

    _step(1, "CreateTable + InsertData (Python API)")
    lake.create_table(
        "orders",
        [
            Field("o_id", "int64", False),
            Field("amount", "float64", True),
            Field("status", "string", True),
        ],
        constraints={"positive_amount": "amount > 0"},
    )
    rows = [(i, float(10 + i), "new" if i % 2 else "done") for i in range(1, 101)]
    lake.insert(
        "orders", spark.createDataFrame(rows, "o_id long, amount double, status string")
    )
    t = lake.table("orders")
    print(f"created 'orders' (CHECK positive_amount), inserted {t.read().count()} rows, version {t.log.latest_version()}")
    assert t.read().count() == 100

    _step(2, "Async query job (REST: POST /queries)")
    srv = LakehouseRestServer(lake).start()
    body = json.dumps(
        {
            "table_name": "orders",
            "filter": "amount > 50",
            "aggregates": [{"function": "count", "column": "o_id"}],
        }
    ).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/queries",
        data=body,
        headers={"Content-Type": "application/json"},
    )
    job_id = json.loads(urllib.request.urlopen(req).read())["job_id"]
    for _ in range(120):
        status = json.loads(
            urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/queries/{job_id}"
            ).read()
        )
        if status["status"] in ("COMPLETED", "FAILED"):
            break
        time.sleep(0.25)
    assert status["status"] == "COMPLETED", status
    results = json.loads(
        urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/queries/{job_id}/results"
        ).read()
    )
    print(f"job {job_id} COMPLETED; result rows: {results['rows']}")

    _step(3, "SQL over pinned views (attach_sql_views + spark.sql)")
    pinned = lake.attach_sql_views()
    out = spark.sql(
        "SELECT status, count(*) AS n, round(sum(amount), 2) AS total "
        "FROM orders GROUP BY status ORDER BY status"
    ).collect()
    for r in out:
        print(f"  status={r.status!r:7} n={r.n:3} total={r.total}")
    print(f"views pinned at: {pinned}")

    _step(4, "gRPC metadata surface (real proto3 bytes)")
    svc = g.MetadataServicer(lake)
    wire_req = pw.encode(g.GetSnapshotRequest(table_name="orders"))
    resp = svc.GetSnapshot(pw.decode(g.GetSnapshotRequest, wire_req))
    wire_resp = pw.encode(resp)
    back = pw.decode(g.GetSnapshotResponse, wire_resp)
    print(
        f"GetSnapshot over {len(wire_req)}B request / {len(wire_resp)}B response: "
        f"{len(back.files)} files, schema {[f.name for f in back.schema.fields]}"
    )
    try:
        import grpc  # noqa: F401

        server, port = g.serve(lake)
        print(f"grpc.Server bound on :{port} (protobuf codec)")
        server.stop(0)
    except ImportError:
        print("grpcio not installed here - servicer + wire codec shown instead")

    _step(5, "Concurrent writers (OCC conflict -> retry, both land)")
    v_before = t.log.latest_version()
    conflicts_before = t.log.conflict_count
    barrier = threading.Barrier(2)
    errs: list[Exception] = []

    def writer(lo: int) -> None:
        df = spark.createDataFrame(
            [(i, float(i), "race") for i in range(lo, lo + 10)],
            "o_id long, amount double, status string",
        )
        barrier.wait()
        try:
            lake.insert("orders", df)
        except Exception as exc:  # pragma: no cover - demo assertion below
            errs.append(exc)

    threads = [threading.Thread(target=writer, args=(lo,)) for lo in (1000, 2000)]
    [th.start() for th in threads]
    [th.join() for th in threads]
    assert not errs and t.read().count() == 120
    print(
        f"both writers committed (v{v_before} -> v{t.log.latest_version()}); "
        f"OCC conflicts retried: {t.log.conflict_count - conflicts_before}"
    )

    _step(6, "CHECK constraint rejects a bad write atomically")
    v = t.log.latest_version()
    try:
        lake.insert(
            "orders",
            spark.createDataFrame([(9999, -1.0, "bad")], "o_id long, amount double, status string"),
        )
        raise AssertionError("negative amount must be rejected")
    except Exception as exc:
        assert "positive_amount" in str(exc)
        print(f"rejected: {str(exc).splitlines()[0][:88]}")
    assert t.log.latest_version() == v and t.read().count() == 120

    _step(7, "Compaction (small files bin-packed; history intact)")
    n_files_before = len(t.snapshot().files)
    result = t.compact()
    n_files_after = len(t.snapshot().files)
    print(
        f"files {n_files_before} -> {n_files_after} "
        f"(compacted={getattr(result, 'compacted', result)}); "
        f"v2 still readable: {t.read(version=2).count()} rows"
    )
    assert t.read(version=2).count() == 100

    _step(8, "Time travel (version + timestamp)")
    ts_now_ms = int(time.time() * 1000)
    print(f"read(version=2) -> {t.read(version=2).count()} rows")
    print(f"read(timestamp_ms=now) -> {t.read(timestamp_ms=ts_now_ms).count()} rows")
    assert t.read(timestamp_ms=ts_now_ms).count() == 120

    _step(9, "RESTORE to the pre-race version (forward commit)")
    new_v = t.restore(2)
    print(
        f"restored to v2 as new version v{new_v}: {t.read().count()} rows; "
        f"interim versions remain time-travelable "
        f"({t.read(version=new_v - 1).count()} rows at v{new_v - 1})"
    )
    assert t.read().count() == 100

    _step(10, "SHALLOW CLONE (metadata-only, pinned; evolves independently)")
    import os as _os

    c = lake.clone_table("orders", "orders_clone")
    assert _os.listdir(c.data_dir) == []  # zero data copied
    print(
        f"cloned -> orders_clone: {c.read().count()} rows referenced, "
        f"0 files copied (data dir empty)"
    )
    t.insert(
        spark.createDataFrame(
            [(500 + i, float(i + 1), "new") for i in range(20)],
            "o_id long, amount double, status string",
        )
    )
    print(
        f"source advanced to {t.read().count()} rows; "
        f"clone still serves {c.read().count()} (pinned snapshot)"
    )
    assert c.read().count() == 100 and t.read().count() == 120

    srv.stop()
    print("\nall steps passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
