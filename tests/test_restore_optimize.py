"""RESTORE (Delta-style, forward commit) and clustered compaction
(OPTIMIZE-ZORDER analogue for linear keys): both are pure table-layer
operations over the OCC log — restore rewrites no data, clustered
compaction rewrites everything into contiguous key slices that min/max
stats then prune like partitions."""

import pytest

from pyspark.sql import functions as F

from mini_lakehouse_control_plane_executor_spark.functions.filters import prune_files
from mini_lakehouse_control_plane_executor_spark.table.schema import Field

SCHEMA = [Field("id", "int64", False), Field("v", "string", True)]


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        "id", F.concat(F.lit("v"), F.col("id")).alias("v")
    )


def _rows(df):
    return sorted((r["id"], r["v"]) for r in df.collect())


def test_restore_roundtrip_and_history(lake, spark):
    lake.create_table("rt", SCHEMA)
    lake.insert("rt", _mk(spark, 0, 10))  # v2
    lake.insert("rt", _mk(spark, 10, 20))  # v3
    t = lake.table("rt")
    t.delete("id < 5")  # v4
    assert t.read().count() == 15

    v5 = lake.restore("rt", 2)
    assert v5 == t.log.latest_version()
    assert _rows(t.read()) == _rows(t.read(version=2))
    assert t.read().count() == 10
    # History is intact: every interim version still time-travels.
    assert t.read(version=3).count() == 20
    assert t.read(version=4).count() == 15
    assert t.versions() == list(range(1, v5 + 1))
    # The restore is itself a diffable CDC event.
    diff = t.diff(4, v5)
    assert diff.filter("_change_type = 'insert'").count() == 5  # id 0..4 back
    assert diff.filter("_change_type = 'delete'").count() == 10  # 10..19 out


def test_restore_idempotent_txn(lake, spark):
    lake.create_table("ri", SCHEMA)
    lake.insert("ri", _mk(spark, 0, 5))  # v2
    lake.insert("ri", _mk(spark, 5, 9))  # v3
    v = lake.restore("ri", 2, txn_id="restore-once")
    again = lake.restore("ri", 2, txn_id="restore-once")
    assert again == v
    assert lake.table("ri").log.latest_version() == v


def test_restore_unknown_and_vacuumed_version(lake, spark):
    lake.create_table("rv", SCHEMA)
    lake.insert("rv", _mk(spark, 0, 5))  # v2
    t = lake.table("rv")
    with pytest.raises(ValueError):
        t.restore(99)
    # Overwrite drops v2's files from the current snapshot; vacuum with
    # zero retention deletes them physically -> v2 is unrestorable and
    # the restore says so instead of committing dangling paths.
    lake.insert("rv", _mk(spark, 5, 9), mode="overwrite")  # v3
    t.vacuum(retain_versions=1, min_age_seconds=0.0)
    with pytest.raises(ValueError, match="no longer restorable"):
        t.restore(2)


def test_clustered_compaction_prunes(lake, spark, monkeypatch):
    """Four interleaved single-file inserts -> every file spans nearly
    the full id range (pruning useless); compact(cluster_by=['id']) ->
    contiguous slices; a range predicate now prunes to a subset of files
    and results are unchanged, old versions still readable (property 30)."""
    from mini_lakehouse_control_plane_executor_spark.table import table as tmod

    # Shrink the target so the test corpus rewrites into several files.
    monkeypatch.setattr(tmod, "COMPACT_TARGET_FILE_SIZE", 1024)
    lake.create_table("cc", SCHEMA)
    for k in range(4):  # ids k, k+4, k+8, ... interleave across files
        ids = list(range(k, 400, 4))
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in ids], "id long, v string"
        ).coalesce(1)
        lake.insert("cc", df)
    t = lake.table("cc")
    before = t.snapshot()
    pruned_before = prune_files(before.files, "id < 10", before.schema)
    assert len(pruned_before) == len(before.files)  # every file overlaps

    v = lake.compact("cc", cluster_by=["id"])
    assert v is not None
    after = t.snapshot()
    assert t.read().count() == 400
    assert _rows(t.read()) == _rows(t.read(version=before.version))
    # Contiguous, non-overlapping id slices across the rewritten files.
    ranges = sorted(
        (int(f.min_values["id"]), int(f.max_values["id"])) for f in after.files
    )
    for (_, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    # Stats pruning now touches a strict subset for a range predicate.
    pruned_after = prune_files(after.files, "id < 10", after.schema)
    assert len(pruned_after) < len(after.files)
    got = {r["id"] for r in t.read(prune_filter="id < 10").collect() if r["id"] < 10}
    assert got == set(range(10))


def test_clustered_compaction_rejects_unknown_column(lake, spark):
    lake.create_table("cx", SCHEMA)
    lake.insert("cx", _mk(spark, 0, 5))
    with pytest.raises(ValueError, match="cluster_by"):
        lake.table("cx").compact(cluster_by=["nope"])


def test_restore_over_http(lake, spark):
    """POST /tables/{t}/restore route: happy path + 409 on a bad version."""
    import json
    import urllib.request
    from mini_lakehouse_control_plane_executor_spark.api.rest import LakehouseRestServer

    lake.create_table("rh", SCHEMA)
    lake.insert("rh", _mk(spark, 0, 6))  # v2
    lake.insert("rh", _mk(spark, 6, 9))  # v3
    srv = LakehouseRestServer(lake).start()
    try:
        def post(path, body, expect=200):
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}{path}",
                method="POST",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            try:
                with urllib.request.urlopen(req) as resp:
                    assert resp.status == expect
                    return json.load(resp)
            except urllib.error.HTTPError as err:
                assert err.code == expect, f"{path}: {err.code}"
                return json.loads(err.read() or b"{}")

        out = post("/tables/rh/restore", {"version": 2})
        assert out["success"] is True
        assert lake.table("rh").read().count() == 6
        post("/tables/rh/restore", {"version": 77}, expect=409)
        post("/tables/rh/restore", {}, expect=400)
    finally:
        srv.stop()


def test_restore_occ_recompute_under_race(lake, spark, monkeypatch):
    """A restore that loses the OCC CAS must recompute its diff against
    the fresh snapshot: a row inserted between the restore's snapshot
    read and its commit is removed by the retried restore (the restored
    state is the TARGET state, not target-plus-racer)."""
    lake.create_table("rr", SCHEMA)
    lake.insert("rr", _mk(spark, 0, 5))  # v2
    lake.insert("rr", _mk(spark, 5, 8))  # v3
    t = lake.table("rr")

    real_commit = t.log.commit
    raced = {"done": False}

    def racing_commit(base_version, txn_id, schema, adds, removes, **kw):
        # First restore attempt: sneak a concurrent insert in first, so
        # the restore's CAS loses and it must re-diff.
        if txn_id.startswith("restore-race") and not raced["done"]:
            raced["done"] = True
            lake.insert("rr", _mk(spark, 100, 103))
        return real_commit(base_version, txn_id, schema, adds, removes, **kw)

    monkeypatch.setattr(t.log, "commit", racing_commit)
    v = t.restore(2, txn_id="restore-race-1")
    monkeypatch.setattr(t.log, "commit", real_commit)
    assert raced["done"]
    assert v == t.log.latest_version()
    assert _rows(t.read()) == _rows(t.read(version=2))  # racer's rows gone
    assert t.read().count() == 5
