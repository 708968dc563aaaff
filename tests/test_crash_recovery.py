"""Crash-recovery chaos tests (analog of the reference's tests/chaos/*):
inject the exact on-disk state a writer killed at each phase of
stage -> promote -> log-link leaves behind, then assert the table is
unaffected, recovery cleans the debris, and an idempotent replay of the
same txn_id lands."""

import os
import shutil
import time

import mini_lakehouse_control_plane_executor_spark.table.table as table_mod
from mini_lakehouse_control_plane_executor_spark.table.schema import Field
from pyspark.sql import functions as F

SCHEMA = [Field("k", "int64"), Field("v", "string"), Field("x", "float64")]


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
        (F.col("id") * 1.5).alias("x"),
    )


def _age(path, seconds=7200):
    old = time.time() - seconds
    os.utime(path, (old, old))


def test_crash_before_promote_swept_by_next_writer(lake, spark):
    """Killed after stage-write, before promote: _tmp/<txn>/ remains.
    The next writer sweeps aged stages; the table never saw the txn."""
    lake.create_table("c1", SCHEMA)
    t = lake.table("c1")
    t.insert(_df(spark, 0, 10))

    # Simulate the dead writer's stage.
    stage = os.path.join(t.tmp_dir, "crashed-txn")
    _df(spark, 100, 110).write.parquet(stage)
    _age(stage)
    assert t.read().count() == 10  # invisible: visibility is log-defined

    t.insert(_df(spark, 10, 20))  # next writer
    assert not os.path.exists(stage), "stale stage must be swept"
    assert t.read().count() == 20

    # Idempotent replay of the crashed txn succeeds from scratch.
    v = t.insert(_df(spark, 100, 110), txn_id="crashed-txn")
    assert t.log.find_txn("crashed-txn") == v
    assert t.read().count() == 30


def test_crash_between_promote_and_commit(lake, spark):
    """Killed after promoting files into data/, before the log link:
    orphans are invisible to every read, replaying the txn_id commits
    fresh files, and vacuum reclaims the orphans."""
    lake.create_table("c2", SCHEMA)
    t = lake.table("c2")
    t.insert(_df(spark, 0, 10).coalesce(1))
    baseline = sorted(t.read().collect())

    # Simulate: promoted file with no committing log entry.
    src = os.path.join(t.data_dir, sorted(os.listdir(t.data_dir))[0])
    orphan = os.path.join(t.data_dir, "part-00000-orphan.parquet")
    shutil.copyfile(src, orphan)
    _age(orphan)

    assert sorted(t.read().collect()) == baseline  # unaffected
    v = t.insert(_df(spark, 10, 20), txn_id="half-committed")  # replay lands
    assert t.read().count() == 20
    assert t.log.find_txn("half-committed") == v

    stats = t.vacuum(retain_versions=len(t.versions()), min_age_seconds=3600)
    assert not os.path.exists(orphan)
    assert stats["deleted_files"] == 1
    assert t.read().count() == 20  # every version still intact


def test_crash_during_log_link(lake, spark):
    """Killed between writing the commit payload tmp and the hard-link:
    no version is visible, the tmp is swept by vacuum, and the same
    txn_id can be replayed."""
    lake.create_table("c3", SCHEMA)
    t = lake.table("c3")
    t.insert(_df(spark, 0, 10))
    v_before = t.log.latest_version()

    leftover = os.path.join(t.log.log_dir, f"{v_before + 1:020d}.json.999.dead.tmp")
    with open(leftover, "wb") as fh:
        fh.write(b'{"version": %d}' % (v_before + 1))
    _age(leftover)

    assert t.log.latest_version() == v_before  # tmp is not a commit
    assert t.read().count() == 10
    t.vacuum(retain_versions=len(t.versions()), min_age_seconds=3600)
    assert not os.path.exists(leftover)

    v = t.insert(_df(spark, 10, 20), txn_id="relinked")
    assert v == v_before + 1
    assert t.read().count() == 20
