"""Transaction-log semantics tests, mirroring the reference's correctness
properties (SURVEY §5): P4 log-controlled visibility, P6 concurrent commit
exclusion, P8 snapshot isolation, P9 replay determinism, P10 commit
idempotency, P30 compaction preserves results."""

import os
import threading

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mini_lakehouse_control_plane_executor_spark.table.log import (
    CommitConflictError,
    CommitValidationError,
    FileAdd,
    TransactionLog,
)
from mini_lakehouse_control_plane_executor_spark.table.schema import Field, SchemaError, validate_schema, validate_table_name

SCHEMA = [Field("a", "int64"), Field("b", "string")]


def test_basic_commit_and_snapshot(tmp_path):
    log = TransactionLog(str(tmp_path))
    v1 = log.commit(0, "t1", SCHEMA, [FileAdd("data/f1.parquet", rows=10, size=100)])
    assert v1 == 1
    v2 = log.commit(1, "t2", SCHEMA, [FileAdd("data/f2.parquet", rows=5, size=50)])
    assert v2 == 2
    snap = log.snapshot()
    assert snap.version == 2
    assert snap.file_paths == ["data/f1.parquet", "data/f2.parquet"]
    # P4: visibility is log-defined — time travel to v1 hides f2
    assert log.snapshot(1).file_paths == ["data/f1.parquet"]


def test_occ_conflict(tmp_path):
    log = TransactionLog(str(tmp_path))
    log.commit(0, "t1", SCHEMA, [FileAdd("data/f1.parquet")])
    with pytest.raises(CommitConflictError):
        log.commit(0, "t2", SCHEMA, [FileAdd("data/f2.parquet")])


def test_commit_idempotency(tmp_path):
    # P10: same txn_id returns the original version, no new entry.
    log = TransactionLog(str(tmp_path))
    v = log.commit(0, "txn-A", SCHEMA, [FileAdd("data/f1.parquet")])
    again = log.commit(log.latest_version(), "txn-A", SCHEMA, [FileAdd("data/f1.parquet")])
    assert again == v
    assert log.latest_version() == v


def test_commit_validation(tmp_path):
    log = TransactionLog(str(tmp_path))
    log.commit(0, "t1", SCHEMA, [FileAdd("data/f1.parquet")])
    with pytest.raises(CommitValidationError):
        log.commit(1, "t2", SCHEMA, removes=["data/nope.parquet"])
    with pytest.raises(CommitValidationError):
        log.commit(1, "t3", SCHEMA, adds=[FileAdd("data/f1.parquet")])


def test_concurrent_commit_exclusion(tmp_path):
    # P6: N threads race the same base_version; exactly one wins.
    log = TransactionLog(str(tmp_path))
    results: list[int | None] = [None] * 8
    conflicts: list[int] = []
    barrier = threading.Barrier(8)

    def worker(i: int):
        barrier.wait()
        try:
            results[i] = log.commit(0, f"txn-{i}", SCHEMA, [FileAdd(f"data/f{i}.parquet")])
        except CommitConflictError:
            conflicts.append(i)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    winners = [r for r in results if r is not None]
    assert winners == [1]
    assert len(conflicts) == 7
    assert log.latest_version() == 1


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.lists(st.integers(0, 19), min_size=0, max_size=3, unique=True),  # adds
            st.lists(st.integers(0, 19), min_size=0, max_size=2, unique=True),  # remove candidates
        ),
        min_size=1,
        max_size=8,
    )
)
def test_replay_determinism_property(tmp_path_factory, ops):
    """P9: snapshot(V) is a pure function of entries 1..V, file list sorted
    by path; adds applied before removes within an entry."""
    tmp = tmp_path_factory.mktemp("log")
    log = TransactionLog(str(tmp))
    live: set[str] = set()
    expected_at: dict[int, list[str]] = {}
    version = 0
    for adds_idx, rm_idx in ops:
        adds = [FileAdd(f"data/f{i}.parquet") for i in adds_idx if f"data/f{i}.parquet" not in live]
        removes = [f"data/f{i}.parquet" for i in rm_idx if f"data/f{i}.parquet" in live and all(a.path != f"data/f{i}.parquet" for a in adds)]
        if not adds and not removes:
            continue
        version = log.commit(version, f"txn-{version}", SCHEMA, adds, removes)
        live |= {a.path for a in adds}
        live -= set(removes)
        expected_at[version] = sorted(live)
    for v, expected in expected_at.items():
        assert log.snapshot(v).file_paths == expected
        # replay twice → identical (determinism)
        assert log.snapshot(v).file_paths == expected


def test_latest_schema_wins(tmp_path):
    log = TransactionLog(str(tmp_path))
    log.commit(0, "t1", SCHEMA, [FileAdd("data/f1.parquet")])
    wider = SCHEMA + [Field("c", "float64")]
    log.commit(1, "t2", wider, [FileAdd("data/f2.parquet")])
    assert [f.name for f in log.snapshot().schema] == ["a", "b", "c"]
    assert [f.name for f in log.snapshot(1).schema] == ["a", "b"]


def test_name_and_schema_validation():
    validate_table_name("ok_table_1")
    for bad in ["", "a" * 65, "bad-name", "bad name", "tab!e"]:
        with pytest.raises(SchemaError):
            validate_table_name(bad)
    with pytest.raises(SchemaError):
        validate_schema([])
    with pytest.raises(SchemaError):
        validate_schema([Field("a", "int64"), Field("a", "string")])
    with pytest.raises(SchemaError):
        validate_schema([Field("a", "uuid")])


def _commit_n(log, n, start_version=0):
    v = start_version
    for i in range(n):
        adds = [FileAdd(f"data/f{v + 1}.parquet", rows=1, size=10)]
        removes = [f"data/f{v}.parquet"] if v % 3 == 0 and v > 0 else []
        v = log.commit(v, f"txn-{v + 1}", SCHEMA, adds, removes)
    return v


def test_checkpoint_bounds_replay(tmp_path):
    """A fresh instance reads ≤ (1 checkpoint + CHECKPOINT_INTERVAL
    entries) per snapshot — not the whole history."""
    from mini_lakehouse_control_plane_executor_spark.table.log import CHECKPOINT_INTERVAL

    log = TransactionLog(str(tmp_path))
    last = _commit_n(log, 57)
    assert log.list_checkpoints(), "interval checkpoints must be written"
    expected = log.snapshot().file_paths

    fresh = TransactionLog(str(tmp_path))
    reads = []
    orig = fresh.read_entry
    fresh.read_entry = lambda v: (reads.append(v), orig(v))[1]
    snap = fresh.snapshot()
    assert snap.version == last and snap.file_paths == expected
    assert len(reads) <= CHECKPOINT_INTERVAL, f"read {len(reads)} entries"
    # Repeat read replays nothing new.
    reads.clear()
    assert fresh.snapshot().file_paths == expected
    assert reads == []


def test_checkpoint_time_travel_correct(tmp_path):
    """Cold time travel to versions behind/ahead of checkpoints matches a
    checkpoint-free replay."""
    log = TransactionLog(str(tmp_path))
    _commit_n(log, 25)
    # Ground truth: replay with checkpoints hidden.
    control = TransactionLog(str(tmp_path))
    control.list_checkpoints = lambda: []
    fresh = TransactionLog(str(tmp_path))
    for v in [1, 5, 10, 11, 19, 20, 21, 25]:
        assert fresh.snapshot(v).file_paths == control.snapshot(v).file_paths, v


def test_find_txn_bounded_and_correct(tmp_path):
    from mini_lakehouse_control_plane_executor_spark.table.log import CHECKPOINT_INTERVAL

    log = TransactionLog(str(tmp_path))
    _commit_n(log, 34)
    fresh = TransactionLog(str(tmp_path))
    reads = []
    orig = fresh.read_entry
    fresh.read_entry = lambda v: (reads.append(v), orig(v))[1]
    assert fresh.find_txn("txn-7") == 7      # behind the newest checkpoint
    assert fresh.find_txn("txn-34") == 34    # after it
    assert fresh.find_txn("txn-999") is None
    assert len(reads) <= CHECKPOINT_INTERVAL


def test_version_at_timestamp(tmp_path):
    """Delta timestampAsOf rule: last commit at-or-before the instant;
    before-the-first-commit errors."""
    from mini_lakehouse_control_plane_executor_spark.table.log import TransactionLog, FileAdd
    from mini_lakehouse_control_plane_executor_spark.table.schema import Field
    import json, os

    log = TransactionLog(str(tmp_path))
    schema = [Field("id", "int64", False)]
    for i in range(4):
        log.commit(i, f"t{i}", schema)
    # Pin deterministic timestamps by rewriting the entries.
    for v, ts in zip([1, 2, 3, 4], [1000, 2000, 3000, 4000]):
        pth = log._entry_path(v)
        e = json.load(open(pth))
        e["timestamp_ms"] = ts
        json.dump(e, open(pth, "w"))
    # Fresh log instance so no cached entries interfere.
    log2 = TransactionLog(str(tmp_path))
    import pytest as _pt
    with _pt.raises(ValueError, match="predates"):
        log2.version_at_timestamp(999)
    assert log2.version_at_timestamp(1000) == 1
    assert log2.version_at_timestamp(2500) == 2
    assert log2.version_at_timestamp(4000) == 4
    assert log2.version_at_timestamp(10**15) == 4
