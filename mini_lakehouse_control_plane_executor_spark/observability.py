"""Structured, context-scoped logging — parity with the reference's
observability plane (``pkg/observability/logging.go:79-148``), minus the
Raft/worker fields whose plane Spark replaces (SURVEY §4.3).

The reference builds zap loggers by chaining ``With*`` field binders
(job_id, txn_id, table_name, version, duration, error) so every line a
subsystem emits carries its correlation ids. Same idiom here on stdlib
``logging``: a ``StructuredLogger`` is an immutable bag of bound fields;
``with_fields`` returns a child with more fields; emit methods render
ONE JSON object per line. JSON-lines over stdlib means any log shipper
(or a test handler) can parse records without a logging framework
dependency.

Spark-side note: this logs the CONTROL PLANE (plan/commit/compact/job
lifecycle) on the driver. Executor-side task logs belong to Spark's own
log4j and are correlated by the ``spark.jobGroup.id`` the session sets
per job/compaction — we deliberately do not ship a Python logger into
executors (per-task Python logging would serialize the hot path).
"""

from __future__ import annotations

import json
import logging
import time

LOGGER_NAME = "mini_lakehouse"


class StructuredLogger:
    """Immutable bound-field logger; ``with_*`` returns a child
    (zap's ``Logger.With`` idiom, ``logging.go:79-121``)."""

    def __init__(self, fields: dict | None = None, logger: logging.Logger | None = None):
        self._fields = dict(fields or {})
        self._logger = logger or logging.getLogger(LOGGER_NAME)

    # -- field binders (reference names, logging.go:79-121) ------------

    def with_fields(self, **fields) -> "StructuredLogger":
        return StructuredLogger({**self._fields, **fields}, self._logger)

    def with_job_id(self, job_id: str) -> "StructuredLogger":
        return self.with_fields(job_id=job_id)

    def with_txn_id(self, txn_id: str) -> "StructuredLogger":
        return self.with_fields(txn_id=txn_id)

    def with_table_name(self, table_name: str) -> "StructuredLogger":
        return self.with_fields(table_name=table_name)

    def with_version(self, version: int) -> "StructuredLogger":
        return self.with_fields(version=version)

    def with_error(self, err: BaseException | str) -> "StructuredLogger":
        return self.with_fields(error=str(err))

    def with_duration_ms(self, ms: int) -> "StructuredLogger":
        return self.with_fields(duration_ms=int(ms))

    # -- emitters ------------------------------------------------------

    def _emit(self, level: int, event: str, **extra) -> None:
        if not self._logger.isEnabledFor(level):
            return
        record = {
            "ts": round(time.time(), 3),
            "level": logging.getLevelName(level).lower(),
            "event": event,
            **self._fields,
            **extra,
        }
        self._logger.log(level, json.dumps(record, default=str))

    def info(self, event: str, **extra) -> None:
        self._emit(logging.INFO, event, **extra)

    def warning(self, event: str, **extra) -> None:
        self._emit(logging.WARNING, event, **extra)

    def error(self, event: str, **extra) -> None:
        self._emit(logging.ERROR, event, **extra)


#: Root control-plane logger; subsystems bind their context onto it.
log = StructuredLogger()
