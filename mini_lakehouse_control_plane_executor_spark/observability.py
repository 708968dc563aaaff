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


# ---------------------------------------------------------------------------
# Tracing spans — parity with the reference's OpenTelemetry plane
# (``pkg/observability/tracing.go:26-135``: StartSpan / SetSpanAttributes /
# SetSpanStatus / RecordError), shaped like OTel but emitted as JSON-lines
# through the structured logger instead of a Jaeger exporter: every span
# carries trace_id / span_id / parent_span_id, wall-clock duration, a
# status, and the recorded error, so a log shipper can reassemble the
# trace tree exactly as Jaeger would. Context propagation uses
# ``contextvars`` — safe across the session's job-runner threads (each
# thread gets its own current-span chain) without threading a ctx object
# through every call the way Go does.
# ---------------------------------------------------------------------------

import contextlib
import contextvars
import uuid as _uuid

_current_span: contextvars.ContextVar["SpanContext | None"] = contextvars.ContextVar(
    "mini_lakehouse_current_span", default=None
)


class SpanContext:
    """One span: ids + attribute bag (``QueryAttributes`` /
    ``TransactionAttributes`` analogues are plain keyword attrs here)."""

    __slots__ = ("trace_id", "span_id", "parent_span_id", "name", "attrs", "status", "error")

    def __init__(self, name: str, parent: "SpanContext | None", **attrs):
        self.trace_id = parent.trace_id if parent else _uuid.uuid4().hex
        self.span_id = _uuid.uuid4().hex[:16]
        self.parent_span_id = parent.span_id if parent else None
        self.name = name
        self.attrs = dict(attrs)
        self.status = "OK"  # codes.Ok / codes.Error (tracing.go:84-89)
        self.error = None

    def set_attributes(self, **attrs) -> None:
        """``SetSpanAttributes`` (tracing.go:76-81)."""
        self.attrs.update(attrs)

    def record_error(self, err: BaseException | str) -> None:
        """``RecordError`` + error status (tracing.go:92-99)."""
        self.status = "ERROR"
        self.error = str(err)


def current_span() -> "SpanContext | None":
    """``SpanFromContext`` (tracing.go:71-73)."""
    return _current_span.get()


@contextlib.contextmanager
def span(name: str, **attrs):
    """``StartSpan`` (tracing.go:66-68) as a context manager: emits
    ``span_start`` / ``span_end`` records, times the body, records an
    escaping exception on the span (and re-raises), and restores the
    parent span on exit."""
    parent = _current_span.get()
    sp = SpanContext(name, parent, **attrs)
    token = _current_span.set(sp)
    slog = log.with_fields(
        trace_id=sp.trace_id, span_id=sp.span_id,
        **({"parent_span_id": sp.parent_span_id} if sp.parent_span_id else {}),
    )
    slog.info("span_start", span_name=name, **sp.attrs)
    t0 = time.time()
    try:
        yield sp
    except BaseException as exc:
        sp.record_error(exc)
        raise
    finally:
        _current_span.reset(token)
        dur_ms = int((time.time() - t0) * 1000)
        end = slog.with_duration_ms(dur_ms)
        if sp.status == "ERROR":
            end.with_error(sp.error or "").error(
                "span_end", span_name=name, status=sp.status, **sp.attrs
            )
        else:
            end.info("span_end", span_name=name, status=sp.status, **sp.attrs)
