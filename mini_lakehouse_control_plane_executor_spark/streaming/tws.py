"""Arbitrary stateful streaming via ``transformWithStateInPandas`` —
the Spark 4 successor of ``applyInPandasWithState`` (see stateful.py for
the legacy-API twin). Typed, composable state primitives (ValueState /
MapState, optional TTL and timers) replace the single untyped
GroupState blob; state schema evolves independently of the operator.

Operator here: a per-user running profile — event count, value total,
distinct event types with per-type counts — emitted in Update mode as
each micro-batch revises it. State per key is O(|event_types|), bounded
by the domain, not the stream; at 100 TB/day the state store shards by
the same user_id hash the shuffle already uses, so adding executors
scales state linearly.

Determinism contract for tests: the emitted row reflects ALL input seen
for the key so far, so after the last batch the output equals the batch
groupBy aggregate — the stream≡batch equality every operator in
streaming/ proves.

Runtime requirements: Spark's transformWithState Python workers speak
protobuf to the JVM state server (``pyspark/sql/streaming/proto``) and
the operator needs a state store with column families (RocksDB).
``session.get_spark`` provides both — it activates the vendored
pure-Python protobuf shim (``vendor/protoshim``) when no real protobuf
package is installed, and sets ``RocksDBStateStoreProvider`` — so the
operator runs end-to-end here (tests/test_streaming.py:
``test_tws_user_profiles_equals_batch``).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, n_types long, top_type string"
)


class UserProfileProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self.totals = handle.getValueState("totals", "n long, total double")
        self.types = handle.getMapState("types", "t string", "c long")

    def handleInputRows(self, key, rows, timerValues):
        n, total = 0, 0.0
        if self.totals.exists():
            n, total = self.totals.get()
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
            for t, c in pdf.groupby("event_type").size().items():
                prev = self.types.getValue((t,)) if self.types.containsKey((t,)) else 0
                self.types.updateValue((t,), (int(prev[0] if isinstance(prev, tuple) else prev) + int(c),))
        self.totals.update((n, total))
        counts = {k[0]: v[0] for k, v in self.types.iterator()}
        # Deterministic top type: max count, ties to the
        # lexicographically smallest type name. A key seen only with
        # NULL event_type has no counts (pandas groupby drops NaN
        # keys) — emit NULL instead of indexing an empty list.
        top = sorted(counts, key=lambda t: (-counts[t], t))[0] if counts else None
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "n_types": [len(counts)],
                "top_type": [top],
            }
        )

    def close(self) -> None:
        pass


SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)

class SessionFinalizerProcessor(StatefulProcessor):
    """Event-time sessionization with inactivity-gap finalization — the
    canonical arbitrary-state + timer operator (stream twin of the
    batch ``events_sessionize`` query).

    Per key: one open session in ValueState ``sess`` = (start_ms,
    end_ms, n, total). Each input batch is walked in timestamp order;
    sessions closed by an in-batch gap emit immediately, the trailing
    open session goes to state, and an event-time timer re-arms at
    ``end + gap`` (old timers deleted — exercises ListTimers /
    DeleteTimer / RegisterTimer). When the watermark passes the timer,
    ``handleExpiredTimer`` emits the finalized session and clears
    state. State is O(1) per key; timers are one per key — at 100 TB
    the state store shards by the grouping key's existing shuffle.
    """

    def __init__(self, gap_ms: int):
        self.gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.sess = handle.getValueState(
            "sess", "start_ms long, end_ms long, n long, total double"
        )

    def _emit(self, key, start_ms, end_ms, n, total):
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start_ms, unit="ms")],
                "session_end": [pd.Timestamp(end_ms, unit="ms")],
                "n_events": [n],
                "total_value": [total],
            }
        )

    def handleInputRows(self, key, rows, timerValues):
        cur = self.sess.get() if self.sess.exists() else None
        out = []
        # Collect EVERY chunk before sorting: a micro-batch larger than
        # Arrow's maxRecordsPerBatch arrives as several pandas chunks
        # whose time ranges interleave — per-chunk sorts let a later
        # chunk's early event regress the open session's end below its
        # start. ts normalizes to datetime64[ns] first (Arrow may hand
        # [us] depending on version — the FunnelProcessor discipline).
        pairs = []
        for pdf in rows:
            ts_ms = pdf["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000
            pairs.extend(zip(ts_ms.tolist(), pdf["value"].fillna(0.0).tolist()))
        pairs.sort(key=lambda p: p[0])
        for t, v in pairs:
            if cur is None:
                cur = (t, t, 1, float(v))
            elif t - cur[1] <= self.gap_ms:
                # max() keeps the end monotone even for a late event
                # that lands inside the open session's span.
                cur = (min(cur[0], t), max(cur[1], t), cur[2] + 1, cur[3] + float(v))
            else:
                out.append(self._emit(key, *cur))
                cur = (t, t, 1, float(v))
        if cur is not None:
            self.sess.update(cur)
            # Re-arm: exactly one live timer per key, at end + gap.
            for t in list(self.handle.listTimers()):
                self.handle.deleteTimer(t)
            self.handle.registerTimer(cur[1] + self.gap_ms)
        for o in out:
            yield o

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        if self.sess.exists():
            start_ms, end_ms, n, total = self.sess.get()
            # Only finalize if this timer matches the CURRENT session
            # end (a stale timer for an extended session re-arms).
            if expiredTimerInfo.getExpiryTimeInMs() >= end_ms + self.gap_ms:
                self.sess.clear()
                yield self._emit(key, start_ms, end_ms, n, total)

    def close(self) -> None:
        pass


def finalized_sessions_tws(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """events (streaming, watermarked on ``ts``): user_id, ts, value →
    one row per FINALIZED session (inactivity gap exceeded), in Append
    mode — output rows are immutable once emitted, unlike the running
    profiles above."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            SessionFinalizerProcessor(gap_ms=gap_minutes * 60_000),
            outputStructType=SESSION_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


FUNNEL_SCHEMA = (
    "user_id long, n_seen long, ts_signup timestamp, ts_click timestamp, "
    "ts_purchase timestamp, funnel_depth int"
)

_FUNNEL_STAGES = {"signup": 0, "click": 1, "purchase": 2}


class FunnelProcessor(StatefulProcessor):
    """Streaming ordered-funnel tracker (stream twin of the batch
    ``events_funnel`` query): first signup → first LATER click → first
    LATER purchase, correct under out-of-order arrival.

    ListState is the right primitive here (the third of the typed
    state kinds, after ValueState/MapState above): a per-user buffer of
    milestone events, appended per batch (``appendList``) and re-read
    to recompute the funnel — an earlier signup arriving late can
    re-qualify a click that previously preceded the known signup, so
    no single running (signup, click, purchase) triple is sufficient
    state. State is O(milestone events per user) — bounded by the
    funnel event types, not the stream; at 100 TB attach a TTL or a
    per-user cap upstream if users are immortal."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.buf = handle.getListState("milestones", "stage int, ts_us long")

    def handleInputRows(self, key, rows, timerValues):
        events = [tuple(t) for t in self.buf.get()] if self.buf.exists() else []
        fresh = []
        for pdf in rows:
            hit = pdf[pdf["event_type"].isin(_FUNNEL_STAGES)]
            codes = hit["event_type"].map(_FUNNEL_STAGES)
            # Arrow may hand ts as datetime64[us] or [ns] depending on
            # version; normalize to ns before the int conversion.
            ts_us = hit["ts"].astype("datetime64[ns]").astype("int64") // 1_000
            fresh.extend(
                (int(c), int(t)) for c, t in zip(codes.tolist(), ts_us.tolist())
            )
        if not fresh:
            return
        self.buf.appendList(fresh)
        events.extend(fresh)
        ts_signup = min((t for c, t in events if c == 0), default=None)
        ts_click = (
            min((t for c, t in events if c == 1 and t > ts_signup), default=None)
            if ts_signup is not None
            else None
        )
        ts_purchase = (
            min((t for c, t in events if c == 2 and t > ts_click), default=None)
            if ts_click is not None
            else None
        )
        stamp = lambda us: pd.Timestamp(us, unit="us") if us is not None else pd.NaT
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_seen": [len(events)],
                "ts_signup": [stamp(ts_signup)],
                "ts_click": [stamp(ts_click)],
                "ts_purchase": [stamp(ts_purchase)],
                "funnel_depth": [
                    sum(t is not None for t in (ts_signup, ts_click, ts_purchase))
                ],
            }
        )

    def close(self) -> None:
        pass


def funnel_tws(events: DataFrame) -> DataFrame:
    """events (streaming or batch): user_id, event_type, ts → current
    funnel row per user per micro-batch (Update mode); non-milestone
    event types are filtered in-processor, users with no milestone
    events never materialize state."""
    return (
        events.select("user_id", "event_type", "ts")
        .groupBy("user_id")
        .transformWithStateInPandas(
            FunnelProcessor(),
            outputStructType=FUNNEL_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def user_profiles_tws(events: DataFrame) -> DataFrame:
    """events (streaming or batch): user_id, event_type, value →
    one running-profile row per user per micro-batch (Update mode)."""
    return (
        events.select("user_id", "event_type", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            UserProfileProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
