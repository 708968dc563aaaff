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
        # lexicographically smallest type name.
        top = sorted(counts, key=lambda t: (-counts[t], t))[0]
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
