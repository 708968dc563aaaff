"""Exactly-once streaming ingest into a lakehouse table.

``foreachBatch`` gives at-least-once batch delivery (a batch whose sink
ran but whose offset-log write was lost is re-run on restart). The
table's txn-id idempotency (SURVEY §2.7: a commit whose txn_id already
appears in the log is a no-op returning the original version) upgrades
that to exactly-once end-to-end: the replayed batch carries the same
``(query-name, batch_id)`` txn id and the table refuses the duplicate.

This is the standard Delta-style sink contract — the reference has no
streaming at all, so the design point is Spark's, not a port.

Scale notes: each micro-batch writes through the normal insert path
(staged parquet at natural parallelism → OCC commit), so ingest
parallelism is the stream's partitioning; tiny-file buildup from many
micro-batches is reclaimed by the table's existing compaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def ingest_stream(
    stream_df: DataFrame,
    lake,
    table_name: str,
    checkpoint_dir: str,
    query_name: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start a streaming write of ``stream_df`` into ``table_name``.

    Exactly-once: every micro-batch commits with
    ``txn_id=f"{name}:{batch_id}"``; a crash between sink-commit and
    checkpoint advance replays the batch, and the table's idempotent
    txn check turns the replay into a no-op.
    """
    name = query_name or f"ingest-{table_name}"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        write_batch(lake, table_name, batch_df, name, batch_id)

    writer = (
        stream_df.writeStream.foreachBatch(_sink)
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_batch(
    lake, table_name: str, batch_df: DataFrame, query_name: str, batch_id: int
) -> int:
    """One micro-batch commit — the idempotency unit. Exposed separately
    so a replay can be simulated (and tested) without a second stream."""
    return lake.insert(
        table_name, batch_df, txn_id=f"{query_name}:{batch_id}"
    )
