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
from pyspark.sql import functions as F
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


def merge_stream(
    stream_df: DataFrame,
    lake,
    table_name: str,
    key: str,
    checkpoint_dir: str,
    order_col: str | None = None,
    query_name: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming UPSERT (CDC apply): every micro-batch MERGEs into the
    lakehouse table on ``key``. Same exactly-once contract as
    ``ingest_stream`` — the merge commits with txn_id
    ``f"{name}:{batch_id}"``, so a replayed batch is refused by the
    table's txn ledger and the upsert applies once.

    ``order_col`` enables last-writer-wins compaction WITHIN a batch
    (a CDC micro-batch can carry several updates for one key, but MERGE
    requires unique source keys); (key, order_col) must be unique per
    batch for the survivor to be deterministic."""
    name = query_name or f"merge-{table_name}"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch(lake, table_name, batch_df, key, name, batch_id, order_col)

    writer = (
        stream_df.writeStream.foreachBatch(_sink)
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def merge_batch(
    lake,
    table_name: str,
    batch_df: DataFrame,
    key: str,
    query_name: str,
    batch_id: int,
    order_col: str | None = None,
) -> int:
    """One micro-batch MERGE — the idempotency unit of ``merge_stream``,
    exposed for replay testing. Returns the table version the batch's
    merge committed (or originally committed, on a replay)."""
    from pyspark.sql import functions as F

    if order_col is not None:
        cols = list(batch_df.columns)
        batch_df = (
            batch_df.groupBy(key)
            .agg(F.max_by(F.struct(*cols), F.col(order_col)).alias("_r"))
            .select(*[F.col(f"_r.{c}").alias(c) for c in cols])
        )
    version, _, _ = lake.merge(
        table_name, batch_df, key, txn_id=f"{query_name}:{batch_id}"
    )
    return version


def dedup_gated_ingest(
    stream_df: DataFrame,
    lake,
    table_name: str,
    corpus_index: DataFrame,
    checkpoint_dir: str,
    query_name: str | None = None,
    threshold: float = 0.8,
    available_now: bool = True,
    augment_index: bool = False,
    index_compact_every: int = 8,
    index_rebuild_every: int | None = None,
    corpus_in_table: bool = False,
) -> StreamingQuery:
    """Dedup-gated exactly-once ingest — the production "append only
    novel documents" pipeline in one operator: every micro-batch of
    (doc_id, text, ...) rows is banded ONCE, probed against the corpus
    band index (``streaming.neardup.corpus_band_index``; maintained
    from the already-committed corpus) AND self-joined within the batch
    (``intra_batch_neardup_losers``), rows with a verified
    near-duplicate already in the corpus OR with a lower-id verified
    near-duplicate in the same batch are dropped, and the survivors
    commit through the idempotent ``(query-name, batch_id)`` txn — so a
    replayed batch never duplicates rows.

    In-batch gate semantics: of a group of mutual near-dups arriving in
    ONE micro-batch, exactly the min doc_id lands, and no two landed
    docs of a batch are verified near-duplicates of each other. On
    chains the rule over-deletes (recall-conservative), never
    under-deletes — see ``intra_batch_neardup_losers``.

    ``augment_index=True`` closes the cross-micro-batch gap: after each
    batch commits, the SURVIVORS' band rows are unioned into the probe
    index, so a near-duplicate of a doc that arrived two batches ago is
    gated exactly like a near-duplicate of the original corpus. The
    increment is eagerly localCheckpoint'ed inside the batch (band rows
    are batch-sized — tiny relative to the corpus — and the checkpoint
    severs any lineage back to the consumed micro-batch source), and
    the accumulated union chain is re-checkpointed every
    ``index_compact_every`` batches so the plan stays constant-size on
    long streams. Replay safety: a crash-replayed batch's commit is
    refused by the txn ledger regardless of what the (possibly already
    augmented) gate now flags, and re-augmenting the same band rows is
    harmless — duplicate index rows only produce duplicate candidates,
    which the flagged-id ``distinct`` collapses. Restart recovery:
    the in-memory augmentation dies with the query; rebuild the probe
    index from the committed table itself via ``band_index_from_table``
    (the table is exactly corpus + all committed survivors) and pass it
    as ``corpus_index``.

    Durability caveat (augment mode): the augmented increments live in
    ``localCheckpoint`` blocks, which are NOT fault-tolerant — losing
    an executor loses index blocks and fails the stream mid-run (the
    restart then recovers via ``band_index_from_table`` as above), and
    per-batch checkpointed RDDs are only reclaimed as the driver GCs
    the superseded DataFrame references, a slow accumulation on very
    long continuous (non-availableNow) streams. For those, set
    ``index_rebuild_every=N`` to periodically swap the in-memory chain
    for a fresh reliable index derived from the committed table
    itself; availableNow drains don't need it. Unless
    ``corpus_in_table=True`` (the table-starts-as-the-corpus
    deployment, where the committed table already contains every
    corpus doc), the rebuild UNIONS the caller's original
    ``corpus_index`` back in, so external-corpus gating survives the
    swap — duplicate index rows for docs present in both are harmless
    (duplicate candidates collapse in the flagged-id ``distinct``).
    Each rebuild materializes the fresh index, then unpersists the
    index cached by the PREVIOUS rebuild (never the caller-owned
    ``corpus_index``) — without that, a continuous stream would pin
    one full-corpus cache per rebuild in the CacheManager forever.

    With ``augment_index=False`` the index is pinned for the query's
    lifetime: near-dup NOVEL docs arriving in different micro-batches
    both land (the in-batch gate above still applies WITHIN each
    batch), and the symmetric batch dedup on the table's compaction
    cadence is the backstop.

    Composition note: both gates are stateless band joins applied per
    micro-batch, so the operator adds no Spark streaming state; at
    100 TB the corpus index is the scaling object, the per-batch probe
    is O(|batch| · bands), and the in-batch self-join is bounded by
    true in-batch near-dup cluster size."""
    from mini_lakehouse_control_plane_executor_spark.streaming.neardup import (
        banded_rows,
        incremental_neardup_stream,
        intra_batch_neardup_losers,
    )

    name = query_name or f"dedup-ingest-{table_name}"
    state = {"idx": corpus_index, "batches": 0, "rebuilt": None}

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        # ONE banding pass (tokenize+shingle+md5 — the expensive part)
        # shared by the corpus probe, the in-batch self-join (both
        # sides), and the augment increment; released before return
        # (try/finally: a failed commit must not leak the caches into
        # a restart-and-retry loop).
        banded = banded_rows(batch_df.select("doc_id", "text")).persist()
        keep = None
        try:
            corpus_hit = (
                incremental_neardup_stream(
                    batch_df, state["idx"], threshold=threshold, probe_banded=banded
                )
                .select(F.col("new_id").alias("doc_id"))
            )
            intra_hit = intra_batch_neardup_losers(banded=banded, threshold=threshold)
            flagged = corpus_hit.unionByName(intra_hit).distinct()
            keep = batch_df.join(flagged, "doc_id", "left_anti")
            if augment_index:
                # keep is consumed twice (the commit AND the
                # survivor-index filter) — cache it so the gate joins
                # run once per batch.
                keep = keep.persist()
            write_batch(lake, table_name, keep, name, batch_id)
            if augment_index:
                # Eager: materializes now (while the micro-batch source
                # is live) and breaks lineage to it; returns a plan
                # leaf. The survivors' band rows are a semi-join filter
                # of the already-persisted banded frame — no second
                # banding pass.
                surv = (
                    banded.join(keep.select("doc_id"), "doc_id", "semi")
                    .localCheckpoint()
                )
                state["idx"] = state["idx"].unionByName(
                    surv.select(*state["idx"].columns)
                )
                state["batches"] += 1
                if index_rebuild_every and state["batches"] % index_rebuild_every == 0:
                    # Reliable periodic rebuild for long-running
                    # continuous streams: swaps the accumulated
                    # localCheckpoint chain for an index derived from
                    # the committed table (+ the original corpus index
                    # when the corpus is not itself committed).
                    tbl_idx = band_index_from_table(lake, table_name)
                    new_idx = (
                        tbl_idx
                        if corpus_in_table
                        else tbl_idx.unionByName(
                            corpus_index.select(*tbl_idx.columns)
                        )
                    )
                    # Materialize the fresh cache BEFORE dropping the
                    # superseded one, then release the previous
                    # rebuild's cache (never the caller-owned
                    # corpus_index) — each rebuild otherwise pins one
                    # more full-corpus CacheManager entry forever.
                    tbl_idx.count()
                    if state["rebuilt"] is not None:
                        state["rebuilt"].unpersist()
                    state["rebuilt"] = tbl_idx
                    state["idx"] = new_idx
                elif state["batches"] % index_compact_every == 0:
                    state["idx"] = state["idx"].localCheckpoint()
        finally:
            banded.unpersist()
            if keep is not None:
                keep.unpersist()

    writer = (
        stream_df.writeStream.foreachBatch(_sink)
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def band_index_from_table(lake, table_name: str, **index_kwargs) -> DataFrame:
    """Probe-index recovery for ``dedup_gated_ingest(augment_index=
    True)`` after a restart: the committed table IS corpus + every
    previously committed survivor, so its latest snapshot rebuilds the
    exact gate the augmented in-memory index had reached (modulo any
    batch that crashed between sink-commit and checkpoint advance —
    whose replay is idempotent either way)."""
    from mini_lakehouse_control_plane_executor_spark.streaming.neardup import (
        corpus_band_index,
    )

    return corpus_band_index(
        lake.table(table_name).read().select("doc_id", "text"), **index_kwargs
    )
