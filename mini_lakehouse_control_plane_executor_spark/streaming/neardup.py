"""Streaming MinHash-LSH near-duplicate detection — the streaming twin
of ``operators.dedup.minhash_dedup_pairs`` (the one LLM-pipeline family
that previously had no streaming variant).

The batch pipeline's shape (signatures -> banded candidates -> verify)
is re-derived for unbounded input:

- **Signatures are map-side.** The batch path aggregates an exploded
  shingle stream (``groupBy(doc_id).agg(min ...)``); a stream cannot
  afford per-doc aggregation state just to build signatures, so here
  each min-hash is an ``array_min`` over the doc's shingle ARRAY — the
  same Carter-Wegman family over one md5 per shingle
  (``operators/dedup.py:259``), evaluated as a pure projection. Batch
  and stream compute bit-identical signatures.
- **Candidates are a watermark-bounded stream-stream self-join.** Band
  keys are exploded (the generator input is a constant
  ``sequence(0, n_bands-1)`` — no HOF-chain re-evaluation risk) and the
  stream joins ITSELF on (band, band_key) with an event-time range
  bound. Join state is therefore keyed by band key and expired by the
  watermark: bounded by (distinct band keys x time horizon), never by
  stream length, and never all-pairs.
- **Verify is in-window and map-side.** Both join sides carry their
  distinct-shingle arrays, so exact Jaccard is an
  ``array_intersect``/``array_union`` size ratio on the joined row — no
  second join, no re-tokenization.
- **Pair uniqueness without dedup state.** A pair colliding in several
  bands would emit once per band; instead of a streaming ``distinct``
  (more keyed state), each emitted row re-derives BOTH sides' band keys
  from the carried (a, b) hash arrays and keeps only the FIRST matching
  band — exactly-once emission as a stateless filter (the standard LSH
  first-collision trick).

The same function runs on a batch DataFrame (watermark and time bound
degrade to plain predicates), which is what the stream≡batch test pins.
At 100 TB/day the state horizon is the product knob: shingle arrays ride
the join state, so the horizon bounds memory, and band-key skew is
bounded by true near-dup cluster size — the same argument as the batch
banded join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mini_lakehouse_control_plane_executor_spark.operators.dedup import (
    MINHASH_BAND_ROWS,
    MINHASH_K,
    MINHASH_P,
    shingles_from_tokens,
)
from mini_lakehouse_control_plane_executor_spark.operators.text import tokens


def _ab_structs(sh: Column) -> Column:
    """Per-shingle (a, b) Carter-Wegman coefficients from ONE md5 —
    identical arithmetic to ``minhash_signatures`` so batch and stream
    signatures agree bit-for-bit."""
    return F.transform(
        sh,
        lambda s: F.struct(
            (F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % MINHASH_P).alias("a"),
            (F.conv(F.substring(F.md5(s), 16, 15), 16, 10).cast("long") % MINHASH_P).alias("b"),
        ),
    )


def _band_key(ab: Column, band: Column, band_rows: int) -> Column:
    """Band key = '|'-joined min-hashes h_i = min over shingles of
    (a + i·b) mod P for the band's ``band_rows`` consecutive i."""
    def h(j: int) -> Column:
        i = band * band_rows + j
        return F.array_min(
            F.transform(ab, lambda x: (x["a"] + i * x["b"]) % MINHASH_P)
        )

    return F.concat_ws("|", *[h(j) for j in range(band_rows)])


def _first_band_verified(
    joined: DataFrame, n_bands: int, band_rows: int, threshold: float
) -> DataFrame:
    """Exactly-once banded-candidate verification shared by the three
    band-join consumers (corpus probe, in-batch gate, stream-stream
    pairs): keep only the FIRST band where the two signatures collide
    (stateless — re-derived from the carried ab arrays, so no streaming
    distinct is needed), then verify TRUE Jaccard >= threshold in exact
    integer arithmetic. Emits ``inter``/``uni`` columns for the
    caller's projection. One definition: a change to the emission rule
    or the threshold rounding cannot silently diverge between the three
    consumers."""
    first_band = F.array_position(
        F.array(
            *[
                _band_key(F.col("l.ab"), F.lit(b), band_rows)
                == _band_key(F.col("r.ab"), F.lit(b), band_rows)
                for b in range(n_bands)
            ]
        ),
        True,
    ) - 1
    inter = F.size(F.array_intersect(F.col("l.sh"), F.col("r.sh")))
    union = F.size(F.array_union(F.col("l.sh"), F.col("r.sh")))
    return (
        joined.filter(F.col("l.band") == first_band)
        .filter(inter * 1000000 >= F.lit(int(round(threshold * 1000000))) * union)
        .withColumn("inter", inter)
        .withColumn("uni", union)
    )


def banded_rows(
    docs: DataFrame,
    n: int = 3,
    k: int = MINHASH_K,
    band_rows: int = MINHASH_BAND_ROWS,
) -> DataFrame:
    """(doc_id, sh, ab, band, bk) band rows of a (doc_id, text)
    relation — the one banding pass shared by the corpus index, the
    stream probe, and the intra-batch self-join, so a caller that needs
    two of those can compute (and persist) the expensive
    tokenize+shingle+md5 work ONCE."""
    n_bands = k // band_rows
    return (
        docs.select("doc_id", tokens(F.col("text")).alias("toks"))
        .select("doc_id", shingles_from_tokens(F.col("toks"), n).alias("sh"))
        .filter(F.size("sh") > 0)
        .withColumn("ab", _ab_structs(F.col("sh")))
        .select(
            "doc_id",
            "sh",
            "ab",
            F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
        )
        .withColumn("bk", _band_key(F.col("ab"), F.col("band"), band_rows))
    )


def corpus_band_index(
    docs: DataFrame,
    n: int = 3,
    k: int = MINHASH_K,
    band_rows: int = MINHASH_BAND_ROWS,
) -> DataFrame:
    """Static band-key index of an EXISTING corpus: (band, bk, doc_id,
    sh, ab) — the probe target for ``incremental_neardup_stream``. In
    production this is maintained incrementally as batches commit (each
    committed batch appends its own band rows); here it is derived in
    one map-side pass + explode and persisted."""
    from pyspark.storagelevel import StorageLevel

    return banded_rows(docs, n, k, band_rows).persist(StorageLevel.MEMORY_AND_DISK)


def incremental_neardup_stream(
    new_docs: DataFrame,
    corpus_index: DataFrame,
    n: int = 3,
    k: int = MINHASH_K,
    band_rows: int = MINHASH_BAND_ROWS,
    threshold: float = 0.8,
    probe_banded: DataFrame | None = None,
) -> DataFrame:
    """Streaming ingest dedup — the stream twin of the batch
    ``incremental_dedup_newbatch`` query: each ARRIVING doc is checked
    against the STATIC corpus index via a stream-static equi-join on
    (band, band_key), and verified near-dup pairs (new_id, old_id,
    jaccard ≥ threshold) are emitted exactly once (first-collision-band
    filter, stateless).

    This operator keeps ZERO streaming state: no watermark, no join
    state, no dedup state — the static side is a bounded relation Spark
    hash-joins per micro-batch, signatures are map-side expressions, and
    pair uniqueness is a stateless filter. Throughput is therefore
    bounded only by the band join; at 100 TB the corpus index is the
    thing that scales (band rows per corpus doc), and it is partitioned
    by band key exactly like the batch path's self-join side.

    ``new_docs`` needs (doc_id, text) and may be streaming or batch (the
    batch form is what the stream≡batch test pins). ``probe_banded``
    short-circuits the banding pass when the caller already computed
    (and persisted) the batch's band rows — ``dedup_gated_ingest``
    shares one banded frame between this corpus probe and its
    intra-batch self-join."""
    n_bands = k // band_rows
    probe = (
        probe_banded
        if probe_banded is not None
        else banded_rows(new_docs, n, k, band_rows)
    ).alias("l")
    r = corpus_index.alias("r")
    joined = probe.join(
        r,
        (F.col("l.band") == F.col("r.band"))
        & (F.col("l.bk") == F.col("r.bk"))
        & (F.col("l.doc_id") != F.col("r.doc_id")),
    )
    return _first_band_verified(joined, n_bands, band_rows, threshold).select(
        F.col("l.doc_id").alias("new_id"),
        F.col("r.doc_id").alias("old_id"),
        F.round(F.col("inter") / F.col("uni"), 6).alias("jaccard"),
    )


def intra_batch_neardup_losers(
    docs: DataFrame | None = None,
    n: int = 3,
    k: int = MINHASH_K,
    band_rows: int = MINHASH_BAND_ROWS,
    threshold: float = 0.8,
    banded: DataFrame | None = None,
) -> DataFrame:
    """doc_ids that have a verified near-duplicate (Jaccard >=
    ``threshold``) with a LOWER doc_id in the SAME relation — the
    in-batch gate of ``dedup_gated_ingest``: dropping exactly these ids
    leaves a set in which NO two surviving docs are near-duplicates
    (any verified pair has a higher side, and the higher side is
    dropped), and a group of mutual near-dups keeps exactly its min id.
    On chains (A~B~C, A!~C) the rule is recall-conservative: C is
    dropped because of B even though B itself is dropped because of A —
    over-deletion, never under-deletion, the right bias for an ingest
    gate whose residuals have no second chance until compaction.

    Batch-only (a band SELF-join — per micro-batch inside foreachBatch,
    where the batch is a plain DataFrame). Pass ``banded``
    (``banded_rows`` output, ideally persisted) to share the banding
    pass with the corpus probe; otherwise ``docs`` (doc_id, text) is
    banded here. The first-collision-band filter keeps the pre-distinct
    volume at one row per colliding pair, and the join volume is
    bounded by true in-batch near-dup cluster size — the batch banded
    self-join argument at micro-batch scale."""
    n_bands = k // band_rows
    if banded is None:
        banded = banded_rows(docs, n, k, band_rows)
    l, r = banded.alias("l"), banded.alias("r")
    joined = l.join(
        r,
        (F.col("l.band") == F.col("r.band"))
        & (F.col("l.bk") == F.col("r.bk"))
        & (F.col("l.doc_id") < F.col("r.doc_id")),
    )
    return (
        _first_band_verified(joined, n_bands, band_rows, threshold)
        .select(F.col("r.doc_id").alias("doc_id"))
        .distinct()
    )


def neardup_pairs(
    docs: DataFrame,
    n: int = 3,
    k: int = MINHASH_K,
    band_rows: int = MINHASH_BAND_ROWS,
    threshold: float = 0.8,
    watermark: str = "2 hours",
    max_gap_minutes: int = 60,
) -> DataFrame:
    """Near-duplicate pairs (id1 < id2, Jaccard ≥ threshold) among docs
    whose event times are within ``max_gap_minutes`` of each other.
    ``docs`` needs (doc_id, text, ts) and may be streaming or batch —
    the streaming plan keeps join state only for the watermark horizon.
    Empty-shingle docs (shorter than the shingle width) cannot collide
    and are dropped up front, mirroring the batch pipeline."""
    n_bands = k // band_rows
    base = (
        docs.select("doc_id", "ts", tokens(F.col("text")).alias("toks"))
        .select("doc_id", "ts", shingles_from_tokens(F.col("toks"), n).alias("sh"))
        .filter(F.size("sh") > 0)
        .withColumn("ab", _ab_structs(F.col("sh")))
    )
    if base.isStreaming:
        base = base.withWatermark("ts", watermark)
    banded = base.select(
        "doc_id",
        "ts",
        "sh",
        "ab",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).withColumn("bk", _band_key(F.col("ab"), F.col("band"), band_rows))
    l = banded.alias("l")
    r = banded.alias("r")
    gap = F.expr(f"INTERVAL {max_gap_minutes} MINUTES")
    joined = l.join(
        r,
        (F.col("l.band") == F.col("r.band"))
        & (F.col("l.bk") == F.col("r.bk"))
        & (F.col("l.doc_id") < F.col("r.doc_id"))
        & (F.col("r.ts") >= F.col("l.ts") - gap)
        & (F.col("r.ts") <= F.col("l.ts") + gap),
    )
    return _first_band_verified(joined, n_bands, band_rows, threshold).select(
        F.col("l.doc_id").alias("id1"),
        F.col("r.doc_id").alias("id2"),
        F.round(F.col("inter") / F.col("uni"), 6).alias("jaccard"),
    )
