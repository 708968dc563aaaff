"""Structured Streaming operators over the event stream.

The reference has no streaming at all (SURVEY §2.6); this module is the
beyond-reference stream surface: watermarked tumbling/sliding window
aggregation and session windows, written so the SAME transformation
function applies to a batch DataFrame and a streaming one — Spark's
unified model. Tests run each against a file source with
``trigger(availableNow=True)`` and assert equality with the batch twin.

Scale notes: windowed aggregation state is partitioned by (window, key)
— Spark distributes it across executors and expires it by watermark, so
state size is bounded by (watermark horizon × key cardinality), not by
stream length. Session windows use ``F.session_window``, whose state
merges adjacent intervals per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of event rows (one parquet dir; new files are
    discovered per micro-batch)."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts per event type. Works on both
    batch and streaming DataFrames (watermark is a no-op in batch)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Hopping-window aggregation (each event lands in window/slide
    overlapping windows)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", window, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "n_events")
    )


def moments_sums(events: DataFrame) -> DataFrame:
    """The higher-moment sketch state of
    ``queries.events_moments_skew_kurtosis`` as a batch/stream-unified
    aggregate: count plus four INTEGER power sums over centi-quantized
    values (decimal(38,0) accumulators, with the x^3 cube multiplied
    through decimal per row — x^3/x^4 of a max centi value overflow
    int64). Per-row contract (same as the batch twin): the x2 SQUARE is
    computed in int64 before promotion, so |value| <= ~3e7 (|xc| <=
    ~3.0e9) is required for x2 itself — promoting the square to decimal
    would only move the bound to the decimal(38,0) per-row quartic
    ceiling (x2*x2 <= 1e38, i.e. |xc| <= ~3.2e9), so the contract is
    stated instead of widened. The sums are commutative, associative, and
    mergeable, so Structured Streaming's own incremental aggregation
    state IS the sketch — when the state is an algebraic aggregate, use
    the engine's, not a custom applyInPandasWithState operator. No
    watermark: state is bounded by the event-type vocabulary, like the
    CMS/HLL cell twins. The stream drain equals the batch sums
    bit-exactly (tests/test_streaming.py), and the batch query derives
    skewness/kurtosis from exactly these columns."""
    xc = F.round(F.col("value") * 100).cast("long")
    d = events.select("event_type", xc.alias("xc"), (xc * xc).alias("x2"))
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("xc").cast("decimal(38,0)")).alias("m1"),
        F.sum(F.col("x2").cast("decimal(38,0)")).alias("m2"),
        F.sum(
            F.col("xc").cast("decimal(19,0)") * F.col("x2").cast("decimal(19,0)")
        ).alias("m3"),
        F.sum(
            F.col("x2").cast("decimal(19,0)") * F.col("x2").cast("decimal(19,0)")
        ).alias("m4"),
    )


def langid_model_counts(docs: DataFrame) -> DataFrame:
    """The NB language-ID TRAINING state of
    ``queries.docs_langid_nb_confusion`` as a batch/stream-unified
    aggregate: exact (lang, bucket) char-trigram counts over the
    1024-bucket hashed feature space. State is bounded by
    |langs| x 1024 regardless of corpus size and merges by addition, so
    Structured Streaming's own incremental aggregation IS the model
    trainer; the scoring side consumes a pure function (Laplace
    micro-nat log-likelihoods + priors) of these cells at read time,
    making continuous model refresh free — the moments_sums /
    value-histogram discipline applied to a trainable model. The stream
    drain equals the batch counts bit-exactly
    (tests/test_streaming.py)."""
    from mini_lakehouse_control_plane_executor_spark.queries import _LANGID_B

    d = docs.select("lang", F.lower(F.col("text")).alias("txt")).filter(
        F.length("txt") >= 3
    )
    tg = d.select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, length(txt) - 2), i -> substring(txt, i, 3))"
            )
        ).alias("g"),
    )
    b = (
        F.conv(F.substring(F.md5(F.concat(F.lit("g:"), F.col("g"))), 1, 15), 16, 10)
        .cast("long")
        % _LANGID_B
    )
    return (
        tg.select("lang", b.alias("b"))
        .groupBy("lang", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity. Streaming state is merged per user by Spark's
    session_window operator; batch mode gives the same result."""
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "complete"):
    """Drain a streaming DataFrame into an in-memory table with
    availableNow (process-everything-then-stop) semantics; returns the
    finished StreamingQuery."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


_FP_NULL = "\x00NULL\x00"  # sentinel no real column value can produce


def _fp_part(col: F.Column) -> F.Column:
    """NULL-distinguishing fingerprint part: concat_ws silently SKIPS
    nulls, which would make (value=NULL, props='x') and (value='x',
    props=NULL) collide — encode NULL as an explicit sentinel instead."""
    return F.coalesce(col.cast("string"), F.lit(_FP_NULL))


def event_fingerprint() -> F.Column:
    """Content fingerprint over everything except the surrogate event_id
    — the streaming twin of operators/dedup exact dedup. The timestamp
    participates at MICROSECOND precision (Spark's native timestamp
    resolution — ``cast('long')`` would truncate to seconds and collide
    distinct events within the same second), matching the
    events_dedup_distinct oracle's full-precision SELECT DISTINCT."""
    return F.md5(
        F.concat_ws(
            "|",
            _fp_part(F.col("user_id")),
            _fp_part(F.col("event_type")),
            _fp_part(F.col("value")),
            _fp_part(F.col("props")),
            _fp_part(F.unix_micros(F.col("ts"))),
        )
    )


def dedup_events(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exact streaming dedup on a content fingerprint. Streaming state is
    bounded by the watermark horizon (``dropDuplicatesWithinWatermark``),
    so at 100 TB/day the dedup state holds one fingerprint per distinct
    event within the horizon — not per event ever seen. The batch twin is
    a plain ``dropDuplicates``; both return the distinct content rows
    (event_id excluded, so survivor choice cannot differ between
    engines)."""
    df = events.withColumn("fp", event_fingerprint())
    if df.isStreaming:
        df = df.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["fp"])
    else:
        df = df.dropDuplicates(["fp"])
    return df.select("ts", "user_id", "event_type", "value", "props")


def enrich_with_user_stats(events: DataFrame, user_stats: DataFrame) -> DataFrame:
    """Stream-static enrichment: join the (possibly streaming) event
    flow against a static per-user dimension. Spark plans the static
    side as a broadcast per micro-batch, so the stream side never
    shuffles — the standard feature-enrichment topology."""
    return events.join(F.broadcast(user_stats), "user_id", "left").select(
        "ts", "user_id", "event_type", "value",
        F.coalesce(F.col("user_events"), F.lit(0)).alias("user_events"),
    )


def correlate_events(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    max_delay: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream INNER JOIN with an event-time range condition:
    pair each left event with right events for the same key arriving in
    (left.ts, left.ts + max_delay]. On streaming inputs both sides carry
    watermarks, and the time-range join condition lets Spark bound the
    buffered state to the watermark+delay horizon — without it a
    stream-stream join would buffer both streams forever. The identical
    code runs in batch (an equi-key join with a range filter), which is
    how the stream≡batch test and the DuckDB oracle attest it.

    100 TB shape: one co-partitioned shuffle of both streams on the key;
    the range predicate is evaluated post-match, so per-key fan-out is
    bounded by true correlation density, never |left|x|right|."""
    l = left.select(
        F.col(key).alias("l_key"),
        F.col("ts").alias("l_ts"),
        F.col("event_type").alias("l_type"),
    )
    r = right.select(
        F.col(key).alias("r_key"),
        F.col("ts").alias("r_ts"),
        F.col("event_type").alias("r_type"),
    )
    if l.isStreaming:
        l = l.withWatermark("l_ts", watermark)
    if r.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, "inner").select(
        F.col("l_key").alias("user_id"), "l_ts", "r_ts", "l_type", "r_type"
    )
