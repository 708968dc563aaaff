"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The container has no media libraries, so the actual decode step is
STUBBED: ``register_decoder`` lets a real deployment plug in
PIL/torchaudio/ffmpeg; the default decoder is either a clearly-marked
``NotImplementedError`` ("strict") or a deterministic fake
("fake", md5-derived features) so the Spark-side plumbing — schema,
partition sizing, UDF signature, Arrow batch shape — is real and
testable end-to-end.

Scale notes: media bytes stay in executor-side Arrow batches (never
collected); ``repartition_for_media`` sizes partitions by byte budget,
not row count, because row count is meaningless when one row is a 50 MB
video. Feature extraction is a narrow map — no shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

Decoder = Callable[[bytes, str], list[float]]


def fake_decoder(data: bytes, mime: str) -> list[float]:
    """Deterministic stand-in for a real decode→featurize pipeline:
    FEATURE_DIM floats derived from the md5 of the bytes. Reproducible
    across runs/engines, so tests can assert exact values."""
    h = hashlib.md5(data).digest()
    return [round(b / 255.0, 6) for b in h[:FEATURE_DIM]]


def strict_decoder(data: bytes, mime: str) -> list[float]:
    """The real-decode slot. Media libraries (PIL/torchaudio/ffmpeg) are
    not available in this container."""
    raise NotImplementedError(
        "media decoding requires PIL/torchaudio/ffmpeg — not installed; "
        "register a real decoder via extract_features(decoder=...)"
    )


def repartition_for_media(
    df: DataFrame, size_col: Column, target_bytes: int = 256 * 1024 * 1024
) -> DataFrame:
    """Partition by cumulative byte budget: media rows vary by orders of
    magnitude, so partition count derives from total payload bytes, not
    row count."""
    total = df.agg(F.sum(size_col).alias("b")).collect()[0]["b"] or 0
    n = max(1, int(total // target_bytes) + 1)
    return df.repartition(n)


def extract_features(
    media_df: DataFrame, decoder: Decoder = fake_decoder, batch_size_hint: int = 64
) -> DataFrame:
    """Decode/featurize each media row via mapInPandas (Arrow batches in,
    Arrow batches out). The decoder runs per-row inside a batch but the
    transfer and schema handling are fully vectorized."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "mime": pdf["mime"],
                "n_bytes": pdf["media"].map(lambda b: len(b) if b is not None else 0),
                "features": [
                    decoder(bytes(b), m) if b is not None else None
                    for b, m in zip(pdf["media"], pdf["mime"])
                ],
            }
            yield pd.DataFrame(out)

    return media_df.mapInPandas(run, schema=FEATURES_SCHEMA)


def image_resize(
    media_df: DataFrame, width: int, height: int, decoder: Decoder | None = None
) -> DataFrame:
    """Resize plumbing: same mapInPandas shape, output is binary again.
    Stubbed: without a real image library the 'resized' payload is the
    md5 fingerprint of (bytes, target size) — deterministic, wrong, and
    clearly labeled; swap in a PIL-based transform in deployment."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                hashlib.md5(bytes(b) + f":{width}x{height}".encode()).digest()
                if b is not None
                else None
                for b in pdf["media"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media": resized,
                    "mime": pdf["mime"],
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("media", T.BinaryType()),
            T.StructField("mime", T.StringType()),
        ]
    )
    return media_df.mapInPandas(run, schema=schema)


def frame_sample_plan(media_df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode each video row into frame
    timestamps from metadata (no decode needed — duration lives in
    meta). The decode of each frame is then an extract_features call.
    Samples every instant i*every_ms STRICTLY below the duration —
    ceil(duration/every) frames via integer arithmetic: the old floor
    form silently dropped the last valid frame of any duration that is
    not a multiple of every_ms (2500 ms @ 1000 lost its 2000 ms frame)
    and emitted a phantom frame_ts 0 for zero-duration rows."""
    n_frames = F.expr(
        f"cast((meta.duration_ms + {every_ms - 1}) div {every_ms} as int)"
    )
    return (
        media_df.filter(
            F.col("meta.duration_ms").isNotNull() & (F.col("meta.duration_ms") > 0)
        )
        .select(
            "media_id",
            "mime",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_frames - 1),
                    lambda i: i * every_ms,
                )
            ).alias("frame_ts_ms"),
        )
    )


PCM_MOD = 2001
PCM_AMP = 1000  # samples in [-1000, 1000] — int16-safe by construction


def synth_pcm(doc_id: int, n: int) -> bytes:
    """Deterministic fake 16-bit little-endian mono PCM for doc
    ``doc_id``: sample_i = (h * (i+1)) % 2001 - 1000 with h the first
    8 md5 hex chars of the id — integer arithmetic reproducible
    bit-for-bit in a SQL oracle, which is what lets the audio pipeline
    below be VALUE-checked rather than rows-only. In a real deployment
    this synthesizer is replaced by the stored audio bytes; everything
    downstream (decode, framing, RMS) is unchanged."""
    import numpy as np

    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
    i = np.arange(1, n + 1, dtype=np.int64)
    v = (h * i) % PCM_MOD - PCM_AMP
    return v.astype("<i2").tobytes()


def audio_frame_rms(
    docs_df: DataFrame,
    id_col: str = "doc_id",
    len_col: str = "n_chars",
    frame: int = 1024,
    max_samples: int = 4096,
) -> DataFrame:
    """Audio frame-RMS extraction: per doc, synthesize (or in a real
    deployment, read) a 16-bit PCM binary column, DECODE it
    (np.frombuffer — the real int16 wire-format decode), window into
    ``frame``-sample frames, and emit per-doc frame stats with the
    peak frame RMS in integer micro-units — the loudness-profile /
    silence-detection primitive of an audio-curation pipeline.

    Determinism contract: the sum of squares per frame is an EXACT
    int64 (samples are small ints), so rms = floor(sqrt(ssq/n)*1e6) is
    identical in numpy and in a SQL engine (same int->double
    conversion, same IEEE sqrt; floor, not round — round's half-case
    differs between numpy's half-even and SQL's half-away).

    100 TB shape: one Arrow-batched ``mapInPandas`` narrow map (bytes
    never leave the executor, no shuffle before the final top-k); the
    per-doc sample count is capped by contract."""
    import numpy as np

    base = docs_df.select(
        F.col(id_col).alias("doc_id"),
        F.least(F.col(len_col), F.lit(max_samples)).cast("int").alias("n"),
    ).filter(F.col("n") > 0)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("n_samples", T.LongType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("peak_rms_micro", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_samples": [], "n_frames": [], "peak_rms_micro": []}
            for doc_id, n in zip(pdf["doc_id"], pdf["n"]):
                blob = synth_pcm(int(doc_id), int(n))  # the binary audio column
                dec = np.frombuffer(blob, dtype="<i2").astype(np.int64)
                starts = np.arange(0, len(dec), frame)
                ssq = np.add.reduceat(dec * dec, starts)
                cnt = (np.minimum(starts + frame, len(dec)) - starts).astype(np.float64)
                rms = np.floor(np.sqrt(ssq / cnt) * 1e6).astype(np.int64)
                out["doc_id"].append(int(doc_id))
                out["n_samples"].append(len(dec))
                out["n_frames"].append(len(starts))
                out["peak_rms_micro"].append(int(rms.max()))
            yield pd.DataFrame(out)

    return base.mapInPandas(run, schema=schema)


IMG_PIX_MOD = 256


def synth_rgb(doc_id: int, w: int, h: int) -> bytes:
    """Deterministic fake RGB image bytes (HWC uint8) for doc
    ``doc_id``: pixel value at flat index i is (h0 * (i+1)) % 256 with
    h0 the first 8 md5 hex chars of the id — integer arithmetic
    reproducible bit-for-bit in a SQL oracle, the image sibling of
    ``synth_pcm``. In a real deployment the stored/decoded image bytes
    replace this synthesizer; the pooling/statistics pipeline below is
    unchanged."""
    import numpy as np

    h0 = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
    i = np.arange(1, w * h * 3 + 1, dtype=np.int64)
    return ((h0 * i) % IMG_PIX_MOD).astype(np.uint8).tobytes()


def image_block_stats(
    docs_df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Image feature extraction through the real multimodal plumbing:
    per doc a deterministic RGB image is synthesized (stand-in for a
    stored binary image column), DECODED (np.frombuffer + HWC reshape —
    the real uint8 wire-format decode), 2x2 average-pooled with integer
    floor division (the downsample every vision-curation pipeline runs
    before featurizing), and reduced to per-channel pooled sums plus an
    integer-milli mean brightness — the dedup/quality signals of an
    image-curation pass. Image dims vary per doc (8-16 px per side,
    even by construction) so the variable-shape decode path is
    exercised, not just one fixed buffer size.

    Determinism contract (the audio_frame_rms discipline): pixels are
    exact small ints, the 2x2 pool is (p00+p01+p10+p11) // 4 (floor),
    channel sums are exact int64, and brightness_milli =
    total*1000 // (3*pooled_pixels) — every step integer, so a SQL
    engine reproduces the values bit-for-bit and the pipeline is
    VALUE-checked end-to-end, not rows-only.

    100 TB shape: one Arrow-batched ``mapInPandas`` narrow map — image
    bytes never leave the executor and never shuffle; per-doc output is
    one 7-column row."""
    import numpy as np

    base = docs_df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        (8 + (F.col(id_col) % 3) * 4).cast("int").alias("w"),
        (8 + (F.col(id_col) % 5) * 2).cast("int").alias("h"),
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("width", T.LongType()),
            T.StructField("height", T.LongType()),
            T.StructField("sum_r", T.LongType()),
            T.StructField("sum_g", T.LongType()),
            T.StructField("sum_b", T.LongType()),
            T.StructField("brightness_milli", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {k: [] for k in (
                "doc_id", "width", "height", "sum_r", "sum_g", "sum_b",
                "brightness_milli",
            )}
            for doc_id, w, h in zip(pdf["doc_id"], pdf["w"], pdf["h"]):
                doc_id, w, h = int(doc_id), int(w), int(h)
                blob = synth_rgb(doc_id, w, h)  # the binary image column
                arr = (
                    np.frombuffer(blob, dtype=np.uint8)
                    .astype(np.int64)
                    .reshape(h, w, 3)
                )
                pooled = arr.reshape(h // 2, 2, w // 2, 2, 3).sum(axis=(1, 3)) // 4
                s = pooled.sum(axis=(0, 1))
                np_cells = (h // 2) * (w // 2)
                cols["doc_id"].append(doc_id)
                cols["width"].append(w)
                cols["height"].append(h)
                cols["sum_r"].append(int(s[0]))
                cols["sum_g"].append(int(s[1]))
                cols["sum_b"].append(int(s[2]))
                cols["brightness_milli"].append(
                    int(s.sum()) * 1000 // (3 * np_cells)
                )
            yield pd.DataFrame(cols)

    return base.mapInPandas(run, schema=schema)


DHASH_ASSET_DOCS = 4   # docs sharing one image asset (seed = doc_id // 4)
DHASH_NOISE_MOD = 101  # ~1% of pixels perturbed per doc
DHASH_NOISE_ADD = 16


def synth_rgb_asset(seed: int, doc_id: int, w: int, h: int) -> bytes:
    """Deterministic SHARED image asset with per-doc noise: the base
    pixels derive from the ASSET seed (the CDN reality — many docs
    embed the same image), and ~1/NOISE_MOD of pixels get +NOISE_ADD
    (mod 256) keyed by the embedding doc — re-encode/watermark-grade
    perturbation. Integer arithmetic throughout, so a SQL oracle
    reproduces every byte (the ``synth_rgb`` discipline)."""
    import numpy as np

    h0 = int(hashlib.md5(str(seed).encode()).hexdigest()[:8], 16)
    j = np.arange(w * h * 3, dtype=np.int64)
    base = (h0 * (j + 1)) % IMG_PIX_MOD
    noisy = np.where(
        (doc_id * 131 + j) % DHASH_NOISE_MOD == 0,
        (base + DHASH_NOISE_ADD) % IMG_PIX_MOD,
        base,
    )
    return noisy.astype(np.uint8).tobytes()


def image_dhash(docs_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """64-bit dHash (difference hash — the standard perceptual
    near-dup fingerprint: krawetz.net dHash; same geometry as
    pHash-family tools) through the real multimodal plumbing: per doc
    the shared-asset image is synthesized (stand-in for a stored
    binary image column), DECODED (np.frombuffer + HWC reshape),
    grid-sampled to the canonical 8×9 grayscale (nearest-neighbor at
    integer coordinates ``r*h//8, c*w//9`` — exact-integer resize so
    the hash is engine-reproducible), and each of the 64 bits is the
    horizontal gradient sign gray[r][c] > gray[r][c+1]. Output: the
    fingerprint as TWO non-negative 32-bit halves (dha, dhb) — the
    exact shape ``dedup.hamming_pairs_from_halves`` consumes, because
    a perceptual hash's whole point is that near-duplicate images land
    within a few bits.

    Determinism contract: pixels are exact small ints, grayscale is
    (R+G+B)//3 floor division, comparisons are strict — bit-for-bit
    SQL-reproducible, so the pipeline is VALUE-checked end-to-end.

    100 TB shape: one Arrow-batched ``mapInPandas`` narrow map — image
    bytes never leave the executor and never shuffle; per-doc output
    is one 3-column row (the 8-byte hash, not the image)."""
    import numpy as np

    base = docs_df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        (F.col(id_col) / DHASH_ASSET_DOCS).cast("long").alias("seed"),
    ).select(
        "doc_id",
        "seed",
        (8 + (F.col("seed") % 3) * 4).cast("int").alias("w"),
        (8 + (F.col("seed") % 5) * 2).cast("int").alias("h"),
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("dha", T.LongType()),
            T.StructField("dhb", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "dha": [], "dhb": []}
            for doc_id, seed, w, h in zip(
                pdf["doc_id"], pdf["seed"], pdf["w"], pdf["h"]
            ):
                doc_id, seed, w, h = int(doc_id), int(seed), int(w), int(h)
                blob = synth_rgb_asset(seed, doc_id, w, h)
                arr = (
                    np.frombuffer(blob, dtype=np.uint8)
                    .astype(np.int64)
                    .reshape(h, w, 3)
                )
                ri = (np.arange(8) * h) // 8
                ci = (np.arange(9) * w) // 9
                gray = arr[np.ix_(ri, ci)].sum(axis=2) // 3  # 8x9 ints
                bits = (gray[:, :-1] > gray[:, 1:]).astype(np.int64)  # 8x8
                flat = bits.reshape(64)
                weights = np.int64(1) << np.arange(64, dtype=np.int64)
                dha = int((flat[:32] * weights[:32]).sum())
                dhb = int((flat[32:] * weights[:32]).sum())
                out["doc_id"].append(doc_id)
                out["dha"].append(dha)
                out["dhb"].append(dhb)
            yield pd.DataFrame(out)

    return base.mapInPandas(run, schema=schema)
