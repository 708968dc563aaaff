"""Distributed Bloom filter over text shingles — the broadcast-bitset
decontamination path.

``decontamination_ngram_overlap`` (queries.py) removes benchmark
contamination with a bipartite banded join: cost scales with
|benchmark| × collision rate. This operator replaces the join with a
Bloom filter built FROM the benchmark and broadcast TO the corpus:

- **build**: every benchmark shingle sets k = ``BLOOM_K`` bit positions
  (same md5-derived Carter-Wegman family as MinHash — one digest per
  shingle, engine-portable, so the whole thing is SQL-oracle-checkable).
  Positions pack into 32-bit words via ``groupBy(word_idx).bit_or`` —
  at most ``BLOOM_BITS/32`` rows regardless of benchmark size.
- **probe**: map-only over the corpus — each shingle recomputes its k
  positions and tests them against the broadcast word table. No shuffle
  touches the corpus until the final per-doc aggregate.

At 100 TB this is the right shape when the benchmark is large or the
corpus is re-probed often: the filter build is one pass over the
benchmark, the probe adds ZERO joins against benchmark data (the word
table is fixed-size), and false positives are a tunable, deterministic
property of (m, k) — callers needing exactness re-verify flagged docs
with the exact-join path, by then candidate-bounded.

Defaults (m = 2^16 bits, k = 4) are sized for the TEST corpora so the
false-positive rate is nonzero and therefore oracle-visible: an
implementation that silently substituted an exact join would produce
different (fewer) flags and fail the hash check. Production m scales
with benchmark cardinality (~10 bits/element for ~1% FP).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mini_lakehouse_control_plane_executor_spark.operators.dedup import MINHASH_P

BLOOM_K = 4
BLOOM_BITS = 1 << 16
WORD_BITS = 32  # 1 << bit stays far inside signed-64 in both engines


def _bitval(pos: Column) -> Column:
    """1 << (pos % WORD_BITS) as a long. ``shiftleft`` takes only a
    literal shift, so use 2^bit — powers of two ≤ 2³¹ are exact in
    doubles."""
    return F.pow(F.lit(2.0), (pos % WORD_BITS).cast("int")).cast("long")


def _ab(s: Column) -> tuple[Column, Column]:
    h = F.md5(s)
    a = F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % MINHASH_P
    b = F.conv(F.substring(h, 16, 15), 16, 10).cast("long") % MINHASH_P
    return a, b


def bloom_positions(s: Column, k: int = BLOOM_K, m: int = BLOOM_BITS) -> Column:
    """Array of k bit positions for one shingle: ((a + i·b) mod P) mod m."""
    a, b = _ab(s)
    return F.array(*[((a + F.lit(i) * b) % MINHASH_P % m) for i in range(k)])


def bloom_build(
    grams: DataFrame, gram_col: str, k: int = BLOOM_K, m: int = BLOOM_BITS
) -> DataFrame:
    """Build the packed filter from an exploded gram column → one row
    per 32-bit word: (word_idx long, bits long). Bounded at m/32 rows —
    broadcastable no matter how large the gram set was.

    ONE shuffle: ``bit_or`` is idempotent, so duplicate positions need
    no pre-distinct (which would cost a second, position-cardinality
    exchange) — map-side partial bit_or already absorbs them. The same
    idempotence makes this expression streamable as an unwindowed
    stateful aggregate whose state is the fixed word table (the
    ``cms_cells`` discipline — see test_bloom_stream_equals_batch)."""
    return (
        grams.select(
            F.explode(bloom_positions(F.col(gram_col), k, m)).alias("pos")
        )
        .select(
            (F.col("pos") / WORD_BITS).cast("long").alias("word_idx"),
            _bitval(F.col("pos")).alias("bitval"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bitval").alias("bits"))
    )


def bloom_probe(
    grams: DataFrame,
    id_col: str,
    gram_col: str,
    words: DataFrame,
    k: int = BLOOM_K,
    m: int = BLOOM_BITS,
) -> DataFrame:
    """Probe (id, gram) rows against a built filter → the same rows
    plus ``in_bloom`` (all k probe bits set). Each of the k probes is
    its own map-side broadcast hash join against the word table — the
    grams side NEVER shuffles (no explode+groupBy round trip), which is
    the whole point of the Bloom path at corpus scale."""
    a, b = _ab(F.col(gram_col))
    out = grams.select(
        id_col,
        gram_col,
        *[
            ((a + F.lit(i) * b) % MINHASH_P % m).alias(f"_pos{i}")
            for i in range(k)
        ],
    )
    hits = []
    for i in range(k):
        wi = words.select(
            F.col("word_idx").alias(f"_wi{i}"), F.col("bits").alias(f"_bits{i}")
        )
        out = out.join(
            F.broadcast(wi),
            (F.col(f"_pos{i}") / WORD_BITS).cast("long") == F.col(f"_wi{i}"),
            "left",
        )
        bitval = _bitval(F.col(f"_pos{i}"))
        hits.append(
            F.coalesce(F.col(f"_bits{i}"), F.lit(0)).bitwiseAND(bitval) != 0
        )
    in_bloom = hits[0]
    for h in hits[1:]:
        in_bloom = in_bloom & h
    return out.select(id_col, gram_col, in_bloom.alias("in_bloom"))
