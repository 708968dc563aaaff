"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the point of each operator at 100 TB):

- **exact**: one hash-shuffle on the fingerprint; no pair join at all.
- **n-gram Jaccard**: exact pairwise similarity — correct but quadratic
  in the worst case; used as the verifier AFTER a candidate generator.
- **MinHash+LSH**: the candidate generator. k md5-derived min-hashes per
  doc → b bands → a pair is a candidate iff it shares a band bucket.
  Each band is one groupBy-shuffle; the quadratic join happens only
  inside buckets (planted near-dups), never across the whole corpus.
- **SimHash**: 32-bit signature per doc via bitwise majority of token
  hashes; near-dup iff hamming ≤ r. Banding on signature bytes prunes
  candidates the same way.

All hashing derives from md5 (identical in Spark and DuckDB), so every
operator has a full SQL oracle — no RNG, no engine-specific hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mini_lakehouse_control_plane_executor_spark.operators.text import fingerprint, tokens

# MinHash defaults: 12 hashes in 4 bands of 3 → catches J≥0.8 with
# P ≈ 1-(1-0.8³)⁴ ≈ 0.95 while keeping the band shuffle cheap.
MINHASH_K = 12
MINHASH_BAND_ROWS = 3

SIMHASH_BITS = 32
SIMHASH_BANDS = 4  # 8-bit bands → candidates share ≥1 byte


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (array<string>).
    Pure column expression: tokenize → sliding window via sequence +
    element_at → distinct."""
    toks = tokens(col)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    gram = lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])
    return F.when(
        F.size(toks) >= n, F.array_distinct(F.transform(idx, gram))
    ).otherwise(F.array().cast("array<string>"))


def exploded_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("s"),
    )


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group by content fingerprint; keep the min-id representative.
    Returns (fp, n_copies, keep_id) — one shuffle, no join."""
    return (
        df.select(F.col(id_col).alias("doc_id"), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keep_id"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The deduplicated corpus: one representative row per fingerprint
    (min id wins), via a single window-free groupBy+semi-join."""
    keep = exact_duplicates(df, id_col, text_col).select(F.col("keep_id").alias(id_col))
    return df.join(keep, on=id_col, how="left_semi")


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact pairwise)
# ---------------------------------------------------------------------------


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Pairs (id1 < id2) with shingle-Jaccard ≥ threshold.

    Without ``candidates`` this is the exact quadratic algorithm (shingle
    self-join); with a candidate pair DataFrame (id1, id2) the join is
    restricted to those pairs — the LSH-pruned path.
    """
    ex = exploded_shingles(df, id_col, text_col, n)
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))

    if candidates is not None:
        # Candidate-driven intersection: fan each candidate pair out over
        # id1's shingles, then equi-join on (id2, shingle). Work is
        # O(|candidates| · shingles-per-doc) — the whole point of LSH —
        # instead of the corpus-wide quadratic shingle self-join below.
        ex1 = ex.select(F.col("doc_id").alias("id1"), "s")
        ex2 = ex.select(F.col("doc_id").alias("id2"), "s")
        inter = (
            candidates.join(ex1, "id1")
            .join(ex2, ["id2", "s"])
            .groupBy("id1", "id2")
            .agg(F.count(F.lit(1)).alias("c"))
        )
    else:
        a = ex.alias("a")
        b = ex.alias("b")
        inter = (
            a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
            .groupBy("id1", "id2")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    s1 = sizes.select(F.col("doc_id").alias("id1"), F.col("n_sh").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("id2"), F.col("n_sh").alias("n2"))
    return (
        inter.join(s1, "id1")
        .join(s2, "id2")
        .select(
            "id1",
            "id2",
            F.round(F.col("c") / (F.col("n1") + F.col("n2") - F.col("c")), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, k: int = MINHASH_K
) -> DataFrame:
    """k min-hashes per doc: h_i = min over shingles of md5(shingle‖':'‖i).
    md5 hex strings compare lexicographically ≡ numerically, and DuckDB
    computes the identical value — fully oracle-checkable."""
    ex = exploded_shingles(df, id_col, text_col, n)
    return ex.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.col("s"), F.lit(f":{i}")))).alias(f"h{i}")
            for i in range(k)
        ]
    )


def lsh_candidates(
    sigs: DataFrame, k: int = MINHASH_K, band_rows: int = MINHASH_BAND_ROWS
) -> DataFrame:
    """Candidate pairs = docs sharing any band key. One groupBy-join per
    band over (band_key) — the shuffle key is the band hash, so skew is
    bounded by true near-dup cluster size."""
    n_bands = k // band_rows
    per_band = []
    for b in range(n_bands):
        cols = [F.col(f"h{i}") for i in range(b * band_rows, (b + 1) * band_rows)]
        band = sigs.select(
            F.col("doc_id"), F.md5(F.concat_ws("|", *cols)).alias("bk")
        )
        l = band.alias("l")
        r = band.alias("r")
        per_band.append(
            l.join(r, (F.col("l.bk") == F.col("r.bk")) & (F.col("l.doc_id") < F.col("r.doc_id")))
            .select(F.col("l.doc_id").alias("id1"), F.col("r.doc_id").alias("id2"))
        )
    out = per_band[0]
    for p in per_band[1:]:
        out = out.unionAll(p)
    return out.distinct()


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    k: int = MINHASH_K,
    band_rows: int = MINHASH_BAND_ROWS,
) -> DataFrame:
    """Full MinHash-LSH pipeline: signatures → banded candidates → exact
    Jaccard verification of candidates only."""
    sigs = minhash_signatures(df, id_col, text_col, n, k)
    cands = lsh_candidates(sigs, k, band_rows)
    return jaccard_pairs(df, id_col, text_col, n, threshold, candidates=cands)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _feature_hash60(feat: Column) -> Column:
    """60-bit integer hash of a feature string from the first 15 md5 hex
    chars — representable in a signed 64-bit long in both engines."""
    return F.conv(F.substring(F.md5(feat), 1, 15), 16, 10).cast("long")


def simhash_from_hashes(hashes: Column, bits: int = SIMHASH_BITS) -> Column:
    """Bitwise-majority SimHash over a pre-computed array<long> of
    feature hashes: bit j of the signature is 1 iff more hashes have bit
    j set than unset. Callers should materialize the hash array in its
    own projection first (one md5 pass) — the 'bits' bit-count terms all
    reference that attribute instead of re-deriving md5 per bit."""
    n_feat = F.size(hashes)
    out = F.lit(0).cast("long")
    for j in range(bits):
        ones = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.shiftright(h, j).bitwiseAND(F.lit(1)).cast("int"),
        )
        out = out + F.when(ones * 2 > n_feat, F.lit(2**j).cast("long")).otherwise(F.lit(0))
    return out


def simhash(features: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash of a feature array (array<string>). Features are typically
    word shingles (documents with a small shared vocabulary would make
    token-level SimHash degenerate)."""
    return simhash_from_hashes(F.transform(features, _feature_hash60), bits)


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
    bands: int = SIMHASH_BANDS,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Banding: split the signature into ``bands`` chunks; by pigeonhole any
    pair with hamming ≤ bands-1 shares a chunk, so the join key is
    (band index, chunk value) — linear shuffle, no cross join — and with
    the default max_hamming=3 < bands=4 the result is EXACT, not
    approximate. Verification computes the true hamming distance."""
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    # Two-phase projection: materialize the md5 hash array once, then the
    # 32 per-bit majority sums reference it as a column attribute.
    sigs = df.select(
        F.col(id_col).alias("doc_id"),
        F.transform(word_shingles(F.col(text_col), shingle_n), _feature_hash60).alias("hs"),
    ).select("doc_id", simhash_from_hashes(F.col("hs"), bits).alias("sh"))
    chunks = None
    for b in range(bands):
        c = sigs.select(
            "doc_id",
            "sh",
            F.lit(b).alias("band"),
            F.shiftright(F.col("sh"), b * band_bits).bitwiseAND(F.lit(mask)).alias("ck"),
        )
        chunks = c if chunks is None else chunks.unionAll(c)
    l = chunks.alias("l")
    r = chunks.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.ck") == F.col("r.ck"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id1"),
            F.col("r.doc_id").alias("id2"),
            F.col("l.sh").alias("sh1"),
            F.col("r.sh").alias("sh2"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh1").bitwiseXOR(F.col("sh2")))
    return cands.select(
        "id1", "id2", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)
