"""Corpus-quality gates for pretraining pipelines: repetition metrics
(Gopher-style, Rae et al. 2021) and duplicated-span fractions (exact
substring dedup, Lee et al. 2022 "Deduplicating Training Data Makes
Language Models Better").

Repetition metrics are pure higher-order-function column expressions —
zero shuffles, scan speed at 100 TB. The span-dup pass is the one that
must see the whole corpus: it shuffles once on the n-gram key (uniform,
md5-free equi-key) and once on doc_id, both map-side combinable.

All formulas use only functions with identical Spark/DuckDB semantics,
so every operator has an exact generated SQL oracle (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mini_lakehouse_control_plane_executor_spark.operators.text import tokens


def max_adjacent_run(arr: Column) -> Column:
    """Longest run of equal ADJACENT elements in an array, via a single
    aggregate() fold (struct accumulator: previous element, current run,
    best run). No explode, no shuffle. Empty array → 0."""
    return F.when(F.size(arr) == 0, F.lit(0)).otherwise(
        F.aggregate(
            arr,
            F.struct(
                F.lit(None).cast("string").alias("prev"),
                F.lit(0).alias("run"),
                F.lit(0).alias("best"),
            ),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1)
                .otherwise(F.lit(1))
                .alias("run"),
                F.greatest(
                    acc["best"],
                    F.when(acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1).otherwise(
                        F.lit(1)
                    ),
                ).alias("best"),
            ),
            lambda acc: acc["best"],
        )
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document repetition diagnostics (the Gopher repetition rules):

    - ``n_words``            token count
    - ``distinct_ratio``     |distinct tokens| / |tokens|
    - ``top_bigram_frac``    occurrences of the most frequent bigram
                             divided by the bigram count
    - ``max_word_run``       longest run of the SAME token repeated
                             consecutively

    The most-frequent-bigram count is found WITHOUT a shuffle: sort the
    bigram array, then the answer is the longest run of equal adjacent
    elements — the same aggregate() fold as ``max_word_run``. The whole
    operator is one narrow projection over the scan.
    """
    toks = tokens(F.col(text_col))
    d = df.select(F.col(id_col), toks.alias("ws"))
    big = F.expr(
        "CASE WHEN size(ws) < 2 THEN array() "
        "ELSE transform(sequence(1, size(ws) - 1), i -> concat_ws(' ', ws[i - 1], ws[i])) END"
    )
    d = d.select(
        id_col,
        F.size("ws").alias("n_words"),
        F.round(
            F.size(F.array_distinct("ws")) / F.greatest(F.size("ws"), F.lit(1)), 6
        ).alias("distinct_ratio"),
        max_adjacent_run(F.array_sort(big)).alias("top_bigram_n"),
        F.greatest(F.size("ws") - 1, F.lit(0)).alias("n_bigrams"),
        max_adjacent_run(F.col("ws")).alias("max_word_run"),
    )
    return d.select(
        id_col,
        "n_words",
        "distinct_ratio",
        F.round(
            F.col("top_bigram_n") / F.greatest(F.col("n_bigrams"), F.lit(1)), 6
        ).alias("top_bigram_frac"),
        F.col("max_word_run").cast("int").alias("max_word_run"),
    )


def repetition_gate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_distinct_ratio: float = 0.2,
    max_top_bigram_frac: float = 0.18,
    max_run: int = 4,
) -> DataFrame:
    """repetition_stats + a boolean ``keep`` column with Gopher-flavored
    thresholds (distinct-token ratio, top-bigram fraction, longest
    repeated-word run)."""
    s = repetition_stats(df, id_col, text_col)
    return s.withColumn(
        "keep",
        (F.col("distinct_ratio") >= min_distinct_ratio)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac)
        & (F.col("max_word_run") <= max_run),
    )


def span_dup_stats(df: DataFrame, id_col: str, text_col: str, n: int = 8) -> DataFrame:
    """Per-document duplicated-span fraction: the share of token
    positions whose n-gram also occurs at ANY other position in the
    corpus (same doc or another). This is the driving metric of exact
    substring deduplication — docs with a high fraction are mostly
    made of text that exists elsewhere.

    Shape at 100 TB: explode positions (linear), ONE map-side-combinable
    count on the gram key, keep only grams with count > 1 (a small
    minority in real corpora), LEFT SEMI join positions against that set
    on the same uniform key, then ONE per-doc count. Nothing quadratic,
    no skew (grams are near-unique keys).
    """
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col).alias("doc"), toks.alias("ws")).filter(
        F.size("ws") >= n
    )
    pos = base.select(
        "doc",
        F.size("ws").alias("n_ws"),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(ws) - {n - 1}), "
                f"i -> concat_ws(' ', slice(ws, i, {n})))"
            )
        ).alias("pos", "gram"),
    )
    dup_grams = (
        pos.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .select("gram")
    )
    dup_pos = pos.join(dup_grams, "gram", "left_semi")
    per_doc = base.select(
        "doc", (F.size("ws") - F.lit(n - 1)).alias("n_spans")
    ).join(
        dup_pos.groupBy("doc").agg(F.count(F.lit(1)).alias("n_dup_spans")),
        "doc",
        "left",
    )
    return per_doc.select(
        F.col("doc").alias(id_col),
        F.col("n_spans").cast("long").alias("n_spans"),
        F.coalesce(F.col("n_dup_spans"), F.lit(0)).cast("long").alias("n_dup_spans"),
        F.round(
            F.coalesce(F.col("n_dup_spans"), F.lit(0)) / F.col("n_spans"), 6
        ).alias("dup_frac"),
    )
