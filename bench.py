#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries": {name: sec}, "sf"}.

Each query is forced end-to-end with a noop datasource write (full
computation, no driver collect)."""

from __future__ import annotations

import json
import os
import re
import sys
import time

from mini_lakehouse_control_plane_executor_spark import queries as qlib
from mini_lakehouse_control_plane_executor_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q13_customer_distribution",
    "q18_large_orders",
    "agg_groupby",
    "join_broadcast_dim",
    "distinct_agg",
    "window_topn_per_group",
    "topk_orders",
    "filter_comparison",
    "events_tumbling_window",
    "events_sessionize",
    "text_stats",
    "dedup_minhash_lsh",
    "ann_cosine_bruteforce",
    "ann_cosine_ivf",
    "multimodal_features",
    # r6 additions: the heaviest new machinery from rounds 4-5, so the
    # driver bench (not just pytest) catches regressions in it.
    "ann_cosine_ivfpq",
    "ngram_novelty_rate",
    # late-r6 additions: sparse retrieval and bigram-LM scoring — the
    # heaviest of the round's new operator classes that belong in the
    # driver bench (supplier_part_pagerank is excluded: a 3-iteration
    # graph algorithm is stage-barrier-bound at sf0.1; its regressions
    # are caught by oracle parity + the mass-conservation invariant).
    "bm25_topk",
    "bigram_lm_surprisal",
    # data-selection class (late r6): DSIR is its heaviest member (two
    # persisted-stream consumers + broadcast ratio scoring); CCNet
    # bucketing shares the unigram-LM machinery bigram_lm already
    # exercises, and dedup_aware_split rides the benched LSH path.
    "dsir_importance_weights",
    # r7: prefix-filtered containment join (PPJoin) — the heaviest new
    # operator class this round (incremental_dedup_newbatch rides the
    # already-benched banded-LSH machinery and stays out, same argument
    # as dedup_aware_split).
    "containment_dedup_pairs",
    # late-r7: graph motif counting — a flat 3-join pipeline (unlike
    # pagerank's stage-barrier-bound iteration) and the heaviest of the
    # round's new analytics trio (event_attribution_touch and
    # robust_trimmed_stats ride already-benched join/window/histogram
    # shapes).
    "graph_triangle_count",
    # late-r7: winnowing is its own operator class (LOCAL-guarantee
    # fingerprinting — a doc-keyed window-min pass plus a df-gated
    # fingerprint join; no other headline exercises that shape).
    "winnowing_dup_pairs",
    # late-r7 (reshaped r14): the distributed covariance pass under the
    # PCA family — per-task Arrow Gram partials (mapInArrow +
    # pyarrow.compute) feeding a dim^2-bounded (i,j) rollup;
    # embedding_pca_power_iteration rides it.
    "embedding_pca_covariance",
    # r8: weighted MinHash — the heaviest new machinery this round (a
    # second count-aggregation layer + the unary weight expansion under
    # the banded-LSH pipeline; the plain path never exercises that).
    # The other r8 queries stay out: semdedup/components are
    # stage-latency-bound (the pagerank exclusion argument),
    # fertility/ensemble/t-test ride already-benched map+tiny-agg
    # shapes.
    "dedup_weighted_minhash",
    # r9: per-band LSH attribution — the one new shape this round with
    # its own join geometry (UNGUARDED banding + pair-keyed min-band
    # attribution + candidate verify; dedup_minhash_lsh benches only
    # the guarded path). The other r9 queries ride benched machinery
    # (simhash histogram = simhash_pairs; CMS sweep = heavy-hitters x3;
    # sampling/deciles/IDF/residual are map+window+tiny-agg shapes).
    "dedup_band_marginal_recall",
    # r10: the deliberately-pessimal six-table chain — the one headline
    # exercising Catalyst/AQE join reordering end-to-end (every other
    # multi-join headline is written in a sensible order). The other
    # r10 queries ride benched machinery (HLL rollup = hll_distinct's
    # register passes; incremental IVF assign = the residual query's
    # broadcast-assignment shape).
    "join_order_stress",
    # r11: Misra-Gries heavy hitters — the one new shape this round
    # with its own join geometry (per-node summary rank windows + the
    # broadcast triangular merge rank over the contract-bounded merged
    # relation). The other r11 queries ride benched machinery
    # (PQ incremental encode = pq_adc's broadcast-codebook map;
    # equi-depth digest = the KS histogram + per-type windows;
    # concurrency peak = the interval bucket-rewrite + sessionize
    # windows).
    "docs_token_heavy_hitters_mg",
    # r12: exact-substring dedup — the one new shape this round with
    # its own join geometry (position-carrying window-equality self-join
    # + diagonal islands run-merge; no other headline carries positions
    # through a pair join). The other r12 queries ride benched
    # machinery (langid NB = broadcast-model scoring like CMS/DSIR;
    # k1 digest = the equi-depth digest's histogram+window plan; skew
    # canary = join_broadcast_dim's geometry with a derived key).
    "docs_exact_substring_dup",
    # r13: unigram-LM EM tokenizer training — the one new shape this
    # round with its own plan (a fixed-round EM loop: per-round
    # broadcast piece-cost join + vocab-keyed edge collect + map-side
    # Viterbi HOF + recount; no other headline iterates a train/score
    # loop). The other r13 queries ride benched machinery (repetition
    # gates / calibration ECE = text_stats' scan-speed map + tiny agg;
    # seasonal decomposition = the daily-count + broadcast-window shape
    # events_tumbling_window and the anomaly family already cover; the
    # ExactSubstr fingerprint key changes docs_exact_substring_dup's
    # exchange payload in place, which its existing slot measures).
    "unigram_lm_em_learn",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    registry = qlib.all_queries()

    # Untimed warmup pass: JVM/codegen/parquet-footer warm, then measure.
    # clearCache between queries drops the persisted intermediates some
    # operators (LSH dedup) create, so later queries aren't measured
    # under another query's cache/GC pressure.
    for name in HEADLINE:
        fn = registry.get(name)
        if fn is not None:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()

    # Three timed passes, per-query minimum: single-shot timings on a
    # shared box are noise-dominated (GC, co-tenant CPU; observed ±25%
    # run-to-run on identical code) — min-of-3 is the cheap robust
    # estimator of the true cost.
    times: dict[str, float] = {}
    for _ in range(3):
        for name in HEADLINE:
            fn = registry.get(name)
            if fn is None:
                continue
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = round(time.perf_counter() - t0, 3)
            times[name] = min(times.get(name, elapsed), elapsed)
            spark.catalog.clearCache()

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
