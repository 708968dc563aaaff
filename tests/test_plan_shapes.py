"""Physical-plan shape guards: the 100 TB design claims (pushdown reaches
the scan, small sides broadcast, scan-only operators don't shuffle,
non-equi joins broadcast instead of cartesian-shuffling) are asserted
against the ACTUAL executed plans, so a regression that silently
de-optimizes a query fails CI rather than only showing up at scale."""

import re

import pytest

from mini_lakehouse_control_plane_executor_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = all_queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def _n_exchanges(plan):
    return len(re.findall(r"Exchange (?:hash|range)partitioning", plan))


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "filter_comparison")
    assert "PushedFilters: [" in plan
    m = re.search(r"PushedFilters: \[([^\]]+)\]", plan)
    assert m and m.group(1).strip(), "filter must be pushed into the parquet scan"


def test_column_pruning_reaches_scan(spark):
    plan = _plan(spark, "project_columns")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m is not None
    read_cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
    assert len(read_cols) <= 3, f"scan reads too many columns: {read_cols}"


def test_broadcast_join_is_broadcast(spark):
    plan = _plan(spark, "join_broadcast_dim")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_range_join_broadcasts_not_cartesian(spark):
    plan = _plan(spark, "range_join_value_bands")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_scan_speed_operators_do_not_shuffle(spark):
    # text_stats: scan -> per-row expressions -> global sort. The ONLY
    # exchange allowed is the final rangepartitioning for ORDER BY.
    plan = _plan(spark, "text_stats")
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 0
    # dedup_exact: exactly one hash shuffle (the fingerprint groupBy).
    plan = _plan(spark, "dedup_exact")
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_asof_join_single_fact_shuffle(spark):
    """The as-of join must stay join-free: one window shuffle on user_id
    for the union + one dedup shuffle for purchases; the aggregation
    reuses the window partitioning."""
    plan = _plan(spark, "events_asof_join")
    assert "Join" not in plan  # no join operator of any kind
    assert _n_exchanges(plan) <= 3  # purchases dedup + window + order-by


def test_whole_stage_codegen_active(spark):
    # Codegen spans only appear in the FINAL adaptive plan — execute
    # first, then inspect.
    df = all_queries()["q1_pricing_summary"](spark, SF_DIR)
    df.collect()  # a write clones the QueryExecution; collect finalizes df's own
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # Codegen spans render as "*(N) Operator" in the final adaptive plan.
    assert re.search(r"\*\(\d+\) HashAggregate", plan), "agg must be codegen'd"


def test_aggregation_is_partial_final(spark):
    """groupBy must produce map-side partial aggregation (HashAggregate
    appears above AND below the exchange)."""
    plan = _plan(spark, "agg_groupby")
    parts = plan.split("Exchange hashpartitioning")
    assert len(parts) >= 2
    assert "HashAggregate" in parts[0] and "HashAggregate" in parts[-1]


def test_topk_uses_take_ordered(spark):
    plan = _plan(spark, "topk_orders")
    assert "TakeOrderedAndProject" in plan, "LIMIT+ORDER BY must not global-sort"


def test_rfm_has_no_global_window(spark):
    """rfm_segmentation assigns quartiles by broadcast percentile
    cutoffs: no ntile / no Window over an unpartitioned global order
    (the pre-r4 formulation single-partitioned the customer table).
    The only SinglePartition exchange allowed is the one feeding the
    3-row cutoff aggregate (32 partial rows, not data)."""
    plan = _plan(spark, "rfm_segmentation")
    assert "Window" not in plan
    assert not re.search(r"(?<!perce)ntile\(", plan)  # ntile(, not percentile(
    assert "BroadcastNestedLoopJoin" in plan  # 1-row cutoffs broadcast back
    assert "CartesianProduct" not in plan


def test_ivf_assignment_is_map_only(spark):
    """IVF centroid assignment must be a per-row argmax against the
    broadcast centroid array — the corpus must NOT shuffle for
    assignment (no hashpartitioning on c_id / cent_id). Allowed
    exchanges: the per-query top-k window (q_id) and the final sort."""
    plan = _plan(spark, "ann_cosine_ivf")
    assert not re.search(r"Exchange hashpartitioning\((?:c_id|cent_id)", plan)
    assert "BroadcastHashJoin" in plan  # probes join assigned lists broadcast
    hash_ex = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert set(hash_ex) <= {"q_id"}, hash_ex


def test_unigram_lm_shuffle_keys(spark):
    """The LM build must shuffle only on the token (count agg) and the
    doc (scoring agg) — no global sort, no corpus-wide exchange beyond
    those two map-side-combinable aggregations. The vocab join is
    deliberately unhinted (a 100 TB corpus's vocab can exceed driver
    memory, so AQE must pick broadcast vs shuffle from runtime size);
    whichever strategy it picks, its only legal shuffle key is the
    token itself — the same partitioning the count agg already uses."""
    plan = _plan(spark, "unigram_lm_surprisal")
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"t", "doc_id"}, keys
    assert re.search(r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin", plan)


def test_boilerplate_is_one_count_shuffle_plus_take_ordered(spark):
    """Boilerplate detection must be: gram-count shuffle (map-side
    combinable), broadcast join against per-source totals, and
    TakeOrderedAndProject for the top-20 — no window, no global sort,
    no shuffle keyed on anything but the group keys."""
    plan = _plan(spark, "boilerplate_ngrams")
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan  # per-source totals broadcast
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"source", "gram"}, keys


def test_lsh_blocked_pair_ops_shuffle_only_on_block_and_group_keys(spark):
    """The LSH-blocked pair operators (hard negatives, decontamination)
    must shuffle only on the (band, bk) candidate join, id-pair
    distinct/re-join keys, the final per-anchor grouping, and — since
    the duplicate-collapse stage landed — the exact-dedup window keyed
    on the vector itself (its array key appears in the plan wrapped as
    ``knownfloatingpointnormalized``) plus the rep-level candidate/
    expansion keys. Never a cartesian, never a nested-loop pairing of
    the two sides."""
    for name, allowed in [
        (
            "hard_negative_mining_lsh",
            {
                "band",
                "vid",
                "q_rep",
                "c_rep",
                "rep",
                "knownfloatingpointnormalized",
            },
        ),
        ("embedding_decontamination", {"band", "t_id", "e_id"}),
    ]:
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
        assert keys <= allowed, (name, keys)


def test_correlation_join_rides_equi_key(spark):
    """The time-range correlation join must be planned as an equi join
    on the user key with the range predicate as a post-condition — never
    a cartesian/nested-loop pairing of the two event sets."""
    plan = _plan(spark, "events_correlation")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[l_key", plan)


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Storage bucketing is the co-located-join lever at 100 TB: two
    tables bucketed+sorted on the join key must SortMergeJoin with NO
    exchange on either side — the shuffle happened once at write time
    and is amortized over every subsequent join."""
    from pyspark.sql import functions as F

    df = spark.range(0, 20000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # Force a non-broadcast join so bucketing (not broadcast) is
        # what eliminates the exchanges.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for name in ("bkt_l", "bkt_r"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            (
                df.write.bucketBy(8, "k")
                .sortBy("k")
                .option("path", str(tmp_path / name))
                .mode("overwrite")
                .saveAsTable(name)
            )
        j = spark.table("bkt_l").join(spark.table("bkt_r"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, "bucketed join must not shuffle"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for name in ("bkt_l", "bkt_r"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_registry_wide_scale_hygiene(spark):
    """Mechanical scale audit of EVERY registered query's physical plan:
    no CartesianProduct anywhere, and an Exchange SinglePartition is
    legal only when its parent is a keyless (global) aggregate — that
    exchange carries one pre-aggregated row per task, not data. A
    SinglePartition feeding a Sort/Window single-threads the dataset:
    NO registered query is allowed to do that (r5: the global
    sequence_packing oracle-baseline was dropped from the registry and
    lives on only as a tests/-side baseline for its scale twin
    sequence_packing_sharded)."""
    allowed_data_single_partition = set()
    bad = {}
    for name, fn in all_queries().items():
        plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        problems = []
        if "CartesianProduct" in plan:
            problems.append("CartesianProduct")
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if "Exchange SinglePartition" not in line:
                continue
            parent = lines[i - 1] if i else ""
            child = lines[i + 1] if i + 1 < len(lines) else ""
            # Benign when the exchange sits between a partial and a
            # final KEYLESS aggregate (one pre-aggregated row per task).
            # Check both sides: under AQE with cached inputs the parent
            # renders as a ShuffleQueryStage wrapper, but the child is
            # still the partial aggregate.
            if "Aggregate(keys=[]" in parent or "Aggregate(keys=[]" in child:
                continue
            if name in allowed_data_single_partition:
                continue
            problems.append(f"SinglePartition under: {parent.strip()[:60]}")
        if problems:
            bad[name] = problems
    assert not bad, f"scale anti-patterns: {bad}"


def test_sharded_packing_has_no_single_partition_window(spark):
    """sequence_packing_sharded must run its cumsum window PER SHARD:
    no SinglePartition exchange anywhere in the plan (the unsharded
    sequence_packing's global-sort window would show one)."""
    plan = _plan(spark, "sequence_packing_sharded")
    assert "Exchange SinglePartition" not in plan
    assert "Window" in plan
    # the window's partitioning key must be the shard column
    assert re.search(r"Exchange hashpartitioning\(shard", plan)


def test_transition_matrix_single_user_shuffle(spark):
    """The Markov-transition query may shuffle the events only ONCE — on
    user_id for the lag window; the (prev,next) count matrix is tiny and
    its totals are broadcast back, so any other hash exchange key means
    the corpus moved twice."""
    plan = _plan(spark, "events_transition_matrix")
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"user_id", "prev_type"}, keys
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_quantization_codebook_is_keyless_single_pass(spark):
    """The int8 codebook must come from one keyless min/max aggregate —
    no posexplode of the corpus (no Generate), no per-dimension shuffle;
    the codebook is broadcast back and the only grouped exchange is the
    |labels|-row rollup."""
    plan = _plan(spark, "embedding_quantization_error")
    assert "Generate" not in plan  # no corpus explode
    assert "BroadcastNestedLoopJoin" in plan  # 1-row codebook broadcast
    assert "CartesianProduct" not in plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"label"}, keys


def test_bigram_pmi_unigram_join_unhinted_and_take_ordered(spark):
    """bigram_pmi_top: top-20 via TakeOrderedAndProject (no global
    sort), the 1-row token total broadcast, and every hash exchange
    keyed on a gram/token column or its join alias — never a corpus-wide
    repartition after the persisted tokenize."""
    plan = _plan(spark, "bigram_pmi_top")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan  # broadcast 1-row total
    assert "CartesianProduct" not in plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"g", "t", "x", "y"}, keys


def test_corpus_law_queries_shuffle_vocab_not_corpus(spark):
    """vocab_growth_heaps: the count(DISTINCT) expands into exchanges
    keyed on (lang[, t]) only. zipf_slope_by_lang: token-count shuffle
    plus the per-lang rank window — keys limited to lang/t, and the
    regression itself adds no exchange beyond the lang rollup."""
    for name in ("vocab_growth_heaps", "zipf_slope_by_lang"):
        plan = _plan(spark, name)
        keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
        assert keys <= {"lang", "t"}, (name, keys)
        assert "CartesianProduct" not in plan


def test_pq_adc_encode_is_map_only(spark):
    """PQ encode must be a map-only pass against the ONE broadcast
    codebook row (no corpus exchange, no explode); the only shuffle in
    the whole ADC search is the per-query top-k window."""
    plan = _plan(spark, "ann_cosine_pq_adc")
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys == {"q_id"}, keys
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # codebook + query broadcast


def test_ivfpq_single_pass_index_build(spark):
    """IVF-PQ: centroid assignment AND PQ encoding ride ONE map-only
    pass (two broadcast one-row tables — no corpus exchange, no
    explode); probes broadcast onto the code table by cent_id; the only
    data shuffle is the per-query top-k window."""
    plan = _plan(spark, "ann_cosine_ivfpq")
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys == {"q_id"}, keys
    assert "CartesianProduct" not in plan
    # The ONLY Generate is the probe-selection explode on the QUERY side
    # (n_probe elements per query row — |queries|·n_probe rows total,
    # corpus-size independent); the corpus stream itself is never
    # exploded.
    gens = re.findall(r"Generate explode\((\w+)", plan)
    assert all(g == "transform" for g in gens) and len(gens) <= 1, gens


def test_cms_is_two_shuffles_and_broadcast(spark):
    """events_heavy_hitters_cms: exactly two hash shuffles (cell-table
    aggregation + per-user exact aggregation, whose partitioning the
    estimate groupBy reuses), the cell table BROADCAST to the estimate
    join, and top-k via TakeOrdered — no second events aggregation, no
    join shuffle."""
    # Deterministic exchange counts need an empty CacheManager (the
    # calibration-test rationale): events_count_min_width_sweep
    # registers a persist of the SAME per-user exact aggregate when the
    # registry-wide hygiene test plans it, and cache substitution would
    # collapse this plan's exact-aggregate exchange.
    spark.catalog.clearCache()
    plan = _plan(spark, "events_heavy_hitters_cms")
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_whitening_is_single_dim_keyed_shuffle(spark):
    """embedding_whitening_stats: one partial/final aggregate keyed by
    dimension — the only exchange moves n_partitions x 64 partial rows,
    never corpus data."""
    plan = _plan(spark, "embedding_whitening_stats")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange SinglePartition" not in plan


def test_calibration_and_qmix_shuffle_only_group_keys(spark):
    """token_length_calibration / quality_weighted_mix: per-doc scoring
    is map-only (array HOFs, no explode); the only hash shuffles carry
    per-lang/per-source partial aggregates (plus quality_weighted_mix's
    one-row broadcast total)."""
    # Deterministic exchange counts need an empty CacheManager: an
    # earlier test that built qmix registered its persisted aggregate,
    # and cache substitution would collapse exchanges in the plan built
    # here (order-dependent counts otherwise).
    spark.catalog.clearCache()
    for name, n in (("token_length_calibration", 1), ("quality_weighted_mix", 2)):
        # qmix's second source-keyed exchange reads the PERSISTED
        # per-source aggregate (InMemoryTableScan), not the corpus —
        # the scan+tokenize pass runs once.
        plan = _plan(spark, name)
        assert plan.count("Exchange hashpartitioning") == n, (name, plan)
        assert "Generate explode" not in plan, name
    assert "InMemoryTableScan" in _plan(spark, "quality_weighted_mix")


def test_opq_rotation_stays_map_only(spark):
    """ann_cosine_pq_opq: the rotation is a projection fused into the
    scan — the plan keeps pq_adc's pinned shape (sole hash exchange is
    the per-query top-k window)."""
    plan = _plan(spark, "ann_cosine_pq_opq")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "CartesianProduct" not in plan


def test_bm25_restricts_to_query_terms_before_scoring(spark):
    """bm25_topk: the query-term set is a BROADCAST semi-restriction on
    the exploded token stream, so every hash exchange is keyed on
    doc_id/term/query_id (candidate-sized), never a corpus repartition;
    the only SinglePartition is the keyless N/avgdl stats aggregate."""
    plan = _plan(spark, "bm25_topk")
    assert "BroadcastHashJoin" in plan  # query terms never shuffle the corpus
    assert "CartesianProduct" not in plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"doc_id", "term", "query_id"}, keys


def test_hybrid_rrf_channels_shuffle_only_per_query_topk(spark):
    """hybrid_retrieval_rrf: both retrieval channels broadcast the
    3-probe side and stream the corpus map-only — the ONLY hash
    exchanges in the whole plan are the per-query top-k windows and the
    2*k*|q|-row fusion join, all keyed on q_id."""
    plan = _plan(spark, "hybrid_retrieval_rrf")
    assert "BroadcastNestedLoopJoin" in plan  # broadcast probes x corpus
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"q_id"}, keys


def test_bigram_lm_context_is_rollup_of_count_table(spark):
    """bigram_lm_surprisal: exchanges keyed on bg (count shuffle),
    w1 (context rollup of the persisted count table — NOT a second
    corpus pass), and doc_id (per-doc partial agg). The bigram
    materialization itself is a map-side transform+explode."""
    plan = _plan(spark, "bigram_lm_surprisal")
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"bg", "w1", "doc_id"}, keys


def test_rag_chunking_is_shuffle_free(spark):
    """rag_chunk_stats: chunking is sequence+explode+slice fused into
    the scan stage — zero hash exchanges; the only exchange in the plan
    is the deterministic output ordering's range partitioner."""
    plan = _plan(spark, "rag_chunk_stats")
    assert "Exchange hashpartitioning" not in plan
    assert "Generate" in plan  # the chunk-start explode
    assert "CartesianProduct" not in plan


def test_hll_state_is_register_sized(spark):
    """events_hll_distinct: the corpus-sized shuffle is the
    (event_type, bucket) register max — ≤ |event_types|*64 rows of
    state; the estimate/exact join is a broadcast of the tiny per-type
    tables; no window, no SinglePartition anywhere."""
    plan = _plan(spark, "events_hll_distinct")
    assert "BroadcastHashJoin" in plan
    assert "Exchange SinglePartition" not in plan
    assert "Window" not in plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"event_type"}, keys  # bucket/user_id ride as 2nd key


def test_weighted_sample_two_phase_topk(spark):
    """weighted_sample_aes: the per-source top-k must run its salted
    pruning phase first — a (source, salt) window that parallelizes a
    low-cardinality stratum — before the final per-source window ranks
    only 32*k survivors."""
    plan = _plan(spark, "weighted_sample_aes")
    assert re.search(r"Exchange hashpartitioning\(source#\d+, salt", plan), plan
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_pagerank_iterations_reuse_persisted_edges(spark):
    """supplier_part_pagerank: the registry query's executed plan ends
    in TakeOrderedAndProject over the lineage-truncated rank table (a
    localCheckpoint collapses the prefix to Scan ExistingRDD — the
    whole point of the truncation); the per-iteration shape is pinned
    separately with ``truncate_lineage=False`` (persist instead of
    checkpoint, so explain() keeps the unrolled rounds): the edge table
    is built ONCE (InMemoryTableScan) and every iteration is a
    src-keyed join plus a node-keyed aggregate — never a global sort,
    never a pairwise product."""
    from pyspark.sql import functions as F

    from mini_lakehouse_control_plane_executor_spark.operators import graph as _graph

    spark.catalog.clearCache()
    plan = _plan(spark, "supplier_part_pagerank")
    assert "TakeOrderedAndProject" in plan
    assert "Scan ExistingRDD" in plan  # the checkpoint boundary
    assert "CartesianProduct" not in plan

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    items = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct()
    s_node = F.concat(F.lit("s"), F.col("s").cast("string"))
    p_node = F.concat(F.lit("p"), F.col("p").cast("string"))
    edges = items.select(s_node.alias("src"), p_node.alias("dst")).unionAll(
        items.select(p_node.alias("src"), s_node.alias("dst"))
    )
    ranks = _graph.pagerank(
        edges, iterations=3, truncate_lineage=False, check_dangling=False
    )
    unrolled = ranks._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in unrolled  # edges persisted, reused per round
    assert "CartesianProduct" not in unrolled
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", unrolled))
    assert keys <= {"s", "src", "dst", "node"}, keys
    for df in (ranks, edges):
        df.unpersist()


def test_silhouette_is_broadcast_centroid_map_pass(spark):
    """embedding_silhouette: centroids collapse through a keyless
    collect (one broadcast row); per-vector a/b are map-side expressions
    — the only grouped exchanges are label-keyed (centroid build +
    final rollup); no pairwise join, no corpus explode."""
    plan = _plan(spark, "embedding_silhouette")
    assert "BroadcastNestedLoopJoin" in plan  # 1-row centroid broadcast
    assert "CartesianProduct" not in plan
    assert "Generate" not in plan  # no corpus posexplode
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"label"}, keys


def test_cond_entropy_sums_vocab_not_corpus(spark):
    """bigram_cond_entropy: one (lang, bigram) count shuffle; context
    totals and entropy terms are rollups/joins of the persisted count
    table; exchanges keyed on lang(+bg/w1) only, no SinglePartition."""
    plan = _plan(spark, "bigram_cond_entropy")
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"lang"}, keys


def test_gopher_gates_are_scan_speed(spark):
    """gopher_quality_gates: pure column expressions + one |sources|
    groupBy — no joins, no explode, no windows."""
    plan = _plan(spark, "gopher_quality_gates")
    assert "Generate" not in plan and "Join" not in plan and "Window" not in plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys == {"source"}, keys


def test_dsir_ratio_is_broadcast_onto_stream(spark):
    """dsir_importance_weights: the 256-row ratio table and the 1-row
    totals broadcast back onto the feature stream (BroadcastHashJoin /
    BroadcastNestedLoopJoin); grouped exchanges stay on the bucket /
    per-doc / per-source keys; never a pairwise product, never a
    window."""
    plan = _plan(spark, "dsir_importance_weights")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"b", "doc_id", "source"}, keys


def test_ccnet_window_runs_over_histogram_not_docs(spark):
    """ccnet_perplexity_buckets: the cumulative window partitions by
    lang OVER THE VALUE HISTOGRAM — its input exchange is
    hashpartitioning(lang) fed by the (lang, s_doc) count aggregate,
    never a per-doc ntile sort; no pairwise product."""
    plan = _plan(spark, "ccnet_perplexity_buckets")
    assert "Window" in plan
    assert "ntile" not in plan.lower()
    assert "CartesianProduct" not in plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"t", "doc_id", "lang"}, keys


def test_dedup_aware_split_is_join_plus_rollup(spark):
    """dedup_aware_split: after the shared cluster machinery, the full
    corpus sees ONE join onto the member→root map and one
    (source, split) rollup — no window over documents, no global sort
    before the aggregate, no pairwise product."""
    plan = _plan(spark, "dedup_aware_split")
    assert "CartesianProduct" not in plan
    # the split assignment itself is a pure projection: no window may
    # touch the documents side (the cluster machinery has none either)
    assert "Window" not in plan


def test_embedding_outliers_use_salted_two_phase_window(spark):
    """embedding_outlier_centroid: the bottom-k must prune through the
    salted (label, salt) window before the exact per-label rank — the
    weighted_sample_aes discipline that keeps a low-cardinality label
    stratum from single-threading."""
    plan = _plan(spark, "embedding_outlier_centroid")
    assert re.search(r"Exchange hashpartitioning\(label#\d+, salt", plan), plan
    assert "BroadcastHashJoin" in plan  # centroids broadcast
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan


def test_jsd_pairwise_stage_is_corpus_independent(spark):
    """source_similarity_jsd: ONE corpus-sized aggregate (the
    (source, bucket) count — its exchange is keyed on source); the
    smoothing grid and the bucket-keyed pairwise join run over
    |sources|x256 rows (broadcast-sized, no corpus key anywhere);
    never a pairwise product of data rows."""
    plan = _plan(spark, "source_similarity_jsd")
    assert "CartesianProduct" not in plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"source", "b", "source_a", "t"}, keys


def test_triangle_wedges_ride_equi_joins(spark):
    """graph_triangle_count: the wedge enumeration must be an equi
    self-join of the oriented edge list on src (never a pairing of
    node sets), closure an equi-join on the canonical (p1, p2) pair;
    the only nested-loop join allowed is the one-row stats assembly."""
    plan = _plan(spark, "graph_triangle_count")
    assert "CartesianProduct" not in plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[src", plan), plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    # k/p are the shared cooccurrence_edges builder's canonical
    # incidence names (operators/graph.py:cooccurrence_edges).
    assert keys <= {"k", "p", "p1", "p2", "src", "v"}, keys


def test_attribution_join_is_user_keyed(spark):
    """event_attribution_touch: the purchase-touch lookback join must
    be planned as an equi join on user_id with the time-range predicate
    as a post-condition — never a time-only cartesian/nested-loop
    pairing — and the first/last windows partition on the purchase id."""
    plan = _plan(spark, "event_attribution_touch")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[user_id", plan), plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"user_id", "p_id", "channel"}, keys


def test_trimmed_stats_windows_run_on_histogram(spark):
    """robust_trimmed_stats: the sole corpus shuffle is the
    (event_type, value) histogram aggregate; the cut windows and final
    rollup are keyed on event_type over HISTOGRAM rows. No joins, no
    SinglePartition, no per-group corpus sort anywhere."""
    plan = _plan(spark, "robust_trimmed_stats")
    assert "Join" not in plan
    assert "Exchange SinglePartition" not in plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"event_type", "v_u"}, keys


def test_skew_canary_broadcasts_and_never_shuffles_hot_key(spark):
    """join_skew_aqe_canary's OWN right plan: the 998-row dim broadcasts
    (BroadcastHashJoin, no SortMergeJoin), so no exchange ever hashes
    the skewed key — the hot key is harmless by construction."""
    plan = _plan(spark, "join_skew_aqe_canary")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert not re.search(r"Exchange hashpartitioning\(sk", plan)


def test_aqe_skew_join_split_fires(spark):
    """The optimizer-trust regression for the 100 TB claim: when the
    hot-key join CANNOT broadcast, AQE's OptimizeSkewedJoin must detect
    the dominant shuffle partition and split it (``skew=true`` on the
    SortMergeJoin in the final adaptive plan). Thresholds are scaled to
    the fixture the way a real cluster's defaults (256 MB) relate to
    real partitions; the skew geometry is the canary query's own: ~95%
    of fact rows on one key."""
    from pyspark.sql import functions as SF

    conf_keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "512KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {}
    for k, v in conf_keys.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        # pad = md5(id): incompressible and aggregated downstream, so it
        # survives column pruning and the hot partition's MEASURED map
        # output (post-lz4) actually crosses the byte threshold — a
        # constant pad compresses to nothing and defeats the detector.
        fact = spark.range(0, 500_000).select(
            SF.when(SF.col("id") % 20 < 19, SF.lit(0))
            .otherwise(SF.col("id") % 997)
            .alias("sk"),
            SF.md5(SF.col("id").cast("string")).alias("pad"),
        )
        dim = spark.range(0, 998).select(
            SF.col("id").alias("sk"), (SF.col("id") % 10).alias("grp")
        )
        df = fact.join(dim, "sk").groupBy("grp").agg(
            SF.count(SF.lit(1)).alias("n"), SF.max("pad").alias("mx")
        )
        rows = {r["grp"]: r["n"] for r in df.collect()}
        # correctness of the forced-SMJ result: every fact row lands
        assert sum(rows.values()) == 500_000
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, (
            "AQE did not split the skewed partition:\n" + plan[:2000]
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
