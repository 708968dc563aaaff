"""Corpus-quality operators: repetition metrics and duplicated-span
stats — edge cases the sf fixtures don't exercise."""

import pytest
from pyspark.sql import functions as F

from mini_lakehouse_control_plane_executor_spark.operators import quality as Q
from mini_lakehouse_control_plane_executor_spark.operators import similarity as sim


def test_max_adjacent_run(spark):
    rows = [
        (1, ["a", "a", "a", "b"]),       # run of 3 at the front
        (2, ["a", "b", "a", "b"]),       # no repeats → 1
        (3, ["x"]),                      # single element → 1
        (4, []),                         # empty → 0
        (5, ["b", "a", "a", "a", "a"]),  # run of 4 at the end
    ]
    df = spark.createDataFrame(rows, "id long, arr array<string>")
    got = {
        r["id"]: r["run"]
        for r in df.select("id", Q.max_adjacent_run(F.col("arr")).alias("run")).collect()
    }
    assert got == {1: 3, 2: 1, 3: 1, 4: 0, 5: 4}


def test_repetition_stats_values(spark):
    docs = [
        (1, "the cat sat on the mat"),          # healthy
        (2, "spam spam spam spam spam spam"),   # one word repeated
        (3, "ab cd ab cd ab cd ab cd"),         # one bigram loop
        (4, "word"),                            # single token, no bigrams
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in Q.repetition_stats(df, "doc_id", "text").collect()}
    assert got[1]["n_words"] == 6 and got[1]["max_word_run"] == 1
    assert got[1]["distinct_ratio"] == round(5 / 6, 6)
    # 'spam spam' bigram occurs 5 times out of 5 bigrams
    assert got[2]["top_bigram_frac"] == 1.0 and got[2]["max_word_run"] == 6
    assert got[2]["distinct_ratio"] == round(1 / 6, 6)
    # 'ab cd' occurs 4 of 7 bigrams; no consecutive-equal words
    assert got[3]["top_bigram_frac"] == round(4 / 7, 6)
    assert got[3]["max_word_run"] == 1
    assert got[4]["n_words"] == 1 and got[4]["top_bigram_frac"] == 0.0


def test_repetition_gate_flags(spark):
    docs = [
        (1, "a perfectly ordinary sentence with many different words here"),
        (2, "buy now buy now buy now buy now buy now buy now buy now"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["keep"] for r in Q.repetition_gate(df, "doc_id", "text").collect()}
    assert got == {1: True, 2: False}


def test_span_dup_stats_cross_doc(spark):
    shared = "one two three four five six seven eight"  # one 8-gram
    docs = [
        (1, shared + " unique1 tail1 words1 here1 extra1 pad1 fill1 end1"),
        (2, shared + " unique2 tail2 words2 here2 extra2 pad2 fill2 end2"),
        (3, "totally different text with nothing repeated anywhere else at all ok"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in Q.span_dup_stats(df, "doc_id", "text", n=8).collect()}
    # Docs 1 and 2 share exactly the spans fully inside the shared prefix:
    # only position 0 (the prefix itself) is identical across docs.
    assert got[1]["n_dup_spans"] == 1 and got[2]["n_dup_spans"] == 1
    assert got[3]["n_dup_spans"] == 0 and got[3]["dup_frac"] == 0.0
    assert got[1]["n_spans"] == 9  # 16 tokens → 9 8-gram positions
    assert got[1]["dup_frac"] == round(1 / 9, 6)


def test_span_dup_within_single_doc(spark):
    # The same 8-gram twice inside ONE doc also counts as duplicated
    # (exact-substring dedup counts positions, not docs).
    words = "w1 w2 w3 w4 w5 w6 w7 w8"
    docs = [(1, words + " filler " + words)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = Q.span_dup_stats(df, "doc_id", "text", n=8).collect()[0]
    assert r["n_dup_spans"] == 2  # both copies of the repeated 8-gram


def test_matmul_topk_equals_brute_force(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(8)
    queries = df.filter(F.col("vec_id") < 4)
    bf = sim.brute_force_topk(df, "vec_id", "embedding", queries, k=5)
    mm = sim.matmul_topk(df, "vec_id", "embedding", queries, k=5)
    key = lambda r: (r["q_id"], r["rank"])
    got_bf = sorted((r.asDict() for r in bf.collect()), key=key)
    got_mm = sorted((r.asDict() for r in mm.collect()), key=key)
    assert len(got_bf) == 20
    for a, b in zip(got_bf, got_mm):
        assert (a["q_id"], a["c_id"], a["rank"]) == (b["q_id"], b["c_id"], b["rank"])
        assert a["sim"] == pytest.approx(b["sim"], abs=1e-6)
