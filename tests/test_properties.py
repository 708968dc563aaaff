"""Property tests mirroring the reference's proptest suites (SURVEY §5):

- P1 Parquet round-trip: random {int64, float64, string} schemas, 1-5
  cols, 1-100 rows survive a write→read cycle bit-exactly
  (reference: worker/src/parquet_format_property_test.rs:91).
- P18 GROUP BY correctness: random grouped data (keys from {A,B,C},
  int values 1..100) — Spark's count/sum/avg/min/max equal a
  hand-computed oracle (reference: worker/src/group_by_property_test.rs:213,
  minus its reduce-phase bugs; pandas is the oracle here).

derandomize=True keeps the suite deterministic; each example runs a real
Spark job, so example counts are tuned for wall-clock (the reference's
100-iteration bar is met across the combined suite runs of a round).
"""

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

PROP = settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_COL_TYPES = ["long", "double", "string"]

_schemas = st.lists(
    st.sampled_from(_COL_TYPES), min_size=1, max_size=5
)


def _value_for(tp: str, draw_int: int) -> object:
    if tp == "long":
        return draw_int
    if tp == "double":
        # Exact in binary64 — round-trip must be bit-identical.
        return float(draw_int) / 4.0
    return f"s{draw_int}"


@PROP
@given(
    types=_schemas,
    cells=st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=100),
)
def test_p1_parquet_roundtrip(spark, tmp_path_factory, types, cells):
    path = str(tmp_path_factory.mktemp("p1") / "t.parquet")
    schema = ", ".join(f"c{i} {tp}" for i, tp in enumerate(types))
    rows = [
        tuple(_value_for(tp, v * (i + 1) + j) for j, tp in enumerate(types))
        for i, v in enumerate(cells)
    ]
    df = spark.createDataFrame(rows, schema)
    df.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, rows))


@PROP
@given(
    data=st.lists(
        st.tuples(st.sampled_from(["A", "B", "C"]), st.integers(min_value=1, max_value=100)),
        min_size=10,
        max_size=50,
    )
)
def test_p18_groupby_matches_oracle(spark, data):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(data, "g string, v long")
    got = {
        r["g"]: r
        for r in df.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("v").alias("s"),
            F.avg("v").alias("a"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    oracle = pd.DataFrame(data, columns=["g", "v"]).groupby("g")["v"]
    want = {
        g: (int(s.count()), int(s.sum()), s.mean(), int(s.min()), int(s.max()))
        for g, s in oracle
    }
    assert set(got) == set(want)
    for g, (cnt, s, a, mn, mx) in want.items():
        r = got[g]
        assert (r["cnt"], r["s"], r["mn"], r["mx"]) == (cnt, s, mn, mx)
        assert math.isclose(r["a"], a, rel_tol=1e-12)


def test_connected_components_long_chain_converges(spark):
    """A 20-hop duplicate chain (diameter 20 > the old fixed 8 rounds)
    must collapse to ONE cluster rooted at the min id — the fixpoint +
    pointer-doubling guarantee from VERDICT r02 item 2."""
    from mini_lakehouse_control_plane_executor_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "id1 long, id2 long"
    )
    labels = connected_components(pairs)
    roots = [r.root for r in labels.collect()]
    assert len(roots) == 21
    assert set(roots) == {0}


def test_connected_components_multiple_clusters_exact(spark):
    """Two disjoint chains + an isolated pair: exact closure per group."""
    from mini_lakehouse_control_plane_executor_spark.operators.dedup import (
        connected_components,
    )

    edges = [(i, i + 1) for i in range(5)]          # 0..5 -> root 0
    edges += [(100 + i, 101 + i) for i in range(12)]  # 100..112 -> root 100
    edges += [(500, 501)]                             # pair -> root 500
    pairs = spark.createDataFrame(edges, "id1 long, id2 long")
    got = {r.id: r.root for r in connected_components(pairs).collect()}
    assert {got[i] for i in range(6)} == {0}
    assert {got[100 + i] for i in range(13)} == {100}
    assert got[500] == 500 and got[501] == 500


# --- Cross-engine percentile exactness ------------------------------------
# rfm_segmentation and length_trim_per_lang assign rows by comparing
# against exact percentile cutoffs computed INDEPENDENTLY by Spark
# (percentile) and DuckDB (quantile_cont). Both use type-7 interpolation
# at position (n-1)*q; for INTEGER-valued inputs with q in {.25,.5,.75}
# every product/sum in either formula ordering is exact in binary FP, so
# the cutoffs must be BIT-identical — the property the oracle hash
# comparison silently depends on.

_int_samples = st.lists(
    st.integers(min_value=0, max_value=10**9), min_size=1, max_size=60
)


@PROP
@given(vals=_int_samples)
def test_percentile_cutoffs_bit_identical(spark, vals):
    import duckdb

    sdf = spark.createDataFrame([(float(v),) for v in vals], "x double")
    got = sdf.selectExpr(
        "percentile(x, array(0.25d, 0.5d, 0.75d)) AS q"
    ).collect()[0]["q"]

    con = duckdb.connect()
    want = con.execute(
        "SELECT quantile_cont(x, [0.25, 0.5, 0.75]) FROM "
        "(SELECT CAST(unnest(?) AS DOUBLE) AS x)",
        [vals],
    ).fetchone()[0]
    con.close()

    assert list(got) == list(want), f"cutoff mismatch for n={len(vals)}"


# --- Filter-grammar parity (SURVEY §2.3) ----------------------------------
# The reference's whole predicate surface is `col op literal` with ops
# = == > < >= <= != <> and inferred literals. parse_filter must apply
# exactly the comparison the reference would — checked against a plain
# Python evaluation over random data, for int and string literals.

_FILTER_OPS = {
    "=": lambda a, b: a == b,
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<>": lambda a, b: a != b,
    ">": lambda a, b: a > b,
    "<": lambda a, b: a < b,
    ">=": lambda a, b: a >= b,
    "<=": lambda a, b: a <= b,
}


@PROP
@given(
    op=st.sampled_from(sorted(_FILTER_OPS)),
    lit=st.integers(min_value=-50, max_value=150),
    data=st.lists(st.integers(min_value=-50, max_value=150), min_size=1, max_size=30),
)
def test_filter_grammar_int_parity(spark, op, lit, data):
    from mini_lakehouse_control_plane_executor_spark.functions.filters import parse_filter

    sdf = spark.createDataFrame([(v,) for v in data], "k long")
    got = sorted(r.k for r in sdf.filter(parse_filter(f"k {op} {lit}")).collect())
    want = sorted(v for v in data if _FILTER_OPS[op](v, lit))
    assert got == want


@PROP
@given(
    op=st.sampled_from(sorted(_FILTER_OPS)),
    lit=st.text(alphabet="abc xyz", min_size=0, max_size=5),
    data=st.lists(
        st.text(alphabet="abc xyz", min_size=0, max_size=5), min_size=1, max_size=20
    ),
)
def test_filter_grammar_string_parity(spark, op, lit, data):
    """Quoted string literals (which may contain spaces — the quoted
    branch of the parser) compare lexicographically, like the
    reference's typed string comparison."""
    from mini_lakehouse_control_plane_executor_spark.functions.filters import parse_filter

    sdf = spark.createDataFrame([(v,) for v in data], "s string")
    got = sorted(r.s for r in sdf.filter(parse_filter(f"s {op} '{lit}'")).collect())
    want = sorted(v for v in data if _FILTER_OPS[op](v, lit))
    assert got == want


# ---------------------------------------------------------------------------
# P-r10: q-gram prefix-filter losslessness (pure lemma, no Spark)
# ---------------------------------------------------------------------------

_EDIT = st.tuples(
    st.sampled_from(["sub", "ins", "del"]),
    st.integers(min_value=0, max_value=30),
    st.sampled_from("abcd"),
)


def _apply_edits(s: str, edits) -> str:
    for op, pos, ch in edits:
        if not s:
            s = ch
            continue
        p = pos % len(s)
        if op == "sub":
            s = s[:p] + ch + s[p + 1 :]
        elif op == "ins":
            s = s[:p] + ch + s[p:]
        else:
            s = s[:p] + s[p + 1 :]
    return s


def _tri(s: str) -> set:
    return {s[i : i + 3] for i in range(len(s) - 2)}


@settings(max_examples=300, deadline=None, derandomize=True)
@given(
    base=st.text(alphabet="abcd", min_size=3, max_size=24),
    edits=st.lists(_EDIT, min_size=0, max_size=2),
    corpus=st.lists(
        st.text(alphabet="abcd", min_size=3, max_size=24), max_size=12
    ),
)
def test_prefix_filter_lemma_holds_at_ed2(base, edits, corpus):
    """The mathematical guarantee part_name_fuzzy_matches' blocking
    rests on, tested against random strings and a RANDOM global
    frequency order (the lemma must hold for ANY total order): two
    strings within edit distance 2 that share at least one distinct
    trigram must collide within their 7 rarest trigrams under a
    df-ascending order — one edit destroys at most 3 DISTINCT
    trigrams (if a gram leaves the set, every occurrence was
    touched), so the globally smallest shared trigram has at most 6
    rarer grams on either side. A tiny alphabet maximizes shared
    grams and df ties, the adversarial regime for the tie-break."""
    from collections import Counter

    other = _apply_edits(base, edits)
    ga, gb = _tri(base), _tri(other)
    if len(base) < 3 or len(other) < 3 or not (ga & gb):
        return  # outside the operator's contract on both paths
    df = Counter()
    for s in corpus + [base, other]:
        for g in _tri(s):
            df[g] += 1
    key = lambda g: (df[g], g)  # noqa: E731 — the query's exact order
    pa = set(sorted(ga, key=key)[:7])
    pb = set(sorted(gb, key=key)[:7])
    assert pa & pb, (base, other, sorted(ga, key=key), sorted(gb, key=key))


@PROP
@given(
    seqs=st.lists(
        st.lists(st.integers(min_value=0, max_value=6), min_size=2, max_size=12),
        min_size=1,
        max_size=8,
    )
)
def test_kneser_ney_distribution_normalizes(seqs):
    """The interpolated-KN formula bigram_kneser_ney_ppl scores with —
    P(w2|w1) = (c12-D)/c1 + D*N1+(w1,.)/c1 * N1+(.,w2)/T — is a proper
    probability distribution: summed over the continuation vocabulary
    (observed bigrams discounted, unseen ones receiving only the
    continuation-smoothed mass) every context's total is exactly 1.
    Algebra: sum of (c12-D) over w1's nf observed continuations is
    c1 - D*nf, and sum of N1+(.,w2) over the vocab is T — so the two
    terms close to c1/c1. Pure-pandas mirror of the query's math on
    random corpora (token ids 0..6 force collisions so nf/nb/T take
    nontrivial values)."""
    from collections import Counter

    from mini_lakehouse_control_plane_executor_spark.queries import _KN_D

    c12 = Counter()
    for s in seqs:
        for a, b in zip(s, s[1:]):
            c12[(a, b)] += 1
    c1 = Counter()
    nf = Counter()
    nb = Counter()
    for (a, b), c in c12.items():
        c1[a] += c
        nf[a] += 1
        nb[b] += 1
    T = len(c12)
    vocab = sorted(nb)  # continuation vocabulary
    for w1 in sorted(c1):
        total = 0.0
        for w2 in vocab:
            disc = max(c12.get((w1, w2), 0) - _KN_D, 0.0) / c1[w1]
            cont = _KN_D * nf[w1] / c1[w1] * (nb[w2] / T)
            p = disc + cont
            assert 0.0 < p <= 1.0
            total += p
        assert abs(total - 1.0) < 1e-9


@PROP
@given(
    start=st.integers(min_value=0, max_value=10_000),
    length=st.integers(min_value=0, max_value=3_000),
    wb=st.integers(min_value=0, max_value=120),
)
def test_interval_bucket_expansion_equals_overlap(start, length, wb):
    """The exactness lemma behind events_interval_overlap_join's
    rewrite: for a window that IS one width-W bucket [wb*W, (wb+1)*W),
    bucket membership wb in [start div W, end div W] holds IFF the
    closed interval [start, end] overlaps the window. Checked over
    random intervals and buckets at W=100 (scale-free: only div
    arithmetic is involved)."""
    W = 100
    end = start + length
    member = (start // W) <= wb <= (end // W)
    overlap = start < (wb + 1) * W and end >= wb * W
    assert member == overlap


@PROP
@given(
    trans=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # src channel id
            st.integers(min_value=-2, max_value=3),  # dst: -2 NULL, -1 CONV, >=0 channel
            st.integers(min_value=1, max_value=50),  # count
        ),
        min_size=1,
        max_size=25,
    )
)
def test_markov_removal_effect_nonnegative_and_monotone(trans):
    """events_markov_attribution's docstring claims: (a) removal
    effects are nonnegative (turning a channel off only deletes
    conversion paths — its incoming mass becomes non-converting), and
    (b) the integer value-iteration is monotone nondecreasing in k
    (starting from p=0, each step only adds discovered conversion
    mass). Checked on random transition-count matrices through the
    exact integer pipeline the query runs (floor-micro probabilities,
    floor division per step)."""
    pm_counts = {}
    for src, dst, n in trans:
        s = f"c{src}"
        d = {-2: "NULL", -1: "CONV"}.get(dst, f"c{dst}")
        if s == d:
            continue
        pm_counts[(s, d)] = pm_counts.get((s, d), 0) + n
    # START rows: route to every channel that appears anywhere
    chans = sorted(
        {s for (s, _) in pm_counts} | {d for (_, d) in pm_counts if d.startswith("c")}
    )
    if not chans:
        return
    for c in chans:
        pm_counts[("START", c)] = 1
    tot = {}
    for (s, _), n in pm_counts.items():
        tot[s] = tot.get(s, 0) + n
    pm = {k: n * 1000000 // tot[k[0]] for k, n in pm_counts.items()}

    def absorb(removed, iters=25, trace=False):
        states = ["START"] + [c for c in chans if c != removed]
        p = {s: 0 for s in states}
        seq = []
        for _ in range(iters):
            p = {
                s: (
                    pm.get((s, "CONV"), 0) * 1000000
                    + sum(pm.get((s, d), 0) * p[d] for d in states)
                )
                // 1000000
                for s in states
            }
            seq.append(p["START"])
        return seq if trace else p["START"]

    seq = absorb(None, trace=True)
    assert all(b >= a for a, b in zip(seq, seq[1:]))  # monotone in k
    p_full = seq[-1]
    for c in chans:
        assert absorb(c) <= p_full  # removal never helps


@PROP
@given(
    ivals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1_000),   # start
            st.integers(min_value=0, max_value=400),     # length
        ),
        min_size=1,
        max_size=30,
    ),
    wb=st.integers(min_value=0, max_value=12),
)
def test_sweepline_peak_equals_bruteforce(ivals, wb):
    """The per-bucket sweep-line behind events_session_concurrency_peak:
    peak concurrency within window [wb*W, (wb+1)*W) computed as
    carry + max over delta timestamps of (starts<=t minus ends<t)
    equals the brute-force max over all in-window instants of
    |{[s,e] : s <= t <= e}|. Pure-integer model of the Spark plan
    (carry from bucket membership with an earlier start bucket; deltas
    only in the start's and end's own buckets)."""
    W = 100
    lo, hi = wb * W, (wb + 1) * W
    spans = [(s, s + ln) for s, ln in ivals]
    # brute force over every candidate instant in the window
    cands = {lo} | {s for s, e in spans if lo <= s < hi} | {e for s, e in spans if lo <= e < hi}
    brute = max(sum(1 for s, e in spans if s <= t <= e) for t in cands)
    # sweep-line: carry + per-window deltas
    carry = sum(1 for s, e in spans if s < lo <= e)
    deltas = {}
    for s, e in spans:
        if lo <= s < hi:
            d = deltas.setdefault(s, [0, 0]); d[0] += 1
        if lo <= e < hi:
            d = deltas.setdefault(e, [0, 0]); d[1] += 1
    peak, cum_s, cum_e = carry, 0, 0
    for t in sorted(deltas):
        ns, ne = deltas[t]
        cum_s += ns
        peak = max(peak, carry + cum_s - cum_e)  # ends<t excluded
        cum_e += ne
    assert peak == brute


_ESDUP_COUNTER = [0]


@settings(max_examples=10, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b"]), min_size=0, max_size=30),
        min_size=2,
        max_size=5,
    )
)
def test_exact_substring_equals_token_level_bruteforce(spark, tmp_path, docs):
    """docs_exact_substring_dup against an INDEPENDENT token-level
    oracle: for every doc pair and every alignment offset, extend-match
    maximal common token blocks directly (no windows, no islands); every
    maximal block of length >= K must surface as exactly one run of
    that length. Alphabet {a, b} forces dense sharing; <= 5 docs keeps
    every window's document frequency under the MAXDF=8 gate, so the
    gate (tested separately) never interferes with the equivalence."""
    from collections import defaultdict

    from mini_lakehouse_control_plane_executor_spark import queries as qlib

    K = qlib._ESDUP_K
    _ESDUP_COUNTER[0] += 1
    d = tmp_path / f"esdup{_ESDUP_COUNTER[0]}"
    rows = [
        (i, " ".join(tk), "en", "s", len(" ".join(tk))) for i, tk in enumerate(docs)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")

    expected = defaultdict(list)  # (a, b) -> [run_len, ...]
    for ia in range(len(docs)):
        for ib in range(ia + 1, len(docs)):
            A, B = docs[ia], docs[ib]
            for diag in range(-(len(B) - 1), len(A)):
                run = 0
                # walk the diagonal: positions i in A, i-diag in B
                for i in range(max(0, diag), min(len(A), len(B) + diag) + 1):
                    j = i - diag
                    if i < len(A) and 0 <= j < len(B) and A[i] == B[j]:
                        run += 1
                    else:
                        if run >= K:
                            expected[(ia, ib)].append(run)
                        run = 0
    got = {
        (r.doc_a, r.doc_b): (r.n_runs, r.max_run_tokens, r.dup_tokens)
        for r in qlib._REGISTRY["docs_exact_substring_dup"](spark, str(d)).collect()
    }
    want = {
        pair: (len(runs), max(runs), sum(runs))
        for pair, runs in expected.items()
        if runs
    }
    assert got == want


def test_filter_grammar_unescapes_doubled_quotes(spark):
    """SQL doubled-quote escapes in string literals must match the rows
    Spark SQL itself would match — the r12 review found 'it''s' taken
    verbatim (both the row filter and file pruning missed the value)."""
    from mini_lakehouse_control_plane_executor_spark.functions.filters import (
        parse_comparison,
        parse_filter,
    )

    cmp = parse_comparison("product = 'it''s'")
    assert cmp is not None and cmp.value == "it's"
    # with spaces — the regex path
    cmp2 = parse_comparison("product = 'a b''c d'")
    assert cmp2 is not None and cmp2.value == "a b'c d"
    sdf = spark.createDataFrame([("it's",), ("its",)], "product string")
    got = [r.product for r in sdf.filter(parse_filter("product = 'it''s'")).collect()]
    want = [
        r.product
        for r in sdf.filter("product = 'it''s'").collect()  # Spark SQL authority
    ]
    assert got == want == ["it's"]
