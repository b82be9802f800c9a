"""Round-6 quality & traversal suite: DuckDB-oracle parity at sf0.01,
pure-Python property references for the graph/robust-stat kernels (the
checks an oracle that shares the algorithm cannot provide), and physical
plan audits for the scale-critical shapes."""

from __future__ import annotations

import random
import re

import pytest
from pyspark.sql import functions as F

from osm_pbf_parquet_spark.operators.fuzzy import blocked_levenshtein_topk
from osm_pbf_parquet_spark.operators.graph import bfs_hops, triangle_count
from osm_pbf_parquet_spark.operators.quality import (
    chi_square_cells,
    mad_outliers,
)
from osm_pbf_parquet_spark.plans.quality_queries import QUALITY_QUERIES

from oracle_harness import run_compare

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(QUALITY_QUERIES))
def test_quality_oracle_parity(spark, name):
    fn, oracle = QUALITY_QUERIES[name]
    run_compare(spark, SF_DIR, name, fn, oracle)


# --- BFS vs pure-Python reference ---------------------------------------------


def _py_bfs(edges, sources, max_hops):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    hops = {s: 0 for s in sources}
    frontier = set(sources)
    for h in range(1, max_hops + 1):
        nxt = set()
        for n in frontier:
            nxt |= adj.get(n, set())
        nxt -= hops.keys()
        for n in nxt:
            hops[n] = h
        frontier = nxt
    return hops


def test_bfs_matches_python_reference(spark):
    rng = random.Random(7)
    edges = list({(rng.randrange(60), rng.randrange(60)) for _ in range(300)})
    sources = [0, 1, 2]
    expect = _py_bfs(edges, sources, 4)
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in sources], "node long")
    got = {r["node"]: r["hops"] for r in bfs_hops(e, s, max_hops=4).collect()}
    assert got == expect


def test_bfs_early_exit_on_drained_frontier(spark):
    """An isolated source must return just itself at hop 0, however deep
    the requested bound (the isEmpty early-exit path)."""
    e = spark.createDataFrame([(10, 11)], "src long, dst long")
    s = spark.createDataFrame([(99,)], "node long")
    rows = bfs_hops(e, s, max_hops=10).collect()
    assert [(r["node"], r["hops"]) for r in rows] == [(99, 0)]


# --- triangle counting vs brute force -------------------------------------------


def _py_triangles(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    es = set(und)
    tri = 0
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) not in es:
                continue
            for c in nodes[nodes.index(b) + 1:]:
                if (a, c) in es and (b, c) in es:
                    tri += 1
    return len(nodes), len(und), tri


def test_triangles_match_bruteforce(spark):
    rng = random.Random(13)
    edges = list({(rng.randrange(25), rng.randrange(25)) for _ in range(120)})
    nn, ne, nt = _py_triangles(edges)
    row = triangle_count(
        spark.createDataFrame(edges, "src long, dst long")
    ).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (nn, ne, nt)


def test_triangles_complete_graph(spark):
    """K5 has C(5,3)=10 triangles; duplicate + reversed input edges must
    not change the count (canonicalization)."""
    edges = [(a, b) for a in range(5) for b in range(5) if a != b]
    row = triangle_count(
        spark.createDataFrame(edges, "src long, dst long")
    ).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (5, 10, 10)


# --- MAD outliers vs pure-Python reference ---------------------------------------


def _py_mad(vals, k):
    sv = sorted(vals)
    n = len(sv)
    lo, hi = (n + 1) // 2 - 1, n // 2
    med2 = sv[lo] + sv[hi]
    devs = sorted(abs(2 * v - med2) for v in vals)
    mad4 = devs[lo] + devs[hi]
    return med2, mad4, sum(1 for v in vals if abs(2 * v - med2) * 2 > k * mad4)


@pytest.mark.parametrize("n", [1, 2, 7, 100])
def test_mad_matches_python_reference(spark, n):
    rng = random.Random(n)
    vals = [rng.randrange(-1000, 10000) for _ in range(n)]
    med2, mad4, nout = _py_mad(vals, 8)
    df = spark.createDataFrame([("g", v) for v in vals], "g string, x long")
    row = mad_outliers(df, ["g"], "x", k=8).collect()[0]
    assert (row["n"], row["med_x2"], row["mad_x4"], row["n_outliers"]) == (
        n, med2, mad4, nout,
    )


def test_mad_constant_group_flags_nothing(spark):
    """All-equal values: MAD=0 and every deviation is 0, so 0 outliers
    (0 > 0 is false) — the degenerate case must not divide or NaN."""
    df = spark.createDataFrame([("g", 5)] * 9, "g string, x long")
    row = mad_outliers(df, ["g"], "x").collect()[0]
    assert (row["med_x2"], row["mad_x4"], row["n_outliers"]) == (10, 0, 0)


# --- fuzzy matching: Spark levenshtein = classic DP -------------------------------


def _py_lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_builtin_is_classic(spark):
    cases = [("kitten", "sitting"), ("", "abc"), ("flaw", "lawn"),
             ("red widget", "red gadget"), ("same", "same")]
    df = spark.createDataFrame(cases, "a string, b string")
    got = df.select(F.levenshtein("a", "b").alias("d")).collect()
    assert [r["d"] for r in got] == [_py_lev(a, b) for a, b in cases]


def test_fuzzy_topk_respects_block_and_tiebreak(spark):
    """Pairs only form within a block; k-cut ties break on keys."""
    rows = [(1, "alpha", "A"), (2, "alphb", "A"), (3, "alpha", "B"),
            (4, "alphz", "A"), (5, "alpha", "A")]
    df = spark.createDataFrame(rows, "k long, name string, blk string")
    got = blocked_levenshtein_topk(df, "k", "name", "blk", k=3).collect()
    assert [(r["key_1"], r["key_2"], r["distance"]) for r in got] == [
        (1, 5, 0), (1, 2, 1), (1, 4, 1),
    ]


# --- chi-square semantics ----------------------------------------------------------


def test_chi_square_independent_uniform_is_zero(spark):
    """A perfectly balanced contingency (independent uniform margins)
    has zero chi-square contribution in every cell."""
    rows = [(a, b) for a in "xy" for b in "uv" for _ in range(10)]
    df = spark.createDataFrame(rows, "a string, b string")
    got = chi_square_cells(df, "a", "b").collect()
    assert len(got) == 4
    assert all(r["contrib"] == 0.0 and r["observed"] == 10 for r in got)


def test_chi_square_denominator_survives_int64_wrap(spark):
    """N·R·C wraps int64 around N ~ 2e6 (the denominator used to be a
    BIGINT product, yielding NEGATIVE contributions under non-ANSI
    Spark). Two perfectly dependent cells of n rows each give
    contrib = n/2 per cell exactly; with n = 1.7e6 the integer product
    2n³ ≈ 9.8e18 exceeds int64, so this pins the double-domain fix."""
    n = 1_700_000
    df = (
        spark.range(n)
        .select(F.lit("x").alias("a"), F.lit("u").alias("b"))
        .unionAll(
            spark.range(n).select(
                F.lit("y").alias("a"), F.lit("v").alias("b")
            )
        )
    )
    got = chi_square_cells(df, "a", "b").collect()
    assert len(got) == 2
    for r in got:
        assert r["contrib"] > 0  # the wrapped BIGINT gave negatives
        assert abs(r["contrib"] - n / 2) < 1e-3


# --- physical plan audits -----------------------------------------------------------


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_quality_plans_no_cartesian(spark):
    """None of the suite may lower to a cartesian/nested-loop join over
    data-sized inputs (the 1-row stat broadcasts in triangle_count and
    profile stacking are exempt by construction: BroadcastNestedLoopJoin
    against a 1-row aggregate is a constant join)."""
    # sf0.001 (r13 suite wall): cartesian-vs-equi structure is decided by
    # join CONDITIONS, not input size, and several quality queries run
    # eager jobs (louvain/BFS training loops) during plan CONSTRUCTION —
    # at sf0.01 this sweep alone cost ~40 s of suite wall
    for name, (fn, _o) in QUALITY_QUERIES.items():
        plan = _plan(fn(spark, "/root/testdata/sf0.001"))
        assert "CartesianProduct" not in plan, name


def _n_scans(plan: str) -> int:
    # each scan appears once as a "(N) Scan parquet" detail header
    return len(re.findall(r"\(\d+\) Scan parquet", plan))


def test_profile_is_single_pass(spark):
    """One Expand-based aggregation: exactly one scan of orders (the
    exact multi-distinct rewrite: Expand ×(cols+1), two shuffles of
    partial aggregates, never N per-column passes)."""
    plan = _plan(QUALITY_QUERIES["profile_table"][0](spark, SF_DIR))
    assert _n_scans(plan) == 1
    assert "Expand" in plan


def test_dq_lineitem_rules_share_one_scan(spark):
    """Five lineitem rules must not cost five scans: the conditional
    aggregates share one pass over the joined frame."""
    plan = _plan(QUALITY_QUERIES["dq_checks"][0](spark, SF_DIR))
    # lineitem + orders + customer + supplier = 4 scans total
    assert _n_scans(plan) == 4


def test_mad_windows_are_partitioned(spark):
    """No global (unpartitioned) window over data rows: every window
    spec in the MAD plan partitions by the group keys. (The only
    unpartitioned window in the suite is chi-square's, which runs over
    bounded contingency CELLS, not raw rows.)"""
    plan = _plan(QUALITY_QUERIES["mad_outliers"][0](spark, SF_DIR))
    specs = [s for s in plan.split("windowspecdefinition(")[1:]]
    assert specs, "expected window specs in the MAD plan"
    for s in specs:
        # spec renders as (part1#N, part2#N, order#N ASC ..., frame):
        # the PARTITION list is the leading comma-tokens with no
        # ASC/DESC marker — ordering columns must not satisfy the check
        part_cols = []
        for tok in s.split(","):
            if (" ASC" in tok or " DESC" in tok
                    or "specifiedwindowframe" in tok):
                break
            part_cols.append(tok)
        assert any("seg#" in t for t in part_cols) and any(
            "prio#" in t for t in part_cols
        ), "window not partitioned by (seg, prio): " + s[:120]


# --- EWMA vs pure-Python recursion -------------------------------------------------


def _py_ewma(vals, w):
    tail = vals[-w:]
    s = tail[0]
    for x in tail[1:]:
        s = (x + s) / 2.0
    return len(tail), s


@pytest.mark.parametrize("n", [1, 3, 16, 40])
def test_ewma_matches_recursive_definition(spark, n):
    """The scaled-integer linearization must equal the literal
    recursion S_k = (x_k + S_{k-1})/2 on the trailing window."""
    from osm_pbf_parquet_spark.operators.ordered import ewma_smooth

    rng = random.Random(n)
    vals = [rng.randrange(0, 50000) for _ in range(n)]
    df = spark.createDataFrame(
        [("u", i, v) for i, v in enumerate(vals)], "k string, t long, x long"
    )
    row = ewma_smooth(df, "k", ["t"], "x", window_last=16).collect()[0]
    k, s = _py_ewma(vals, 16)
    assert row["n_used"] == k
    assert row["ewma"] == pytest.approx(s, abs=1e-9)
    # exactness: U = EWMA * 2^k exactly
    assert row["ewma_u"] == round(s * (1 << k))


def test_hll_set_algebra_disjoint_and_identical(spark):
    """Disjoint sides: exact intersection 0 and union = |A|+|B|.
    Identical sides: union registers equal each side's, so
    est_union = est_a = est_b and est_intersection = est_a."""
    from osm_pbf_parquet_spark.operators.sketches import hll_set_algebra

    disj = spark.createDataFrame(
        [(i, "a") for i in range(300)] + [(i + 1000, "b") for i in range(200)],
        "k long, t string",
    )
    r = hll_set_algebra(disj, "k", F.col("t") == "a", F.col("t") == "b").collect()[0]
    assert (r["exact_a"], r["exact_b"], r["exact_union"]) == (300, 200, 500)
    assert r["exact_intersection"] == 0

    same = spark.createDataFrame(
        [(i, t) for i in range(250) for t in ("a", "b")], "k long, t string"
    )
    r = hll_set_algebra(same, "k", F.col("t") == "a", F.col("t") == "b").collect()[0]
    assert r["z_a"] == r["z_b"] == r["z_union"]
    assert r["est_intersection"] == r["est_a"]
    assert r["exact_intersection"] == 250


def test_grouped_dq_counts_segment_by_window(spark):
    """group_by segments the counts; per-group n_checked is the group
    size and violations stay within their group."""
    from osm_pbf_parquet_spark.operators.quality import dq_counts

    df = spark.createDataFrame(
        [("w1", 5), ("w1", 50), ("w2", 7), ("w2", 8), ("w2", 90)],
        "win string, v long",
    )
    out = dq_counts(df, [("big", F.col("v") > 40)], group_by=["win"]).collect()
    got = {r["win"]: (r["n_violations"], r["n_checked"]) for r in out}
    assert got == {"w1": (1, 2), "w2": (1, 3)}


def test_hll_set_algebra_empty_side(spark):
    """A side whose predicate matches nothing must yield the all-empty
    sketch (z = m·2^53, v = m, est 0.0) — and the composed intersection
    stays finite, matching the oracle's coalesce'd finish."""
    from osm_pbf_parquet_spark.operators.sketches import HLL_P, hll_set_algebra

    m = 1 << HLL_P
    df = spark.createDataFrame([(i, "a") for i in range(100)], "k long, t string")
    r = hll_set_algebra(df, "k", F.col("t") == "a", F.col("t") == "zzz").collect()[0]
    assert (r["z_b"], r["v_b"], r["exact_b"], r["est_b"]) == (m << 53, m, 0, 0.0)
    assert r["exact_intersection"] == 0
    assert r["est_intersection"] is not None


def test_profile_and_dq_accept_exotic_identifiers(spark):
    """Column/rule names with spaces and quotes must not break the
    stack()/alias expression plumbing."""
    from osm_pbf_parquet_spark.operators.quality import dq_counts, profile_table

    df = spark.createDataFrame([(1, "x"), (2, None)], ["order id", "o'clock"])
    prof = {r["col_name"]: (r["n_null"], r["n_distinct"])
            for r in profile_table(
                df, [("order id", "int"), ("o'clock", "str")]).collect()}
    assert prof == {"order id": (0, 2), "o'clock": (1, 1)}
    dq = dq_counts(df, [("it's big", F.col("order id") > 1)]).collect()
    assert (dq[0]["rule"], dq[0]["n_violations"], dq[0]["n_checked"]) == ("it's big", 1, 2)


def test_fuzzy_topk_string_keys(spark):
    """Non-numeric keys keep their native type and still pair/tiebreak
    correctly (regression: a cast-to-long silently NULLed string keys
    and returned an empty result)."""
    rows = [("u1", "alpha", "A"), ("u2", "alphb", "A"), ("u3", "alpha", "A")]
    df = spark.createDataFrame(rows, "k string, name string, blk string")
    got = blocked_levenshtein_topk(df, "k", "name", "blk", k=2).collect()
    assert [(r["key_1"], r["key_2"], r["distance"]) for r in got] == [
        ("u1", "u3", 0), ("u1", "u2", 1),
    ]


def test_exact_quantiles_match_sorted_reference(spark):
    """Two-pass bucket selection must equal direct sorted indexing for
    every rational q, including q=0 and q=1."""
    from osm_pbf_parquet_spark.operators.sketches import exact_quantiles

    rng = random.Random(42)
    vals = [rng.randrange(-10**6, 10**6) for _ in range(5001)]
    qs = [(0, 1), (1, 4), (1, 2), (3, 4), (1, 1)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {(r["q_num"], r["q_den"]): (r["value"], r["target_rank"])
           for r in exact_quantiles(df, "v", qs).collect()}
    sv = sorted(vals)
    n = len(sv)
    for qn, qd in qs:
        k = (n - 1) * qn // qd + 1
        assert got[(qn, qd)] == (sv[k - 1], k), (qn, qd)


def test_exact_quantiles_heavy_ties(spark):
    """A near-constant column (one mega-bin) still selects the exact
    element — the documented worst case degrades to one partition's
    sort, not a wrong answer."""
    from osm_pbf_parquet_spark.operators.sketches import exact_quantiles

    vals = [5] * 900 + [7] * 100
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {tuple((r["q_num"], r["q_den"])): r["value"]
           for r in exact_quantiles(df, "v", [(1, 2), (95, 100)]).collect()}
    assert got == {(1, 2): 5, (95, 100): 7}


def test_feature_hashing_deterministic_and_bounded(spark):
    """Dims stay in [0, dim); repeated tokens accumulate their sign
    (|value| for a doc of one repeated token = its count); results are
    partitioning-independent."""
    from osm_pbf_parquet_spark.operators.features import feature_hashing

    df = spark.createDataFrame(
        [(1, "zap zap zap"), (2, "one two three four")], "doc_id long, text string"
    )
    rows = feature_hashing(df, "doc_id", "text", dim=8).collect()
    assert all(0 <= r["dim"] < 8 for r in rows)
    doc1 = [r for r in rows if r["doc_id"] == 1]
    assert len(doc1) == 1 and abs(doc1[0]["value"]) == 3
    again = feature_hashing(df.repartition(7), "doc_id", "text", dim=8).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_group_regression_recovers_known_line(spark):
    """Points on an exact line y = 3x + 17 must return slope 3.0 and
    intercept 17.0 exactly (integer moments, zero residual); a single
    point and a zero-variance group return NULL slope/intercept."""
    from osm_pbf_parquet_spark.operators.quality import group_regression

    pts = [("g", x, 3 * x + 17) for x in range(-50, 200, 7)]
    df = spark.createDataFrame(
        pts + [("one", 5, 99), ("flat", 4, 10), ("flat", 4, 20)],
        "g string, x long, y long",
    )
    rows = {r["g"]: r for r in group_regression(df, ["g"], "x", "y").collect()}
    assert rows["g"]["slope"] == 3.0 and rows["g"]["intercept"] == 17.0
    assert rows["one"]["slope"] is None and rows["one"]["intercept"] is None
    assert rows["flat"]["slope"] is None


def test_group_regression_matches_numpy(spark):
    """Noisy data: exact-moment OLS must agree with numpy.polyfit to
    float precision."""
    import numpy as np

    from osm_pbf_parquet_spark.operators.quality import group_regression

    rng = random.Random(9)
    xs = [rng.randrange(0, 10000) for _ in range(500)]
    ys = [2 * x + rng.randrange(-1000, 1000) for x in xs]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "g string, x long, y long"
    )
    r = group_regression(df, ["g"], "x", "y").collect()[0]
    slope, intercept = np.polyfit(np.array(xs, dtype=float),
                                  np.array(ys, dtype=float), 1)
    assert r["slope"] == pytest.approx(slope, rel=1e-9)
    assert r["intercept"] == pytest.approx(intercept, rel=1e-6)


def test_group_regression_null_pairs_excluded(spark):
    """Rows with a NULL coordinate must not count toward n or skew the
    fit: points on y=x plus a NULL-y row still give slope exactly 1."""
    from osm_pbf_parquet_spark.operators.quality import group_regression

    df = spark.createDataFrame(
        [("g", 1, 1), ("g", 2, 2), ("g", 3, None), ("g", 4, 4)],
        "g string, x long, y long",
    )
    r = group_regression(df, ["g"], "x", "y").collect()[0]
    assert r["n"] == 3 and r["slope"] == 1.0 and r["intercept"] == 0.0


def test_group_regression_huge_values_no_wrap(spark):
    """Per-row products beyond int64 (epoch-micros x) must not wrap:
    y = 2x over x ~ 1.7e18 still recovers slope 2 exactly."""
    from osm_pbf_parquet_spark.operators.quality import group_regression

    base = 1_700_000_000_000_000_000
    # exact line (y fits long but x*y ~ 1.7e24 >> 2^63)
    pts = [("g", base + i, 1_000_000 + 3 * i) for i in range(5)]
    df = spark.createDataFrame(pts, "g string, x long, y long")
    r = group_regression(df, ["g"], "x", "y").collect()[0]
    assert r["slope"] == 3.0


def test_exact_quantiles_full_int64_range_and_dup_qs(spark):
    """Bucketing a full-range column must not overflow (min near -2^62,
    max near 2^62), and duplicate quantile specs must collapse rather
    than corrupt ranks."""
    from osm_pbf_parquet_spark.operators.sketches import exact_quantiles

    vals = [-(2**62), -(2**40), -17, 0, 5, 12, 2**40, 2**62]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = exact_quantiles(df, "v", [(1, 2), (1, 2), (0, 1), (1, 1)]).collect()
    got = {(r["q_num"], r["q_den"]): r["value"] for r in rows}
    assert len(rows) == 3  # dup collapsed
    sv = sorted(vals)
    assert got == {(0, 1): sv[0], (1, 2): sv[(len(sv) - 1) // 2], (1, 1): sv[-1]}
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", [(3, 2)]).collect()


def test_scd2_snapshot_reconstructs_point_in_time(spark):
    """snapshot(intervals(log), t) = latest change per key at/before t;
    exactly one row per key with history at t, none for keys whose
    first change is after t."""
    from osm_pbf_parquet_spark.operators.ordered import (
        scd2_intervals, scd2_snapshot,
    )

    log = spark.createDataFrame(
        [(1, "a", 10, 1), (1, "b", 20, 2), (1, "c", 30, 3),
         (2, "x", 25, 4), (3, "q", 5, 5), (3, "q", 15, 6)],
        "k long, attr string, ts long, eid long",
    )
    iv = scd2_intervals(log, "k", "attr", "ts", "eid")
    snap = {r["k"]: r["attr"]
            for r in scd2_snapshot(iv, 22).collect()}
    # at t=22: key1 on 'b' (20<=22<30), key2 'x' (25>22? no -> absent),
    # key3 'q' (5<=22, no close)
    assert snap == {1: "b", 3: "q"}
    assert {r["k"] for r in scd2_snapshot(iv, 25).collect()} == {1, 2, 3}


# --- autocorrelation: numpy reference ----------------------------------------


def test_autocorr_matches_numpy(spark):
    import numpy as np

    from osm_pbf_parquet_spark.operators.quality import autocorr_lags

    rng = np.random.default_rng(11)
    rows = []
    series = {}
    for g in ["a", "b"]:
        vals = rng.integers(0, 1000, size=60).tolist()
        series[g] = vals
        rows += [(g, i, int(v)) for i, v in enumerate(vals)]
    # constant series → NULL acf at every lag
    rows += [("c", i, 5) for i in range(10)]
    df = spark.createDataFrame(rows, ["g", "pos", "v"])
    got = {
        (r.g, r.lag): (r.n_pairs, r.acf)
        for r in autocorr_lags(df, ["g"], ["pos"], "v", max_lag=3).collect()
    }
    for g, vals in series.items():
        for k in (1, 2, 3):
            x = np.array(vals[k:], dtype=float)
            y = np.array(vals[:-k], dtype=float)
            ref = np.corrcoef(x, y)[0, 1]
            n, acf = got[(g, k)]
            assert n == len(vals) - k
            assert abs(acf - ref) < 1e-12, (g, k, acf, ref)
    for k in (1, 2, 3):
        n, acf = got[("c", k)]
        assert n == 10 - k and acf is None


def test_fuzzy_skewed_block_guard(spark):
    """A skewed blocking key silently goes quadratic; with
    max_block_rows the job must FAIL naming the block, and a satisfied
    cap must not change the result."""
    rows = [(i, f"name{i}", "big" if i < 6 else "ok") for i in range(8)]
    df = spark.createDataFrame(rows, "k long, name string, blk string")
    baseline = blocked_levenshtein_topk(df, "k", "name", "blk", k=5).collect()
    with pytest.raises(Exception, match="max_block_rows=4"):
        blocked_levenshtein_topk(
            df, "k", "name", "blk", k=5, max_block_rows=4
        ).collect()
    got = blocked_levenshtein_topk(
        df, "k", "name", "blk", k=5, max_block_rows=6
    ).collect()
    assert got == baseline


def test_hashed_linear_score_hand_computed(spark):
    """r10: the fixed-point linear scorer on a 2-token doc equals the
    hand-composed sign·weight sum, and `keep` flips exactly at the
    threshold (fixed-point comparison, no float on the decision path)."""
    import hashlib

    from osm_pbf_parquet_spark.operators.features import hashed_linear_score

    def h(s, m):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % m

    weights = [(d * 37) % 100 - 50 for d in range(16)]

    def contrib(term):
        return (1 - 2 * h(term + ":s", 2)) * weights[h(term, 16)]

    doc = "alpha beta"
    want = contrib("alpha") + contrib("beta")
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    row = hashed_linear_score(df, "doc_id", weights).collect()[0]
    assert row["score_fp"] == want and row["n_tokens"] == 2
    assert row["score"] == round(want / 1e6, 6)
    # threshold: keep is >= in fixed-point units
    at = hashed_linear_score(df, "doc_id", weights, threshold=want)
    assert at.collect()[0]["keep"] is True
    above = hashed_linear_score(df, "doc_id", weights, threshold=want + 1)
    assert above.collect()[0]["keep"] is False
    # bias shifts the score exactly
    biased = hashed_linear_score(df, "doc_id", weights, bias=7)
    assert biased.collect()[0]["score_fp"] == want + 7


def test_hashed_linear_score_classifies_empty_docs(spark):
    """r11 (advisor note): token-less documents must SURFACE with
    n_tokens=0 and score_fp=bias instead of vanishing from the output —
    a curation pipeline joining verdicts back would otherwise silently
    lose them."""
    from osm_pbf_parquet_spark.operators.features import hashed_linear_score

    weights = [(d * 37) % 100 - 50 for d in range(16)]
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, "   "), (4, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            hashed_linear_score(df, "doc_id", weights, bias=9,
                                threshold=10).collect()}
    assert set(rows) == {1, 2, 3, 4}
    for d in (2, 3, 4):
        assert rows[d]["n_tokens"] == 0
        assert rows[d]["score_fp"] == 9
        assert rows[d]["score"] == round(9 / 1e6, 6)
        assert rows[d]["keep"] is False
    assert rows[1]["n_tokens"] == 2
