"""Evaluation suite: DuckDB-oracle parity at sf0.01, pure-Python
references for the rank/agreement/t-test kernels (checks an oracle that
shares the formula cannot provide), and edge-case guards."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from osm_pbf_parquet_spark.operators.evaluation import (
    calibration_bins,
    cohens_kappa,
    roc_auc,
    welch_ttest,
)
from osm_pbf_parquet_spark.plans.eval_queries import EVAL_QUERIES

from oracle_harness import run_compare

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(EVAL_QUERIES))
def test_eval_oracle_parity(spark, name):
    fn, oracle = EVAL_QUERIES[name]
    run_compare(spark, SF_DIR, name, fn, oracle)


# --- ROC-AUC vs pure-Python pair counting ------------------------------------


def _py_auc(pairs):
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    if not pos or not neg:
        return None
    c = sum(1 for p in pos for n in neg if p > n)
    t = sum(1 for p in pos for n in neg if p == n)
    return (c + t / 2) / (len(pos) * len(neg))


def test_auc_matches_pair_counting(spark):
    rng = random.Random(7)
    # heavy ties: scores drawn from a tiny integer domain
    pairs = [(rng.randrange(12), rng.randrange(2)) for _ in range(400)]
    df = spark.createDataFrame(pairs, "score long, y long")
    row = roc_auc(df, "score", "y", coarse_width=4).collect()[0]
    assert row["n"] == 400
    assert row["auc"] == pytest.approx(_py_auc(pairs), abs=1e-9)


def test_auc_perfect_and_inverted(spark):
    df = spark.createDataFrame(
        [(i, 1 if i >= 50 else 0) for i in range(100)], "score long, y long"
    )
    assert roc_auc(df, "score", "y").collect()[0]["auc"] == 1.0
    inv = df.select((F.lit(100) - F.col("score")).alias("score"), "y")
    assert roc_auc(inv, "score", "y").collect()[0]["auc"] == 0.0


def test_auc_single_class_is_null(spark):
    df = spark.createDataFrame([(i, 1) for i in range(10)], "score long, y long")
    assert roc_auc(df, "score", "y").collect()[0]["auc"] is None


# --- Cohen's kappa vs the textbook formula ------------------------------------


def _py_kappa(pairs):
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    cats = {c for p in pairs for c in p}
    s = sum(
        sum(1 for a, _ in pairs if a == k) * sum(1 for _, b in pairs if b == k)
        for k in cats
    )
    return (n * agree - s) / (n * n - s)


def test_kappa_matches_reference(spark):
    rng = random.Random(11)
    cats = ["en", "de", "fr", "zh"]
    pairs = [
        (rng.choice(cats), rng.choice(cats) if rng.random() < 0.5 else None)
        for _ in range(300)
    ]
    # None → a category the first rater never uses (tests the 0-overlap arm)
    pairs = [(a, b if b is not None else "xx") for a, b in pairs]
    df = spark.createDataFrame(pairs, "a string, b string")
    row = cohens_kappa(df, "a", "b").collect()[0]
    assert row["n"] == 300
    assert row["kappa"] == pytest.approx(_py_kappa(pairs), abs=1e-9)


def test_kappa_perfect_agreement(spark):
    df = spark.createDataFrame([("x", "x"), ("y", "y")], "a string, b string")
    assert cohens_kappa(df, "a", "b").collect()[0]["kappa"] == 1.0


# --- calibration bins ----------------------------------------------------------


def test_calibration_bin_edges(spark):
    # scores at bin boundaries: 0 → bin 0, 99_999 → bin 0, 100_000 → bin 1,
    # 1_000_000 (inclusive top) → clamped into bin 9
    rows = [(0, 0), (99_999, 0), (100_000, 1), (950_000, 1), (1_000_000, 1)]
    df = spark.createDataFrame(rows, "score long, y long")
    got = {
        r["bin"]: (r["n"], r["positives"])
        for r in calibration_bins(df, "score", "y").collect()
    }
    assert got == {0: (2, 0), 1: (1, 1), 9: (2, 2)}


def test_calibration_uneven_bins_have_exact_edges(spark):
    """bins that do not divide scale: edges must be the exact
    equal-width boundaries (score·bins div scale), not the drifted
    score div (scale//bins) — e.g. scale=10, bins=3 puts score 9 in
    bin 2 (9·3 div 10), where the naive width=3 rule put it in bin 2
    only by the top-bin clamp absorbing scores 9 and 10 alike while
    score 3 landed in bin 1 instead of bin 0 (3·3 div 10 = 0)."""
    rows = [(0, 0), (3, 0), (4, 1), (6, 0), (7, 1), (9, 1), (10, 1)]
    df = spark.createDataFrame(rows, "score long, y long")
    got = {
        r["bin"]: r["n"]
        for r in calibration_bins(df, "score", "y", bins=3, scale=10)
        .collect()
    }
    # exact thirds of [0,10]: [0,10/3) -> {0,3}, [10/3,20/3) -> {4,6},
    # [20/3,10] -> {7,9,10 (clamped)}
    assert got == {0: 2, 1: 2, 2: 3}


def test_calibration_overflowing_scale_bins_raises(spark):
    df = spark.createDataFrame([(1, 1)], "score long, y long")
    with pytest.raises(ValueError, match="2\\^63"):
        calibration_bins(df, "score", "y", bins=1024, scale=2**60)


# --- Welch t-test vs pure-Python -----------------------------------------------


def _py_welch(a, b):
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = sum((x - ma) ** 2 for x in a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
    sea, seb = va / na, vb / nb
    t = (ma - mb) / math.sqrt(sea + seb)
    df = (sea + seb) ** 2 / (sea**2 / (na - 1) + seb**2 / (nb - 1))
    return t, df


def test_welch_matches_reference(spark):
    rng = random.Random(3)
    # values in cents so the 1e6 scaling is exact in both paths
    arm0 = [round(rng.uniform(1, 50), 2) for _ in range(80)]
    arm1 = [round(rng.uniform(5, 60), 2) for _ in range(70)]
    rows = [("g", 0, int(v * 100) * 10_000) for v in arm0] + [
        ("g", 1, int(v * 100) * 10_000) for v in arm1
    ]
    df = spark.createDataFrame(rows, "grp string, arm int, v_s long")
    row = welch_ttest(df, "grp", "arm", "v_s").collect()[0]
    exp_t, exp_df = _py_welch(
        [v / 1e6 for _, a, v in rows if a == 0],
        [v / 1e6 for _, a, v in rows if a == 1],
    )
    assert row["t_stat"] == pytest.approx(exp_t, abs=1e-5)
    assert row["welch_df"] == pytest.approx(exp_df, abs=1e-3)


def test_welch_degenerate_groups_yield_nulls_not_errors(spark):
    """Under Spark 4's default ANSI mode the unguarded divisions crashed
    the whole query with DIVIDE_BY_ZERO; every degenerate shape must
    degrade to NULLs instead (and DuckDB agrees: its /0 is NULL)."""
    rows = [
        ("zero_var", 0, 100), ("zero_var", 0, 100),   # both arms constant
        ("zero_var", 1, 100), ("zero_var", 1, 100),
        ("empty_arm", 0, 100), ("empty_arm", 0, 200),  # no arm-1 rows
    ]
    df = spark.createDataFrame(rows, "grp string, arm int, v_s long")
    got = {r["grp"]: r for r in welch_ttest(df, "grp", "arm", "v_s").collect()}
    zv = got["zero_var"]
    assert zv["t_stat"] is None and zv["welch_df"] is None
    assert zv["mean0"] == zv["mean1"] == pytest.approx(1e-4)
    ea = got["empty_arm"]
    assert ea["n1"] == 0 and ea["mean1"] is None
    assert ea["t_stat"] is None and ea["welch_df"] is None


def test_kappa_degenerate_is_null(spark):
    df = spark.createDataFrame([("x", "x"), ("x", "x")], "a string, b string")
    row = cohens_kappa(df, "a", "b").collect()[0]
    assert row["kappa"] is None and row["agree"] == 2


def test_auc_excludes_null_scores_and_labels(spark):
    rows = [(1, 1), (2, 0), (None, 1), (None, 0), (5, None)]
    df = spark.createDataFrame(rows, "score long, y long")
    row = roc_auc(df, "score", "y").collect()[0]
    assert (row["n"], row["npos"], row["nneg"]) == (2, 1, 1)


def test_welch_singleton_arm_is_null(spark):
    rows = [("g", 0, 100), ("g", 0, 200), ("g", 1, 300)]
    df = spark.createDataFrame(rows, "grp string, arm int, v_s long")
    row = welch_ttest(df, "grp", "arm", "v_s").collect()[0]
    assert row["t_stat"] is None and row["welch_df"] is None
    assert (row["n0"], row["n1"]) == (2, 1)


# --- plan shape: the scale-critical structure ---------------------------------


def test_auc_has_no_data_sized_global_window(spark):
    """The only UNPARTITIONED window in the AUC plan must be the bucket-
    offset prefix over the coarse-bucket totals (_bneg — score-domain-
    bounded rows), never one over the per-score/data frame. A logical
    Window node prints ``Window [exprs], [partition], [order]`` when
    partitioned and ``Window [exprs], [order]`` when global — the
    bracket-group count is the discriminator (asserted non-vacuous by
    construction: roc_auc always contains exactly one of each)."""
    df = spark.range(10_000).select(
        (F.col("id") % 1000).alias("score"), (F.col("id") % 2).alias("y")
    )
    plan = roc_auc(df, "score", "y")._jdf.queryExecution().optimizedPlan().toString()
    win_lines = [l for l in plan.splitlines() if "windowspecdefinition" in l]
    global_wins = [l for l in win_lines if l.count("], [") == 1]
    partitioned = [l for l in win_lines if l.count("], [") == 2]
    assert len(win_lines) == 2 and len(partitioned) == 1, win_lines
    assert len(global_wins) == 1, win_lines
    assert "_bneg" in global_wins[0], (
        f"global window over a non-bucket-total frame: {global_wins[0]}"
    )
    assert "_b#" in partitioned[0], partitioned[0]


def test_welch_is_single_aggregation(spark):
    df = spark.createDataFrame(
        [("g", 0, 10), ("g", 1, 20)], "grp string, arm int, v_s long"
    )
    plan = (
        welch_ttest(df, "grp", "arm", "v_s")
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan.lower().count("aggregate") == 1, plan


# --- nDCG@k: pure-Python reference -------------------------------------------


def test_ndcg_matches_python_reference(spark):
    import math

    from osm_pbf_parquet_spark.operators.evaluation import ndcg_at_k

    random.seed(7)
    rows = []
    for q in ["q1", "q2", "q3"]:
        for item in range(1, 30):
            rows.append((q, item, random.randint(0, 50), random.randint(0, 5)))
    # q4: all-zero relevance → NULL ndcg
    rows += [("q4", i, i, 0) for i in range(1, 5)]
    df = spark.createDataFrame(rows, ["q", "item", "score", "rel"])
    got = {
        r.q: (r.dcg_scaled, r.idcg_scaled, r.ndcg_permille)
        for r in ndcg_at_k(df, "q", "item", "score", "rel", k=10).collect()
    }

    scale = 2**40
    disc = [round(scale / math.log2(p + 1)) for p in range(1, 11)]
    by_q = {}
    for q, item, score, rel in rows:
        by_q.setdefault(q, []).append((item, score, rel))
    for q, cand in by_q.items():
        sys_rank = sorted(cand, key=lambda t: (-t[1], t[0]))[:10]
        ideal = sorted(cand, key=lambda t: (-t[2], t[0]))[:10]
        dcg = sum(rel * disc[p] for p, (_, _, rel) in enumerate(sys_rank))
        idcg = sum(rel * disc[p] for p, (_, _, rel) in enumerate(ideal))
        nd = (1000 * dcg) // idcg if idcg > 0 else None
        assert got[q] == (dcg, idcg, nd), q
