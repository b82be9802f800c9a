"""Property tests for the exact-arithmetic operator claims: the
distributed plans (bucket-pruned selection, two-level prefix AUC,
linearized EWMA) must agree with trivially-correct sequential Python
references on arbitrary inputs — duplicates, negatives, constant
columns, single-class corpora, series shorter than the window — the
shapes where off-by-one rank math and recursion linearization break
first."""

from __future__ import annotations

import pytest

from hypothesis import given, settings, strategies as st

from osm_pbf_parquet_spark.operators.evaluation import roc_auc
from osm_pbf_parquet_spark.operators.ordered import ewma_smooth
from osm_pbf_parquet_spark.operators.sketches import exact_quantiles

QS = [(0, 1), (1, 4), (1, 2), (3, 4), (1, 1)]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.integers(-1000, 1000), min_size=1, max_size=30
    )
)
@pytest.mark.slow  # r13 driver tier: operator keeps oracle-parity coverage; full tier runs this each round
def test_exact_quantiles_match_sorted_selection(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v long")
    out = {
        (r["q_num"], r["q_den"]): r
        for r in exact_quantiles(df, "v", QS, bins=8).collect()
    }
    s = sorted(values)
    n = len(s)
    for qn, qd in QS:
        k = (n - 1) * qn // qd + 1  # 1-based exact target rank
        r = out[(qn, qd)]
        assert r["n"] == n
        assert r["target_rank"] == k
        assert r["value"] == s[k - 1], (qn, qd, s)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 1)),
        min_size=1,
        max_size=25,
    )
)
def test_roc_auc_matches_pair_counting(spark, rows):
    df = spark.createDataFrame(rows, "score long, label int")
    r = roc_auc(df, "score", "label").collect()[0]
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    assert r["n"] == len(rows)
    assert r["npos"] == len(pos) and r["nneg"] == len(neg)
    if not pos or not neg:
        assert r["auc"] is None  # degenerate corpus: NULL, never NaN
        return
    c2t = sum(
        2 if p > q else (1 if p == q else 0) for p in pos for q in neg
    )
    want = c2t / (2.0 * len(pos) * len(neg))
    # the operator rounds to 9dp; small-int ratios sit far from the
    # 10th-digit rounding boundary, so this is an exactness check
    assert abs(r["auc"] - want) < 1e-9, (r["auc"], want)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(-500, 500)),
        min_size=1,
        max_size=30,
    )
)
def test_ewma_linearization_equals_recursion(spark, rows):
    W = 4
    data = [(k, i, x) for i, (k, x) in enumerate(rows)]
    df = spark.createDataFrame(data, "k string, t long, x long")
    out = {
        r["k"]: r for r in ewma_smooth(df, "k", ["t"], "x", W).collect()
    }
    series: dict[str, list[int]] = {}
    for k, _, x in sorted(data, key=lambda r: r[1]):
        series.setdefault(k, []).append(x)
    for k, xs in series.items():
        tail = xs[-W:]
        n_used = len(tail)
        # the recursion S_1 = x_1, S_i = (x_i + S_{i-1})/2 scaled to
        # integers: U_n = S_n·2^n = 2·x_1 + Σ_{i=2..n} 2^(i-1)·x_i
        u = 2 * tail[0] + sum(
            (2 ** (i - 1)) * tail[i - 1] for i in range(2, n_used + 1)
        )
        r = out[k]
        assert r["n_used"] == n_used
        assert r["ewma_u"] == u, (k, tail)
        assert abs(r["ewma"] - u / (2.0**n_used)) < 1e-12
