"""Fixed-point log2 + Kneser-Ney scoring: the no-libm LM stack.

The value-hash gates forbid libm drift between engines; these tests pin
(a) the three ilog2_fp implementations (Python / Spark SQL / DuckDB
recursive CTE) bit-identical on adversarial inputs, (b) monotonicity
and log2 closeness of the shared algorithm, and (c) the KN operator
against an independent pure-Python fraction-exact reference.
"""

from __future__ import annotations

import math
import re
from fractions import Fraction

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_pbf_parquet_spark.functions.fixedpoint import (
    ILOG2_F,
    ilog2_fp_duck_ctes,
    ilog2_fp_py,
    ilog2_fp_sql,
)
from osm_pbf_parquet_spark.operators.text import (
    KN_DISC_DEN,
    KN_DISC_NUM,
    TOKEN_REGEX,
    kneser_ney_bigram_score,
)

EDGE = [1, 2, 3, 4, 7, 8, 15, 16, 65535, 65536, 65537, 131071, 131072,
        (1 << 62) - 1, 1 << 62, (1 << 63) - 1]


def test_ilog2_py_matches_log2():
    for x in EDGE + [10**k for k in range(1, 19)]:
        fp = ilog2_fp_py(x)
        assert abs(fp / 2**ILOG2_F - math.log2(x)) < 1e-4, x


def test_ilog2_py_monotone():
    vals = sorted(EDGE + [v + 1 for v in EDGE if v < (1 << 63) - 1])
    fps = [ilog2_fp_py(v) for v in vals]
    assert fps == sorted(fps)


@given(st.integers(min_value=1, max_value=(1 << 63) - 1))
@settings(max_examples=200, deadline=None)
def test_ilog2_py_bounds(x):
    fp = ilog2_fp_py(x)
    # truncation only ever loses fraction bits → fp/2^F ≤ log2(x),
    # and the per-step loss is bounded
    assert fp / 2**ILOG2_F <= math.log2(x) + 1e-12
    assert fp / 2**ILOG2_F > math.log2(x) - 1e-4


def test_ilog2_spark_matches_py(spark):
    df = spark.createDataFrame([(v,) for v in EDGE], "x bigint")
    rows = df.selectExpr("x", f"{ilog2_fp_sql('x')} AS fp").collect()
    for r in rows:
        assert r.fp == ilog2_fp_py(r.x), r.x


def test_ilog2_duck_matches_py():
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x BIGINT)")
    for v in EDGE:
        con.execute("INSERT INTO t VALUES (?)", [v])
    sql = ("WITH RECURSIVE "
           + ilog2_fp_duck_ctes("lg", "t", ["x"], {"fp": "x"})
           + " SELECT x, fp FROM lg")
    for x, fp in con.execute(sql).fetchall():
        assert fp == ilog2_fp_py(x), x
    con.close()


# --- Kneser-Ney reference ------------------------------------------------------


def _kn_reference(texts: dict[int, str]) -> dict[int, tuple]:
    """Independent sequential KN implementation: exact Fractions for the
    probability, ilog2_fp_py for the cost — mirrors the published
    formula, not the Spark plan."""
    docs = {k: re.findall("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]", t)
            for k, t in texts.items()}
    from collections import Counter
    c12: Counter = Counter()
    doc_bg: dict[int, list] = {}
    for k, ws in docs.items():
        bgs = list(zip(ws, ws[1:]))
        doc_bg[k] = bgs
        c12.update(bgs)
    c1: Counter = Counter()
    n1fw: Counter = Counter()
    n1bw: Counter = Counter()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        n1fw[w1] += 1
        n1bw[w2] += 1
    n1pp = len(c12)
    out = {}
    for k, bgs in doc_bg.items():
        total = 0
        for w1, w2 in bgs:
            p = (Fraction(max(c12[(w1, w2)] * KN_DISC_DEN - KN_DISC_NUM, 0),
                          KN_DISC_DEN * c1[w1])
                 + Fraction(KN_DISC_NUM * n1fw[w1] * n1bw[w2],
                            KN_DISC_DEN * c1[w1] * n1pp))
            assert 0 < p <= 1
            num = (max(KN_DISC_DEN * c12[(w1, w2)] - KN_DISC_NUM, 0) * n1pp
                   + KN_DISC_NUM * n1fw[w1] * n1bw[w2])
            den = KN_DISC_DEN * c1[w1] * n1pp
            assert Fraction(num, den) == p
            total += ilog2_fp_py(den) - ilog2_fp_py(num)
        n = len(bgs)
        out[k] = (n, total,
                  (total * 1000) // (n * 65536) if n else None)
    return out


def test_kneser_ney_matches_reference(spark):
    texts = {
        0: "the cat sat on the mat",
        1: "the cat sat",
        2: "a dog. A dog! the dog",
        3: "xyz",          # 1 token → 0 bigrams → NULL score
        4: "",              # empty
        5: "the the the the",
        6: "cat dog cat dog cat",
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_bigrams, r.total_cost_fp, r.bits_per_bigram_milli)
           for r in kneser_ney_bigram_score(df).collect()}
    ref = _kn_reference(texts)
    for k in texts:
        n, tot, bits = ref[k]
        assert got[k] == (n, tot, bits), (k, got[k], ref[k])


def test_kneser_ney_probabilities_sum_to_one():
    """Interpolated KN is a proper conditional distribution: for each
    context w1, Σ_w2∈V p(w2|w1) = 1 when the continuation set is the
    full bigram-completion vocabulary — sanity of the rational form."""
    texts = {0: "a b a c b a", 1: "c a b b a"}
    docs = {k: t.split() for k, t in texts.items()}
    from collections import Counter
    c12: Counter = Counter()
    for ws in docs.values():
        c12.update(zip(ws, ws[1:]))
    c1, n1fw, n1bw = Counter(), Counter(), Counter()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        n1fw[w1] += 1
        n1bw[w2] += 1
    n1pp = len(c12)
    vocab = sorted(n1bw)  # words that ever complete a bigram
    z = sum(Fraction(n1bw[w], n1pp) for w in vocab)
    assert z == 1
    for w1 in sorted(c1):
        s = sum(
            Fraction(max(c12[(w1, w2)] * KN_DISC_DEN - KN_DISC_NUM, 0),
                     KN_DISC_DEN * c1[w1])
            + Fraction(KN_DISC_NUM * n1fw[w1] * n1bw[w2],
                       KN_DISC_DEN * c1[w1] * n1pp)
            for w2 in vocab
        )
        assert s == 1, (w1, s)


def test_prescale_shift_law():
    """prescale_bits is sound because ilog2_fp(x >> s) ≈ ilog2_fp(x) −
    s·2^F with error bounded by the mantissa truncation — tight for the
    LARGE values prescale exists for (overflow-adjacent counts), where
    the relative loss of dropping s low bits is negligible."""
    for x in [10**12, (1 << 61) + 12345, 987654321987654321]:
        for s in [1, 4, 10]:
            got = ilog2_fp_py(x >> s)
            assert abs(got - (ilog2_fp_py(x) - s * 65536)) <= 2, (x, s)


def test_kneser_ney_prescale_consistent(spark):
    """prescale_bits must keep the plan runnable and the bigram counts
    identical; on tiny counts the defined truncation moves costs (num~4
    >> 2 loses real mass), so only the structural outputs are pinned."""
    df = spark.createDataFrame([(0, "a b c a b")], "doc_id long, text string")
    a = kneser_ney_bigram_score(df, prescale_bits=0).collect()[0]
    b = kneser_ney_bigram_score(df, prescale_bits=2).collect()[0]
    assert a.n_bigrams == b.n_bigrams == 4
    assert a.total_cost_fp > 0 and b.total_cost_fp > 0
