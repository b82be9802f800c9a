"""Property tests for the selection suite: the Spark plans must agree
with INDEPENDENT pure-Python reference implementations on arbitrary
small corpora — a third implementation alongside Spark and the DuckDB
oracles, reaching shapes the fixed test tables never do (single-doc
languages, all-duplicate clusters, unscored docs, empty texts).

Float-seam policy: ln/pow may differ by 1 ulp between the JVM and
libm, and the operators floor-scale those values to fixed point — so
weight comparisons allow ±1 fixed-point unit per contributing term,
while every integer-exact surface (bucket counts, normalization sums,
keeper choice, tertile membership) is compared exactly.
"""

from __future__ import annotations

import pytest

import hashlib
import math
import re

from hypothesis import given, settings, strategies as st

from osm_pbf_parquet_spark.operators import selection
from osm_pbf_parquet_spark.operators.text import TOKEN_REGEX

WORDS = ["alpha", "beta", "gamma", "delta", "x", "y", "42", "the"]

# a document: 0-8 words; a corpus: 1-12 (doc_id, text, lang) rows
doc_texts = st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(
    " ".join
)
corpora = st.lists(
    st.tuples(doc_texts, st.sampled_from(["en", "fr"])),
    min_size=1,
    max_size=12,
)


def _hash_mod(term: str, buckets: int) -> int:
    """Pure-Python replica of sampling.hash_mod_expr: top-60-bit md5."""
    return int(hashlib.md5(term.encode()).hexdigest()[:15], 16) % buckets


def _tokens(text: str) -> list[str]:
    return re.findall(TOKEN_REGEX, text)


@settings(max_examples=10, deadline=None)
@given(corpora)
@pytest.mark.slow  # r13 driver tier: operator keeps oracle-parity coverage; full tier runs this each round
def test_dsir_matches_pure_python_reference(spark, corpus):
    rows = [(i + 1, text, lang) for i, (text, lang) in enumerate(corpus)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    b = selection.DSIR_BUCKETS
    out = {
        r["doc_id"]: r["dsir_nano"]
        for r in selection.dsir_importance(df, "lang = 'en'").collect()
    }

    # independent reference
    dbc: dict[tuple[int, int], int] = {}
    is_t: dict[int, bool] = {}
    for doc_id, text, lang in rows:
        is_t[doc_id] = lang == "en"
        for t in _tokens(text):
            k = (doc_id, _hash_mod(t, b))
            dbc[k] = dbc.get(k, 0) + 1
    raw_ct: dict[int, int] = {}
    tgt_ct: dict[int, int] = {}
    for (doc_id, bucket), c in dbc.items():
        raw_ct[bucket] = raw_ct.get(bucket, 0) + c
        if is_t[doc_id]:
            tgt_ct[bucket] = tgt_ct.get(bucket, 0) + c
    traw = sum(raw_ct.values())
    ttgt = sum(tgt_ct.values())
    lam = {
        bucket: math.floor(
            math.log(
                (float(tgt_ct.get(bucket, 0) + 1) * float(traw + b))
                / (float(raw_ct[bucket] + 1) * float(ttgt + b))
            )
            * float(selection.DSIR_SCALE)
        )
        for bucket in raw_ct
    }
    expected = {}
    for (doc_id, bucket), c in dbc.items():
        expected[doc_id] = expected.get(doc_id, 0) + c * lam[bucket]

    assert set(out) == set(expected)  # tokenless docs absent BOTH sides
    for doc_id, want in expected.items():
        # ±1 nanonat per token: JVM ln vs libm ln may differ in the
        # last ulp, flipping a floor boundary once per bucket at most
        n_tokens = sum(c for (d, _), c in dbc.items() if d == doc_id)
        assert abs(out[doc_id] - want) <= n_tokens, (doc_id, out[doc_id], want)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["en", "fr", "de", "zh"]), st.integers(1, 50)),
        min_size=1,
        max_size=4,
        unique_by=lambda t: t[0],
    )
)
def test_temperature_matches_pure_python_reference(spark, groups):
    rows = []
    i = 0
    for lang, n in groups:
        for _ in range(n):
            i += 1
            rows.append((i, lang))
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = {
        r["lang"]: r
        for r in selection.temperature_weights(df, "lang", 0.3).collect()
    }

    total = sum(n for _, n in groups)
    mass = {
        lang: math.floor(
            math.pow(float(n) / float(total), 0.3)
            * float(selection.TEMP_SCALE)
        )
        for lang, n in groups
    }
    mtot = sum(mass.values())
    for lang, n in groups:
        r = out[lang]
        assert r["n_docs"] == n
        want_ppm = mass[lang] * 1_000_000 // mtot
        # pow's last ulp can move one mass unit, shifting ppm by ≤1
        assert abs(r["w_ppm"] - want_ppm) <= 1, (lang, r["w_ppm"], want_ppm)
        assert r["expected_docs"] == r["w_ppm"] * total // 1_000_000
    # exact normalization invariant regardless of float seams
    total_ppm = sum(r["w_ppm"] for r in out.values())
    assert 1_000_000 - len(groups) <= total_ppm <= 1_000_000


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 20),  # doc id
            st.integers(1, 4),  # cluster id
            st.one_of(st.none(), st.integers(0, 10000)),  # quality e-4
        ),
        min_size=1,
        max_size=15,
        unique_by=lambda t: t[0],
    )
)
def test_resolve_matches_pure_python_reference(spark, members):
    comp_rows = []
    qual_rows = []
    sizes: dict[int, int] = {}
    for _, cid, _ in members:
        sizes[cid] = sizes.get(cid, 0) + 1
    for doc_id, cid, q in members:
        comp_rows.append((doc_id, cid, sizes[cid]))
        if q is not None:
            qual_rows.append((doc_id, q / 10000.0))
    comp = spark.createDataFrame(
        comp_rows, ["doc_id", "canonical_id", "component_size"]
    )
    quality = spark.createDataFrame(
        qual_rows or [(None, None)],
        "doc_id long, quality double",
    )
    out = {
        r["doc_id"]: r
        for r in selection.resolve_duplicates(comp, quality).collect()
    }

    assert set(out) == {doc_id for doc_id, _, _ in members}
    q_by_doc = {doc_id: q for doc_id, _, q in members}
    by_cluster: dict[int, list[int]] = {}
    for doc_id, cid, _ in members:
        by_cluster.setdefault(cid, []).append(doc_id)
    for cid, docs in by_cluster.items():
        # keeper: highest quality, NULLs last, ties to smallest id —
        # pure integer/None comparisons, so the match is EXACT
        want_keeper = min(
            docs,
            key=lambda d: (
                q_by_doc[d] is None,
                -(q_by_doc[d] or 0),
                d,
            ),
        )
        for d in docs:
            assert out[d]["kept_id"] == want_keeper, (cid, d)
            assert out[d]["keep"] == (d == want_keeper)


@settings(max_examples=8, deadline=None)
@given(corpora)
@pytest.mark.slow  # r13 driver tier: operator keeps oracle-parity coverage; full tier runs this each round
def test_ccnet_bucket_invariants_hold_on_arbitrary_corpora(spark, corpus):
    rows = [(i + 1, text, lang) for i, (text, lang) in enumerate(corpus)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = selection.perplexity_buckets(df).collect()
    assert len(out) == len(rows)  # every doc bucketed, even tokenless
    per_lang: dict[str, list] = {}
    for r in out:
        per_lang.setdefault(r["lang"], []).append(r)
    for lang, members in per_lang.items():
        # tertile edges are over SCORED docs; NULL-scored (tokenless)
        # docs are unconditionally junk → 'tail'
        n = sum(1 for r in members if r["avg_neg_logprob"] is not None)
        counts = {"head": 0, "middle": 0, "tail": 0}
        for r in members:
            counts[r["ppl_bucket"]] += 1
        assert counts["head"] == n // 3, lang
        assert counts["middle"] == (2 * n) // 3 - n // 3, lang
        assert counts["tail"] == len(members) - (2 * n) // 3, lang
        for r in members:
            if r["avg_neg_logprob"] is None:
                assert r["ppl_bucket"] == "tail"


# --- r8: weighted reservoir sample (A-ES / Gumbel top-k) ------------------------

# corpora of (string-able key, log-weight nanonats); weights span sign
# and magnitude so jitter can and cannot dominate
reservoir_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=500),
        st.integers(min_value=-(10**12), max_value=10**12),
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


def _aes_reference(rows, k, salt="aes-v1"):
    """Sequential Efraimidis-Spirakis reference: rank by exp-jittered
    key e/w ascending, expressed in the identical Gumbel log-domain
    fixed-point the operator uses."""
    B = selection._RESERVOIR_HASH_BUCKETS
    den = selection._RESERVOIR_HASH_DEN
    scored = []
    for key, log_w in rows:
        h = (
            int(hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:15], 16)
            % B
        )
        u = (h + 1) / den
        jit = math.floor(-math.log(-math.log(u)) * selection.RESERVOIR_SCALE)
        scored.append((key, log_w, log_w + jit))
    scored.sort(key=lambda t: (-t[2], t[0]))
    return scored[:k]


@settings(max_examples=25, deadline=None)
@given(reservoir_rows, st.integers(min_value=1, max_value=10))
@pytest.mark.slow  # r13 driver tier: operator keeps oracle-parity coverage; full tier runs this each round
def test_reservoir_matches_sequential_aes_reference(spark, rows, k):
    df = spark.createDataFrame(rows, ["doc_id", "dsir_nano"])
    got = [
        (r["doc_id"], r["dsir_nano"], r["score_nano"])
        for r in selection.weighted_reservoir_sample(df, k=k).collect()
    ]
    want = _aes_reference(rows, k)
    assert sorted(got) == sorted(want)


def test_reservoir_inclusion_tracks_weight(spark):
    """Statistical sanity on the sampler itself (not just the plan): a
    doc with overwhelming log-weight is always drawn; among equal
    weights the draw is the deterministic jitter top-k."""
    rows = [(i, 0) for i in range(50)] + [(999, 10**14)]
    df = spark.createDataFrame(rows, ["doc_id", "dsir_nano"])
    got = {
        r["doc_id"]
        for r in selection.weighted_reservoir_sample(df, k=5).collect()
    }
    assert 999 in got
    want_rest = {k for k, _, _ in _aes_reference([r for r in rows if r[0] != 999], 4)}
    assert got - {999} == want_rest


@settings(max_examples=15, deadline=None)
@given(reservoir_rows, st.integers(min_value=1, max_value=5))
def test_group_reservoir_matches_per_group_reference(spark, rows, k):
    """Per-group A-ES == the sequential reference applied independently
    within each group (groups assigned deterministically from the key)."""
    grouped = [(key, lw, ["en", "fr", "de"][key % 3]) for key, lw in rows]
    df = spark.createDataFrame(grouped, ["doc_id", "dsir_nano", "lang"])
    got = sorted(
        (r["doc_id"], r["dsir_nano"], r["lang"], r["score_nano"],
         r["rank_in_group"])
        for r in selection.weighted_reservoir_sample_per_group(
            df, k=k, group_col="lang"
        ).collect()
    )
    want = []
    for lang in ("en", "fr", "de"):
        members = [(key, lw) for key, lw, g in grouped if g == lang]
        for rank, (key, lw, score) in enumerate(
            _aes_reference(members, k), start=1
        ):
            want.append((key, lw, lang, score, rank))
    assert got == sorted(want)
