"""prefix_jaccard_join (exact AllPairs/PPJoin set-similarity join):
the semantic separation from ngram_jaccard_dedup's max_df contract, a
plan audit, and a pure-Python property pinning the prefix-filter
completeness claim (lossless candidates) on arbitrary set corpora —
the lemma the gate's exactness rests on, checked beyond the fixed
corpus (adversarial shapes: identical sets, subset chains, sets whose
every element is corpus-common)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from osm_pbf_parquet_spark.operators import dedup

SF_DIR = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# --- the semantic point: no max_df recall trade ----------------------------------


def test_finds_pairs_whose_shared_grams_are_all_common(spark):
    """55 identical docs: every gram's document frequency (55) exceeds
    ngram_jaccard_dedup's max_df=50, so the posting-list pruning drops
    ALL of them from the candidate index — zero pairs, its documented
    contract. The prefix filter has no such trade: all C(55,2) pairs at
    jaccard 1.0."""
    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(55)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert dedup.ngram_jaccard_dedup(df, threshold=0.8).count() == 0
    out = dedup.prefix_jaccard_join(df, threshold=0.8).collect()
    assert len(out) == 55 * 54 // 2
    assert all(r["jaccard"] == 1.0 for r in out)


def test_matches_brute_force_on_mixed_corpus(spark):
    """Small mixed corpus: result equals per-pair brute force (exact
    set jaccard over the SAME md5-mod-p gram hashes both engines use),
    including a just-below-threshold pair staying out."""
    texts = {
        1: "a b c d e f g h i j",
        2: "a b c d e f g h i j",          # dup of 1
        3: "a b c d e f g h i x",          # high-but-partial overlap w/ 1
        4: "q r s t u v w x y z",          # unrelated
        5: "a b",                           # short doc (whole-text gram)
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.prefix_jaccard_join(df, threshold=0.8).collect()
    }
    grams = {
        d: set(_py_grams(t, 3)) for d, t in texts.items()
    }
    want = {}
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            j = len(grams[a] & grams[b]) / len(grams[a] | grams[b])
            if round(j, 4) >= 0.8:
                want[(a, b)] = round(j, 4)
    assert got == want and (1, 2) in got and (1, 3) not in got


def _py_grams(text: str, k: int) -> list[str]:
    ws = text.split(" ")
    if len(ws) < k:
        return [text]
    return [" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)]


# --- plan audit -------------------------------------------------------------------


def test_plan_no_cartesian(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(dedup.prefix_jaccard_join(df, threshold=0.8))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # every stage stays keyed (gh / doc key) — no global bottleneck
    assert "Exchange SinglePartition" not in plan


# --- prefix-filter completeness property -------------------------------------------
#
# Pure-Python replica of the implementation's candidate generation —
# SAME global order (df asc, element asc), SAME ppm prefix-length
# arithmetic (tnum = round(t*1e6) - 100; plen = s - ceil(tnum*s/1e6) + 1),
# SAME length filter (min·1e6 ≥ tnum·max) and positional filter
# (any prefix-match row with 1 + min(sa-ia, sb-ib) ≥ α where
# α = ceil(tnum·(sa+sb)/(1e6+tnum))) — checked against brute force:
# every pair the round(·,4) verifier accepts MUST survive all three
# filters. This is the losslessness claim; precision is free
# (verification rejects false candidates).


def _prefix_candidates(sets: dict[int, frozenset], t: float) -> set:
    df_ct: dict[int, int] = {}
    for s in sets.values():
        for e in s:
            df_ct[e] = df_ct.get(e, 0) + 1
    tnum = int(round(t * 1_000_000)) - 100
    pos = {}
    for k, s in sets.items():
        n = len(s)
        plen = n - (tnum * n + 999_999) // 1_000_000 + 1
        ordered = sorted(s, key=lambda e: (df_ct[e], e))
        pos[k] = {e: i + 1 for i, e in enumerate(ordered[:plen])}
    out = set()
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = len(sets[a]), len(sets[b])
            if min(sa, sb) * 1_000_000 < tnum * max(sa, sb):
                continue
            alpha = (tnum * (sa + sb) + (1_000_000 + tnum) - 1) // (
                1_000_000 + tnum
            )
            if any(
                1 + min(sa - pos[a][g], sb - pos[b][g]) >= alpha
                for g in pos[a].keys() & pos[b].keys()
            ):
                out.add((a, b))
    return out


@settings(max_examples=300, deadline=None)
@given(st.data())
def test_prefix_filter_is_lossless(data):
    t = data.draw(
        st.sampled_from([0.05, 0.3, 0.5, 0.7, 0.8, 0.9, 0.95, 1.0])
    )
    corpus = data.draw(
        st.lists(
            st.frozensets(st.integers(0, 30), min_size=1, max_size=12),
            min_size=2,
            max_size=10,
        )
    )
    sets = {i + 1: s for i, s in enumerate(corpus)}
    cands = _prefix_candidates(sets, t)
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
            if round(j, 4) >= t:
                assert (a, b) in cands, (
                    f"qualifying pair missed by the prefix filter: "
                    f"{sets[a]} vs {sets[b]} (J={j}, t={t})"
                )


def test_prefix_length_never_below_one():
    """s - ceil(t_eff*s) + 1 >= 1 for every s >= 1 and t <= 1.0 — the
    slice must always expose at least one join key, or identical docs
    would silently vanish."""
    for t in (0.05, 0.5, 0.8, 0.9999, 1.0):
        tnum = int(round(t * 1_000_000)) - 100
        for s in range(1, 200):
            plen = s - (tnum * s + 999_999) // 1_000_000 + 1
            assert 1 <= plen <= s, (t, s, plen)


def test_intra_doc_modp_collision_does_not_prune(spark):
    """'bbin' and 'foeb' have different md5-h60s but the SAME mod-p gram
    hash (222434810) — the per-doc h60 dedup keeps both, so without the
    set-level array_distinct doc 2's size reads 6 instead of 5 and the
    length filter prunes this EXACTLY-at-threshold pair (4/5 = 0.8,
    min·10⁶ = 4.0e6 < tnum·6 = 4.7994e6). The verifier is set-semantic
    either way; only the filter sizes were exposed. k=1 makes each word
    one gram."""
    rows = [
        (1, "bbin alpha beta gamma"),
        (2, "bbin foeb alpha beta gamma delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.prefix_jaccard_join(df, threshold=0.8, k=1).collect()
    assert [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in out] == [
        (1, 2, 0.8)
    ]
