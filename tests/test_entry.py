"""Driver-contract conformance: entry() runs, every queries() entry runs at
sf0.001, every oracle key exists in queries()."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_each_query_runs(spark, name):
    df = entrymod.queries()[name](spark, SF)
    assert df.count() >= 0


def test_check_first_names_all_resolve():
    """A typo in _CHECK_FIRST silently loses the front-loading (the
    ordering comprehension skips unknown names) — so pin that every
    listed name exists in the registry, and that the gate-relevant
    head has no duplicates."""
    import __spark_entry__ as e

    reg = set(e.queries())
    missing = [n for n in e._CHECK_FIRST if n not in reg]
    assert not missing, f"_CHECK_FIRST names not in registry: {missing}"
    assert len(e._CHECK_FIRST) == len(set(e._CHECK_FIRST)), "duplicates"


def test_r7_rotation_inside_driver_cap():
    """The correctness driver checks the first 50 entries. r7's
    must-cover set: the never-checked r7 gate, the r6 verdict's 12
    named displacements (ask #1), and every query tainted by an r7
    module/plan edit that was not explicitly displaced (the 12
    displacements and their rationale live in __spark_entry__'s
    rotation comment)."""
    import __spark_entry__ as e

    head = list(e.queries())[:50]
    assert len(head) == 50
    must = (
        # never driver-checked (r7-new)
        "stream_incremental_dedup",
        "dsir_importance", "temperature_mixture", "split_leakage",
        # the r6 verdict's 12 named displacements — all must retire
        "negative_sampling", "embedding_outliers", "unigram_logprob",
        "text_entropy", "ann_lsh_pairs", "ann_ivf_topk",
        "cms_heavy_hitters", "text_stats", "text_lang_id", "dataset_diff",
        "tokenize_corpus", "text_quality",
        # r7 ADVICE-fix certifications
        "chi_square_assoc", "bm25_topk", "calibration_curve",
        # banded-Hamming fold (dedup.py + phash.py)
        "dedup_simhash", "image_dhash", "image_near_dup_pairs",
        "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
        "dedup_components", "duplicate_spans", "decontaminate",
        "incremental_dedup",
        # quadratic guards (itemsets.py / fuzzy.py)
        "frequent_itemsets", "cooccurrence_topk", "kcore_parts",
        "fuzzy_name_match",
        # text.py-routed module taint
        "hybrid_rrf_search", "kappa_lang_agreement",
        "stream_quality_by_lang", "clean_corpus_pipeline",
        "text_fingerprint", "pii_scrub", "text_repetition",
        "full_curation_pipeline", "tfidf_top_terms", "line_corpus_dedup",
        "vocab_build", "token_drift_js",
        # quality.py / quality_queries.py-routed module taint
        # (shortest_hops/triangle_count/autocorr_lags displaced to the
        # r8 head list by the three r7-new selection gates — weakest
        # taint class, see the rotation comment)
        "profile_table", "dq_checks", "mad_outliers",
        "group_regression", "stream_dq_monitor",
    )
    for name in must:
        assert name in head, name
    # exactly the cap: nothing above pushed a must-cover entry out
    assert len(must) == 50
