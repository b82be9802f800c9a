"""Selection suite (r7): oracle parity, semantic units, and physical-plan
audits for DSIR importance weights, temperature mixture weights, and the
split-leakage audit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_pbf_parquet_spark.operators import selection
from osm_pbf_parquet_spark.plans.selection_queries import SELECTION_QUERIES

from oracle_harness import run_compare

SF_DIR = "/root/testdata/sf0.01"
SF_SMALL = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.mark.parametrize("name", sorted(SELECTION_QUERIES))
def test_selection_oracle_parity(spark, name):
    fn, oracle = SELECTION_QUERIES[name]
    run_compare(spark, SF_DIR, name, fn, oracle)


# --- DSIR ----------------------------------------------------------------------


def test_dsir_target_docs_score_higher(spark):
    """The point of the weight: documents drawn from the target
    distribution must average a higher log-likelihood ratio than the
    rest of the raw corpus."""
    docs = _docs(spark, SF_DIR)
    w = selection.dsir_importance(docs, "lang = 'en'")
    joined = w.join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r["is_en"]: r["m"]
        for r in joined.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("dsir_nano").alias("m"))
        .collect()
    }
    # the separation, not the sign, is the invariant: with Laplace
    # smoothing over 128 buckets and shared vocabulary across languages
    # even target docs can score negative in absolute nanonats
    assert means[True] > means[False]


def test_dsir_empty_text_docs_absent(spark):
    """A document with no tokens has no bag — it gets no row (both
    engines drop it at the explode/unnest), never a spurious 0."""
    rows = [(1, "alpha beta gamma"), (2, ""), (3, "alpha alpha")]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "lang", F.when(F.col("doc_id") == 1, "en").otherwise("fr")
    )
    out = selection.dsir_importance(df, "lang = 'en'")
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {1, 3}


def test_dsir_arrow_sql_impl_parity(spark):
    """The r12 vectorized bucket-count kernel must reproduce the SQL
    tokenize→md5-bucket→groupBy chain EXACTLY — corpus plus the edge
    shapes (empty text, whitespace-only, single char, non-ASCII
    multibyte, repeated tokens, digit runs) where tokenizer or UTF-8
    hashing drift would show first."""
    edge = spark.createDataFrame(
        [(900001, "", "en"), (900002, "   ", "de"), (900003, "a", "en"),
         (900004, "héllo wörld héllo !!", "fr"),
         (900005, "7 77 777 xx7x", "en"),
         (900006, "tab\tand\nnewline stay one-token?", "de")],
        "doc_id long, text string, lang string",
    )
    base = _docs(spark, SF_SMALL).select("doc_id", "text", "lang").unionByName(edge)
    arrow = {
        (r["doc_id"], r["dsir_nano"])
        for r in selection.dsir_importance(base, "lang = 'en'", impl="arrow").collect()
    }
    sql = {
        (r["doc_id"], r["dsir_nano"])
        for r in selection.dsir_importance(base, "lang = 'en'", impl="sql").collect()
    }
    assert arrow == sql


def test_dsir_arrow_plan_no_corpus_groupby_single_kernel_eval(spark):
    """The kernel path's plan: exactly ONE ArrowEvalPython (no optimizer
    duplication past the explode) and no corpus-wide exchange feeding
    the persisted counts frame — the per-doc counts are finished inside
    the kernel."""
    import re

    df = SELECTION_QUERIES["dsir_importance"][0](spark, SF_SMALL)
    plan = _plan(df)
    # the cached counts frame is referenced three times and the formatted
    # output reprints the cached subtree per reference — count DISTINCT
    # node ids, not textual occurrences
    ids = set(re.findall(r"ArrowEvalPython \((\d+)\)", plan))
    ids |= set(re.findall(r"\((\d+)\) ArrowEvalPython", plan))
    assert len(ids) == 1, plan


def test_dsir_plan_one_corpus_shuffle_no_cartesian(spark):
    df = SELECTION_QUERIES["dsir_importance"][0](spark, SF_SMALL)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    # the 1-row totals attach is the only nested-loop node; the lambda
    # attach must be a broadcast HASH join on the bucket key
    assert plan.count("BroadcastNestedLoopJoin (") <= 1
    assert "BroadcastHashJoin" in plan


# --- temperature mixture ---------------------------------------------------------


def test_temperature_weights_normalize_and_upsample_tail(spark):
    docs = _docs(spark, SF_DIR)
    out = {
        r["lang"]: r
        for r in selection.temperature_weights(docs, "lang", 0.3).collect()
    }
    total_ppm = sum(r["w_ppm"] for r in out.values())
    # floor-division loses < 1 ppm per group, never overshoots
    assert 1_000_000 - len(out) <= total_ppm <= 1_000_000
    n = {k: r["n_docs"] for k, r in out.items()}
    total = sum(n.values())
    smallest = min(n, key=n.get)
    biggest = max(n, key=n.get)
    # alpha < 1 moves mass from the head to the tail
    assert out[smallest]["w_ppm"] > n[smallest] * 1_000_000 // total
    assert out[biggest]["w_ppm"] < n[biggest] * 1_000_000 // total
    # expected_docs is the ppm share of the corpus
    for k, r in out.items():
        assert r["expected_docs"] == r["w_ppm"] * total // 1_000_000


def test_temperature_alpha_one_is_proportional(spark):
    docs = _docs(spark, SF_SMALL)
    out = selection.temperature_weights(docs, "lang", 1.0).collect()
    total = sum(r["n_docs"] for r in out)
    for r in out:
        exact = r["n_docs"] * 1_000_000 // total
        # fixed-point pow/floor seam can shave at most 1 ppm
        assert abs(r["w_ppm"] - exact) <= 1


# --- split leakage ----------------------------------------------------------------


def test_split_leakage_rows_are_cross_split_near_dups(spark):
    from osm_pbf_parquet_spark.operators.dedup import minhash_lsh_dedup
    from osm_pbf_parquet_spark.operators.sampling import hash_split

    docs = _docs(spark, SF_DIR)
    leaks = selection.split_leakage(docs).collect()
    assert leaks, "sf0.01 corpus is known to contain cross-split near-dups"
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_dedup(docs, threshold=0.8).collect()
    }
    split = {
        r["doc_id"]: r["split"] for r in hash_split(docs).collect()
    }
    for r in leaks:
        assert (r["doc_a"], r["doc_b"]) in pairs
        assert r["jaccard"] == pairs[(r["doc_a"], r["doc_b"])]
        assert r["split_a"] == split[r["doc_a"]]
        assert r["split_b"] == split[r["doc_b"]]
        assert r["split_a"] != r["split_b"]


def test_dedup_resolve_one_keeper_per_cluster(spark):
    from osm_pbf_parquet_spark.operators import dedup, text

    docs = _docs(spark, SF_DIR)
    comp = dedup.duplicate_components(
        dedup.ngram_jaccard_dedup(docs, threshold=0.8)
    )
    rows = selection.resolve_duplicates(comp, text.quality_score(docs)).collect()
    assert rows
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["canonical_id"], []).append(r)
    for cid, members in by_cluster.items():
        keepers = [r for r in members if r["keep"]]
        assert len(keepers) == 1, cid
        k = keepers[0]
        assert k["doc_id"] == k["kept_id"]
        best = max(members, key=lambda r: (r["quality"], -r["doc_id"]))
        assert k["doc_id"] == best["doc_id"]
        for r in members:
            assert r["kept_id"] == k["doc_id"]
            assert r["keep"] == (r["doc_id"] == r["kept_id"])
            assert r["component_size"] == members[0]["component_size"]


def test_ccnet_buckets_exact_tertiles(spark):
    docs = _docs(spark, SF_DIR)
    rows = selection.perplexity_buckets(docs).collect()
    assert len(rows) == docs.count()  # every doc bucketed
    per_lang: dict = {}
    for r in rows:
        per_lang.setdefault(r["lang"], []).append(r)
    for lang, members in per_lang.items():
        n = len(members)
        counts = {"head": 0, "middle": 0, "tail": 0}
        for r in members:
            counts[r["ppl_bucket"]] += 1
        assert counts["head"] == n // 3, lang
        assert counts["middle"] == (2 * n) // 3 - n // 3, lang
        assert counts["tail"] == n - (2 * n) // 3, lang
        # head really is the most-fluent slice: its max score <= every
        # non-null tail score (boundary ties broken by doc_id stay
        # consistent because the score is rounded identically in both
        # engines). Guard the generators: a language with n < 3 has an
        # empty head, and NULL-scored (zero-token) docs sort into tail.
        head = [
            r["avg_neg_logprob"] for r in members if r["ppl_bucket"] == "head"
        ]
        tail = [
            r["avg_neg_logprob"]
            for r in members
            if r["ppl_bucket"] == "tail" and r["avg_neg_logprob"] is not None
        ]
        if head and tail:
            assert max(head) <= min(tail), lang


def test_ccnet_zero_token_docs_bucket_tail(spark):
    """A tokenless doc has no LM score but must still be bucketed —
    NULL score, ranked last, 'tail'."""
    rows = [(i, "common words here", "en") for i in range(1, 9)]
    rows.append((9, "", "en"))
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r["doc_id"]: r for r in selection.perplexity_buckets(df).collect()}
    assert len(out) == 9
    assert out[9]["avg_neg_logprob"] is None
    assert out[9]["ppl_bucket"] == "tail"


def test_resolve_unscored_docs_never_win(spark):
    """A clustered doc missing from the quality frame stays in the
    output (NULL quality) and never beats a scored sibling."""
    comp = spark.createDataFrame(
        [(1, 1, 3), (2, 1, 3), (3, 1, 3)],
        ["doc_id", "canonical_id", "component_size"],
    )
    quality = spark.createDataFrame(
        [(1, 0.2), (2, 0.9)], ["doc_id", "quality"]
    )  # doc 3 unscored
    out = {
        r["doc_id"]: r
        for r in selection.resolve_duplicates(comp, quality).collect()
    }
    assert len(out) == 3
    assert out[3]["quality"] is None and not out[3]["keep"]
    assert all(r["kept_id"] == 2 for r in out.values())
    assert out[2]["keep"]


def test_resolve_and_ccnet_windows_are_keyed(spark):
    """Both new ops rank inside keyed windows (cluster id / language) —
    a global-sort SinglePartition window would be the 100TB killer."""
    from osm_pbf_parquet_spark.plans.selection_queries import SELECTION_QUERIES

    # ccnet's one allowed SinglePartition is the unigram LM's 1-row
    # (n_total, v_size) totals aggregate — scalar, corpus-size-free
    for name, single_cap in (("dedup_resolve", 0), ("ccnet_buckets", 1)):
        plan = _plan(SELECTION_QUERIES[name][0](spark, SF_SMALL))
        assert plan.count("SinglePartition") <= single_cap, name
        assert "CartesianProduct" not in plan, name


def test_split_leakage_adds_no_corpus_scan(spark):
    """Split sides are hash projections of the pair keys — the plan must
    scan the corpus exactly as many times as the dedup itself, never
    join back to documents for the split column."""
    from osm_pbf_parquet_spark.operators.dedup import minhash_lsh_dedup

    docs = _docs(spark, SF_SMALL)
    base = _plan(minhash_lsh_dedup(docs, threshold=0.8))
    audited = _plan(selection.split_leakage(docs))
    # ≤, not ==: extending the dedup plan can only REUSE scans (the
    # persisted signature frame), never add a corpus re-scan
    assert audited.count("Scan parquet") <= base.count("Scan parquet")
    assert "CartesianProduct" not in audited


def test_kcenter_matches_greedy_reference(spark):
    """r10: the in-plan farthest-point loop equals the sequential
    Gonzalez greedy on constructed clustered vectors — same center
    sequence (ties by lowest key) and same nearest assignments."""
    import numpy as np

    from osm_pbf_parquet_spark.operators.selection import kcenter_select

    # 3 tight clusters + one outlier: greedy must pick across them
    base = {0: [0.0] * 8, 1: [10.0] * 8, 2: [-10.0] * 8, 3: [100.0] * 8}
    rows = []
    for i in range(24):
        c = i % 4
        rows.append((i, [b + ((i * 7 + j) % 5) / 10.0
                         for j, b in enumerate(base[c])]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: (r["center_id"], r["d2"])
           for r in kcenter_select(df, k=4).collect()}

    X = {i: np.asarray(v) for i, v in rows}
    centers = [min(X)]
    for _ in range(3):
        far = max(
            ((min(float(((X[i] - X[c]) ** 2).sum()) for c in centers), -i), i)
            for i in X
        )[1]
        centers.append(far)
    ref = {}
    for i in X:
        d, c = min(
            (float(((X[i] - X[c]) ** 2).sum()), centers.index(c), c)
            for c in centers
        )[0::2]
        ref[i] = (c, round(d, 6))
    assert got == ref
    # one center per cluster: the diversity guarantee on this geometry
    assert {c % 4 for c in {c for c, _ in got.values()}} == {0, 1, 2, 3}


def test_embedding_diversity_report_equals_joined_parts(spark):
    """r11 capstone handoff contract: the fused single-pass report must
    equal the explicit composition — kcenter_select joined to
    pca_power_scores on the key, grouped per center with the same
    fixed-point mean."""
    from pyspark.sql import functions as F

    from osm_pbf_parquet_spark.operators.selection import (
        embedding_diversity_report,
        kcenter_select,
    )
    from osm_pbf_parquet_spark.operators.similarity import pca_power_scores

    rows = [(i, [float(((i * 31 + j * 17) % 13) - 6) / 6.0
                 + (3.0 if j == 1 else 0.0)
                 for j in range(8)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["center_id"]: (r["n_members"], r["max_d2"], r["avg_pc1"])
           for r in embedding_diversity_report(df, k=3).collect()}

    joined = (
        kcenter_select(df, k=3)
        .join(pca_power_scores(df), "vec_id")
        .groupBy("center_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("d2").alias("mx"),
            F.sum(
                F.expr("cast(round(pc1 * 1000000, 0) AS BIGINT)")
            ).alias("sfp"),
        )
        .select("center_id", "n", "mx",
                F.round(F.col("sfp") / F.col("n") / F.lit(1e6), 6).alias("ap"))
    )
    ref = {r["center_id"]: (r["n"], r["mx"], r["ap"])
           for r in joined.collect()}
    assert got == ref and len(got) == 3
