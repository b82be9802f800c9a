"""Driver contract for the spark-graft builder (PySpark target).

``entry`` smoke-runs the flagship query; ``queries``/``oracle_sql`` expose
the engine's declared operator surface (SURVEY.md §2) for the DuckDB
correctness gate. Implementations live in ``osm_pbf_parquet_spark``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1-shaped pricing
    summary (scan → partial agg → final agg)."""
    from osm_pbf_parquet_spark.plans.relational import q_pricing_summary

    return q_pricing_summary(spark, "/root/testdata/sf0.001")


def _registry() -> dict[str, tuple]:
    from osm_pbf_parquet_spark.plans.relational import QUERIES as RELATIONAL
    from osm_pbf_parquet_spark.plans.osm_queries import OSM_QUERIES
    from osm_pbf_parquet_spark.plans.analytic_queries import ANALYTIC_QUERIES

    reg: dict[str, tuple] = {}
    reg.update(RELATIONAL)
    reg.update(OSM_QUERIES)
    reg.update(ANALYTIC_QUERIES)
    try:  # data-pipeline operator suites land incrementally
        from osm_pbf_parquet_spark.plans.pipeline_queries import PIPELINE_QUERIES
        from osm_pbf_parquet_spark.plans.sampling_queries import SAMPLING_QUERIES

        reg.update(PIPELINE_QUERIES)
        reg.update(SAMPLING_QUERIES)
    except ImportError:
        pass
    try:
        from osm_pbf_parquet_spark.plans.advanced_queries import ADVANCED_QUERIES

        reg.update(ADVANCED_QUERIES)
    except ImportError:
        pass
    try:
        from osm_pbf_parquet_spark.plans.mining_queries import MINING_QUERIES

        reg.update(MINING_QUERIES)
    except ImportError:
        pass
    try:
        from osm_pbf_parquet_spark.plans.quality_queries import QUALITY_QUERIES

        reg.update(QUALITY_QUERIES)
    except ImportError:
        pass
    try:
        from osm_pbf_parquet_spark.plans.eval_queries import EVAL_QUERIES

        reg.update(EVAL_QUERIES)
    except ImportError:
        pass
    try:
        from osm_pbf_parquet_spark.plans.media_queries import MEDIA_QUERIES

        reg.update(MEDIA_QUERIES)
    except ImportError:
        pass
    try:
        from osm_pbf_parquet_spark.plans.tokenizer_queries import (
            TOKENIZER_QUERIES,
        )

        reg.update(TOKENIZER_QUERIES)
    except ImportError:
        pass
    try:
        from osm_pbf_parquet_spark.plans.stream_dedup_queries import (
            STREAM_DEDUP_QUERIES,
        )

        reg.update(STREAM_DEDUP_QUERIES)
    except ImportError:
        pass
    try:
        from osm_pbf_parquet_spark.plans.selection_queries import (
            SELECTION_QUERIES,
        )

        reg.update(SELECTION_QUERIES)
    except ImportError:
        pass
    return _verification_order(reg)


# The correctness driver checks the FIRST 50 registry entries, so insertion
# order decides which queries get a gate row each round. Front-load (a)
# queries that have never had a driver check, (b) queries added/changed this
# round whose behavior must be certified, (c) queries whose last green row
# predates a change to the module they run through. Long-stable queries take
# the tail — every registered query keeps at least one green CORRECTNESS row
# across rounds.
#
# ROUND-12 ROTATION (mechanically derived by tools/taint_ledger.py on the
# final r12 tree — TAINT_LEDGER.json is the committed evidence):
#
#   5 never-checked late-r12 gates of the no-libm LM/tokenizer/graph
#   wave (kneser_ney_score, louvain_communities, unigram_vocab_costs,
#   unigram_encode_corpus, stream_unigram_encode)
#   + 10 never-checked late-r12 gates of the index/media wave
#     (stream_ivfpq_serve … consistent_shards below)
#   + 3 never-checked r12-new gates (pq_encode_artifact,
#     ivfpq_index_search, ivfpq_index_append)
#   + 5 line-tainted by this round's engine edits (ivfpq_topk: L2
#     k-means coarse quantizer + residual encoding; pq_ann_topk +
#     stream_pq_encode: pq_encode's derived-shape signature and the
#     in-plan ragged-corpus guard; bpe_encode_corpus: the distinct-word
#     dictionary apply; stream_bpe_encode: the shared _with_merge_table
#     refactor on its fold path)
#   + semantic_dedup hoisted (ivf_assign line-taint — was DISPLACED at
#     position 56 after the late-r12 prepends)
#   + 2 more late-r12 never-checked gates (unigram_em_round: the
#     hard-EM re-estimation round; louvain_coarse_graph: the phase-2
#     contraction)
#   = 26 must-cover, ALL IN-CAP (the ledger adds triangle_count and
#     ann_ivf_topk as line-tainted — both ride the fill block in-cap).
#
# The remaining 24 slots are freshness fills, oldest-green-first (r11
# verdict Next #4): ALL seven r7 rows (image_near_dup_pairs, kcore_parts,
# pagerank_suppliers, shortest_hops, split_leakage, temperature_mixture,
# triangle_count), then the oldest r8 rows through
# embedding_quantize (ann_ivf_topk — also line-tainted — rides
# this block in-cap). The r8 rows epoch_shard_plan..
# winnowing_fingerprints are r13's oldest-first fills.
_CHECK_FIRST = [
    # --- must-cover (never-checked + line-tainted) ---
    # no-libm LM stack, added late-r12: Kneser-Ney bigram scoring over
    # exact rationals + integer fixed-point log2 (never-checked)
    "kneser_ney_score",
    # Louvain phase-1 local moves with the Lu et al. 2015 swap veto
    # (never-checked)
    "louvain_communities",
    # unigram-LM (SentencePiece) tokenizer lifecycle: seed vocab with
    # fixed-point costs, Viterbi encode, + encode-on-arrival (21st
    # streaming gate) — all never-checked
    "unigram_vocab_costs",
    "unigram_encode_corpus",
    "stream_unigram_encode",
    "unigram_em_round",
    # Louvain phase-2 contraction (never-checked)
    "louvain_coarse_graph",
    # 18th streaming gate, added late-r12: serve-on-arrival from the
    # persisted IVFADC index (its engine edits also re-taint the ivfpq
    # family below — all in-cap)
    "stream_ivfpq_serve",
    # VAD-style audio segmentation (batch + 19th streaming gate),
    # added late-r12: never-checked
    "audio_energy_segments",
    "stream_audio_segments",
    # nprobe recall sweep, added late-r12: never-checked (its ranked-
    # probe oracle/plan edits also re-taint the ivfpq family below)
    "ann_recall_report",
    # UniMax waterfill budget-setter, added late-r12: never-checked
    "unimax_allocation",
    # JL +-1 projection distortion audit, added late-r12: never-checked
    "jl_distortion",
    # cell-restricted kNN graph + NN-Descent refinement round, added
    # late-r12: never-checked (the centroid-offset param also touches
    # the ivf_assign line set, so BOTH its consumers must be in-cap:
    # ann_ivf_topk rides the fills below; semantic_dedup is hoisted
    # here — the late-r12 must-cover prepends had pushed it to
    # position 56, which the taint ledger flagged as DISPLACED)
    "knn_graph",
    "nn_descent_round",
    "semantic_dedup",
    # 20th streaming gate (JL project-on-arrival) + ring-hash rebalance
    # plan, added late-r12: never-checked
    "stream_jl_encode",
    "consistent_shards",
    "pq_encode_artifact",
    "ivfpq_index_search",
    "ivfpq_index_append",
    "ivfpq_topk",
    "pq_ann_topk",
    "stream_pq_encode",
    "bpe_encode_corpus",
    "stream_bpe_encode",
    # --- 24 freshness fills (oldest green first: r7, then r8) ---
    "image_near_dup_pairs",
    "kcore_parts",
    "pagerank_suppliers",
    "shortest_hops",
    "split_leakage",
    "temperature_mixture",
    "triangle_count",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_lsh_pairs",
    "bigram_lm",
    "bm25_topk",
    "clean_corpus_pipeline",
    "cms_heavy_hitters",
    "decontaminate",
    "dedup_components",
    "dedup_embedding",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "duplicate_spans",
    "embedding_outliers",
    "embedding_quantize",
    # ---- cap boundary: the 50 names above are positions 1-50 (pinned in
    #      test_entry). Everything below position 50 is swept by the
    #      local full-registry parity tests on current code every pytest
    #      run. The r11 must-cover block rotated out with fresh r11
    #      greens; the remaining r8 rows (epoch_shard_plan,
    #      full_curation_pipeline, group_weighted_reservoir,
    #      hybrid_rrf_search, incremental_dedup, jaccard_join_exact,
    #      kmeans_clusters, line_corpus_dedup, negative_sampling,
    #      pii_scrub, sample_pack_sequences, sample_stratified_cap,
    #      sample_weighted_mixture, stream_incremental_dedup,
    #      text_entropy, text_fingerprint, text_lang_id, text_quality,
    #      text_repetition, text_stats, tfidf_top_terms,
    #      token_budget_fill, token_drift_js, tokenize_corpus,
    #      unigram_logprob, vocab_build, weighted_reservoir_sample,
    #      winnowing_fingerprints) are r13's oldest-first fills. ----
]



def _verification_order(reg: dict[str, tuple]) -> dict[str, tuple]:
    head = {n: reg[n] for n in _CHECK_FIRST if n in reg}
    head.update((n, v) for n, v in reg.items() if n not in head)
    return head


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _oracle) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: oracle
        for name, (_fn, oracle) in _registry().items()
        if oracle is not None
    }
