"""Edge-case units + plan audits for the r4 curation operators:
line-level dedup, vocabulary build, document chunking, int8 embedding
quantization, and SemDedup cluster-then-dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from osm_pbf_parquet_spark.operators import sampling, similarity, text

SF_DIR = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# --- line_dedup -----------------------------------------------------------------


def test_line_dedup_removes_common_keeps_order(spark):
    docs = spark.createDataFrame(
        [
            (1, "unique one\ncommon\nunique two"),
            (2, "common\nonly in two"),
            (3, "common\nonly in three"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in text.line_dedup(docs, max_docs=2).collect()}
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 2
    assert out[1]["cleaned_md5"] == md5("unique one\nunique two")
    assert out[2]["cleaned_md5"] == md5("only in two")


def test_line_dedup_all_removed_hashes_empty(spark):
    import hashlib

    docs = spark.createDataFrame(
        [(i, "same line") for i in range(4)], ["doc_id", "text"]
    )
    out = text.line_dedup(docs, max_docs=1).collect()
    assert all(r["n_kept"] == 0 for r in out)
    assert all(
        r["cleaned_md5"] == hashlib.md5(b"").hexdigest() for r in out
    )


def test_line_dedup_counts_distinct_docs_not_occurrences(spark):
    # one doc repeating a line 5 times != 5 docs sharing it
    docs = spark.createDataFrame(
        [(1, "x\nx\nx\nx\nx"), (2, "y")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in text.line_dedup(docs, max_docs=1).collect()}
    assert out[1]["n_kept"] == 5  # 1 distinct doc <= max_docs


def test_line_dedup_plan_no_cartesian(spark):
    from osm_pbf_parquet_spark.plans.relational import t

    plan = _plan(text.line_dedup(t(spark, SF_DIR, "documents")))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- build_vocab ----------------------------------------------------------------


def test_build_vocab_order_and_min_count(spark):
    docs = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a d")], ["doc_id", "text"]
    )
    out = text.build_vocab(docs, vocab_size=10, min_count=2).collect()
    # a:3 b:3 (tie -> token asc), c:1 d:1 dropped by min_count
    assert [(r["token_id"], r["token"], r["n"]) for r in out] == [
        (0, "a", 3),
        (1, "b", 3),
    ]


def test_build_vocab_caps_at_vocab_size(spark):
    docs = spark.createDataFrame([(1, "a b c d e f")], ["doc_id", "text"])
    out = text.build_vocab(docs, vocab_size=3, min_count=1).collect()
    assert len(out) == 3
    assert [r["token"] for r in out] == ["a", "b", "c"]


def test_build_vocab_plan_takeordered_no_global_sort(spark):
    from osm_pbf_parquet_spark.plans.relational import t

    plan = _plan(text.build_vocab(t(spark, SF_DIR, "documents"), vocab_size=200))
    assert "TakeOrderedAndProject" in plan


# --- chunk_documents ------------------------------------------------------------


def test_chunk_documents_windows_and_tail(spark):
    words = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame([(1, words)], ["doc_id", "text"])
    out = sorted(
        sampling.chunk_documents(docs, size=4, stride=3).collect(),
        key=lambda r: r["chunk_id"],
    )
    # starts 1,4,7 (start 10's window [10,10] is contained in [7,10] — a
    # redundant subset window, filtered out)
    assert [(r["start"], r["n_tokens"]) for r in out] == [
        (1, 4), (4, 4), (7, 4),
    ]
    import hashlib

    assert out[0]["chunk_md5"] == hashlib.md5(b"w0 w1 w2 w3").hexdigest()
    assert out[2]["chunk_md5"] == hashlib.md5(b"w6 w7 w8 w9").hexdigest()


def test_chunk_documents_short_doc_single_chunk(spark):
    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    out = sampling.chunk_documents(docs, size=64, stride=48).collect()
    assert len(out) == 1 and out[0]["n_tokens"] == 2


def test_chunk_documents_validates_args(spark):
    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        sampling.chunk_documents(docs, size=0)
    with pytest.raises(ValueError):
        sampling.chunk_documents(docs, stride=0)


def test_chunk_documents_plan_no_shuffle(spark):
    from osm_pbf_parquet_spark.plans.relational import t

    plan = _plan(
        sampling.chunk_documents(t(spark, SF_DIR, "documents"), 24, 16)
    )
    assert "Exchange" not in plan  # pure per-row explode at scan speed


# --- quantize_embeddings --------------------------------------------------------


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=[0.0, 0.0, 0.0])]
    )
    r = similarity.quantize_embeddings(df).collect()[0]
    assert r["scale"] == 0.0 and r["q_checksum"] == 0 and r["mse"] == 0.0


def test_quantize_extremes_hit_127(spark):
    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=[1.0, -1.0, 0.5])]
    )
    r = similarity.quantize_embeddings(df).collect()[0]
    # q = [127, -127, 64]; checksum = 127*1 - 127*2 + 64*3
    assert r["q_checksum"] == 127 - 254 + 192
    assert r["scale"] == round(1.0 / 127.0, 9)  # operator rounds to 9 dp


def test_quantize_reconstruction_error_small(spark):
    from osm_pbf_parquet_spark.plans.relational import t

    out = similarity.quantize_embeddings(t(spark, SF_DIR, "embeddings"))
    mx = out.agg(F.max("mse")).collect()[0][0]
    # int8 symmetric quantization: mse <= (scale/2)^2 with scale <= max|x|/127
    assert mx < 1e-4


# --- semantic_dedup -------------------------------------------------------------


def test_semantic_dedup_matches_within_cell_brute_force(spark):
    from osm_pbf_parquet_spark.plans.relational import t

    emb = t(spark, SF_DIR, "embeddings")
    assigned = {
        r["vec_id"]: r["cell"]
        for r in similarity.ivf_assign(emb).select("vec_id", "cell").collect()
    }
    pairs = similarity.embedding_near_dup_pairs(emb, threshold=0.45).collect()
    expect_removed = {
        r["id_b"] for r in pairs if assigned[r["id_a"]] == assigned[r["id_b"]]
    }
    survivors = {
        r["vec_id"] for r in similarity.semantic_dedup(emb, 0.45).collect()
    }
    assert survivors == set(assigned) - expect_removed


def test_semantic_dedup_join_is_equi_on_cell(spark):
    from osm_pbf_parquet_spark.plans.relational import t

    plan = _plan(similarity.semantic_dedup(t(spark, SF_DIR, "embeddings")))
    assert "CartesianProduct" not in plan
    # the pair join must be a hash join keyed on cell, not a nested loop
    # over the corpus (the centroid crossJoin is broadcast-by-construction)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan
    )


# --- kmeans_assign --------------------------------------------------------------


def test_kmeans_inertia_non_increasing(spark):
    from osm_pbf_parquet_spark.plans.relational import t

    emb = t(spark, SF_DIR, "embeddings").withColumn(
        "embedding",
        F.expr("transform(embedding, x -> floor(cast(x AS DOUBLE) * 1000 + 0.5))"),
    )
    inertia = [
        similarity.kmeans_assign(emb, k=6, iters=i)
        .agg(F.sum("sq_dist")).collect()[0][0]
        for i in (1, 3)
    ]
    assert inertia[1] <= inertia[0] + 1e-6  # Lloyd's monotonicity


def test_kmeans_deterministic_across_runs(spark):
    from osm_pbf_parquet_spark.plans.relational import t

    emb = t(spark, SF_DIR, "embeddings").withColumn(
        "embedding",
        F.expr("transform(embedding, x -> floor(cast(x AS DOUBLE) * 1000 + 0.5))"),
    )
    a = sorted(map(tuple, similarity.kmeans_assign(emb, k=6, iters=2).collect()))
    b = sorted(map(tuple, similarity.kmeans_assign(emb, k=6, iters=2).collect()))
    assert a == b


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # duplicate init vectors force an empty cluster (ties go to the
    # lowest cid); the guard must keep iterating without KeyError and
    # still emit a full partition over 0..k-1
    rows = [Row(vec_id=i, embedding=[0.0]) for i in range(2)] + [
        Row(vec_id=10, embedding=[5.0]),
        Row(vec_id=11, embedding=[6.0]),
    ]
    df = spark.createDataFrame(rows)
    out = similarity.kmeans_assign(df, k=2, iters=3).collect()
    assert len(out) == 4
    assert {r["cluster"] for r in out} <= {0, 1}


def test_kmeans_assignment_stage_no_shuffle(spark):
    """The per-round argmin assignment must be a broadcast projection over
    the corpus scan — the only exchanges in the FINAL plan are the
    persist/spread scan, never a join shuffle keyed on data."""
    from osm_pbf_parquet_spark.plans.relational import t

    emb = t(spark, SF_DIR, "embeddings")
    plan = _plan(similarity.kmeans_assign(emb, k=4, iters=1))
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


# --- duplicate_spans ------------------------------------------------------------


def test_duplicate_spans_cross_doc_maximal_merge(spark):
    from osm_pbf_parquet_spark.operators import dedup

    shared = " ".join(f"s{i}" for i in range(12))  # 12 shared tokens
    docs = spark.createDataFrame(
        [
            (1, "aa bb " + shared + " cc"),
            (2, shared + " zz yy"),
            (3, "totally different words here nothing repeated at all ok"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r["doc_id"], r["span_id"]): r
        for r in dedup.duplicate_spans(docs, k=8).collect()
    }
    # doc1: shared starts at token 3, covers 12 tokens -> span [3, 14];
    # 5 dup shingles (positions 3..7) merge into ONE maximal span
    r1 = out[(1, 1)]
    assert (r1["start"], r1["span_end"], r1["n_tokens"], r1["n_shingles"]) == (
        3, 14, 12, 5,
    )
    r2 = out[(2, 1)]
    assert (r2["start"], r2["span_end"], r2["n_tokens"]) == (1, 12, 12)
    assert not any(doc == 3 for doc, _ in out)


def test_duplicate_spans_intra_doc_repeat(spark):
    from osm_pbf_parquet_spark.operators import dedup

    block = " ".join(f"t{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(1, block + " mid " + block)], ["doc_id", "text"]
    )
    out = sorted(
        dedup.duplicate_spans(docs, k=8).collect(), key=lambda r: r["start"]
    )
    # the 8-token block occurs twice inside one doc: two disjoint spans
    assert [(r["start"], r["span_end"]) for r in out] == [(1, 8), (10, 17)]


def test_duplicate_spans_short_docs_yield_nothing(spark):
    from osm_pbf_parquet_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], ["doc_id", "text"]
    )
    assert dedup.duplicate_spans(docs, k=8).count() == 0


def test_duplicate_spans_plan_no_cartesian(spark):
    from osm_pbf_parquet_spark.operators import dedup
    from osm_pbf_parquet_spark.plans.relational import t

    plan = _plan(dedup.duplicate_spans(t(spark, SF_DIR, "documents")))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- randomized differential checks (fixed seed, pure-Python reference) ---------


def _py_duplicate_spans(texts: dict, k: int):
    """Reference implementation: shingle counts -> maximal merged spans."""
    from collections import Counter

    sh = {
        d: [" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)]
        for d, ws in ((d, t.split(" ")) for d, t in texts.items())
    }
    counts = Counter(g for gs in sh.values() for g in gs)
    spans = []
    for d, gs in sh.items():
        dup_pos = [i + 1 for i, g in enumerate(gs) if counts[g] > 1]
        cur = None
        sid = 0
        for p in dup_pos:
            if cur and p <= cur[1] + 1:  # inside or abutting covered end
                cur[1] = max(cur[1], p + k - 1)
                cur[3] += 1
            else:
                if cur:
                    spans.append((d, sid, cur[0], cur[1], cur[1] - cur[0] + 1, cur[3]))
                sid += 1
                cur = [p, p + k - 1, None, 1]
        if cur:
            spans.append((d, sid, cur[0], cur[1], cur[1] - cur[0] + 1, cur[3]))
    return sorted(spans)


def test_duplicate_spans_differential_random_corpus(spark):
    import random

    from osm_pbf_parquet_spark.operators import dedup

    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> many repeats
    texts = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40)))
        for d in range(30)
    }
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    got = sorted(
        (r["doc_id"], r["span_id"], r["start"], r["span_end"],
         r["n_tokens"], r["n_shingles"])
        for r in dedup.duplicate_spans(docs, k=4).collect()
    )
    assert got == _py_duplicate_spans(texts, k=4)


def test_line_dedup_differential_random_corpus(spark):
    import hashlib
    import random
    from collections import Counter

    rng = random.Random(99)
    lines_pool = [f"line {i}" for i in range(8)]
    texts = {
        d: "\n".join(rng.choice(lines_pool) for _ in range(rng.randint(1, 6)))
        for d in range(25)
    }
    max_docs = 3
    per_line_docs = Counter()
    for d, t in texts.items():
        for ln in set(t.split("\n")):
            per_line_docs[ln] += 1
    expect = {}
    for d, t in texts.items():
        ls = t.split("\n")
        kept = [ln for ln in ls if per_line_docs[ln] <= max_docs]
        expect[d] = (
            len(ls), len(kept),
            hashlib.md5("\n".join(kept).encode()).hexdigest(),
        )
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    from osm_pbf_parquet_spark.operators import text as text_ops

    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["cleaned_md5"])
        for r in text_ops.line_dedup(docs, max_docs=max_docs).collect()
    }
    assert got == expect


# --- tfidf_top_terms ------------------------------------------------------------


def test_tfidf_ranks_rare_terms_above_common(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple apple common"),
            (2, "banana common common"),
            (3, "cherry common"),
        ],
        ["doc_id", "text"],
    )
    out = text.tfidf_top_terms(docs, top_k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rk"], r["term"], r["score"]))
    # doc1: apple tf=3 df=1 -> 3*(3/1)=9; common tf=1 df=3 -> 1
    assert sorted(by_doc[1]) == [(1, "apple", 9.0), (2, "common", 1.0)]
    # doc2: banana 1*(3/1)=3 beats common 2*(3/3)=2
    assert sorted(by_doc[2]) == [(1, "banana", 3.0), (2, "common", 2.0)]


def test_tfidf_tie_breaks_by_term(spark):
    docs = spark.createDataFrame([(1, "zz aa")], ["doc_id", "text"])
    out = sorted(text.tfidf_top_terms(docs, top_k=2).collect(),
                 key=lambda r: r["rk"])
    assert [r["term"] for r in out] == ["aa", "zz"]  # equal scores


# --- cms_heavy_hitters ----------------------------------------------------------


def test_cms_never_undercounts_on_corpus(spark):
    from osm_pbf_parquet_spark.operators.sketches import cms_heavy_hitters
    from osm_pbf_parquet_spark.plans.relational import t

    out = cms_heavy_hitters(t(spark, SF_DIR, "documents"), k=10).collect()
    assert len(out) == 10
    assert all(r["never_undercounts"] for r in out)
    assert all(r["est_n"] >= r["true_n"] for r in out)


def test_cms_exact_when_no_collisions(spark):
    from osm_pbf_parquet_spark.operators.sketches import cms_heavy_hitters

    # 5 distinct tokens << width=1024: collisions are possible only if
    # two of the 5 tokens share a bucket in EVERY row — vanishingly
    # unlikely and deterministically absent for this fixed vocabulary
    docs = spark.createDataFrame(
        [(1, "aa aa aa bb bb cc dd ee")], ["doc_id", "text"]
    )
    out = {r["term"]: r for r in cms_heavy_hitters(docs, k=5).collect()}
    assert out["aa"]["true_n"] == 3 and out["aa"]["est_n"] == 3
    assert all(r["est_n"] == r["true_n"] for r in out.values())


def test_duplicate_spans_abutting_coverage_merges(spark):
    from osm_pbf_parquet_spark.operators import dedup

    a = " ".join(f"a{i}" for i in range(8))
    b = " ".join(f"b{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(1, a + " " + b), (2, a), (3, b)], ["doc_id", "text"]
    )
    out = [r for r in dedup.duplicate_spans(docs, k=8).collect()
           if r["doc_id"] == 1]
    # dup shingles at pos 1 (block a) and pos 9 (block b): coverages
    # [1,8] and [9,16] abut -> ONE maximal span over the whole doc
    assert len(out) == 1
    r = out[0]
    assert (r["start"], r["span_end"], r["n_tokens"], r["n_shingles"]) == (
        1, 16, 16, 2,
    )


def test_kmeans_oracle_matches_when_cluster_empties(spark, tmp_path):
    """Regression: the DuckDB oracle must keep an emptied cluster's stale
    centroid (LEFT JOIN + coalesce) exactly like the operator. Duplicate
    init vectors force cluster 1 empty in round 1 (lowest-cid tie-break);
    with the stale centroid kept it regains members at final assignment."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from oracle_harness import run_compare
    from osm_pbf_parquet_spark.plans.pipeline_queries import PIPELINE_QUERIES

    base = str(tmp_path)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet",
                    f"{base}/{t}.parquet")
    rng = np.random.RandomState(7)
    vecs = rng.uniform(-1, 1, size=(40, 64)).astype(np.float32)
    vecs[1] = vecs[0]  # duplicate init centroid -> empty cluster round 1
    pq.write_table(pa.table({
        "vec_id": pa.array(range(40), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * 40, pa.int32()),
    }), f"{base}/embeddings.parquet")
    fn, oracle = PIPELINE_QUERIES["kmeans_clusters"]
    out = fn(spark, base).toPandas()
    assert 1 in set(out["cluster"])  # stale centroid regained members
    run_compare(spark, base, "kmeans_clusters", fn, oracle)
