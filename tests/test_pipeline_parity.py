"""Training-data pipeline queries vs DuckDB oracles at sf0.01, plus
semantic checks (LSH recall, multimodal plumbing) no oracle covers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_pbf_parquet_spark.plans.pipeline_queries import PIPELINE_QUERIES
from osm_pbf_parquet_spark.plans.relational import t
from osm_pbf_parquet_spark.operators import dedup, multimodal, similarity

from oracle_harness import run_compare

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(PIPELINE_QUERIES))
def test_pipeline_oracle_parity(spark, name):
    fn, oracle = PIPELINE_QUERIES[name]
    run_compare(spark, SF_DIR, name, fn, oracle)


def test_minhash_lsh_finds_planted_near_dups(spark):
    """The synthetic documents table plants near-dup pairs (jaccard ≥ .9);
    LSH must surface them (32 hashes / 8 bands → P(miss | j=.9) < 1e-3)."""
    docs = t(spark, SF_DIR, "documents")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_dedup(docs, threshold=0.9).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_dedup(docs, threshold=0.9).collect()
    }
    assert exact, "expected planted near-dups in testdata"
    assert lsh == exact  # verification filter makes LSH exact on found pairs


def test_lsh_ann_recall_vs_brute_force(spark):
    """LSH ANN is approximate — measure recall against the exact pairs."""
    emb = t(spark, SF_DIR, "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_near_dup_pairs(emb, threshold=0.45).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in similarity.lsh_ann_pairs(emb, dim=64, threshold=0.45).collect()
    }
    assert approx <= exact  # candidates are verified → no false positives
    if exact:
        recall = len(approx) / len(exact)
        assert recall >= 0.3, f"LSH recall too low: {recall}"


def test_ivf_topk_recall_vs_brute_force(spark):
    """IVF probes 2/8 cells — approximate; measure top-k recall against
    the exact broadcast scan."""
    from pyspark.sql import functions as F

    emb = t(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_topk(emb, q, k=5).collect()
    }
    assert exact
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_multimodal_feature_plumbing(spark):
    docs = t(spark, SF_DIR, "documents").limit(50)
    media = multimodal.attach_binary(docs)
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 50
    for r in feats:
        assert 64 <= r["width"] < 256 and 64 <= r["height"] < 256
        assert 1 <= r["n_frames"] <= 8
        assert 0.0 <= r["feature_norm"] <= 1.0


def test_multimodal_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")


def test_frame_sample_shapes(spark):
    docs = t(spark, SF_DIR, "documents").limit(20)
    media = multimodal.attach_binary(docs)
    frames = multimodal.frame_sample(media, every_n=2)
    agg = frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    assert len(agg) == 20
    assert all(1 <= r["n"] <= 4 for r in agg)  # ceil(n_frames/2), n_frames<=8


def test_signature_impls_bit_identical(spark):
    """The Arrow (numpy) and SQL (Catalyst fold) signature paths must
    produce bit-identical minhash/simhash values — the DuckDB oracle
    mirrors the SQL form, so this equality is what keeps the default
    Arrow path oracle-checkable."""
    docs = t(spark, SF_DIR, "documents")
    a = dedup.minhash_signatures(docs, impl="arrow").select("doc_id", "minhash")
    b = dedup.minhash_signatures(docs, impl="sql").select("doc_id", "minhash")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    sa = dedup.simhash_signatures(docs, impl="arrow").select("doc_id", "simhash")
    sb = dedup.simhash_signatures(docs, impl="sql").select("doc_id", "simhash")
    assert sa.exceptAll(sb).count() == 0 and sb.exceptAll(sa).count() == 0


def test_duplicate_components_transitive_closure(spark):
    """A chain a~b~c must collapse to one component with canonical=min,
    even though (a,c) itself is not a pair; disjoint pair stays separate."""
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (9, 8), (30, 3)], "doc_a long, doc_b long"
    )
    got = {
        (r["doc_id"], r["canonical_id"], r["component_size"])
        for r in dedup.duplicate_components(pairs).collect()
    }
    assert got == {
        (1, 1, 4), (2, 1, 4), (3, 1, 4), (30, 1, 4),
        (8, 8, 2), (9, 8, 2),
    }
