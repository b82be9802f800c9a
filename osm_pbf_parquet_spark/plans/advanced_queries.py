"""Round-5 advanced analytics + ML-pipeline queries with DuckDB oracles.

Six operator families the 100 TB training-data story still lacked:
Pareto skyline (sort-based, distributed carry), SCD-2 interval build,
HyperLogLog distinct (oracle REPLAYS the sketch), deterministic negative
sampling, per-cluster embedding outliers (exact-integer centroids), and
unigram-LM perplexity scoring (CCNet-style quality filter).

Every float constant is computed once in Python and injected as the same
double literal into BOTH the Spark plan and the SQL oracle — engine-side
decimal-literal arithmetic (DuckDB parses ``1.079/256`` as DECIMAL
division) diverges from double math at the 1e-9 digit, which a
value-hash gate notices.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import ordered, similarity, text
from ..operators.sketches import (
    HLL_ALPHA,
    HLL_HASH_BITS,
    HLL_P,
    hll_distinct,
)
from .pipeline_queries import t_adaptive as _pta
from .relational import t as _t

from ..operators.sampling import duck_hash_mod as _duck_hash_mod
# sequential left-fold dot/norm, the pipeline_queries oracle idiom —
# identical FP order to Spark's aggregate(zip_with(...)) fold
_DOT = (
    "list_reduce(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]),"
    " (acc, x) -> acc + x)"
)
_NORM = "sqrt(list_reduce(list_transform({v}, x -> x * x), (acc, x) -> acc + x))"


# --- Pareto skyline -----------------------------------------------------------


def q_skyline_pareto(spark, sf_dir):
    """Distinct Pareto frontier of orders minimizing (price, date):
    cheapest-and-earliest trade-off curve. Distributed sort-based
    skyline — see operators/ordered.py for the carry-in scheme."""
    return ordered.skyline_min_min(
        _t(spark, sf_dir, "orders"), "o_totalprice", "o_orderdate"
    )


ORACLE_SKYLINE = """
WITH pts AS (
  SELECT DISTINCT o_totalprice AS x, o_orderdate AS y FROM orders
),
m AS (
  SELECT x, y,
         min(y) OVER (ORDER BY x, y
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS gmin
  FROM pts
)
SELECT x AS o_totalprice, y AS o_orderdate
FROM m WHERE gmin IS NULL OR y < gmin
"""


# --- SCD-2 intervals ----------------------------------------------------------


def q_scd2_intervals(spark, sf_dir):
    """Type-2 change history of each user's event_type: change-point
    compression of the event log into validity intervals. Timestamps
    compare as exact epoch-µs integers (loader's ts_us) so interval
    bounds are integer-exact across engines."""
    e = _t(spark, sf_dir, "events")
    out = ordered.scd2_intervals(
        e, key_col="user_id", attr_col="event_type",
        ts_col="ts_us", tiebreak_col="event_id",
    )
    return out.select(
        "user_id", "event_type",
        F.col("valid_from").cast("long"),
        F.col("valid_to").cast("long"),
        F.col("version_no").cast("int"),
    )


ORACLE_SCD2 = """
WITH ordered_ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
         lag(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
changes AS (
  SELECT user_id, event_type, ts_us, event_id
  FROM ordered_ev
  WHERE prev_type IS NULL OR event_type <> prev_type
)
SELECT user_id, event_type,
       CAST(ts_us AS BIGINT) AS valid_from,
       CAST(lead(ts_us) OVER w2 AS BIGINT) AS valid_to,
       CAST(row_number() OVER w2 AS INT) AS version_no
FROM changes
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
"""


# --- HyperLogLog distinct -----------------------------------------------------


def q_hll_distinct(spark, sf_dir):
    """HLL distinct users over events; the oracle REPLAYS the register
    build (z_scaled is an exact integer checksum of all 256 registers,
    not a tolerance check)."""
    return hll_distinct(_t(spark, sf_dir, "events"), "user_id")


_HLL_M = 1 << HLL_P
_HLL_SUB = HLL_HASH_BITS - HLL_P
_HLL_EST = (
    # CAST the alpha literal: DuckDB parses a bare float literal as
    # DECIMAL and overflows the register-count multiplication
    f"CAST({HLL_ALPHA!r} AS DOUBLE) * {_HLL_M} * {_HLL_M}"
    f" * CAST({1 << 53} AS DOUBLE) / z_scaled"
)
ORACLE_HLL = f"""
WITH h AS (
  SELECT {_duck_hash_mod("CAST(user_id AS VARCHAR)", 1 << 60)} AS hv
  FROM events
),
b AS (
  SELECT hv % {_HLL_M} AS bucket, hv // {_HLL_M} AS w FROM h
),
rk AS (
  SELECT bucket,
         CASE WHEN w = 0 THEN {_HLL_SUB + 1}
              ELSE {_HLL_SUB} - length(bin(w)) + 1 END AS rank
  FROM b
),
regs AS (SELECT bucket, max(rank) AS r FROM rk GROUP BY bucket),
spine AS (SELECT unnest(range(0, {_HLL_M})) AS bucket),
filled AS (
  SELECT s.bucket, coalesce(regs.r, 0) AS r
  FROM spine s LEFT JOIN regs ON s.bucket = regs.bucket
),
agg AS (
  SELECT CAST(sum(CAST(pow(2.0, 53 - r) AS BIGINT)) AS BIGINT) AS z_scaled,
         CAST(sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_empty
  FROM filled
),
ex AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
       FROM events)
SELECT z_scaled, v_empty, exact_distinct,
       round(CASE WHEN ({_HLL_EST}) <= 2.5 * {_HLL_M} AND v_empty > 0
             THEN {_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE) / v_empty)
             ELSE ({_HLL_EST}) END, 6) AS hll_estimate
FROM agg, ex
"""


# --- negative sampling --------------------------------------------------------

_NEG_K = 4
_NEG_LIMIT = 200


def q_negative_sampling(spark, sf_dir):
    """Deterministic contrastive negatives: k hash-drawn partners per
    anchor (vec_id < 200), cosine-scored. Pure hash arithmetic — no RNG
    state, replayable in SQL."""
    out = similarity.negative_sampling(
        _pta(spark, sf_dir, "embeddings"),
        k=_NEG_K, query_limit=_NEG_LIMIT,
    )
    return out.select(
        "anchor_id", F.col("draw").cast("long"), "neg_id", "cosine"
    )


_NEG_HASH = _duck_hash_mod(
    "CAST(e.vec_id AS VARCHAR) || ':neg:' || CAST(d.draw AS VARCHAR)",
    "(s.hi - s.lo + 1)",
)
ORACLE_NEGATIVE_SAMPLING = f"""
WITH span AS (SELECT min(vec_id) AS lo, max(vec_id) AS hi FROM embeddings),
vd AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
draws AS (
  SELECT e.vec_id AS anchor_id, d.draw,
         s.lo + {_NEG_HASH} AS neg_id
  FROM embeddings e, span s,
       (SELECT unnest(range(0, {_NEG_K})) AS draw) d
  WHERE e.vec_id < {_NEG_LIMIT}
)
SELECT dr.anchor_id, CAST(dr.draw AS BIGINT) AS draw, dr.neg_id,
       round({_DOT.format(a="a.v", b="n.v")}
             / ({_NORM.format(v="a.v")} * {_NORM.format(v="n.v")}), 6)
         AS cosine
FROM draws dr
JOIN vd a ON a.vec_id = dr.anchor_id
JOIN vd n ON n.vec_id = dr.neg_id
WHERE dr.neg_id <> dr.anchor_id
"""


# --- embedding outliers -------------------------------------------------------

_OUT_SCALE = 1_000_000
_OUT_TOP = 3


def q_embedding_outliers(spark, sf_dir):
    """Top-3 farthest-from-centroid vectors per label. Centroids from
    exact scaled-integer sums (order-independent); distances fold
    sequentially from identical integers on both engines."""
    return similarity.embedding_outliers(
        _pta(spark, sf_dir, "embeddings"),
        top_n=_OUT_TOP, scale=_OUT_SCALE,
    )


ORACLE_EMBEDDING_OUTLIERS = f"""
WITH s AS (
  SELECT vec_id, label,
         list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * {_OUT_SCALE}, 0) AS BIGINT))
           AS vi
  FROM embeddings
),
d AS (
  SELECT vec_id, label,
         unnest(range(0, len(vi))) AS dim, unnest(vi) AS val
  FROM s
),
cent AS (
  SELECT label, dim,
         CAST(sum(val) AS DOUBLE) / count(*) AS c
  FROM d GROUP BY label, dim
),
cv AS (
  SELECT label, list(c ORDER BY dim) AS cvec FROM cent GROUP BY label
),
dist AS (
  SELECT s.vec_id, s.label,
         sqrt(list_reduce(
             list_transform(range(1, len(s.vi) + 1),
                 i -> (CAST(s.vi[i] AS DOUBLE) - cv.cvec[i])
                      * (CAST(s.vi[i] AS DOUBLE) - cv.cvec[i])),
             (acc, x) -> acc + x)) / {_OUT_SCALE}.0 AS dist_raw
  FROM s JOIN cv ON s.label = cv.label
),
ranked AS (
  SELECT label, vec_id,
         row_number() OVER (PARTITION BY label
                            ORDER BY dist_raw DESC, vec_id) AS rk,
         dist_raw
  FROM dist
)
SELECT label, vec_id, CAST(rk AS INT) AS rk, round(dist_raw, 6) AS dist
FROM ranked WHERE rk <= {_OUT_TOP}
"""


# --- unigram LM perplexity ----------------------------------------------------


def q_unigram_logprob(spark, sf_dir):
    """Corpus-trained unigram-LM quality score per document (CCNet-style
    perplexity filter). Sequential sorted-token fold — see
    operators/text.py."""
    return text.unigram_logprob_score(_pta(spark, sf_dir, "documents"))


ORACLE_UNIGRAM = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '{text.TOKEN_REGEX}')) AS token
  FROM documents
),
vocab AS (SELECT token, count(*) AS c_corpus FROM toks GROUP BY token),
tot AS (
  SELECT CAST(sum(c_corpus) AS BIGINT) AS n_total,
         CAST(count(*) AS BIGINT) AS v_size
  FROM vocab
),
pd AS (
  SELECT doc_id, token, count(*) AS c_doc
  FROM toks GROUP BY doc_id, token
),
folded AS (
  SELECT pd.doc_id,
         CAST(sum(pd.c_doc) AS BIGINT) AS n_tokens,
         list_reduce(
             list_transform(
                 list(struct_pack(token := pd.token, c_doc := pd.c_doc,
                                  c_corpus := v.c_corpus)
                      ORDER BY pd.token),
                 s -> -(s.c_doc * ln((CAST(s.c_corpus AS DOUBLE) + 1.0)
                        / (CAST(t.n_total AS DOUBLE) + t.v_size)))),
             (acc, x) -> acc + x) AS nll
  FROM pd JOIN vocab v ON pd.token = v.token, tot t
  GROUP BY pd.doc_id, t.n_total, t.v_size
)
SELECT doc_id, n_tokens,
       round(CASE WHEN n_tokens = 0 THEN 0.0 ELSE nll / n_tokens END, 6)
         AS avg_neg_logprob
FROM folded
"""


ADVANCED_QUERIES: dict[str, tuple] = {
    "skyline_pareto": (q_skyline_pareto, ORACLE_SKYLINE),
    "scd2_intervals": (q_scd2_intervals, ORACLE_SCD2),
    "hll_distinct": (q_hll_distinct, ORACLE_HLL),
    "negative_sampling": (q_negative_sampling, ORACLE_NEGATIVE_SAMPLING),
    "embedding_outliers": (q_embedding_outliers, ORACLE_EMBEDDING_OUTLIERS),
    "unigram_logprob": (q_unigram_logprob, ORACLE_UNIGRAM),
}


# --- BM25 retrieval -----------------------------------------------------------

_BM25_TERMS = ["data", "spark", "query"]
_BM25_K = 10


def q_bm25_topk(spark, sf_dir):
    """Okapi BM25 top-10 for a fixed 3-term query — the lexical half of
    hybrid search; the oracle replays idf/tf/length normalization from
    the same exact integer counts."""
    return text.bm25_topk(
        _pta(spark, sf_dir, "documents"), _BM25_TERMS, k=_BM25_K
    )


_BM25_TERMS_SQL = ", ".join(
    "'" + t.replace("'", "''") + "'" for t in _BM25_TERMS
)
_BM25_TERM_SCORE = (
    "ln(1.0 + (CAST(s.n_docs AS DOUBLE) - s.df + 0.5) / (s.df + 0.5))"
    f" * (s.tf * (CAST({text.BM25_K1!r} AS DOUBLE) + 1.0))"
    f" / (s.tf + CAST({text.BM25_K1!r} AS DOUBLE)"
    f" * (1.0 - CAST({text.BM25_B!r} AS DOUBLE)"
    f" + CAST({text.BM25_B!r} AS DOUBLE) * s.dl"
    " / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))"
)
_BM25_CTE = f"""toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '{text.TOKEN_REGEX}')) AS token
  FROM documents
),
dlens AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS sum_dl
  FROM dlens
),
tf AS (
  SELECT doc_id, token, count(*) AS tf
  FROM toks WHERE token IN ({_BM25_TERMS_SQL})
  GROUP BY doc_id, token
),
dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY token),
parts AS (
  SELECT tf.doc_id, tf.token,
         CAST(tf.tf AS BIGINT) AS tf, CAST(dfreq.df AS BIGINT) AS df,
         CAST(dlens.dl AS BIGINT) AS dl, st.n_docs, st.sum_dl
  FROM tf
  JOIN dfreq ON tf.token = dfreq.token
  JOIN dlens ON tf.doc_id = dlens.doc_id, stats st
),
bm AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_terms_hit,
         round(list_reduce(
             list_transform(
                 list(struct_pack(token := token, tf := tf, df := df,
                                  dl := dl, n_docs := n_docs,
                                  sum_dl := sum_dl) ORDER BY token),
                 s -> {_BM25_TERM_SCORE}),
             (acc, x) -> acc + x), 6) AS bm25
  FROM parts GROUP BY doc_id
)"""

ORACLE_BM25 = f"""
WITH {_BM25_CTE}
SELECT doc_id, n_terms_hit, bm25
FROM bm ORDER BY bm25 DESC, doc_id LIMIT {_BM25_K}
"""


# --- histogram quantiles ------------------------------------------------------

_HQ_QUANTILES = [0.0, 0.25, 0.5, 0.75, 0.9, 0.99]


def q_histogram_quantiles(spark, sf_dir):
    """Fixed-width-histogram quantile estimates over lineitem prices —
    the two-pass scalable alternative to a global sort; the oracle
    replays bin assignment, cumulative counts, and interpolation."""
    from ..operators.sketches import histogram_quantiles

    return histogram_quantiles(
        _t(spark, sf_dir, "lineitem"), "l_extendedprice", _HQ_QUANTILES
    )


_HQ_BINS = 1024
_HQ_Q_SQL = ", ".join(repr(q) for q in _HQ_QUANTILES)
ORACLE_HISTOGRAM_QUANTILES = f"""
WITH vals AS (
  SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem
  WHERE l_extendedprice IS NOT NULL
),
rng AS (SELECT min(x) AS lo, max(x) AS hi, CAST(count(*) AS BIGINT) AS n
        FROM vals),
binned AS (
  SELECT CASE WHEN r.hi = r.lo THEN 0 ELSE
           least({_HQ_BINS} - 1,
                 CAST(floor((x - r.lo) / (r.hi - r.lo) * {_HQ_BINS}) AS INT))
         END AS bin,
         count(*) AS cnt
  FROM vals, rng r GROUP BY 1
),
spine AS (SELECT CAST(unnest(range(0, {_HQ_BINS})) AS INT) AS bin),
filled AS (
  SELECT s.bin, CAST(coalesce(b.cnt, 0) AS BIGINT) AS cnt
  FROM spine s LEFT JOIN binned b ON s.bin = b.bin
),
cum AS (
  SELECT bin, cnt,
         coalesce(sum(cnt) OVER (ORDER BY bin
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before,
         sum(cnt) OVER (ORDER BY bin
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM filled
)
SELECT q.q,
       round(CASE WHEN r.hi = r.lo THEN r.lo
           WHEN q.q = 0.0 THEN r.lo ELSE
           r.lo + (CAST(c.bin AS DOUBLE)
                   + (q.q * r.n - c.cum_before) / c.cnt)
                * ((r.hi - r.lo) / {_HQ_BINS}) END, 6) AS est
FROM cum c, (SELECT unnest([{_HQ_Q_SQL}]) AS q) q, rng r
WHERE (q.q * r.n > c.cum_before OR (q.q = 0.0 AND c.bin = 0))
  AND q.q * r.n <= c.cum
"""


# --- leakage-safe grouped split -----------------------------------------------


def q_grouped_split(spark, sf_dir):
    """Group-level (source-keyed) train/val/test split audit: per-split
    group/doc counts plus the computed no-leakage invariant."""
    from ..operators.sampling import grouped_split_audit

    return grouped_split_audit(_pta(spark, sf_dir, "documents"))


ORACLE_GROUPED_SPLIT = f"""
WITH bucketed AS (
  SELECT doc_id, source,
         {_duck_hash_mod(
             "CAST(source AS VARCHAR) || ':' || 'grouped-split-v1'", 10000
         )} AS bucket
  FROM documents
),
assigned AS (
  SELECT doc_id, source,
         CASE WHEN bucket < 8000 THEN 'train'
              WHEN bucket < 9000 THEN 'val'
              ELSE 'test' END AS split
  FROM bucketed
),
per_split AS (
  SELECT split,
         CAST(count(DISTINCT source) AS BIGINT) AS n_groups,
         CAST(count(doc_id) AS BIGINT) AS n_docs
  FROM assigned GROUP BY split
),
leak AS (
  SELECT CAST(max(ns) AS BIGINT) AS max_splits_per_group
  FROM (SELECT source, count(DISTINCT split) AS ns
        FROM assigned GROUP BY source)
)
SELECT split, n_groups, n_docs, max_splits_per_group
FROM per_split, leak
"""


ADVANCED_QUERIES.update({
    "bm25_topk": (q_bm25_topk, ORACLE_BM25),
    "histogram_quantiles": (q_histogram_quantiles, ORACLE_HISTOGRAM_QUANTILES),
    "grouped_split": (q_grouped_split, ORACLE_GROUPED_SPLIT),
})


# --- hybrid RRF search --------------------------------------------------------

_RRF_N = 50  # per-list candidate cut
_RRF_TOP = 10
_RRF_QVEC = 0  # stored query vector (vec_id 0)


def q_hybrid_rrf(spark, sf_dir):
    """Hybrid search capstone: BM25 lexical ranking over documents +
    cosine ranking against a stored query vector, fused by reciprocal
    rank (1/(60+rank)). Each list is a bounded top-50 cut
    (TakeOrderedAndProject); fusion runs on dimension-sized frames."""
    from pyspark.sql import Window

    docs = _pta(spark, sf_dir, "documents")
    lex = text.bm25_topk(docs, _BM25_TERMS, k=_RRF_N)
    # ≤ 50 rows: literal-bounded unpartitioned window
    w = Window.orderBy(F.desc("bm25"), F.col("doc_id"))
    lex_ranked = lex.withColumn("rank", F.row_number().over(w)).select(
        F.col("doc_id").alias("id"), "rank"
    )
    vec_ranked = similarity.ranked_cosine_candidates(
        _pta(spark, sf_dir, "embeddings"), _RRF_QVEC, _RRF_N
    ).select(F.col("vec_id").alias("id"), "rank")
    out = similarity.rrf_fuse([lex_ranked, vec_ranked], "id", k=_RRF_TOP)
    return out.select(
        "id",
        F.col("rank_0").alias("rank_lex"),
        F.col("rank_1").alias("rank_vec"),
        "rrf",
    )


ORACLE_HYBRID_RRF = f"""
WITH {_BM25_CTE},
lex AS (
  SELECT doc_id AS id,
         CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
           AS rank_lex
  FROM bm ORDER BY bm25 DESC, doc_id LIMIT {_RRF_N}
),
vd AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
qv AS (SELECT v AS q FROM vd WHERE vec_id = {_RRF_QVEC}),
cos AS (
  SELECT vec_id,
         round({_DOT.format(a="vd.v", b="qv.q")}
               / ({_NORM.format(v="vd.v")} * {_NORM.format(v="qv.q")}), 6)
           AS cosine
  FROM vd, qv WHERE vec_id <> {_RRF_QVEC}
),
vec AS (
  SELECT vec_id AS id,
         CAST(row_number() OVER (ORDER BY cosine DESC, vec_id) AS BIGINT)
           AS rank_vec
  FROM cos ORDER BY cosine DESC, vec_id LIMIT {_RRF_N}
),
fused AS (
  SELECT coalesce(lex.id, vec.id) AS id, rank_lex, rank_vec,
         round(coalesce(1.0 / CAST(60 + rank_lex AS DOUBLE), 0.0)
               + coalesce(1.0 / CAST(60 + rank_vec AS DOUBLE), 0.0), 6)
           AS rrf
  FROM lex FULL OUTER JOIN vec ON lex.id = vec.id
)
SELECT id, rank_lex, rank_vec, rrf
FROM fused ORDER BY rrf DESC, id LIMIT {_RRF_TOP}
"""


ADVANCED_QUERIES.update({
    "hybrid_rrf_search": (q_hybrid_rrf, ORACLE_HYBRID_RRF),
})


# --- incremental dedup --------------------------------------------------------


def q_incremental_dedup(spark, sf_dir):
    """Warehouse steady-state dedup: incoming batch (doc_id % 5 == 0)
    checked against the already-ingested corpus's persisted signature
    table — banded LSH join new×old only, never corpus×corpus."""
    from ..operators import dedup

    docs = _pta(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    incoming = docs.where(F.col("doc_id") % 5 == 0)
    corpus_sigs = dedup.minhash_signatures(corpus).select(
        "doc_id", "gram_hashes", "minhash"
    )
    return dedup.incremental_minhash_dedup(incoming, corpus_sigs)


def _oracle_incremental() -> str:
    from ..operators import dedup
    from .pipeline_queries import GRAMS_CTE, _seed_sql

    P = dedup.MERSENNE31
    rows = dedup.N_MINHASH // dedup.LSH_BANDS
    return f"""
WITH {GRAMS_CTE},
sig AS (
  SELECT doc_id,
    list_transform({_seed_sql()}, s ->
      list_min(list_transform(gram_hashes, gh -> (s.a * gh + s.b) % {P})))
      AS minhash
  FROM h
),
bands AS (
  SELECT doc_id, t.b AS band_idx,
         array_to_string(minhash[t.b * {rows} + 1 : t.b * {rows} + {rows}], ',')
           AS band_sig
  FROM sig CROSS JOIN generate_series(0, {dedup.LSH_BANDS - 1}) AS t(b)
),
cand AS (
  SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
  FROM bands n JOIN bands o
    ON n.band_idx = o.band_idx AND n.band_sig = o.band_sig
  WHERE n.doc_id % 5 = 0 AND o.doc_id % 5 <> 0
),
scored AS (
  SELECT new_id, old_id,
         round(len(list_intersect(ga.gram_hashes, gb.gram_hashes)) * 1.0
               / len(list_distinct(ga.gram_hashes || gb.gram_hashes)), 4)
           AS jaccard
  FROM cand
  JOIN h ga ON ga.doc_id = new_id
  JOIN h gb ON gb.doc_id = old_id
),
best AS (
  SELECT new_id AS doc_id, old_id AS dup_of, jaccard,
         row_number() OVER (PARTITION BY new_id
                            ORDER BY jaccard DESC, old_id) AS rn
  FROM scored WHERE jaccard >= 0.8
)
SELECT doc_id, dup_of, jaccard FROM best WHERE rn = 1
"""


ADVANCED_QUERIES.update({
    "incremental_dedup": (q_incremental_dedup, _oracle_incremental()),
})


# --- MERGE upsert -------------------------------------------------------------


def q_merge_upsert(spark, sf_dir):
    """Lakehouse MERGE INTO semantics: a deterministic price-correction
    batch (keys % 10 == 0, +10% in exact integer cents) plus an insert
    batch (keys % 97 == 0, re-keyed +1e9) merged into orders — updates
    replace, inserts append, untouched rows survive. One keyed-window
    shuffle. Prices flow as BIGINT cents end-to-end: ``x * 1.1`` lands
    on .xx5 half-boundaries where Spark (shortest-repr BigDecimal
    HALF_UP) and DuckDB (double-scaled C rounding) systematically
    disagree — integer cents make the merge bit-exact instead."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.expr(
            "cast(round(o_totalprice * 100.0d, 0) AS BIGINT)"
        ).alias("price_cents"),
    )
    corrections = orders.where(F.col("o_orderkey") % 10 == 0).withColumn(
        "price_cents", F.expr("(price_cents * 11) div 10")
    )
    inserts = orders.where(F.col("o_orderkey") % 97 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(1_000_000_000)
    )
    updates = corrections.unionByName(inserts)
    merged = ordered.merge_upsert(orders, updates, "o_orderkey")
    return merged.select("o_orderkey", "o_custkey", "price_cents", "src")


ORACLE_MERGE_UPSERT = """
WITH target AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100.0, 0) AS BIGINT) AS price_cents
  FROM orders
),
corrections AS (
  SELECT o_orderkey, o_custkey, (price_cents * 11) // 10 AS price_cents
  FROM target WHERE o_orderkey % 10 = 0
),
inserts AS (
  SELECT o_orderkey + 1000000000 AS o_orderkey, o_custkey, price_cents
  FROM target WHERE o_orderkey % 97 = 0
),
updates AS (SELECT * FROM corrections UNION ALL SELECT * FROM inserts),
tagged AS (
  SELECT *, 0 AS prio FROM target
  UNION ALL
  SELECT *, 1 AS prio FROM updates
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey
                               ORDER BY prio DESC) AS rn
  FROM tagged
)
SELECT o_orderkey, o_custkey, price_cents,
       CASE WHEN prio = 1 THEN 'update' ELSE 'target' END AS src
FROM ranked WHERE rn = 1
"""


ADVANCED_QUERIES.update({
    "merge_upsert": (q_merge_upsert, ORACLE_MERGE_UPSERT),
})


# --- cogrouped reconciliation -------------------------------------------------


def q_cogroup_reconcile(spark, sf_dir):
    """Two-sided grouped-map API surface (cogroup + applyInPandas):
    per-user reconciliation of event value vs order spend, exact
    integer-cents arithmetic. user_id maps onto the customer key space
    via the events table's existing ids; orders keyed by o_custkey."""
    from ..functions.udx import cogroup_reconcile

    events = _t(spark, sf_dir, "events").select("user_id", "value")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_totalprice"
    )
    return cogroup_reconcile(events, orders)


ORACLE_COGROUP_RECONCILE = """
WITH ev AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT)
           AS event_cents
  FROM events GROUP BY user_id
),
od AS (
  SELECT o_custkey AS user_id,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100.0, 0) AS BIGINT)) AS BIGINT)
           AS order_cents
  FROM orders GROUP BY o_custkey
)
SELECT coalesce(ev.user_id, od.user_id) AS user_id,
       CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
       CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
       CAST(coalesce(event_cents, 0) AS BIGINT) AS event_cents,
       CAST(coalesce(order_cents, 0) AS BIGINT) AS order_cents,
       CAST(coalesce(order_cents, 0) - coalesce(event_cents, 0) AS BIGINT)
         AS delta_cents
FROM ev FULL OUTER JOIN od ON ev.user_id = od.user_id
"""


ADVANCED_QUERIES.update({
    "cogroup_reconcile": (q_cogroup_reconcile, ORACLE_COGROUP_RECONCILE),
})


# --- character entropy / TTR --------------------------------------------------


def q_text_entropy(spark, sf_dir):
    """Information-density quality screens: char-distribution Shannon
    entropy + type-token ratio, flat codegen, zero shuffle."""
    return text.char_entropy_stats(_pta(spark, sf_dir, "documents"))


def _oracle_text_entropy() -> str:
    """Mirror char_entropy_stats' expression chain term-for-term (same
    class order, same fixed-order sum) in DuckDB SQL."""
    counts = [
        f"(length(_lc) - length(replace(_lc, '{ch}', '')))"
        for ch in text.ENTROPY_CHARS
    ]
    counts.append(
        "(length(_lc) - length(regexp_replace(_lc, '[0-9]', '', 'g')))"
    )
    counts.append("(length(_lc) - length(replace(_lc, ' ', '')))")
    total_known = " + ".join(counts)
    counts.append(f"(length(_lc) - ({total_known}))")
    terms = [
        f"CASE WHEN {c} = 0 OR _n = 0 THEN CAST(0.0 AS DOUBLE) ELSE "
        f"-(CAST({c} AS DOUBLE) / _n) * log2(CAST({c} AS DOUBLE) / _n) END"
        for c in counts
    ]
    entropy = " + ".join(terms)
    return f"""
WITH base AS (
  SELECT doc_id, lower(text) AS _lc, length(lower(text)) AS _n, text
  FROM documents
)
SELECT doc_id,
       CAST(_n AS BIGINT) AS n_chars,
       round({entropy}, 6) AS char_entropy_bits,
       round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / greatest(len(string_split(text, ' ')), 1), 6)
         AS type_token_ratio
FROM base
"""


ADVANCED_QUERIES.update({
    "text_entropy": (q_text_entropy, _oracle_text_entropy()),
})


# --- salted skew join ---------------------------------------------------------


def q_salted_join(spark, sf_dir):
    """Salted replicated join (static skew mitigation): events joined to
    the customer dimension on (user_id, salt) with the dim replicated
    16x — semantically identical to the plain join the oracle runs;
    rolled up per market segment in exact integer cents."""
    from ..operators.skew import salted_join

    events = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    dim = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(events, dim, "user_id", "event_id")
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(
            F.expr("cast(round(value * 100.0, 0) AS BIGINT)")
        ).cast("long").alias("value_cents"),
    )


ORACLE_SALTED_JOIN = """
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(e.value * 100.0, 0) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""


ADVANCED_QUERIES.update({
    "salted_join": (q_salted_join, ORACLE_SALTED_JOIN),
})


# --- ordered funnel -----------------------------------------------------------

_FUNNEL_STEPS = ["view", "click", "purchase"]


def q_funnel_depths(spark, sf_dir):
    """Product-analytics funnel: per user, how far through
    view → click → purchase they progressed, each step strictly after
    the previous one; exact epoch-µs timestamps."""
    e = _t(spark, sf_dir, "events")
    out = ordered.funnel_depths(
        e, _FUNNEL_STEPS, key_col="user_id",
        type_col="event_type", ts_col="ts_us",
    )
    return out.select(
        "user_id", "depth",
        F.col("t_1").cast("long"),
        F.col("t_2").cast("long"),
        F.col("t_3").cast("long"),
    )


ORACLE_FUNNEL = """
WITH s1 AS (
  SELECT user_id, min(epoch_us(ts)) AS t_1
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t_2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t_1
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t_3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t_2
  GROUP BY e.user_id
)
SELECT s1.user_id,
       CAST(CASE WHEN t_3 IS NOT NULL THEN 3
                 WHEN t_2 IS NOT NULL THEN 2
                 ELSE 1 END AS INT) AS depth,
       CAST(t_1 AS BIGINT) AS t_1,
       CAST(t_2 AS BIGINT) AS t_2,
       CAST(t_3 AS BIGINT) AS t_3
FROM s1
LEFT JOIN s2 ON s1.user_id = s2.user_id
LEFT JOIN s3 ON s1.user_id = s3.user_id
"""


ADVANCED_QUERIES.update({
    "funnel_depths": (q_funnel_depths, ORACLE_FUNNEL),
})


# --- cohort retention ---------------------------------------------------------


def q_cohort_retention(spark, sf_dir):
    """Weekly cohort-retention grid: users grouped by first-activity
    week (cohort), counted per subsequent activity week offset — two
    map-side-combinable aggs + one co-partitioned join on user_id;
    week arithmetic in exact integer µs (epoch µs div one week)."""
    week_us = 7 * 24 * 3600 * 1_000_000
    e = _t(spark, sf_dir, "events").select(
        "user_id", F.expr(f"ts_us div {week_us}").alias("week")
    )
    cohort = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    grid = (
        e.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week"))
                 .alias("week_offset"))
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )
    return grid.select(
        F.col("cohort_week").cast("long"),
        F.col("week_offset").cast("long"),
        "n_users",
    )


ORACLE_COHORT = """
WITH e AS (
  SELECT user_id, epoch_us(ts) // 604800000000 AS week FROM events
),
cohort AS (
  SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id
)
SELECT CAST(c.cohort_week AS BIGINT) AS cohort_week,
       CAST(e.week - c.cohort_week AS BIGINT) AS week_offset,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM e JOIN cohort c ON e.user_id = c.user_id
GROUP BY 1, 2
"""


# --- distributed table checksum -----------------------------------------------

_CKSUM_BUCKETS = 64


def q_table_checksum(spark, sf_dir):
    """Distributed anti-entropy checksum of the orders table: rows hash
    to 64 buckets; per bucket, an order-independent XOR of the row
    content hash + exact count. Two tables are replica-identical iff
    their 64 checksum rows match — the cross-cluster validation
    primitive (compare replicas / write routes without moving data).
    One map-side-combinable aggregation; XOR is commutative-associative
    so partial merge order is irrelevant."""
    from ..operators.sampling import hash_mod_expr

    row_key = (
        "concat(cast(o_orderkey AS string), '|', "
        "cast(o_custkey AS string), '|', o_orderstatus, '|', "
        "cast(cast(round(o_totalprice * 100.0d, 0) AS BIGINT) AS string))"
    )
    h = f"cast(conv(substring(md5({row_key}), 1, 15), 16, 10) AS BIGINT)"
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            F.expr(hash_mod_expr(row_key, _CKSUM_BUCKETS)).alias("bucket"),
            F.expr(h).alias("row_hash"),
        )
        .groupBy("bucket")
        .agg(
            F.expr("bit_xor(row_hash)").cast("long").alias("xor_hash"),
            F.count("*").cast("long").alias("n_rows"),
        )
    )


def _oracle_table_checksum() -> str:
    row_key = (
        "CAST(o_orderkey AS VARCHAR) || '|' || "
        "CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus || '|' || "
        "CAST(CAST(round(o_totalprice * 100.0, 0) AS BIGINT) AS VARCHAR)"
    )
    h = f"CAST(('0x' || substring(md5({row_key}), 1, 15)) AS BIGINT)"
    return f"""
WITH hashed AS (
  SELECT {_duck_hash_mod(row_key, _CKSUM_BUCKETS)} AS bucket,
         {h} AS row_hash
  FROM orders
)
SELECT bucket,
       CAST(bit_xor(row_hash) AS BIGINT) AS xor_hash,
       CAST(count(*) AS BIGINT) AS n_rows
FROM hashed GROUP BY bucket
"""


ADVANCED_QUERIES.update({
    "cohort_retention": (q_cohort_retention, ORACLE_COHORT),
    "table_checksum": (q_table_checksum, _oracle_table_checksum()),
})


# --- dataset diff -------------------------------------------------------------


def q_dataset_diff(spark, sf_dir):
    """Row-level delta between orders and its merge-upserted form: the
    corrected keys report ``changed``, the re-keyed inserts ``only_b``,
    everything identical is omitted. One full-outer join on the key."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.expr(
            "cast(round(o_totalprice * 100.0d, 0) AS BIGINT)"
        ).alias("price_cents"),
    )
    corrections = orders.where(F.col("o_orderkey") % 10 == 0).withColumn(
        "price_cents", F.expr("(price_cents * 11) div 10")
    )
    inserts = orders.where(F.col("o_orderkey") % 97 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(1_000_000_000)
    )
    merged = ordered.merge_upsert(
        orders, corrections.unionByName(inserts), "o_orderkey"
    ).drop("src")
    return ordered.dataset_diff(
        orders, merged, ["o_orderkey"], ["o_custkey", "price_cents"]
    )


ORACLE_DATASET_DIFF = """
WITH target AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100.0, 0) AS BIGINT) AS price_cents
  FROM orders
),
corrections AS (
  SELECT o_orderkey, o_custkey, (price_cents * 11) // 10 AS price_cents
  FROM target WHERE o_orderkey % 10 = 0
),
inserts AS (
  SELECT o_orderkey + 1000000000 AS o_orderkey, o_custkey, price_cents
  FROM target WHERE o_orderkey % 97 = 0
),
updates AS (SELECT * FROM corrections UNION ALL SELECT * FROM inserts),
merged AS (
  SELECT o_orderkey, o_custkey, price_cents FROM (
    SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                 ORDER BY prio DESC) AS rn
    FROM (SELECT *, 0 AS prio FROM target
          UNION ALL SELECT *, 1 AS prio FROM updates)
  ) WHERE rn = 1
)
SELECT coalesce(t.o_orderkey, m.o_orderkey) AS o_orderkey,
       CASE WHEN m.o_orderkey IS NULL THEN 'only_a'
            WHEN t.o_orderkey IS NULL THEN 'only_b'
            WHEN t.o_custkey <> m.o_custkey
                 OR t.price_cents <> m.price_cents THEN 'changed'
       END AS status
FROM target t FULL OUTER JOIN merged m ON t.o_orderkey = m.o_orderkey
WHERE CASE WHEN m.o_orderkey IS NULL THEN 'only_a'
           WHEN t.o_orderkey IS NULL THEN 'only_b'
           WHEN t.o_custkey <> m.o_custkey
                OR t.price_cents <> m.price_cents THEN 'changed'
      END IS NOT NULL
"""


ADVANCED_QUERIES.update({
    "dataset_diff": (q_dataset_diff, ORACLE_DATASET_DIFF),
})


# --- Poisson bootstrap --------------------------------------------------------


def q_poisson_bootstrap(spark, sf_dir):
    """Scalable bootstrap of the mean event value: 32 Poisson-resample
    replicas in one explode + one map-side-combinable agg; fully
    deterministic (hash-driven draws, exact integer-cents sums)."""
    from ..operators.sketches import poisson_bootstrap_mean

    return poisson_bootstrap_mean(
        _t(spark, sf_dir, "events"), "value", "event_id"
    )


def _oracle_poisson_bootstrap() -> str:
    from ..operators.sketches import BOOT_B, _poisson_weight_case

    u = (
        "(CAST("
        + _duck_hash_mod(
            "CAST(event_id AS VARCHAR) || ':boot:' || CAST(b AS VARCHAR)",
            1 << 60,
        )
        + f" AS DOUBLE) / {float(1 << 60)!r})"
    )
    w = _poisson_weight_case(u)
    return f"""
WITH rows_ AS (
  SELECT event_id,
         CAST(round(value * 100.0, 0) AS BIGINT) AS v,
         b
  FROM events, (SELECT unnest(range(0, {BOOT_B})) AS b)
),
weighted AS (
  SELECT b, v, {w} AS w FROM rows_
)
SELECT CAST(b AS BIGINT) AS replica,
       CAST(sum(w) AS BIGINT) AS n_eff,
       round(CASE WHEN sum(w) = 0 THEN 0.0 ELSE
           CAST(sum(w * v) AS DOUBLE) / sum(w) / 100.0 END, 6)
         AS mean_value
FROM weighted GROUP BY b
"""


ADVANCED_QUERIES.update({
    "poisson_bootstrap": (q_poisson_bootstrap, _oracle_poisson_bootstrap()),
})


# --- exact Gram matrix (PCA core) ---------------------------------------------


def q_gram_matrix(spark, sf_dir):
    """Distributed exact X'X over the embedding corpus: per-partition
    numpy matmul partials in mapInArrow + one (i, j) sum — the heavy
    half of PCA; integer-exact, order-independent."""
    return similarity.gram_matrix(_pta(spark, sf_dir, "embeddings"))


ORACLE_GRAM_MATRIX = """
WITH v AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))
           AS vi
  FROM embeddings
),
d AS (
  SELECT vec_id, unnest(range(0, len(vi))) AS i, unnest(vi) AS xi FROM v
)
SELECT CAST(a.i AS INT) AS i, CAST(b.i AS INT) AS j,
       CAST(sum(a.xi * b.xi) AS BIGINT) AS g
FROM d a JOIN d b ON a.vec_id = b.vec_id
GROUP BY 1, 2
"""


ADVANCED_QUERIES.update({
    "gram_matrix": (q_gram_matrix, ORACLE_GRAM_MATRIX),
})


# --- PCA power-iteration scores (r10) -----------------------------------------


def q_pca_power_scores(spark, sf_dir):
    """Distributed PCA completed: every embedding projected onto the
    top principal direction from 3 power-iteration rounds over the
    exact Gram matrix (similarity.pca_power_scores). The iteration runs
    in-plan on d-row frames; the corpus pays only gram_matrix's bounded
    shuffle plus a scan-speed projection with a 1-row broadcast
    component attach."""
    return similarity.pca_power_scores(_pta(spark, sf_dir, "embeddings"))


def _build_pca_oracle(rounds: int = 3) -> str:
    dot = (
        "list_reduce(list_transform(range(1, len({a}) + 1), "
        "k -> {a}[k] * {b}[k]), (acc, x) -> acc + x)"
    )
    norm = (
        "sqrt(list_reduce(list_transform({v}, x -> x * x), "
        "(acc, x) -> acc + x))"
    )
    parts = ["""
WITH v AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))
           AS vi,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd
  FROM embeddings
),
d AS (
  SELECT vec_id, unnest(range(0, len(vi))) AS i, unnest(vi) AS xi FROM v
),
gm AS (
  SELECT a.i AS i, b.i AS j, CAST(sum(a.xi * b.xi) AS BIGINT) AS g
  FROM d a JOIN d b ON a.vec_id = b.vec_id GROUP BY 1, 2
),
rows_ AS (
  SELECT i, list(CAST(g AS DOUBLE)
                 / (CAST(1000000 AS DOUBLE) * CAST(1000000 AS DOUBLE))
                 ORDER BY j) AS gi
  FROM gm GROUP BY i
),
v0 AS (
  SELECT list_transform(gi, q -> CAST(0.125 AS DOUBLE)) AS vv
  FROM rows_ LIMIT 1
)
"""]
    prev = "v0"
    for t in range(1, rounds + 1):
        parts.append(f""",
w{t} AS (
  SELECT i, {dot.format(a="gi", b="vv")} AS wi FROM rows_, {prev}
),
u{t} AS (SELECT list(wi ORDER BY i) AS u FROM w{t}),
v{t} AS (
  SELECT list_transform(u, x -> x / ({norm.format(v="u")})) AS vv FROM u{t}
)""")
        prev = f"v{t}"
    parts.append(f"""
SELECT vec_id, round({dot.format(a="xd", b="vv")}, 6) AS pc1
FROM v, {prev}
""")
    return "".join(parts)


ADVANCED_QUERIES.update({
    "pca_power_scores": (q_pca_power_scores, _build_pca_oracle()),
})


# --- mutual information -------------------------------------------------------


def q_mutual_information(spark, sf_dir):
    """Mutual information between a document's language and its source
    (column-dependence screening): exact contingency counts (one
    map-side agg over ≤ |langs|·|sources| cells), then ONE row with MI
    computed as a sequential fold over the sorted cell list — the only
    float work happens once, in a fixed order, from exact integers."""
    docs = _pta(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_xy")
    )
    margins_x = docs.groupBy("lang").agg(F.count("*").alias("n_x"))
    margins_y = docs.groupBy("source").agg(F.count("*").alias("n_y"))
    total = docs.agg(F.count("*").alias("n"))
    joined = (
        cells.join(F.broadcast(margins_x), "lang")
        .join(F.broadcast(margins_y), "source")
        .crossJoin(F.broadcast(total))
    )
    term = (
        "(cast(t.n_xy AS DOUBLE) / t.n) * ln("
        "  (cast(t.n_xy AS DOUBLE) * t.n)"
        "  / (cast(t.n_x AS DOUBLE) * t.n_y))"
    )
    return joined.agg(
        F.count("*").cast("long").alias("n_cells"),
        F.expr(
            "round(aggregate("
            "  array_sort(collect_list(struct(lang, source, n_xy, n_x,"
            "                                 n_y, n))),"
            "  cast(0.0 AS DOUBLE),"
            f"  (acc, t) -> acc + {term}), 6)"
        ).alias("mi_nats"),
    )


ORACLE_MUTUAL_INFORMATION = """
WITH cells AS (
  SELECT lang, source, count(*) AS n_xy FROM documents GROUP BY 1, 2
),
mx AS (SELECT lang, count(*) AS n_x FROM documents GROUP BY 1),
my AS (SELECT source, count(*) AS n_y FROM documents GROUP BY 1),
tot AS (SELECT count(*) AS n FROM documents),
j AS (
  SELECT c.lang, c.source,
         CAST(c.n_xy AS BIGINT) AS n_xy, CAST(mx.n_x AS BIGINT) AS n_x,
         CAST(my.n_y AS BIGINT) AS n_y, CAST(tot.n AS BIGINT) AS n
  FROM cells c JOIN mx ON c.lang = mx.lang
  JOIN my ON c.source = my.source, tot
)
SELECT CAST(count(*) AS BIGINT) AS n_cells,
       round(list_reduce(
           list_transform(
               list(struct_pack(lang := lang, source := source,
                                n_xy := n_xy, n_x := n_x, n_y := n_y,
                                n := n)
                    ORDER BY lang, source),
               t -> (CAST(t.n_xy AS DOUBLE) / t.n)
                    * ln((CAST(t.n_xy AS DOUBLE) * t.n)
                         / (CAST(t.n_x AS DOUBLE) * t.n_y))),
           (acc, x) -> acc + x), 6) AS mi_nats
FROM j
"""


ADVANCED_QUERIES.update({
    "mutual_information": (q_mutual_information, ORACLE_MUTUAL_INFORMATION),
})


# --- corpus drift (Jensen-Shannon) ----------------------------------------------

_JS_SCALE = 1_000_000_000_000  # per-token contribs rounded to 1e-12 then
# summed as exact BIGINTs — order-independent at ANY vocab size (a float
# SUM's partial-merge order varies; a sorted-collect fold wouldn't scale
# past driver-sized vocabularies)


def q_token_drift_js(spark, sf_dir):
    """Distribution-drift detection between two corpus halves: the
    Jensen-Shannon divergence of their token distributions — the
    standard screen for 'did this ingest batch shift the data mix'.
    Token counts are exact; each token's JS contribution is computed
    once from those integers and rounded to a 1e-12-scaled BIGINT, so
    the corpus-wide sum is one map-side-combinable integer aggregation
    (no fold, no collect — works at a 100 M-token vocabulary)."""
    docs = _pta(spark, sf_dir, "documents")
    toks = text.with_tokens(docs).select(
        F.expr("CASE WHEN cast(substring(source, 4, 10) AS INT) < 10 "
               "THEN 'a' ELSE 'b' END").alias("half"),
        F.explode("tokens").alias("token"),
    )
    counts = toks.groupBy("token").agg(
        F.sum(F.expr("CASE WHEN half = 'a' THEN 1 ELSE 0 END"))
        .alias("ca"),
        F.sum(F.expr("CASE WHEN half = 'b' THEN 1 ELSE 0 END"))
        .alias("cb"),
    )
    totals = counts.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    contrib = (
        "CASE WHEN p > 0.0d THEN 0.5d * p * ln(p / m) ELSE 0.0d END"
        " + CASE WHEN q > 0.0d THEN 0.5d * q * ln(q / m) ELSE 0.0d END"
    )
    scored = (
        counts.crossJoin(F.broadcast(totals))
        .withColumn("p", F.expr("cast(ca AS DOUBLE) / na"))
        .withColumn("q", F.expr("cast(cb AS DOUBLE) / nb"))
        .withColumn("m", F.expr("(p + q) / 2.0d"))
        .withColumn(
            "c_scaled",
            F.expr(
                f"cast(round(({contrib}) * {_JS_SCALE}, 0) AS BIGINT)"
            ),
        )
    )
    return scored.agg(
        F.count("*").cast("long").alias("n_tokens_union"),
        F.expr(
            f"round(cast(sum(c_scaled) AS DOUBLE) / {_JS_SCALE}, 6)"
        ).alias("js_divergence"),
    )


ORACLE_TOKEN_DRIFT = f"""
WITH toks AS (
  SELECT CASE WHEN CAST(substring(source, 4, 10) AS INT) < 10
         THEN 'a' ELSE 'b' END AS half,
         unnest(regexp_extract_all(text, '{text.TOKEN_REGEX}')) AS token
  FROM documents
),
counts AS (
  SELECT token,
         sum(CASE WHEN half = 'a' THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN half = 'b' THEN 1 ELSE 0 END) AS cb
  FROM toks GROUP BY token
),
tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM counts),
scored AS (
  SELECT CAST(ca AS DOUBLE) / na AS p,
         CAST(cb AS DOUBLE) / nb AS q
  FROM counts, tot
),
contrib AS (
  SELECT CAST(round((
           CASE WHEN p > 0 THEN 0.5 * p * ln(p / ((p + q) / 2.0))
                ELSE CAST(0.0 AS DOUBLE) END
           + CASE WHEN q > 0 THEN 0.5 * q * ln(q / ((p + q) / 2.0))
                  ELSE CAST(0.0 AS DOUBLE) END
         ) * {_JS_SCALE}, 0) AS BIGINT) AS c_scaled
  FROM scored
)
SELECT CAST(count(*) AS BIGINT) AS n_tokens_union,
       round(CAST(sum(c_scaled) AS DOUBLE) / {_JS_SCALE}, 6)
         AS js_divergence
FROM contrib
"""


ADVANCED_QUERIES.update({
    "token_drift_js": (q_token_drift_js, ORACLE_TOKEN_DRIFT),
})


# --- z-score anomalies ----------------------------------------------------------

_Z_TOP = 5


def q_zscore_anomalies(spark, sf_dir):
    """Per-group outlier detection: top-5 |z-score| event values per
    event type. Group mean/std come from exact integer-cents sums and
    sum-of-squares (one map-side agg — order-independent, unlike float
    moments), z and the ranking derive deterministically from those
    integers; ties break on event_id."""
    e = _t(spark, sf_dir, "events").select(
        "event_id", "event_type",
        F.expr("cast(round(value * 100.0d, 0) AS BIGINT)").alias("cents"),
    )
    stats = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s1"),
        F.sum(F.expr("cents * cents")).alias("s2"),
    )
    from pyspark.sql import Window

    joined = e.join(F.broadcast(stats), "event_type").withColumn(
        "z",
        F.expr(
            "(cast(cents AS DOUBLE) - cast(s1 AS DOUBLE) / n)"
            " / sqrt(cast(s2 AS DOUBLE) / n"
            " - (cast(s1 AS DOUBLE) / n) * (cast(s1 AS DOUBLE) / n))"
        ),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc(F.abs(F.col("z"))), F.col("event_id")
    )
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _Z_TOP)
        .select(
            "event_type", F.col("rk").cast("int"), "event_id",
            F.expr("round(z, 6)").alias("z"),
        )
    )


ORACLE_ZSCORE = f"""
WITH e AS (
  SELECT event_id, event_type,
         CAST(round(value * 100.0, 0) AS BIGINT) AS cents
  FROM events
),
stats AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS s1,
         CAST(sum(cents * cents) AS BIGINT) AS s2
  FROM e GROUP BY event_type
),
scored AS (
  SELECT e.event_type, e.event_id,
         (CAST(cents AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
         / sqrt(CAST(s2 AS DOUBLE) / n
                - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
           AS z
  FROM e JOIN stats ON e.event_type = stats.event_type
)
SELECT event_type, CAST(rk AS INT) AS rk, event_id, round(z, 6) AS z
FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY abs(z) DESC, event_id) AS rk
  FROM scored
) WHERE rk <= {_Z_TOP}
"""


ADVANCED_QUERIES.update({
    "zscore_anomalies": (q_zscore_anomalies, ORACLE_ZSCORE),
})


# --- corpus tokenization (vocab encode) -----------------------------------------


def q_tokenize_corpus(spark, sf_dir):
    """The tokenize-for-training flow end-to-end: build the vocabulary
    (existing build_vocab operator), encode every document to ordered
    token ids (OOV → -1), and pin the ID SEQUENCE byte-for-byte via an
    md5 over the comma-joined ids — any vocab drift, ordering bug, or
    OOV mishandling flips the hash. One posexplode + one broadcast
    vocab join + one keyed collect, all bounded by doc length."""
    docs = _pta(spark, sf_dir, "documents")
    vocab = text.build_vocab(docs, vocab_size=200, min_count=2).select(
        "token", "token_id"
    )
    pos = text.with_tokens(docs).select(
        "doc_id", F.posexplode("tokens").alias("pos", "token")
    )
    ids = pos.join(F.broadcast(vocab), "token", "left").select(
        "doc_id", "pos",
        F.coalesce("token_id", F.lit(-1)).alias("tid"),
    )
    return (
        ids.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.expr("CASE WHEN tid = -1 THEN 1 ELSE 0 END"))
            .cast("long").alias("n_unk"),
            F.expr(
                "md5(concat_ws(',', transform("
                "array_sort(collect_list(struct(pos, tid))), p -> p.tid)))"
            ).alias("ids_md5"),
        )
    )


ORACLE_TOKENIZE = f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(text, '{text.TOKEN_REGEX}')) AS token
  FROM documents
),
c AS (SELECT token, count(*) AS n FROM toks
      GROUP BY token HAVING count(*) >= 2),
top AS (SELECT token, n FROM c ORDER BY n DESC, token LIMIT 200),
vocab AS (
  SELECT CAST(row_number() OVER (ORDER BY n DESC, token) - 1 AS INT)
           AS token_id,
         token
  FROM top
),
pos AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '{text.TOKEN_REGEX}')) AS token,
         unnest(range(len(regexp_extract_all(text, '{text.TOKEN_REGEX}'))))
           AS pos
  FROM documents
),
ids AS (
  SELECT p.doc_id, p.pos, coalesce(v.token_id, -1) AS tid
  FROM pos p LEFT JOIN vocab v ON p.token = v.token
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN tid = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
       md5(array_to_string(list(tid ORDER BY pos), ',')) AS ids_md5
FROM ids GROUP BY doc_id
"""


ADVANCED_QUERIES.update({
    "tokenize_corpus": (q_tokenize_corpus, ORACLE_TOKENIZE),
})


# --- Bloom-filter contamination prefilter (r8) ------------------------------------

_BLOOM_GRAM_K = 5


def _grams5_expr() -> str:
    n = "size(split(text, ' '))"
    w = "split(text, ' ')"
    return (
        f"CASE WHEN {n} < {_BLOOM_GRAM_K} THEN array(text) "
        f"ELSE array_distinct(transform(sequence(0, {n} - {_BLOOM_GRAM_K}), "
        f"i -> concat_ws(' ', slice({w}, i + 1, {_BLOOM_GRAM_K})))) END"
    )


def q_bloom_decontaminate(spark, sf_dir):
    """Bloom-filter contamination PREFILTER: per training doc, how many
    of its distinct 5-grams are maybe-present in the 8 KB filter built
    over the eval split's grams. Zero false negatives, so
    n_maybe_hits = 0 PROVES a doc clean — the cheap screen that lets
    the exact decontaminate join run on the surviving sliver. The big
    (training) side never shuffles on gram values: k positions per
    gram are a projection, the filter is a broadcast, the count is a
    doc-keyed combinable agg."""
    from pyspark.sql import functions as F

    from ..operators.sketches import bloom_probe_contamination

    docs = _pta(spark, sf_dir, "documents")
    grams = _grams5_expr()
    ev_items = (
        docs.filter(F.col("doc_id") % 20 == 0)
        .select(F.explode(F.expr(grams)).alias("gram"))
        .distinct()
    )
    probe_items = docs.filter(F.col("doc_id") % 20 != 0).select(
        "doc_id", F.explode(F.expr(grams)).alias("gram")
    )
    return bloom_probe_contamination(probe_items, ev_items)


def _oracle_bloom() -> str:
    from ..operators.sketches import BLOOM_BITS, BLOOM_K
    from ..operators.sampling import duck_hash_mod

    k = _BLOOM_GRAM_K

    def pos(item: str) -> str:
        return duck_hash_mod(
            f"{item} || ':' || 'bloom-v1' || ':' || CAST(j AS VARCHAR)",
            BLOOM_BITS,
        )

    return f"""
WITH g AS (
  SELECT doc_id,
    CASE WHEN len(string_split(text, ' ')) < {k} THEN [text]
         ELSE list_distinct(list_transform(
              range(0, len(string_split(text, ' ')) - {k} + 1),
              i -> array_to_string((string_split(text, ' '))[i+1:i+{k}], ' ')))
    END AS grams
  FROM documents
),
ev AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 20 = 0),
pos AS (
  SELECT {pos('gram')} AS p
  FROM ev, range({BLOOM_K}) t(j)
),
words AS (
  SELECT CAST(p // 63 AS INT) AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INT)) AS word
  FROM pos GROUP BY 1
),
probe AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 20 <> 0),
ppos AS (
  SELECT doc_id, gram, {pos('gram')} AS p
  FROM probe, range({BLOOM_K}) t(j)
),
chk AS (
  SELECT doc_id, gram,
         CASE WHEN sum(CASE WHEN (coalesce(w.word, 0)
                    & (CAST(1 AS BIGINT) << CAST(p % 63 AS INT))) <> 0
               THEN 1 ELSE 0 END) = {BLOOM_K} THEN 1 ELSE 0 END AS maybe
  FROM ppos LEFT JOIN words w ON w.word_idx = CAST(p // 63 AS INT)
  GROUP BY doc_id, gram
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(maybe) AS BIGINT) AS n_maybe_hits
FROM chk GROUP BY doc_id
"""


ADVANCED_QUERIES.update({
    "bloom_decontaminate": (q_bloom_decontaminate, _oracle_bloom()),
})


_CSH_BEFORE, _CSH_AFTER, _CSH_V = 8, 10, 8


def q_consistent_shards(spark, sf_dir):
    """Consistent-hash rebalance plan for growing 8 → 10 shards over
    the orders keyspace: the migration matrix whose value hash pins
    every key's ring assignment at BOTH sizes — and whose defining
    invariant (keys only move ONTO the new shards) is what separates
    ring hashing from mod-S resharding at 100 TB."""
    return ordered.consistent_shard_plan(
        _t(spark, sf_dir, "orders"), "o_orderkey",
        _CSH_BEFORE, _CSH_AFTER, vnodes=_CSH_V,
    )


def _oracle_consistent_shards() -> str:
    M = 1 << 60

    def ring(n):
        return f"""(
  SELECT CAST(('0x' || substring(md5('ring-v1:' || CAST(i // {_CSH_V} AS VARCHAR)
         || ':' || CAST(i % {_CSH_V} AS VARCHAR)), 1, 15)) AS BIGINT) AS pos,
         CAST(i // {_CSH_V} AS INT) AS sid
  FROM range(0, {n * _CSH_V}) r(i))"""

    def assign(ring_name):
        return f"""(
  SELECT sid FROM {ring_name}
  ORDER BY ((({ring_name}.pos - k.kpos) % {M}) + {M}) % {M}, sid
  LIMIT 1)"""

    return f"""
WITH rb AS MATERIALIZED {ring(_CSH_BEFORE)},
ra AS MATERIALIZED {ring(_CSH_AFTER)},
k AS (
  SELECT CAST(('0x' || substring(md5('key-v1:' || CAST(o_orderkey AS VARCHAR)),
         1, 15)) AS BIGINT) AS kpos
  FROM orders
),
asg AS (
  SELECT {assign('rb')} AS shard_before,
         {assign('ra')} AS shard_after
  FROM k
)
SELECT shard_before, shard_after, CAST(count(*) AS BIGINT) AS n_keys
FROM asg GROUP BY shard_before, shard_after
"""


ADVANCED_QUERIES.update({
    # ring-hash migration matrix: moves only land on the new shards
    "consistent_shards": (
        q_consistent_shards, _oracle_consistent_shards(),
    ),
})
