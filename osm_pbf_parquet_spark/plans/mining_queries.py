"""Round-6 mining queries: graph link analysis, itemset mining, grouped
sketches, n-gram LM statistics, and behavioral Markov chains — each a
(Spark plan, DuckDB oracle) gate pair over the shared test tables.

Reference context: the reference engine's users run this class of
analysis on its parquet output via external engines (``README.md:44-77``
delegates querying); here they are native distributed plans with exact
integer arithmetic so value-hash gates pin them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import itemsets, ordered, text
from ..operators.graph import (
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_SCALE,
    pagerank_power,
)
from ..operators.sketches import HLL_ALPHA, HLL_HASH_BITS, HLL_P, hll_distinct_by
from ..operators.sampling import duck_hash_mod as _duck_hash_mod
from .relational import t as _t
from .pipeline_queries import t_adaptive as _pta


# --- PageRank over the customer→supplier interaction graph -------------------

_PR_ITERS = 3
_PR_K = 20


def q_pagerank_suppliers(spark, sf_dir):
    """3-iteration integer-exact PageRank on the customer→supplier
    bipartite interaction graph (who bought from whom, via
    orders ⋈ lineitem). Node ids: customers even (2c), suppliers odd
    (2s+1). The oracle unrolls the same integer power iteration."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = o.join(l, o.o_orderkey == l.l_orderkey).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    return pagerank_power(edges, iterations=_PR_ITERS, k=_PR_K)


def _pr_iteration_sql(prev: str, out: str, inflow: str) -> str:
    base = f"({PR_SCALE} * {PR_DAMP_DEN - PR_DAMP_NUM}) // ({PR_DAMP_DEN} * nn.n)"
    return f"""{inflow} AS (
  SELECT e.dst AS node,
         sum((r.rank * {PR_DAMP_NUM}) // ({PR_DAMP_DEN} * d.deg)) AS inflow
  FROM {prev} r JOIN e ON r.node = e.src JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
{out} AS (
  SELECT nodes.node, {base} + coalesce(i.inflow, 0) AS rank
  FROM nodes CROSS JOIN nn LEFT JOIN {inflow} i ON nodes.node = i.node
)"""


ORACLE_PAGERANK = f"""
WITH e AS (
  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
r0 AS (
  SELECT node, {PR_SCALE} // nn.n AS rank FROM nodes CROSS JOIN nn
),
{_pr_iteration_sql("r0", "r1", "i1")},
{_pr_iteration_sql("r1", "r2", "i2")},
{_pr_iteration_sql("r2", "r3", "i3")}
SELECT node, CAST(rank AS BIGINT) AS rank_scaled
FROM r3 ORDER BY rank_scaled DESC, node LIMIT {_PR_K}
"""


# --- frequent item pairs (Apriori 2-phase) ------------------------------------

_FI_MIN_ITEM = 3
_FI_MIN_PAIR = 2
_FI_K = 15


def q_frequent_itemsets(spark, sf_dir):
    """Top co-occurring part pairs within orders, Apriori-pruned to
    items with support >= 3 (_FI_MIN_ITEM) before the quadratic step."""
    li = _t(spark, sf_dir, "lineitem")
    return itemsets.frequent_item_pairs(
        li, "l_orderkey", "l_partkey",
        min_item=_FI_MIN_ITEM, min_pair=_FI_MIN_PAIR, k=_FI_K,
    )


ORACLE_FREQUENT_ITEMSETS = f"""
WITH b AS (
  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
),
freq AS (
  SELECT item FROM b GROUP BY item HAVING count(*) >= {_FI_MIN_ITEM}
),
fb AS (SELECT b.basket, b.item FROM b JOIN freq USING (item)),
p AS (
  SELECT a.item AS item_1, c.item AS item_2,
         CAST(count(*) AS BIGINT) AS pair_support
  FROM fb a JOIN fb c ON a.basket = c.basket AND a.item < c.item
  GROUP BY 1, 2 HAVING count(*) >= {_FI_MIN_PAIR}
)
SELECT * FROM p ORDER BY pair_support DESC, item_1, item_2 LIMIT {_FI_K}
"""


# --- grouped HLL ---------------------------------------------------------------

_GHLL_M = 1 << HLL_P
_GHLL_SUB = HLL_HASH_BITS - HLL_P
_GHLL_EST = (
    f"CAST({HLL_ALPHA!r} AS DOUBLE) * {_GHLL_M} * {_GHLL_M}"
    f" * CAST({1 << 53} AS DOUBLE) / z_scaled"
)


def q_hll_by_type(spark, sf_dir):
    """Distinct users PER event_type via grouped HLL — the per-group
    sketch rollup; the oracle replays every group's registers."""
    return hll_distinct_by(_t(spark, sf_dir, "events"), "event_type", "user_id")


ORACLE_HLL_BY_TYPE = f"""
WITH h AS (
  SELECT event_type,
         {_duck_hash_mod("CAST(user_id AS VARCHAR)", 1 << HLL_HASH_BITS)} AS hv
  FROM events
),
b AS (
  SELECT event_type, hv % {_GHLL_M} AS bucket, hv // {_GHLL_M} AS w FROM h
),
rk AS (
  SELECT event_type, bucket,
         CASE WHEN w = 0 THEN {_GHLL_SUB + 1}
              ELSE {_GHLL_SUB} - length(bin(w)) + 1 END AS rank
  FROM b
),
regs AS (
  SELECT event_type, bucket, max(rank) AS r FROM rk GROUP BY 1, 2
),
agg AS (
  SELECT event_type,
         CAST(sum(CAST(pow(2.0, 53 - r) AS BIGINT))
              + ({_GHLL_M} - count(*)) * {1 << 53} AS BIGINT) AS z_scaled,
         CAST({_GHLL_M} - count(*) AS BIGINT) AS v_empty
  FROM regs GROUP BY event_type
),
ex AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT a.event_type, z_scaled, v_empty, exact_distinct,
       round(CASE WHEN ({_GHLL_EST}) <= 2.5 * {_GHLL_M} AND v_empty > 0
             THEN {_GHLL_M} * ln(CAST({_GHLL_M} AS DOUBLE) / v_empty)
             ELSE ({_GHLL_EST}) END, 6) AS hll_estimate
FROM agg a JOIN ex USING (event_type)
ORDER BY event_type
"""


# --- bigram LM statistics -------------------------------------------------------

_BG_K = 20


def q_bigram_lm(spark, sf_dir):
    """Top corpus bigrams + conditional probability P(w2|w1): zero joins
    over the corpus (self-zipped token slices), exact integer counts."""
    return text.bigram_conditional(_pta(spark, sf_dir, "documents"), k=_BG_K)


ORACLE_BIGRAM_LM = f"""
WITH toks AS (
  SELECT regexp_extract_all(text, '{text.TOKEN_REGEX}') AS l FROM documents
),
bg AS (
  SELECT unnest(l[1:len(l)-1]) AS w1, unnest(l[2:len(l)]) AS w2
  FROM toks WHERE len(l) >= 2
),
pc AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_n FROM bg GROUP BY 1, 2
),
sc AS (
  SELECT w1, w2, pair_n,
         CAST(sum(pair_n) OVER (PARTITION BY w1) AS BIGINT) AS w1_n
  FROM pc
)
SELECT w1, w2, pair_n, w1_n,
       CAST((pair_n * 1000000) // w1_n AS DOUBLE) / 1000000 AS p_cond
FROM sc ORDER BY pair_n DESC, w1, w2 LIMIT {_BG_K}
"""


# --- Markov transition matrix ---------------------------------------------------


def q_markov_transitions(spark, sf_dir):
    """First-order event-type transition matrix over per-user event
    sequences (exact µs ordering, event_id tiebreak)."""
    return ordered.markov_transitions(
        _t(spark, sf_dir, "events"), "user_id", "event_type",
        ["ts_us", "event_id"],
    )


ORACLE_MARKOV = """
WITH seq AS (
  SELECT event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS nxt
  FROM events
),
tr AS (
  SELECT event_type AS state, nxt AS next_state,
         CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
),
sc AS (
  SELECT state, next_state, n,
         CAST(sum(n) OVER (PARTITION BY state) AS BIGINT) AS state_n
  FROM tr
)
SELECT state, next_state, n, state_n,
       CAST((n * 1000000) // state_n AS DOUBLE) / 1000000 AS p
FROM sc ORDER BY state, next_state
"""


# --- item-item cosine co-occurrence (collaborative filtering) -----------------

_CF_MIN_ITEM = 2
_CF_K = 20


def q_cooccurrence_topk(spark, sf_dir):
    """Top part pairs by cosine similarity of their order-incidence
    vectors (item-based CF): exact co-occurrence and degree counts,
    one IEEE division+sqrt per pair, key tiebreaks."""
    li = _t(spark, sf_dir, "lineitem")
    return itemsets.cooccurrence_cosine_topk(
        li, "l_orderkey", "l_partkey", min_item=_CF_MIN_ITEM, k=_CF_K,
    )


ORACLE_COOCCURRENCE = f"""
WITH b AS (
  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
),
deg AS (
  SELECT item, CAST(count(*) AS BIGINT) AS n FROM b
  GROUP BY item HAVING count(*) >= {_CF_MIN_ITEM}
),
fb AS (SELECT b.basket, b.item FROM b JOIN deg USING (item)),
p AS (
  SELECT a.item AS item_1, c.item AS item_2,
         CAST(count(*) AS BIGINT) AS co_count
  FROM fb a JOIN fb c ON a.basket = c.basket AND a.item < c.item
  GROUP BY 1, 2
),
s AS (
  SELECT p.item_1, p.item_2, p.co_count, d1.n AS n_1, d2.n AS n_2,
         CAST(p.co_count AS DOUBLE)
           / sqrt(CAST(d1.n AS DOUBLE) * CAST(d2.n AS DOUBLE)) AS cosine
  FROM p JOIN deg d1 ON p.item_1 = d1.item JOIN deg d2 ON p.item_2 = d2.item
)
SELECT * FROM s ORDER BY cosine DESC, item_1, item_2 LIMIT {_CF_K}
"""


# --- bounded k-core decomposition ----------------------------------------------

_KC_K = 3
_KC_ROUNDS = 4
_KC_MIN_SUP = 2


def q_kcore_parts(spark, sf_dir):
    """4-round 3-core peel of the part co-purchase graph (support ≥ 2):
    the dense backbone left after repeatedly shedding weakly-connected
    parts; the oracle unrolls the same synchronous peeling. The edge
    list comes from the shared Apriori-pruned ``basket_pairs`` pipeline
    (item support ≥ 2 prefilter — lossless for support-≥-2 pairs, and
    the bound that keeps the per-basket self-join from going quadratic
    in the corpus)."""
    from ..operators.graph import kcore_peel

    pairs, _deg = itemsets.basket_pairs(
        _t(spark, sf_dir, "lineitem"), "l_orderkey", "l_partkey",
        min_item=_KC_MIN_SUP,
    )
    edges = pairs.filter(F.col("co_count") >= _KC_MIN_SUP).select(
        F.col("item_1").alias("src"), F.col("item_2").alias("dst")
    )
    return kcore_peel(edges, k=_KC_K, rounds=_KC_ROUNDS)


def _kc_round_sql(prev_alive: str, out_deg: str, out_alive: str) -> str:
    return f"""{out_deg} AS (
  SELECT e.u AS node, CAST(count(*) AS BIGINT) AS deg
  FROM e JOIN {prev_alive} x ON e.u = x.node JOIN {prev_alive} y ON e.v = y.node
  GROUP BY 1
),
{out_alive} AS (SELECT node FROM {out_deg} WHERE deg >= {_KC_K})"""


ORACLE_KCORE = f"""
WITH b AS (
  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
),
e0 AS (
  SELECT a.item AS u, c.item AS v FROM b a JOIN b c
  ON a.basket = c.basket AND a.item < c.item
  GROUP BY 1, 2 HAVING count(*) >= {_KC_MIN_SUP}
),
e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
d1 AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
a1 AS (SELECT node FROM d1 WHERE deg >= {_KC_K}),
{_kc_round_sql("a1", "d2", "a2")},
{_kc_round_sql("a2", "d3", "a3")},
{_kc_round_sql("a3", "d4", "a4")}
SELECT node, deg FROM d4 WHERE deg >= {_KC_K}
"""


# --- Kneser-Ney bigram LM scoring ---------------------------------------------


def q_kneser_ney_score(spark, sf_dir):
    """Interpolated Kneser-Ney bigram perplexity per document — the
    KenLM-style CCNet filter with ZERO float arithmetic: exact-rational
    probabilities (D = 3/4) + integer fixed-point log2 (mantissa
    squaring), so doc scores are commutative BIGINT sums and the oracle
    replays every bit."""
    return text.kneser_ney_bigram_score(_pta(spark, sf_dir, "documents"))


def _oracle_kneser_ney() -> str:
    from ..functions.fixedpoint import ilog2_fp_duck_ctes

    dn, dd = text.KN_DISC_NUM, text.KN_DISC_DEN
    return f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, regexp_extract_all(text, '{text.TOKEN_REGEX}') AS l
  FROM documents
),
bg AS (
  SELECT doc_id, unnest(l[1:len(l)-1]) AS w1, unnest(l[2:len(l)]) AS w2
  FROM toks WHERE len(l) >= 2
),
dp AS (
  SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS c_doc
  FROM bg GROUP BY 1, 2, 3
),
pc AS (SELECT w1, w2, CAST(sum(c_doc) AS BIGINT) AS c12 FROM dp GROUP BY 1, 2),
lf AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
              CAST(count(*) AS BIGINT) AS n1fw FROM pc GROUP BY 1),
rt AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1bw FROM pc GROUP BY 1),
tt AS (SELECT CAST(count(*) AS BIGINT) AS n1pp FROM pc),
nd AS (
  SELECT pc.w1, pc.w2,
         CAST(greatest({dd} * c12 - {dn}, 0) * CAST(n1pp AS HUGEINT)
              + {dn} * n1fw * CAST(n1bw AS HUGEINT) AS BIGINT) AS nm,
         CAST({dd} * c1 * CAST(n1pp AS HUGEINT) AS BIGINT) AS dns
  FROM pc JOIN lf USING (w1) JOIN rt USING (w2), tt
),
{ilog2_fp_duck_ctes("lg", "nd", ["w1", "w2"], {"fden": "dns", "fnum": "nm"})},
st AS (SELECT w1, w2, fden - fnum AS cost_fp FROM lg),
per AS (
  SELECT dp.doc_id, CAST(sum(c_doc) AS BIGINT) AS nb,
         CAST(sum(c_doc * cost_fp) AS BIGINT) AS tc
  FROM dp JOIN st USING (w1, w2) GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(nb, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(tc, 0) AS BIGINT) AS total_cost_fp,
       CASE WHEN nb IS NULL OR nb = 0 THEN NULL
            ELSE CAST((tc * 1000) // (nb * 65536) AS BIGINT)
       END AS bits_per_bigram_milli
FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
"""


MINING_QUERIES = {
    "pagerank_suppliers": (q_pagerank_suppliers, ORACLE_PAGERANK),
    "kneser_ney_score": (q_kneser_ney_score, _oracle_kneser_ney()),
    "frequent_itemsets": (q_frequent_itemsets, ORACLE_FREQUENT_ITEMSETS),
    "hll_by_type": (q_hll_by_type, ORACLE_HLL_BY_TYPE),
    "bigram_lm": (q_bigram_lm, ORACLE_BIGRAM_LM),
    "markov_transitions": (q_markov_transitions, ORACLE_MARKOV),
    "cooccurrence_topk": (q_cooccurrence_topk, ORACLE_COOCCURRENCE),
    "kcore_parts": (q_kcore_parts, ORACLE_KCORE),
}
