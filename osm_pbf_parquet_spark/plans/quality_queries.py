"""Round-6 quality & traversal suite: bounded graph traversal (the
recursive-query capability), exact triangle counting, blocked fuzzy
string matching, one-pass column profiling, rule-based data-quality
validation, robust MAD outliers, and chi-square independence — each a
(Spark plan, DuckDB oracle) gate pair over the shared test tables.

Reference context: the reference validates its output with a
differential checker (``osm-pbf-parquet/test/validate.py:57-217``) and
resolves reference graphs one level deep (way→node, relation→member);
profile/dq generalize the former into reusable operators, bfs/triangles
the latter into arbitrary-depth traversal. The oracle side exercises
DuckDB's recursive CTEs — the one query class the suite didn't cover.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.fuzzy import blocked_levenshtein_topk
from ..operators.graph import bfs_hops, label_propagation, triangle_count
from ..operators.quality import (
    chi_square_cells,
    dq_counts,
    mad_outliers,
    profile_table,
)
from .relational import t as _t


# --- bounded BFS (recursive traversal) ----------------------------------------

_BFS_HOPS = 3
_BFS_NATION = 0


def q_shortest_hops(spark, sf_dir):
    """Minimum hop count from nation-0 suppliers over the undirected
    customer↔supplier interaction graph (who traded with whom), depth 3.
    Node ids: customers even (2c), suppliers odd (2s+1). The oracle is a
    recursive CTE; the engine side is level-synchronous frontier joins."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # r12: DISTINCT the directed pairs before symmetrizing, and emit
    # both directions in ONE projection (explode of a 2-struct array)
    # instead of a self-union. The pre-r12 form fed bfs_hops the raw
    # 2×|o⋈l| edge multiset (11.7M rows, 99.4 MB distinct-shuffle at
    # the 10× tier); BFS is set-semantic, so dedup'ing the 5.87M
    # directed pairs first (map-side-combinable) and doubling the
    # ~587k survivors is the same graph at a twentieth of the shuffle.
    eb = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = eb.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                ),
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst")
    sources = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == _BFS_NATION)
        .select((F.col("s_suppkey") * 2 + 1).alias("node"))
    )
    # assume_distinct: eb is distinct'd and src (even) / dst (odd) live in
    # disjoint id spaces, so the two symmetrized direction images cannot
    # collide — the edge set is distinct by construction and bfs_hops's
    # defensive re-dedup would re-exchange all 1.17M rows for nothing.
    return bfs_hops(edges, sources, max_hops=_BFS_HOPS, assume_distinct=True)


ORACLE_SHORTEST_HOPS = f"""
WITH RECURSIVE eb AS (
  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
e AS (SELECT src, dst FROM eb UNION SELECT dst, src FROM eb),
walk(node, hops) AS (
  SELECT s_suppkey * 2 + 1, 0 FROM supplier WHERE s_nationkey = {_BFS_NATION}
  UNION
  SELECT e.dst, w.hops + 1 FROM walk w JOIN e ON w.node = e.src
  WHERE w.hops < {_BFS_HOPS}
)
SELECT node, CAST(min(hops) AS INT) AS hops FROM walk GROUP BY node
"""


# --- triangle counting ----------------------------------------------------------

_TRI_MIN_SUP = 2
_LPA_ROUNDS = 3


def q_label_communities(spark, sf_dir):
    """Label-propagation communities over the undirected customer ↔
    supplier interaction graph (same node encoding as shortest_hops:
    customers even, suppliers odd) — 3 deterministic synchronous rounds,
    smallest-label tie-break. DISTINCT edges: duplicate order lines must
    not weight neighbor votes."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    eb = o.join(l, o.o_orderkey == l.l_orderkey).select(
        (F.col("o_custkey") * 2).cast("long").alias("src"),
        (F.col("l_suppkey") * 2 + 1).cast("long").alias("dst"),
    ).distinct()
    edges = eb.unionByName(
        eb.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return label_propagation(edges, rounds=_LPA_ROUNDS)


def _lpa_ctes() -> str:
    """Shared LPA oracle body: distinct symmetric edges + unrolled
    synchronous rounds; final labels in l{_LPA_ROUNDS}."""
    rounds = []
    for r in range(1, _LPA_ROUNDS + 1):
        rounds.append(f"""
c{r} AS (SELECT e.src AS node, l.lbl AS lbl, count(*) AS cnt
         FROM e JOIN l{r - 1} l ON l.node = e.dst GROUP BY 1, 2),
p{r} AS (SELECT node, lbl FROM (
           SELECT node, lbl, row_number() OVER (PARTITION BY node
                  ORDER BY cnt DESC, lbl) AS rk FROM c{r}) WHERE rk = 1),
l{r} AS (SELECT l.node, coalesce(p.lbl, l.lbl) AS lbl
         FROM l{r - 1} l LEFT JOIN p{r} p ON p.node = l.node)""")
    return f"""eb AS (
  SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
                  CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
e AS (SELECT src, dst FROM eb UNION SELECT dst, src FROM eb),
l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e),{",".join(rounds)}"""


def _oracle_label_communities() -> str:
    return f"""
WITH {_lpa_ctes()}
SELECT node, CAST(lbl AS BIGINT) AS community FROM l{_LPA_ROUNDS}
"""


def q_community_modularity(spark, sf_dir):
    """Newman modularity per LPA community — the quality readout of the
    partition (composes label_communities the way dedup_resolve composes
    the dedup gates): exact integer sufficient statistics, one float
    composition per community."""
    from ..operators.graph import community_modularity

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    eb = o.join(l, o.o_orderkey == l.l_orderkey).select(
        (F.col("o_custkey") * 2).cast("long").alias("src"),
        (F.col("l_suppkey") * 2 + 1).cast("long").alias("dst"),
    ).distinct()
    # r12 optimization round: the symmetrized edge list feeds BOTH the
    # modularity readout and the LPA rounds — un-persisted, each
    # consumer (and each broadcast build inside them) re-derived the
    # orders ⋈ lineitem extraction. One caller-level persist, released
    # with the result.
    from ..functions.caching import owned_set, tie_release

    ps, owned = owned_set(None)
    edges = ps.persist(eb.unionByName(
        eb.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ))
    edges.count()
    return tie_release(
        community_modularity(
            edges, label_propagation(edges, rounds=_LPA_ROUNDS, cache=ps)
        ),
        ps, owned,
    )


def _oracle_community_modularity() -> str:
    return f"""
WITH {_lpa_ctes()},
tot AS (SELECT CAST(count(*) AS HUGEINT) AS d_total FROM e),
lab AS (SELECT node, lbl AS c FROM l{_LPA_ROUNDS}),
w AS (SELECT ls.c AS community, CAST(count(*) AS HUGEINT) AS w_d
      FROM e JOIN lab ls ON ls.node = e.src
             JOIN lab ld ON ld.node = e.dst
      WHERE ls.c = ld.c GROUP BY 1),
deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY 1),
ds AS (SELECT lab.c AS community, CAST(sum(deg.deg) AS HUGEINT) AS s_c,
              CAST(count(*) AS BIGINT) AS n_nodes
       FROM deg JOIN lab ON lab.node = deg.node GROUP BY 1)
SELECT ds.community, ds.n_nodes,
       CAST(coalesce(w.w_d, 0) // 2 AS BIGINT) AS internal_edges,
       CAST(ds.s_c AS BIGINT) AS degree_sum,
       round(CAST(coalesce(w.w_d, 0) * t.d_total - ds.s_c * ds.s_c AS DOUBLE)
             / CAST(t.d_total * t.d_total AS DOUBLE), 9) AS q_contrib
FROM ds LEFT JOIN w ON w.community = ds.community CROSS JOIN tot t
"""


_LOUVAIN_ROUNDS = 2


def q_louvain_communities(spark, sf_dir):
    """Louvain phase-1 local moves over the same customer ↔ supplier
    graph LPA partitions — 2 synchronous rounds of exact-integer
    modularity-gain argmax (Blondel et al. 2008), the move rule that
    optimizes the objective community_modularity reads out. Oracle
    unrolls both rounds: gains in HUGEINT, argmax by (gain DESC, com),
    move iff gain > 0."""
    from ..operators.graph import louvain_move_rounds

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    eb = o.join(l, o.o_orderkey == l.l_orderkey).select(
        (F.col("o_custkey") * 2).cast("long").alias("src"),
        (F.col("l_suppkey") * 2 + 1).cast("long").alias("dst"),
    ).distinct()
    edges = eb.unionByName(
        eb.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return louvain_move_rounds(edges, rounds=_LOUVAIN_ROUNDS)


def _louvain_round_sql(prev: str, r: int) -> str:
    return f"""
cd{r} AS MATERIALIZED (SELECT p.com, CAST(sum(d.k) AS HUGEINT) AS s_c,
                 CAST(count(*) AS BIGINT) AS n_c
          FROM {prev} p JOIN deg d ON d.node = p.node GROUP BY 1),
ki{r} AS MATERIALIZED (SELECT e.src AS node, p.com, CAST(count(*) AS BIGINT) AS cnt
          FROM e JOIN {prev} p ON p.node = e.dst GROUP BY 1, 2),
kia{r} AS MATERIALIZED (SELECT k.node,
                  CAST(sum(CASE WHEN k.com = c.com THEN k.cnt ELSE 0 END)
                       AS BIGINT) AS k_ia
           FROM ki{r} k JOIN {prev} c ON c.node = k.node GROUP BY 1),
g{r} AS MATERIALIZED (SELECT k.node, c.com AS a, k.com, sc.n_c AS n_cand,
                sa.n_c AS n_own,
                t.d_total * (k.cnt - i.k_ia)
                  - d.k * (sc.s_c - sa.s_c + d.k) AS gain
         FROM ki{r} k
         JOIN {prev} c ON c.node = k.node
         JOIN kia{r} i ON i.node = k.node
         JOIN deg d ON d.node = k.node
         JOIN cd{r} sc ON sc.com = k.com
         JOIN cd{r} sa ON sa.com = c.com
         CROSS JOIN dt t
         WHERE k.com != c.com),
p{r} AS MATERIALIZED (SELECT node, com, gain, n_cand, n_own FROM (
           SELECT node, com, gain, n_cand, n_own,
                  row_number() OVER (PARTITION BY node
                                     ORDER BY gain DESC, com) AS rk
           FROM g{r}) WHERE rk = 1),
a{r} AS MATERIALIZED (SELECT c.node,
                CAST(CASE WHEN p.gain > 0
                          AND NOT (p.n_own = 1 AND p.n_cand = 1
                                   AND p.com > c.com)
                     THEN p.com ELSE c.com END AS BIGINT) AS com
         FROM {prev} c LEFT JOIN p{r} p ON p.node = c.node)"""


def _oracle_louvain_communities() -> str:
    rounds = ",".join(
        _louvain_round_sql(f"a{r - 1}", r)
        for r in range(1, _LOUVAIN_ROUNDS + 1)
    )
    return f"""
WITH eb AS (
  SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
                  CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
e AS MATERIALIZED (SELECT src, dst FROM eb UNION SELECT dst, src FROM eb),
deg AS MATERIALIZED (SELECT src AS node, CAST(count(*) AS BIGINT) AS k
        FROM e GROUP BY 1),
dt AS MATERIALIZED (SELECT CAST(count(*) AS HUGEINT) AS d_total FROM e),
a0 AS MATERIALIZED (SELECT node, node AS com FROM deg),{rounds}
SELECT node, com AS community FROM a{_LOUVAIN_ROUNDS}
"""


def q_louvain_coarse_graph(spark, sf_dir):
    """Louvain phase-2 contraction of the move-round partition: the
    community supernode multigraph (weights = directed edge counts,
    self-loops = intra-community mass) — the multi-level step that
    makes the next level community-count-sized. Composes
    louvain_communities the way community_modularity composes LPA."""
    from ..operators.graph import louvain_coarsen, louvain_move_rounds

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    eb = o.join(l, o.o_orderkey == l.l_orderkey).select(
        (F.col("o_custkey") * 2).cast("long").alias("src"),
        (F.col("l_suppkey") * 2 + 1).cast("long").alias("dst"),
    ).distinct()
    # r12 optimization round: same caller-level persist as
    # q_community_modularity — contraction and move rounds otherwise
    # each re-derive the edge extraction
    from ..functions.caching import owned_set, tie_release

    ps, owned = owned_set(None)
    edges = ps.persist(eb.unionByName(
        eb.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ))
    edges.count()
    return tie_release(
        louvain_coarsen(
            edges, louvain_move_rounds(edges, rounds=_LOUVAIN_ROUNDS,
                                       cache=ps)
        ),
        ps, owned,
    )


def _oracle_louvain_coarse() -> str:
    rounds = ",".join(
        _louvain_round_sql(f"a{r - 1}", r)
        for r in range(1, _LOUVAIN_ROUNDS + 1)
    )
    return f"""
WITH eb AS (
  SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
                  CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
e AS MATERIALIZED (SELECT src, dst FROM eb UNION SELECT dst, src FROM eb),
deg AS MATERIALIZED (SELECT src AS node, CAST(count(*) AS BIGINT) AS k
        FROM e GROUP BY 1),
dt AS MATERIALIZED (SELECT CAST(count(*) AS HUGEINT) AS d_total FROM e),
a0 AS MATERIALIZED (SELECT node, node AS com FROM deg),{rounds}
SELECT ls.com AS c_src, ld.com AS c_dst,
       CAST(count(*) AS BIGINT) AS weight
FROM e JOIN a{_LOUVAIN_ROUNDS} ls ON ls.node = e.src
       JOIN a{_LOUVAIN_ROUNDS} ld ON ld.node = e.dst
GROUP BY 1, 2
"""


def q_triangle_count(spark, sf_dir):
    """Triangles in the part co-purchase graph (parts co-occurring in
    ≥2 orders). Edge build reuses the Apriori item-support prefilter
    (lossless: pair support ≤ item support); counting is degree-oriented
    so wedge enumeration is bounded by min-degrees even on power-law
    graphs."""
    b = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item"))
        .distinct()
    )
    freq = (
        b.groupBy("item").agg(F.count("*").alias("n"))
        .filter(F.col("n") >= _TRI_MIN_SUP).select("item")
    )
    fb = b.join(freq, "item")
    a = fb.select(F.col("basket"), F.col("item").alias("u"))
    c = fb.select(F.col("basket"), F.col("item").alias("v"))
    edges = (
        a.join(c, "basket")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("sup"))
        .filter(F.col("sup") >= _TRI_MIN_SUP)
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
    )
    return triangle_count(edges)


ORACLE_TRIANGLE_COUNT = f"""
WITH b AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem),
freq AS (SELECT item FROM b GROUP BY item HAVING count(*) >= {_TRI_MIN_SUP}),
fb AS (SELECT b.basket, b.item FROM b JOIN freq USING (item)),
e AS (
  SELECT a.item AS u, c.item AS v FROM fb a JOIN fb c
  ON a.basket = c.basket AND a.item < c.item
  GROUP BY 1, 2 HAVING count(*) >= {_TRI_MIN_SUP}
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes
       FROM (SELECT u FROM e UNION SELECT v FROM e)),
ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
        FROM e x JOIN e y ON x.v = y.u JOIN e z ON z.u = x.u AND z.v = y.v)
SELECT n_nodes, n_edges, n_triangles FROM nn, ne, tri
"""


# --- blocked fuzzy match --------------------------------------------------------

_FZ_K = 25
_FZ_LEN = 15


def q_fuzzy_name_match(spark, sf_dir):
    """Top-25 most-similar part-name pairs within brand blocks by exact
    Levenshtein distance — entity-resolution candidate generation with
    a lossless length prefilter; ties broken on keys."""
    return blocked_levenshtein_topk(
        _t(spark, sf_dir, "part"), "p_partkey", "p_name", "p_brand",
        k=_FZ_K, max_len_diff=_FZ_LEN,
    )


ORACLE_FUZZY_NAME_MATCH = f"""
WITH p AS (
  SELECT a.p_partkey AS key_1, b.p_partkey AS key_2,
         a.p_name AS name_1, b.p_name AS name_2,
         CAST(levenshtein(a.p_name, b.p_name) AS INT) AS distance
  FROM part a JOIN part b
    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
  WHERE abs(length(a.p_name) - length(b.p_name)) <= {_FZ_LEN}
)
SELECT * FROM p ORDER BY distance, key_1, key_2 LIMIT {_FZ_K}
"""


# --- one-pass column profiling ---------------------------------------------------

_PROFILE_SPECS = [
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "money"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def q_profile_table(spark, sf_dir):
    """Full column profile of ``orders`` in one aggregation pass:
    rows/nulls/exact-distincts/min/max per column, numerics canonicalized
    to BIGINT (cents, epoch µs) before ordering."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return profile_table(_t(spark, sf_dir, "orders"), _PROFILE_SPECS)


def _profile_oracle_row(col: str, kind: str) -> str:
    if kind == "money":
        v = f"CAST(round({col} * 100) AS BIGINT)"
    elif kind == "ts":
        v = f"epoch_us({col})"
    elif kind == "int":
        v = f"CAST({col} AS BIGINT)"
    else:
        v = col
    return f"""SELECT '{col}' AS col_name,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(coalesce(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_null,
  CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
  CAST(min({v}) AS VARCHAR) AS min_repr,
  CAST(max({v}) AS VARCHAR) AS max_repr
FROM orders"""


ORACLE_PROFILE_TABLE = "\nUNION ALL\n".join(
    _profile_oracle_row(c, k) for c, k in _PROFILE_SPECS
)


# --- rule-based data-quality validation ------------------------------------------


def q_dq_checks(spark, sf_dir):
    """Constraint-violation counts: five lineitem rules (incl. the
    cross-table temporal rule ship-before-order and FK orphans via one
    LEFT join) in one pass, plus two dimension-table balance rules —
    three scans total for seven rules."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lo = li.join(o, li.l_orderkey == o.o_orderkey, "left")
    line_rules = dq_counts(lo, [
        ("ship_before_order", F.col("l_shipdate") < F.col("o_orderdate")),
        ("fk_orphan_lineitem", F.col("o_orderkey").isNull()),
        ("nonpositive_qty", F.col("l_quantity") <= 0),
        ("discount_range", (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)),
        ("negative_tax", F.col("l_tax") < 0),
    ])
    cust_rules = dq_counts(
        _t(spark, sf_dir, "customer"),
        [("neg_acctbal_customer", F.col("c_acctbal") < 0)],
    )
    supp_rules = dq_counts(
        _t(spark, sf_dir, "supplier"),
        [("neg_acctbal_supplier", F.col("s_acctbal") < 0)],
    )
    return line_rules.unionByName(cust_rules).unionByName(supp_rules)


ORACLE_DQ_CHECKS = """
WITH lo AS (
  SELECT l.*, o.o_orderkey AS ok, o.o_orderdate AS od
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT 'ship_before_order' AS rule,
       CAST(coalesce(sum(CASE WHEN l_shipdate < od THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_violations,
       CAST(count(*) AS BIGINT) AS n_checked FROM lo
UNION ALL
SELECT 'fk_orphan_lineitem',
       CAST(coalesce(sum(CASE WHEN ok IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
       CAST(count(*) AS BIGINT) FROM lo
UNION ALL
SELECT 'nonpositive_qty',
       CAST(coalesce(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END), 0) AS BIGINT),
       CAST(count(*) AS BIGINT) FROM lo
UNION ALL
SELECT 'discount_range',
       CAST(coalesce(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END), 0) AS BIGINT),
       CAST(count(*) AS BIGINT) FROM lo
UNION ALL
SELECT 'negative_tax',
       CAST(coalesce(sum(CASE WHEN l_tax < 0 THEN 1 ELSE 0 END), 0) AS BIGINT),
       CAST(count(*) AS BIGINT) FROM lo
UNION ALL
SELECT 'neg_acctbal_customer',
       CAST(coalesce(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END), 0) AS BIGINT),
       CAST(count(*) AS BIGINT) FROM customer
UNION ALL
SELECT 'neg_acctbal_supplier',
       CAST(coalesce(sum(CASE WHEN s_acctbal < 0 THEN 1 ELSE 0 END), 0) AS BIGINT),
       CAST(count(*) AS BIGINT) FROM supplier
"""


# --- robust MAD outliers ----------------------------------------------------------

_MAD_K = 8


def q_mad_outliers(spark, sf_dir):
    """Per-(segment, priority) robust outlier counts on order totals:
    |x − median| > 8·MAD, entirely in scaled integers (med×2, MAD×4) so
    no interpolation or float enters the verdict."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_orderpriority").alias("prio"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return mad_outliers(base, ["seg", "prio"], "cents", k=_MAD_K)


ORACLE_MAD_OUTLIERS = f"""
WITH base AS (
  SELECT c_mktsegment AS seg, o_orderpriority AS prio,
         CAST(round(o_totalprice * 100) AS BIGINT) AS x
  FROM orders JOIN customer ON o_custkey = c_custkey
),
r1 AS (
  SELECT seg, prio, x,
         row_number() OVER (PARTITION BY seg, prio ORDER BY x) AS rn,
         count(*) OVER (PARTITION BY seg, prio) AS n
  FROM base
),
med AS (
  SELECT seg, prio,
         CAST(sum(x * CASE WHEN (n + 1) // 2 = n // 2 + 1 THEN 2 ELSE 1 END) AS BIGINT) AS med_x2,
         CAST(max(n) AS BIGINT) AS n
  FROM r1 WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1 GROUP BY 1, 2
),
dev AS (
  SELECT b.seg, b.prio, m.med_x2, m.n, abs(b.x * 2 - m.med_x2) AS d2
  FROM base b JOIN med m ON b.seg = m.seg AND b.prio = m.prio
),
r2 AS (
  SELECT seg, prio, d2,
         row_number() OVER (PARTITION BY seg, prio ORDER BY d2) AS rn,
         count(*) OVER (PARTITION BY seg, prio) AS nn
  FROM dev
),
mad AS (
  SELECT seg, prio,
         CAST(sum(d2 * CASE WHEN (nn + 1) // 2 = nn // 2 + 1 THEN 2 ELSE 1 END) AS BIGINT) AS mad_x4
  FROM r2 WHERE rn = (nn + 1) // 2 OR rn = nn // 2 + 1 GROUP BY 1, 2
)
SELECT d.seg, d.prio, CAST(max(d.n) AS BIGINT) AS n,
       CAST(max(d.med_x2) AS BIGINT) AS med_x2,
       CAST(max(m.mad_x4) AS BIGINT) AS mad_x4,
       CAST(sum(CASE WHEN d.d2 * 2 > {_MAD_K} * m.mad_x4 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m ON d.seg = m.seg AND d.prio = m.prio
GROUP BY d.seg, d.prio
"""


# --- chi-square independence -------------------------------------------------------

_CHI_HOUR_US = 3_600_000_000


def q_chi_square_assoc(spark, sf_dir):
    """Chi-square table for event_type × hour-of-day: exact BIGINT
    contingency + marginals; the single per-cell division is the only
    float op and is IEEE-identical cross-engine (both sides divide the
    same int64-derived doubles), so no rounding is needed."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"(ts_us div {_CHI_HOUR_US}) % 24").cast("long").alias("hour"),
    )
    return chi_square_cells(e, "event_type", "hour")


ORACLE_CHI_SQUARE = f"""
WITH d AS (
  SELECT event_type,
         CAST((epoch_us(ts) // {_CHI_HOUR_US}) % 24 AS BIGINT) AS hour
  FROM events
),
cells AS (
  SELECT event_type, hour, CAST(count(*) AS BIGINT) AS observed
  FROM d GROUP BY 1, 2
),
m AS (
  SELECT event_type, hour, observed,
         CAST(sum(observed) OVER (PARTITION BY event_type) AS BIGINT) AS row_total,
         CAST(sum(observed) OVER (PARTITION BY hour) AS BIGINT) AS col_total,
         CAST(sum(observed) OVER () AS BIGINT) AS grand_total
  FROM cells
)
SELECT event_type, hour, observed, row_total, col_total,
       (CAST(observed * grand_total - row_total * col_total AS DOUBLE)
        * CAST(observed * grand_total - row_total * col_total AS DOUBLE))
       / (CAST(grand_total AS DOUBLE) * CAST(row_total AS DOUBLE)
          * CAST(col_total AS DOUBLE)) AS contrib
FROM m
"""
# NOTE: the denominator casts each marginal to DOUBLE before multiplying,
# mirroring quality.chi_square_cells — N·R·C formed in BIGINT wraps
# (Spark, non-ANSI) or aborts (DuckDB) around N ~ 2e6, so both engines
# take the identical left-to-right IEEE-double product instead.


# --- EWMA smoothing (time-series family) --------------------------------------

_EWMA_W = 16


def q_ewma_smooth(spark, sf_dir):
    """Per-user exponential smoothing (α=1/2) of event values over the
    trailing 16 observations — the recursive filter linearized to an
    exact integer weighted sum (U = EWMA·2^n), so the oracle replays it
    with plain window arithmetic."""
    from ..operators.ordered import ewma_smooth

    e = _t(spark, sf_dir, "events").select(
        "user_id", "ts_us", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return ewma_smooth(e, "user_id", ["ts_us", "event_id"], "cents",
                       window_last=_EWMA_W)


ORACLE_EWMA = f"""
WITH base AS (
  SELECT user_id, epoch_us(ts) AS tsu, event_id,
         CAST(round(value * 100) AS BIGINT) AS x
  FROM events
),
rd AS (
  SELECT user_id, tsu, event_id, x,
         row_number() OVER (
           PARTITION BY user_id ORDER BY tsu DESC, event_id DESC
         ) AS rdn
  FROM base
),
rc AS (
  SELECT user_id, x,
         row_number() OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS i
  FROM rd WHERE rdn <= {_EWMA_W}
),
w AS (
  SELECT user_id,
         CASE WHEN i = 1 THEN x * 2 ELSE x * (1::BIGINT << (i - 1)) END AS wv
  FROM rc
)
SELECT user_id, CAST(count(*) AS INT) AS n_used,
       CAST(sum(wv) AS BIGINT) AS ewma_u,
       CAST(sum(wv) AS DOUBLE)
         / CAST((1::BIGINT << CAST(count(*) AS INT)) AS DOUBLE) AS ewma
FROM w GROUP BY user_id
"""


# --- HLL set algebra ---------------------------------------------------------------


def q_hll_set_ops(spark, sf_dir):
    """Audience overlap from sketches: click users vs purchase users —
    |A|, |B|, |A∪B| via register-wise-max merge (no second data pass)
    and |A∩B| by inclusion-exclusion; the oracle replays all three
    register sets bit-for-bit."""
    from ..operators.sketches import hll_set_algebra

    e = _t(spark, sf_dir, "events")
    return hll_set_algebra(
        e, "user_id",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    )


def _hll_oracle_parts():
    from ..operators.sketches import HLL_ALPHA, HLL_HASH_BITS, HLL_P
    from ..operators.sampling import duck_hash_mod

    m = 1 << HLL_P
    sub = HLL_HASH_BITS - HLL_P
    hv = duck_hash_mod("CAST(user_id AS VARCHAR)", 1 << HLL_HASH_BITS)
    # coalesce: a side with ZERO matching rows must yield the all-empty
    # sketch (z = m·2^53, v = m) like Spark's spine fill, not NULL
    fin = lambda src, tag: f"""
f{tag} AS (
  SELECT CAST(coalesce(sum(CAST(pow(2.0, 53 - r) AS BIGINT)), 0)
              + ({m} - count(*)) * {1 << 53} AS BIGINT) AS z_{tag},
         CAST({m} - count(*) AS BIGINT) AS v_{tag}
  FROM {src}
)"""
    est = lambda tag: (
        f"CAST({HLL_ALPHA!r} AS DOUBLE) * {m} * {m}"
        f" * CAST({1 << 53} AS DOUBLE) / z_{tag}"
    )
    rnd = lambda tag: (
        f"round(CASE WHEN ({est(tag)}) <= 2.5 * {m} AND v_{tag} > 0 "
        f"THEN {m} * ln(CAST({m} AS DOUBLE) / v_{tag}) "
        f"ELSE ({est(tag)}) END, 6)"
    )
    return m, sub, hv, fin, rnd


def _build_hll_set_ops_oracle() -> str:
    m, sub, hv, fin, rnd = _hll_oracle_parts()
    return f"""
WITH s AS (
  SELECT CASE WHEN event_type = 'click' THEN 'a' ELSE 'b' END AS side,
         {hv} AS hvv
  FROM events WHERE event_type IN ('click', 'purchase')
),
b AS (SELECT side, hvv % {m} AS bucket, hvv // {m} AS w FROM s),
rk AS (
  SELECT side, bucket,
         CASE WHEN w = 0 THEN {sub + 1}
              ELSE {sub} - length(bin(w)) + 1 END AS rank
  FROM b
),
regs AS (SELECT side, bucket, max(rank) AS r FROM rk GROUP BY 1, 2),
regs_u AS (SELECT bucket, max(r) AS r FROM regs GROUP BY 1),
{fin("(SELECT r FROM regs WHERE side = 'a')", "a")},
{fin("(SELECT r FROM regs WHERE side = 'b')", "b")},
{fin("regs_u", "union")},
ex AS (
  SELECT CAST(count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS BIGINT) AS exact_a,
         CAST(count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS BIGINT) AS exact_b,
         CAST(count(DISTINCT CASE WHEN event_type IN ('click', 'purchase') THEN user_id END) AS BIGINT) AS exact_union
  FROM events
),
est AS (
  SELECT z_a, v_a, exact_a, {rnd("a")} AS est_a,
         z_b, v_b, exact_b, {rnd("b")} AS est_b,
         z_union, v_union, exact_union, {rnd("union")} AS est_union
  FROM fa, fb, funion, ex
)
SELECT *, round(est_a + est_b - est_union, 6) AS est_intersection,
       CAST(exact_a + exact_b - exact_union AS BIGINT) AS exact_intersection
FROM est
"""


# --- streaming DQ monitor ----------------------------------------------------------

_DQ_WIN_US = 21_600_000_000  # 6 hours


def q_stream_dq_monitor(spark, sf_dir):
    """Data-quality rules ON A STREAM: per 6-hour tumbling event-time
    window, violation counts for three rules — the conditional
    aggregates are map-side combinable so the batch operator runs
    unchanged under readStream (streaming/batch unification); on static
    input the result is exactly the batch GROUP BY the oracle pins."""
    from ..operators.quality import dq_counts
    from .analytic_queries import _event_stream, _run_stream_to_table

    s = _event_stream(spark, sf_dir)
    w = (
        s.withColumn("win", F.window("event_time", "6 hours"))
        .withColumn("window_start", F.col("win.start"))
    )
    dq = dq_counts(w, [
        ("high_value", F.col("value") > 300),
        ("nonpositive_value", F.col("value") <= 0),
        ("null_props", F.col("props").isNull()),
    ], group_by=["window_start"])
    return _run_stream_to_table(spark, dq, "stream_dq_result", "complete")


ORACLE_STREAM_DQ = f"""
WITH w AS (
  SELECT make_timestamp(epoch_us(ts) // {_DQ_WIN_US} * {_DQ_WIN_US}) AS window_start,
         value, props
  FROM events
),
g AS (
  SELECT window_start, CAST(count(*) AS BIGINT) AS n,
         CAST(coalesce(sum(CASE WHEN value > 300 THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_high,
         CAST(coalesce(sum(CASE WHEN value <= 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_nonpos,
         CAST(coalesce(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_nullp
  FROM w GROUP BY window_start
)
SELECT window_start, 'high_value' AS rule, v_high AS n_violations, n AS n_checked FROM g
UNION ALL
SELECT window_start, 'nonpositive_value', v_nonpos, n FROM g
UNION ALL
SELECT window_start, 'null_props', v_nullp, n FROM g
"""


# --- per-group OLS trend ------------------------------------------------------------


def q_group_regression(spark, sf_dir):
    """Per-segment OLS trend of order value (cents) over order date
    (epoch days): exact BIGINT/decimal(38,0) moments in ONE combinable
    aggregation; only the final slope/intercept divisions are floats
    (fixed three-flop composition — bit-reproducible)."""
    from ..operators.quality import group_regression

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return group_regression(base, ["seg"], "day", "cents")


ORACLE_GROUP_REGRESSION = """
WITH base AS (
  SELECT c_mktsegment AS seg,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
         CAST(round(o_totalprice * 100) AS BIGINT) AS y
  FROM orders JOIN customer ON o_custkey = c_custkey
),
m AS (
  SELECT seg, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx
  FROM base WHERE x IS NOT NULL AND y IS NOT NULL GROUP BY seg
),
s AS (
  SELECT seg, n, sx, sy,
         n * sxy - sx * sy AS cov, n * sxx - sx * sx AS var
  FROM m
)
SELECT seg, n,
       CASE WHEN var <> 0
            THEN CAST(cov AS DOUBLE) / CAST(var AS DOUBLE) END AS slope,
       CASE WHEN var <> 0
            THEN (CAST(sy AS DOUBLE)
                  - (CAST(cov AS DOUBLE) / CAST(var AS DOUBLE))
                    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) END AS intercept
FROM s
"""


# --- exact distributed quantiles ---------------------------------------------------

_EQ_QS = [(1, 4), (1, 2), (9, 10), (99, 100)]


def q_exact_quantiles(spark, sf_dir):
    """Exact k-th-element quantiles of lineitem price cents via two-pass
    integer bucket selection (no global sort; only the covering bin's
    rows are ranked). Quantiles are exact rationals so the target ranks
    are integer arithmetic end-to-end."""
    from ..operators.sketches import exact_quantiles

    li = _t(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    return exact_quantiles(li, "cents", _EQ_QS)


ORACLE_EXACT_QUANTILES = f"""
WITH v AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS x
  FROM lineitem WHERE l_extendedprice IS NOT NULL
),
r AS (SELECT x, row_number() OVER (ORDER BY x) AS rn FROM v),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
qs(q_num, q_den) AS (VALUES {", ".join(f"({a}, {b})" for a, b in _EQ_QS)}),
sel AS (
  SELECT CAST(q_num AS BIGINT) AS q_num, CAST(q_den AS BIGINT) AS q_den,
         CAST(q_num AS DOUBLE) / q_den AS q, nn.n,
         (nn.n - 1) * q_num // q_den + 1 AS k
  FROM qs, nn
)
SELECT s.q_num, s.q_den, s.q, s.n,
       CAST(s.k AS BIGINT) AS target_rank, r.x AS value
FROM sel s JOIN r ON r.rn = s.k
"""


# --- hashing-trick featurization ----------------------------------------------------

_FH_DIM = 64


def q_feature_hashing(spark, sf_dir):
    """Signed hashing-trick featurizer over the document corpus: sparse
    (doc, dim, value) cells from exact integer sign sums — fixed 64-dim
    output regardless of vocabulary size."""
    from ..operators.features import feature_hashing

    return feature_hashing(
        _t(spark, sf_dir, "documents"), "doc_id", "text", dim=_FH_DIM
    )


def _build_feature_hashing_oracle() -> str:
    from ..operators.sampling import duck_hash_mod
    from ..operators.text import TOKEN_REGEX

    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '{TOKEN_REGEX}')) AS term
  FROM documents
),
h AS (
  SELECT doc_id,
         {duck_hash_mod("term", _FH_DIM)} AS dim,
         1 - 2 * ({duck_hash_mod("term || ':s'", 2)}) AS sign
  FROM toks
)
SELECT doc_id, dim, CAST(sum(sign) AS BIGINT) AS value
FROM h GROUP BY doc_id, dim
"""


_ACF_MAX_LAG = 3


def q_autocorr_lags(spark, sf_dir):
    """Per-event-type lag-1..3 autocorrelation of the cent-scaled value
    series (ordered by event time) — exact integer moments, one window
    shuffle on the series key, final Pearson ratio as the only float op."""
    from ..operators.quality import autocorr_lags

    e = _t(spark, sf_dir, "events").select(
        "event_type", "ts_us", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return autocorr_lags(
        e, ["event_type"], ["ts_us", "event_id"], "cents",
        max_lag=_ACF_MAX_LAG,
    )


ORACLE_AUTOCORR = """
WITH base AS (
  SELECT event_type, epoch_us(ts) AS tsu, event_id,
         CAST(round(value * 100) AS BIGINT) AS x
  FROM events
),
lagged AS (
  SELECT event_type, x,
         lag(x, 1) OVER w AS y1,
         lag(x, 2) OVER w AS y2,
         lag(x, 3) OVER w AS y3
  FROM base WINDOW w AS (PARTITION BY event_type ORDER BY tsu, event_id)
),
pairs AS (
  SELECT event_type, 1 AS lag, x, y1 AS y FROM lagged
  UNION ALL SELECT event_type, 2, x, y2 FROM lagged
  UNION ALL SELECT event_type, 3, x, y3 FROM lagged
),
m AS (
  SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM pairs WHERE x IS NOT NULL AND y IS NOT NULL GROUP BY 1, 2
),
s AS (
  SELECT event_type, lag, n_pairs,
         n_pairs * sxy - sx * sy AS cov,
         n_pairs * sxx - sx * sx AS varx,
         n_pairs * syy - sy * sy AS vary
  FROM m
)
SELECT event_type, CAST(lag AS INTEGER) AS lag, n_pairs,
       CASE WHEN n_pairs > 1 AND varx > 0 AND vary > 0
            THEN CAST(cov AS DOUBLE)
                 / sqrt(CAST(varx AS DOUBLE) * CAST(vary AS DOUBLE))
       END AS acf
FROM s
"""


# --- model-based quality classifier (r10) -------------------------------------------

# A pinned fixed-point linear model over the 64-dim hashed feature space
# (what an offline fastText-style training run would hand the pipeline):
# weights in millionths, derived from Knuth's multiplicative constant so
# they are deterministic, signed, and embedded verbatim in BOTH the
# Spark plan and the oracle SQL.
_QC_DIM = 64
_QC_W = [((d * 2654435761) % 2001) - 1000 for d in range(_QC_DIM)]
_QC_BIAS = 250_000
# near the corpus median score so the verdict actually discriminates
# (a constant-keep gate would not pin the threshold comparison)
_QC_THRESHOLD = 249_000


def q_quality_classifier(spark, sf_dir):
    """Classifier-based document filtering (CCNet/LLaMA-recipe style):
    a fixed-point linear model scored over hashing-trick features,
    fused to tokenize → plan-literal weight lookup → one keyed agg
    (operators.features.hashed_linear_score). The missing
    curation-family member next to the heuristic gates
    (gopher_quality, text_quality, unigram_logprob)."""
    from ..operators.features import hashed_linear_score

    return hashed_linear_score(
        _t(spark, sf_dir, "documents"), "doc_id", _QC_W,
        bias=_QC_BIAS, threshold=_QC_THRESHOLD,
    )


def _build_quality_classifier_oracle() -> str:
    from ..operators.sampling import duck_hash_mod
    from ..operators.text import TOKEN_REGEX

    wlist = "[" + ", ".join(
        f"CAST({w} AS BIGINT)" for w in _QC_W
    ) + "]"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '{TOKEN_REGEX}')) AS term
  FROM documents
),
c AS (
  SELECT doc_id,
         CAST(1 - 2 * ({duck_hash_mod("term || ':s'", 2)}) AS BIGINT)
         * list_extract({wlist},
             CAST(({duck_hash_mod("term", _QC_DIM)}) + 1 AS INT)) AS contrib
  FROM toks
),
-- LEFT JOIN from documents (r11): token-less docs surface with
-- n_tokens=0, score_fp=bias — the engine's explode_outer contract
s AS (
  SELECT d.doc_id,
         CAST(count(c.contrib) AS BIGINT) AS n_tokens,
         CAST({_QC_BIAS} + COALESCE(sum(c.contrib), 0) AS BIGINT)
           AS score_fp
  FROM documents d LEFT JOIN c ON d.doc_id = c.doc_id
  GROUP BY d.doc_id
)
SELECT doc_id, n_tokens, score_fp,
       round(score_fp / 1000000.0, 6) AS score,
       score_fp >= {_QC_THRESHOLD} AS keep
FROM s
"""


def q_stream_quality_classifier(spark, sf_dir):
    """Classifier-score-on-arrival: the SAME fixed-point linear model
    (operators.features.hashed_linear_score — zero operator changes,
    streaming/batch unification) over a document stream; the per-doc
    score aggregation runs stateful in complete mode, so every arriving
    document leaves the micro-batch carrying its quality verdict before
    it lands in the corpus. On static input the result is exactly the
    batch gate's, which the shared oracle pins value-for-value."""
    from pyspark.sql import types as T

    from ..operators.features import hashed_linear_score
    from .analytic_queries import _run_stream_to_table

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    scored = hashed_linear_score(
        stream, "doc_id", _QC_W, bias=_QC_BIAS, threshold=_QC_THRESHOLD
    )
    return _run_stream_to_table(
        spark, scored, "stream_qclf_result", "complete"
    )


QUALITY_QUERIES = {
    "shortest_hops": (q_shortest_hops, ORACLE_SHORTEST_HOPS),
    "triangle_count": (q_triangle_count, ORACLE_TRIANGLE_COUNT),
    "label_communities": (q_label_communities, _oracle_label_communities()),
    "louvain_communities": (
        q_louvain_communities, _oracle_louvain_communities(),
    ),
    "louvain_coarse_graph": (
        q_louvain_coarse_graph, _oracle_louvain_coarse(),
    ),
    # composes the LPA oracle verbatim — the two gates move together
    "community_modularity": (
        q_community_modularity, _oracle_community_modularity(),
    ),
    "fuzzy_name_match": (q_fuzzy_name_match, ORACLE_FUZZY_NAME_MATCH),
    "profile_table": (q_profile_table, ORACLE_PROFILE_TABLE),
    "dq_checks": (q_dq_checks, ORACLE_DQ_CHECKS),
    "mad_outliers": (q_mad_outliers, ORACLE_MAD_OUTLIERS),
    "chi_square_assoc": (q_chi_square_assoc, ORACLE_CHI_SQUARE),
    "ewma_smooth": (q_ewma_smooth, ORACLE_EWMA),
    "hll_set_ops": (q_hll_set_ops, _build_hll_set_ops_oracle()),
    "stream_dq_monitor": (q_stream_dq_monitor, ORACLE_STREAM_DQ),
    "exact_quantiles": (q_exact_quantiles, ORACLE_EXACT_QUANTILES),
    "feature_hashing": (q_feature_hashing, _build_feature_hashing_oracle()),
    "group_regression": (q_group_regression, ORACLE_GROUP_REGRESSION),
    "autocorr_lags": (q_autocorr_lags, ORACLE_AUTOCORR),
    "quality_classifier": (
        q_quality_classifier, _build_quality_classifier_oracle(),
    ),
    # the streaming form shares the batch oracle verbatim — one
    # definition pins both execution modes (14th streaming gate)
    "stream_quality_classifier": (
        q_stream_quality_classifier, _build_quality_classifier_oracle(),
    ),
}
