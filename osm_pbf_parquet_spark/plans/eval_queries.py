"""Evaluation-suite gates: ROC-AUC, Cohen's kappa (lang-id vs labeled
lang — real annotator agreement, not a toy pairing), calibration bins,
per-arm Welch t-test, and SCD-2 point-in-time snapshot. Each entry is a
(Spark plan, DuckDB oracle) pair whose float outputs derive from exact
integer sufficient statistics, so the gate's value-hash must match.

Reference context: the reference's differential checker
(``osm-pbf-parquet/test/validate.py:57-217``) is a one-shot
compare-labels-to-reference harness; this suite turns that capability
into corpus-scale evaluation operators (see ``operators/evaluation.py``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import evaluation, ordered, text
from ..operators.sampling import duck_hash_mod, hash_mod_expr
from .pipeline_queries import _oracle_lang_id
from .relational import t as _t

# deterministic float->int score scaling used by BOTH engines: one IEEE
# add, one multiply, one floor on the float32-exact embedding component.
_SCALE = 1_000_000
_SPARK_SCORE = (
    "greatest(0L, least(999999L, cast(floor((cast(element_at(embedding, 2) "
    "as double) + cast(1 as double)) * cast(500000 as double)) as bigint)))"
)
_DUCK_SCORE = (
    "greatest(0, least(999999, CAST(floor((CAST(embedding[2] AS DOUBLE) "
    "+ CAST(1 AS DOUBLE)) * CAST(500000 AS DOUBLE)) AS BIGINT)))"
)
# binary target: odd embedding label (deterministic, ~balanced)
_SPARK_LABEL = "cast(pmod(label, 2) as bigint)"
_DUCK_LABEL = "CAST(label % 2 AS BIGINT)"


def q_auc_score(spark, sf_dir):
    """Exact distributed ROC-AUC of the scaled embedding-component score
    against the odd-label target — rank-statistic form, two-level prefix
    (domain-bounded windows only; see ``evaluation.roc_auc``)."""
    e = _t(spark, sf_dir, "embeddings").select(
        F.expr(_SPARK_SCORE).alias("score"),
        F.expr(_SPARK_LABEL).alias("y"),
    )
    return evaluation.roc_auc(e, "score", "y")


ORACLE_AUC = f"""
WITH base AS (
  SELECT {_DUCK_SCORE} AS score, {_DUCK_LABEL} AS y FROM embeddings
),
s AS (
  SELECT score, SUM(y) AS pos, COUNT(*) - SUM(y) AS neg
  FROM base GROUP BY score
),
c AS (
  SELECT score, pos, neg,
         COALESCE(SUM(neg) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
  FROM s
)
SELECT CAST(SUM(pos) + SUM(neg) AS BIGINT) AS n,
       CAST(SUM(pos) AS BIGINT) AS npos,
       CAST(SUM(neg) AS BIGINT) AS nneg,
       ROUND(CAST(SUM(2 * pos * cumneg + pos * neg) AS DOUBLE)
             / (CAST(2 AS DOUBLE) * CAST(SUM(pos) AS DOUBLE)
                * CAST(SUM(neg) AS DOUBLE)), 9) AS auc
FROM c
"""


def q_kappa_lang(spark, sf_dir):
    """Cohen's kappa between the corpus's labeled ``lang`` column and the
    stopword-voting lang-id prediction — the annotator-agreement readout
    a labeling pipeline runs before trusting model labels."""
    d = text.with_language(_t(spark, sf_dir, "documents"))
    return evaluation.cohens_kappa(d, "lang", "lang_pred")


def _oracle_kappa() -> str:
    return f"""
WITH ll AS ({_oracle_lang_id()}),
pairs AS (
  SELECT d.lang AS a, ll.lang_pred AS b
  FROM documents d JOIN ll ON ll.doc_id = d.doc_id
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree
  FROM pairs
),
ra AS (SELECT a AS k, CAST(COUNT(*) AS BIGINT) AS r FROM pairs GROUP BY a),
cb AS (SELECT b AS k, CAST(COUNT(*) AS BIGINT) AS c FROM pairs GROUP BY b),
cross_term AS (
  SELECT CAST(COALESCE(SUM(ra.r * cb.c), 0) AS BIGINT) AS s
  FROM ra JOIN cb ON ra.k = cb.k
)
SELECT n, agree,
       ROUND(CAST(n * agree - s AS DOUBLE) / CAST(n * n - s AS DOUBLE), 9)
         AS kappa
FROM tot, cross_term
"""


def q_calibration_bins(spark, sf_dir):
    """Reliability-curve bins of the scaled score vs the odd-label
    target: one groupBy, ten rows out."""
    e = _t(spark, sf_dir, "embeddings").select(
        F.expr(_SPARK_SCORE).alias("score"),
        F.expr(_SPARK_LABEL).alias("y"),
    )
    return evaluation.calibration_bins(e, "score", "y", bins=10, scale=_SCALE)


ORACLE_CALIBRATION = f"""
WITH base AS (
  SELECT {_DUCK_SCORE} AS score, {_DUCK_LABEL} AS y FROM embeddings
)
SELECT CAST(least(score // {_SCALE // 10}, 9) AS INT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(y) AS BIGINT) AS positives,
       ROUND(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
         AS pos_rate,
       ROUND(CAST(SUM(score) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * CAST({_SCALE} AS DOUBLE)), 9)
         AS mean_score
FROM base GROUP BY 1
"""


_AB_SALT = "ab-v1"
_SPARK_ARM = hash_mod_expr(
    f"concat(cast(user_id AS string), ':', '{_AB_SALT}')", 2
)
_DUCK_ARM = duck_hash_mod(
    f"CAST(user_id AS VARCHAR) || ':' || '{_AB_SALT}'", 2
)


def q_ab_welch(spark, sf_dir):
    """Per-event-type Welch t-test between deterministic hash-assigned
    experiment arms over the event metric (µ-scaled to exact BIGINTs);
    one wide agg total."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr(_SPARK_ARM).cast("int").alias("arm"),
        F.expr("cast(floor(value * cast(1000000 as double)) as bigint)")
        .alias("v_s"),
    )
    return evaluation.welch_ttest(e, "event_type", "arm", "v_s", scale=_SCALE)


def _welch_oracle(group_col: str, base_select: str) -> str:
    """Welch-t oracle body over an arbitrary grouping column; the base
    CTE must yield (``group_col``, arm, v_s)."""
    g = group_col
    return f"""
WITH base AS (
{base_select}
),
agg AS (
  SELECT {g},
         CAST(SUM(CASE WHEN arm <> 1 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         SUM(CASE WHEN arm <> 1 THEN v_s ELSE 0 END) AS s0,
         SUM(CASE WHEN arm = 1 THEN v_s ELSE 0 END) AS s1,
         SUM(CASE WHEN arm <> 1 THEN v_s * v_s ELSE 0 END) AS q0,
         SUM(CASE WHEN arm = 1 THEN v_s * v_s ELSE 0 END) AS q1
  FROM base GROUP BY {g}
),
stats AS (
  SELECT {g}, n0, n1,
         CAST(s0 AS DOUBLE) / (CAST(n0 AS DOUBLE) * CAST(1000000 AS DOUBLE))
           AS mean0,
         CAST(s1 AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(1000000 AS DOUBLE))
           AS mean1,
         (CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE)
            / CAST(n0 AS DOUBLE))
           / ((CAST(n0 AS DOUBLE) - CAST(1 AS DOUBLE))
              * CAST(1000000 AS DOUBLE) * CAST(1000000 AS DOUBLE)) AS var0,
         (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
            / CAST(n1 AS DOUBLE))
           / ((CAST(n1 AS DOUBLE) - CAST(1 AS DOUBLE))
              * CAST(1000000 AS DOUBLE) * CAST(1000000 AS DOUBLE)) AS var1
  FROM agg
),
ses AS (
  SELECT *, var0 / CAST(n0 AS DOUBLE) AS se0, var1 / CAST(n1 AS DOUBLE) AS se1
  FROM stats
)
SELECT {g}, n0, n1,
       ROUND(mean0, 9) AS mean0,
       ROUND(mean1, 9) AS mean1,
       CASE WHEN n0 > 1 AND n1 > 1
            THEN ROUND((mean0 - mean1) / sqrt(se0 + se1), 6) END AS t_stat,
       CASE WHEN n0 > 1 AND n1 > 1
            THEN ROUND((se0 + se1) * (se0 + se1)
                 / (se0 * se0 / (CAST(n0 AS DOUBLE) - CAST(1 AS DOUBLE))
                    + se1 * se1 / (CAST(n1 AS DOUBLE) - CAST(1 AS DOUBLE))),
                 6) END AS welch_df
FROM ses
"""


ORACLE_AB_WELCH = _welch_oracle("event_type", f"""  SELECT event_type,
         CAST({_DUCK_ARM} AS INT) AS arm,
         CAST(floor(value * CAST(1000000 AS DOUBLE)) AS BIGINT) AS v_s
  FROM events""")


_AB_WIN_US = 21_600_000_000  # 6 hours


def q_stream_ab_monitor(spark, sf_dir):
    """A/B experiment monitoring ON A STREAM: per 6-hour tumbling
    event-time window, the Welch t-test between hash-assigned arms —
    the batch ``welch_ttest`` operator runs unchanged under readStream
    because its sufficient statistics are one map-side-combinable agg
    (streaming/batch unification, 10th streaming gate). On static input
    the result equals the batch GROUP BY the oracle pins."""
    from .analytic_queries import _event_stream, _run_stream_to_table

    s = _event_stream(spark, sf_dir)
    w = (
        s.withColumn("win", F.window("event_time", "6 hours"))
        .withColumn("window_start", F.col("win.start"))
        .select(
            "window_start",
            F.expr(_SPARK_ARM).cast("int").alias("arm"),
            F.expr("cast(floor(value * cast(1000000 as double)) as bigint)")
            .alias("v_s"),
        )
    )
    res = evaluation.welch_ttest(w, "window_start", "arm", "v_s", scale=_SCALE)
    return _run_stream_to_table(spark, res, "stream_ab_result", "complete")


ORACLE_STREAM_AB = _welch_oracle(
    "window_start",
    f"""  SELECT make_timestamp(epoch_us(ts) // {_AB_WIN_US} * {_AB_WIN_US})
           AS window_start,
         CAST({_DUCK_ARM} AS INT) AS arm,
         CAST(floor(value * CAST(1000000 AS DOUBLE)) AS BIGINT) AS v_s
  FROM events""",
)


# point-in-time literal inside every SF's event range (2024-01-16 UTC, µs)
_SNAPSHOT_AT = 1_705_363_200_000_000


def q_scd2_snapshot(spark, sf_dir):
    """Time travel: rebuild each user's event_type state as of a fixed
    instant from the SCD-2 interval table (compose ``scd2_intervals`` →
    ``scd2_snapshot``; the snapshot itself is a pure pushdown filter)."""
    e = _t(spark, sf_dir, "events")
    iv = ordered.scd2_intervals(
        e, key_col="user_id", attr_col="event_type",
        ts_col="ts_us", tiebreak_col="event_id",
    )
    out = ordered.scd2_snapshot(iv, _SNAPSHOT_AT)
    return out.select(
        "user_id", "event_type",
        F.col("valid_from").cast("long"),
        F.col("version_no").cast("int"),
    )


def _oracle_scd2_snapshot() -> str:
    from .advanced_queries import ORACLE_SCD2

    return f"""
WITH iv AS ({ORACLE_SCD2})
SELECT user_id, event_type, valid_from, version_no
FROM iv
WHERE valid_from <= {_SNAPSHOT_AT}
  AND (valid_to IS NULL OR {_SNAPSHOT_AT} < valid_to)
"""


_NDCG_K = 10


def q_ndcg_at_k(spark, sf_dir):
    """Ranking-quality readout: per nation, rank its suppliers by total
    shipped quantity (the "system" ranking — one exact BIGINT agg) and
    judge against part-diversity relevance (distinct parts supplied).
    nDCG@10 per nation from the integer discount table — the metric a
    retrieval pipeline runs over BM25/ANN/RRF output."""
    from ..operators.evaluation import ndcg_at_k

    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    per_sup = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
            F.countDistinct("l_partkey").alias("rel"),
        )
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", "l_suppkey", "qty", "rel")
    )
    return ndcg_at_k(per_sup, "n_name", "l_suppkey", "qty", "rel", k=_NDCG_K)


def _oracle_ndcg() -> str:
    from ..operators.evaluation import ndcg_discounts

    disc = ", ".join(str(d) for d in ndcg_discounts(_NDCG_K))
    return f"""
WITH per_sup AS (
  SELECT l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
         CAST(count(DISTINCT l_partkey) AS BIGINT) AS rel
  FROM lineitem GROUP BY 1
),
ranked AS (
  SELECT n_name, rel,
         row_number() OVER (
           PARTITION BY n_name ORDER BY qty DESC, l_suppkey
         ) AS rn,
         row_number() OVER (
           PARTITION BY n_name ORDER BY rel DESC, l_suppkey
         ) AS rr
  FROM per_sup
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
),
g AS (
  SELECT n_name,
         CAST(sum(CASE WHEN rn <= {_NDCG_K}
                       THEN rel * ([{disc}])[rn] ELSE 0 END) AS BIGINT)
           AS dcg_scaled,
         CAST(sum(CASE WHEN rr <= {_NDCG_K}
                       THEN rel * ([{disc}])[rr] ELSE 0 END) AS BIGINT)
           AS idcg_scaled
  FROM ranked GROUP BY n_name
)
SELECT n_name, dcg_scaled, idcg_scaled,
       CASE WHEN idcg_scaled > 0
            THEN CAST((1000 * dcg_scaled) // idcg_scaled AS BIGINT)
       END AS ndcg_permille
FROM g
"""


EVAL_QUERIES = {
    "auc_score": (q_auc_score, ORACLE_AUC),
    "kappa_lang_agreement": (q_kappa_lang, _oracle_kappa()),
    "calibration_curve": (q_calibration_bins, ORACLE_CALIBRATION),
    "ab_welch_by_type": (q_ab_welch, ORACLE_AB_WELCH),
    "stream_ab_monitor": (q_stream_ab_monitor, ORACLE_STREAM_AB),
    "scd2_snapshot": (q_scd2_snapshot, _oracle_scd2_snapshot()),
    "ndcg_at_k": (q_ndcg_at_k, _oracle_ndcg()),
}
