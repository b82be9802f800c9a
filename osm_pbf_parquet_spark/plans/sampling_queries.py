"""Sampling/splitting queries + DuckDB oracles.

Every oracle replicates the Spark plan's md5-bucket arithmetic exactly
(same 60-bit prefix, same salt, same thresholds), so the driver's
value-hash comparison checks real selection membership, not just shapes.
"""

from __future__ import annotations

from ..operators import sampling
from .pipeline_queries import t_adaptive

B = sampling.HASH_BUCKETS


def _duck_bucket(key: str, salt: str) -> str:
    return sampling.duck_hash_mod(
        f"CAST({key} AS VARCHAR) || ':' || '{salt}'", B
    )


# --- deterministic train/val/test split ---------------------------------------


def q_sample_hash_split(spark, sf_dir):
    out = sampling.hash_split(t_adaptive(spark, sf_dir, "documents"))
    return out.select("doc_id", "bucket", "split")


ORACLE_HASH_SPLIT = f"""
SELECT doc_id,
       {_duck_bucket('doc_id', 'split-v1')} AS bucket,
       CASE WHEN {_duck_bucket('doc_id', 'split-v1')} < 8000 THEN 'train'
            WHEN {_duck_bucket('doc_id', 'split-v1')} < 9000 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


# --- per-group cap (stratified downsample) ------------------------------------


def q_sample_stratified_cap(spark, sf_dir):
    out = sampling.stratified_cap(t_adaptive(spark, sf_dir, "documents"),
                                  group_col="source", n_per_group=20)
    return out.select("doc_id", "source", "rank_in_group")


ORACLE_STRATIFIED_CAP = """
SELECT doc_id, source, rank_in_group FROM (
  SELECT doc_id, source,
         CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR) || ':' || 'cap-v1'), doc_id
         ) AS INT) AS rank_in_group
  FROM documents
) WHERE rank_in_group <= 20
"""


# --- weighted mixture rebalance -----------------------------------------------

MIX_WEIGHTS = {"en": 1.0, "de": 0.5, "fr": 0.25, "es": 0.1}


def q_sample_weighted_mixture(spark, sf_dir):
    out = sampling.weighted_mixture(
        t_adaptive(spark, sf_dir, "documents"), group_col="lang", weights=MIX_WEIGHTS
    )
    return out.select("doc_id", "lang", "bucket")


def _oracle_mixture() -> str:
    case = " ".join(
        f"WHEN lang = '{g}' THEN {int(round(w * B))}"
        for g, w in MIX_WEIGHTS.items()
    )
    return f"""
SELECT doc_id, lang, bucket FROM (
  SELECT doc_id, lang, {_duck_bucket('doc_id', 'mix-v1')} AS bucket
  FROM documents
) WHERE bucket < CASE {case} ELSE 0 END
"""


# --- token-length histogram ---------------------------------------------------


def q_sample_length_buckets(spark, sf_dir):
    return sampling.length_buckets(t_adaptive(spark, sf_dir, "documents"))


ORACLE_LENGTH_BUCKETS = """
SELECT CAST(length(bin(len(string_split(text, ' ')))) AS INT) - 1 AS len_bucket,
       count(*) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(min(len(string_split(text, ' '))) AS BIGINT) AS min_tokens,
       CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens
FROM documents
GROUP BY 1
"""


# --- exact-n uniform sample ---------------------------------------------------


def q_sample_uniform_n(spark, sf_dir):
    out = sampling.uniform_sample_n(t_adaptive(spark, sf_dir, "documents"), n=50)
    return out.select("doc_id", "lang", "source")


ORACLE_UNIFORM_N = """
SELECT doc_id, lang, source
FROM documents
ORDER BY md5(CAST(doc_id AS VARCHAR) || ':' || 'sample-v1'), doc_id
LIMIT 50
"""


# --- sequence packing ---------------------------------------------------------


def q_sample_pack_sequences(spark, sf_dir):
    return sampling.pack_sequences(t_adaptive(spark, sf_dir, "documents"), budget=2048)


ORACLE_PACK_SEQUENCES = """
WITH toks AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_end
  FROM toks
)
SELECT doc_id, n_tokens,
       CAST((cum_end - n_tokens) // 2048 AS BIGINT) AS start_window,
       CAST((cum_end - n_tokens) % 2048 AS BIGINT)  AS start_offset,
       CAST(greatest(cum_end - 1, cum_end - n_tokens) // 2048 AS BIGINT)
           AS end_window
FROM cum
"""


def q_sample_chunk_windows(spark, sf_dir):
    """Context-window chunking: 24-token windows, stride 16 (overlapping);
    per-window md5 pins the exact token bytes."""
    out = sampling.chunk_documents(t_adaptive(spark, sf_dir, "documents"),
                                   size=24, stride=16)
    return out


ORACLE_CHUNK_WINDOWS = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
s AS (
  -- drop starts whose previous window already reached the doc end
  -- (their windows are strict subsets — mirror of the Spark filter)
  SELECT doc_id, ws,
         unnest(list_filter(range(1, greatest(len(ws), 1) + 1, 16),
                            s -> s = 1 OR s - 16 + 24 - 1 < len(ws))) AS start
  FROM w
)
SELECT doc_id,
       CAST((start - 1) // 16 AS INT) AS chunk_id,
       CAST(start AS INT) AS start,
       CAST(least(24, len(ws) - start + 1) AS INT) AS n_tokens,
       md5(array_to_string(ws[CAST(start AS INT):CAST(start + 23 AS INT)], ' ')) AS chunk_md5
FROM s
"""


# --- per-epoch shard plan (r8) --------------------------------------------------

_SHARDS, _EPOCH = 8, 3


def q_epoch_shard_plan(spark, sf_dir):
    """Deterministic epoch-3 training layout: every document's
    (shard, position) for an 8-shard loader — a fresh pseudo-random
    permutation per epoch, identical on any cluster/partitioning."""
    return sampling.epoch_shard_plan(
        t_adaptive(spark, sf_dir, "documents"), n_shards=_SHARDS, epoch=_EPOCH
    )


def _oracle_epoch_shard() -> str:
    keyed = f"CAST(doc_id AS VARCHAR) || ':' || 'epoch-v1' || ':' || '{_EPOCH}'"
    shard = sampling.duck_hash_mod(keyed, _SHARDS)
    return f"""
SELECT doc_id,
       CAST({shard} AS INT) AS shard,
       CAST(row_number() OVER (
         PARTITION BY {shard}
         ORDER BY md5({keyed}), doc_id
       ) - 1 AS BIGINT) AS position
FROM documents
"""


# --- per-domain token-budget fill (r8) -------------------------------------------


def q_token_budget_fill(spark, sf_dir):
    """Temperature-rebalanced corpus: redistribute the corpus's own
    total token count across languages by the alpha=0.3 temperature
    weights, then fill each language's token budget with the
    deterministic uniform draw — the executor that turns
    temperature_mixture's weights into the documents a trainer reads."""
    from pyspark.sql import functions as F

    from ..operators.selection import temperature_weights

    docs = t_adaptive(spark, sf_dir, "documents")
    total = docs.agg(
        F.sum(F.size(F.split("text", " ")).cast("long")).alias("_tt")
    )
    budgets = (
        temperature_weights(docs, "lang", alpha=0.3)
        .crossJoin(F.broadcast(total))
        .select(
            "lang",
            F.expr("w_ppm * _tt div 1000000").cast("long").alias(
                "token_budget"
            ),
        )
    )
    return sampling.token_budget_fill(docs, budgets, group_col="lang")


def _oracle_token_budget() -> str:
    from .selection_queries import _oracle_temperature

    return f"""
WITH tw AS ({_oracle_temperature()}),
tt AS (
  SELECT CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS t
  FROM documents
),
budgets AS (
  SELECT lang, CAST(w_ppm * t // 1000000 AS BIGINT) AS token_budget
  FROM tw, tt
),
run AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(sum(len(string_split(text, ' '))) OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR) || ':' || 'budget-v1'),
                    doc_id
           ROWS UNBOUNDED PRECEDING
         ) AS BIGINT) AS tokens_through
  FROM documents
)
SELECT r.doc_id, r.lang, r.n_tokens, r.tokens_through, b.token_budget
FROM run r JOIN budgets b USING (lang)
WHERE r.tokens_through - r.n_tokens < b.token_budget
"""


SAMPLING_QUERIES: dict[str, tuple] = {
    "epoch_shard_plan": (q_epoch_shard_plan, _oracle_epoch_shard()),
    "token_budget_fill": (q_token_budget_fill, _oracle_token_budget()),
    "sample_pack_sequences": (q_sample_pack_sequences, ORACLE_PACK_SEQUENCES),
    "sample_chunk_windows": (q_sample_chunk_windows, ORACLE_CHUNK_WINDOWS),
    "sample_hash_split": (q_sample_hash_split, ORACLE_HASH_SPLIT),
    "sample_stratified_cap": (q_sample_stratified_cap, ORACLE_STRATIFIED_CAP),
    "sample_weighted_mixture": (q_sample_weighted_mixture, _oracle_mixture()),
    "sample_length_buckets": (q_sample_length_buckets, ORACLE_LENGTH_BUCKETS),
    "sample_uniform_n": (q_sample_uniform_n, ORACLE_UNIFORM_N),
}


_UNIMAX_B, _UNIMAX_E = 50_000, 2


def q_unimax_allocation(spark, sf_dir):
    """UniMax budget split across the 20 sources: 50k tokens at a
    2-epoch cap — on the gate corpus that caps the small sources and
    waterfills the large ones, so the breakpoint, the integer base
    share, AND the mod-remainder distribution all land in the value
    hash."""
    return sampling.unimax_allocation(
        t_adaptive(spark, sf_dir, "documents"),
        budget=_UNIMAX_B, max_epochs=_UNIMAX_E,
    )


# replays the closed-form waterfill: ascending-cap prefix sums, the
# first-false breakpoint, integer base share + one-token remainders
ORACLE_UNIMAX = f"""
WITH counts AS (
  SELECT source,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
caps AS (
  SELECT source, n_tokens,
         CAST(n_tokens * {_UNIMAX_E} AS BIGINT) AS cap,
         CAST(row_number() OVER (ORDER BY n_tokens * {_UNIMAX_E}, source)
              AS BIGINT) AS i,
         CAST(count(*) OVER () AS BIGINT) AS S,
         CAST(coalesce(sum(n_tokens * {_UNIMAX_E}) OVER (
              ORDER BY n_tokens * {_UNIMAX_E}, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS pre
  FROM counts
),
brk AS (
  SELECT coalesce(min(CASE WHEN cap * (S - i + 1) > {_UNIMAX_B} - pre
                       THEN i END) - 1, max(S)) AS t
  FROM caps
),
pfx AS (
  SELECT CAST(coalesce(max(CASE WHEN i <= t THEN pre + cap END), 0)
              AS BIGINT) AS prefix_t
  FROM caps, brk
)
SELECT source, n_tokens, cap AS cap_tokens,
       CAST(CASE WHEN i <= t THEN cap
            ELSE ({_UNIMAX_B} - prefix_t) // (S - t)
                 + CASE WHEN i - t <= ({_UNIMAX_B} - prefix_t) % (S - t)
                        THEN 1 ELSE 0 END
       END AS BIGINT) AS alloc_tokens
FROM caps, brk, pfx
"""


SAMPLING_QUERIES.update({
    # the budget-setter upstream of token_budget_fill: UniMax waterfill
    "unimax_allocation": (q_unimax_allocation, ORACLE_UNIMAX),
})
