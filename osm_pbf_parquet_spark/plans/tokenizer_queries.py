"""Tokenizer gates: distributed BPE merge learning, the resulting
subword vocabulary, and corpus ENCODING with the learned table — each
with a DuckDB oracle that replays the greedy merge rounds bit-for-bit
(the pagerank/kcore unrolled-round oracle pattern — see
``operators/bpe.py`` for the encoding trick that makes ``replace()``
exactly greedy-left BPE in both engines).
"""

from __future__ import annotations

from ..operators.bpe import SEP, bpe_encode_docs, bpe_train, bpe_vocab
from .relational import t as _t

_ROUNDS = 3
_VOCAB_K = 20


def q_bpe_train_merges(spark, sf_dir):
    """Learn 3 BPE merges from the documents corpus: one corpus-sized
    word-count shuffle, then vocabulary-sized rounds (pair-count agg +
    1-row argmax broadcast + narrow rewrite per round)."""
    return bpe_train(_t(spark, sf_dir, "documents"), rounds=_ROUNDS)


def q_bpe_token_vocab(spark, sf_dir):
    """Apply the 3 learned merges and return the top-20 subword tokens
    by corpus frequency — the vocabulary readout of the trained
    tokenizer."""
    return bpe_vocab(_t(spark, sf_dir, "documents"), rounds=_ROUNDS, k=_VOCAB_K)


def _bpe_round_sql(prev: str, r: int) -> str:
    """One unrolled merge round: pair counts from e{prev}, deterministic
    argmax m{r}, greedy rewrite e{r}."""
    return f"""p{r} AS (
  SELECT toks[i] AS a, toks[i+1] AS b, CAST(sum(cnt) AS BIGINT) AS pair_cnt
  FROM {prev},
       LATERAL (SELECT string_split(trim(enc, '{SEP}'), '{SEP}{SEP}') AS toks) _t,
       LATERAL unnest(generate_series(1, len(toks) - 1)) AS _g(i)
  GROUP BY 1, 2
),
m{r} AS (SELECT a, b, pair_cnt FROM p{r} ORDER BY pair_cnt DESC, a, b LIMIT 1),
e{r} AS (
  SELECT w, cnt,
         CASE WHEN a IS NULL THEN enc
              ELSE replace(enc, '{SEP}' || a || '{SEP}{SEP}' || b || '{SEP}',
                           '{SEP}' || a || b || '{SEP}') END AS enc
  FROM {prev} LEFT JOIN m{r} ON TRUE
)"""


_BPE_BASE_SQL = f"""
words AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents
  ) WHERE length(w) > 0 GROUP BY w
),
e0 AS (
  SELECT w, cnt,
         '{SEP}' || array_to_string(string_split(w, ''), '{SEP}{SEP}')
              || '{SEP}' AS enc
  FROM words
),
{_bpe_round_sql("e0", 1)},
{_bpe_round_sql("e1", 2)},
{_bpe_round_sql("e2", 3)}"""


ORACLE_BPE_TRAIN = f"""
WITH {_BPE_BASE_SQL}
SELECT CAST(step AS INTEGER) AS step, left_tok, right_tok,
       left_tok || right_tok AS merged, pair_cnt
FROM (
  SELECT 1 AS step, a AS left_tok, b AS right_tok, pair_cnt FROM m1
  UNION ALL SELECT 2, a, b, pair_cnt FROM m2
  UNION ALL SELECT 3, a, b, pair_cnt FROM m3
)
"""

ORACLE_BPE_VOCAB = f"""
WITH {_BPE_BASE_SQL}
SELECT token, CAST(sum(cnt) AS BIGINT) AS total_cnt FROM (
  SELECT cnt, unnest(string_split(trim(enc, '{SEP}'), '{SEP}{SEP}')) AS token
  FROM e3
) GROUP BY token ORDER BY total_cnt DESC, token LIMIT {_VOCAB_K}
"""


def q_bpe_encode_corpus(spark, sf_dir):
    """Encode every document with the 3 learned merges — the tokenizer
    lifecycle's apply side (train → SHIP TABLE → encode corpus): the
    merge table aggregates to one ordered broadcast row, so encoding is
    a scan-speed projection; per-doc token counts and a segmentation md5
    pin the full output."""
    docs = _t(spark, sf_dir, "documents")
    return bpe_encode_docs(docs, bpe_train(docs, rounds=_ROUNDS))


def q_stream_bpe_encode(spark, sf_dir):
    """Tokenize-on-arrival: the SAME encode operator over a document
    readStream, with the merge table in its shipped-artifact form (the
    3 learned merges collected once — literal-bounded — and inlined as
    plan literals, exactly how a deployed tokenizer carries its
    vocabulary). Pure per-row projection → append mode; on static input
    the result is the batch gate's, pinned by the shared oracle."""
    from pyspark.sql import types as T

    from .analytic_queries import _run_stream_to_table

    merges = [
        (r["left_tok"], r["right_tok"])
        for r in bpe_train(_t(spark, sf_dir, "documents"), rounds=_ROUNDS)
        .orderBy("step").collect()
    ]
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
    return _run_stream_to_table(
        spark, bpe_encode_docs(stream, merges), "stream_bpe_encode_result",
        "append",
    )


def _merge_pat(r: int) -> tuple[str, str]:
    """LEFT-JOIN-safe replace args for merge round r: a missing merge
    (degenerate corpus) yields a chr(1) pattern that matches nothing."""
    return (
        f"coalesce('{SEP}' || m{r}.a || '{SEP}{SEP}' || m{r}.b || '{SEP}', chr(1))",
        f"coalesce('{SEP}' || m{r}.a || m{r}.b || '{SEP}', '')",
    )


ORACLE_BPE_ENCODE = f"""
WITH {_BPE_BASE_SQL},
d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     w -> w != '') AS ws
  FROM documents
),
e AS (
  SELECT doc_id, len(ws) AS n_words,
         array_to_string(list_transform(ws, w ->
           '{SEP}' || array_to_string(string_split(w, ''), '{SEP}{SEP}')
                || '{SEP}'), ' ') AS enc0
  FROM d
),
r AS (
  SELECT doc_id, n_words,
    replace(replace(replace(enc0,
      {_merge_pat(1)[0]}, {_merge_pat(1)[1]}),
      {_merge_pat(2)[0]}, {_merge_pat(2)[1]}),
      {_merge_pat(3)[0]}, {_merge_pat(3)[1]}) AS enc
  FROM e LEFT JOIN m1 ON TRUE LEFT JOIN m2 ON TRUE LEFT JOIN m3 ON TRUE
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       CAST((length(enc) - length(replace(enc, '{SEP}', ''))) // 2
            AS BIGINT) AS n_tokens,
       md5(enc) AS enc_md5
FROM r
"""


TOKENIZER_QUERIES = {
    "bpe_train_merges": (q_bpe_train_merges, ORACLE_BPE_TRAIN),
    "bpe_token_vocab": (q_bpe_token_vocab, ORACLE_BPE_VOCAB),
    "bpe_encode_corpus": (q_bpe_encode_corpus, ORACLE_BPE_ENCODE),
    # tokenize-on-arrival shares the batch oracle verbatim — one
    # definition pins both execution modes (15th streaming gate)
    "stream_bpe_encode": (q_stream_bpe_encode, ORACLE_BPE_ENCODE),
}
