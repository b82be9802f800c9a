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


# --- unigram-LM (SentencePiece-style) tokenizer --------------------------------

_UNI_UNROLL = 10  # DP unroll depth in the oracle ≥ max word length in data


def q_unigram_vocab_costs(spark, sf_dir):
    """Seed piece vocabulary with integer fixed-point −log2 costs
    (Kudo 2018's substring-frequency seed): all single chars + top-K
    multi-char substrings; the oracle replays the mantissa-squaring
    log via a recursive CTE — zero libm in either engine."""
    from ..operators.unigram import unigram_seed_vocab

    return unigram_seed_vocab(_t(spark, sf_dir, "documents"))


def q_unigram_encode_corpus(spark, sf_dir):
    """Viterbi-encode the corpus under the seed vocabulary — the
    unigram-LM lifecycle's apply side (train → encode), the
    SentencePiece counterpart of bpe_encode_corpus. The DP runs as a
    Catalyst fold once per DISTINCT word; the oracle unrolls the DP
    positions as SQL CTEs and walks backpointers with a recursive
    CTE."""
    from ..operators.unigram import unigram_encode_docs, unigram_seed_vocab

    docs = _t(spark, sf_dir, "documents")
    return unigram_encode_docs(docs, unigram_seed_vocab(docs))


def q_stream_unigram_encode(spark, sf_dir):
    """Unigram-encode-on-arrival: the SAME Viterbi expression over a
    document readStream with the vocabulary in shipped-artifact form
    (bounded collect → map literal, the stream_bpe_encode idiom) — a
    stateless append-mode projection; on static input the result is
    the batch gate's, pinned by the shared oracle."""
    from pyspark.sql import types as T

    from ..operators.unigram import unigram_encode_docs, unigram_seed_vocab
    from .analytic_queries import _run_stream_to_table

    vocab = sorted(
        (r["piece"], r["cost"])
        for r in unigram_seed_vocab(
            _t(spark, sf_dir, "documents")
        ).collect()
    )
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
        spark, unigram_encode_docs(stream, vocab),
        "stream_unigram_encode_result", "append",
    )


def _uni_vocab_ctes() -> str:
    """Shared oracle prefix: word frequencies → substring counts →
    char+top-K selection → fixed-point costs (recursive ilog2 CTE)."""
    from ..functions.fixedpoint import ilog2_fp_duck_ctes
    from ..operators.unigram import UNI_K, UNI_P

    return f"""wf AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                  w -> w != '')) AS w FROM documents) GROUP BY 1
),
pieces AS MATERIALIZED (
  SELECT piece, CAST(sum(cnt) AS BIGINT) AS cnt FROM (
    SELECT unnest(flatten(list_transform(range(1, len(w)+1), i ->
        list_transform(range(1, least({UNI_P}, len(w)-i+1)+1), l ->
            substr(w, i, l))))) AS piece, cnt
    FROM wf) GROUP BY 1
),
sel AS MATERIALIZED (
  SELECT piece, cnt FROM pieces WHERE len(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt,
           row_number() OVER (ORDER BY cnt DESC, piece) AS rk
    FROM pieces WHERE len(piece) > 1) WHERE rk <= {UNI_K}
),
vt AS (SELECT CAST(sum(cnt) AS BIGINT) AS vtot FROM sel),
selv AS (SELECT piece, cnt, vtot FROM sel, vt),
{ilog2_fp_duck_ctes("vlg", "selv", ["piece", "cnt"],
                    {"ft": "vtot", "fc": "cnt"})},
vocab AS MATERIALIZED (SELECT piece, cnt, ft - fc AS cost FROM vlg)"""


ORACLE_UNIGRAM_VOCAB = f"""
WITH RECURSIVE {_uni_vocab_ctes()}
SELECT piece, cnt, CAST(cost AS BIGINT) AS cost FROM vocab
"""


def _uni_dp_sql() -> str:
    """DP unroll: b{{j}} = best (cost, np, bp) for each word's prefix of
    length j, branches over piece lengths joining b{{j−l}}; argmin by
    (cost, np, bp DESC) — exactly the engine's min struct(cost, np,
    −l). Words longer than the unroll produce no encoding row and the
    compare fails LOUDLY (row-count), never silently."""
    from ..operators.unigram import UNI_P

    parts = []
    for j in range(1, _UNI_UNROLL + 1):
        branches = []
        for l in range(1, min(UNI_P, j) + 1):
            prev = f"b{j - l}"
            branches.append(
                f"SELECT c.w, p.cost + c.cost AS cost, p.np + 1 AS np, "
                f"c.ln AS bp FROM cand c JOIN {prev} p ON p.w = c.w "
                f"WHERE c.st = {j - l + 1} AND c.ln = {l}"
            )
        parts.append(f"""
b{j} AS MATERIALIZED (SELECT w, cost, np, bp FROM (
  SELECT w, cost, np, bp,
         row_number() OVER (PARTITION BY w
                            ORDER BY cost, np, bp DESC) AS rk
  FROM ({' UNION ALL '.join(branches)})) WHERE rk = 1)""")
    bp_union = " UNION ALL ".join(
        f"SELECT w, {j} AS j, bp FROM b{j}"
        for j in range(1, _UNI_UNROLL + 1)
    )
    return f"""cand0 AS MATERIALIZED (
  SELECT w, unnest(flatten(list_transform(range(1, len(w)+1), i ->
      list_transform(range(1, least({UNI_P}, len(w)-i+1)+1), l ->
          struct_pack(st := i, ln := l,
                      piece := substr(w, i, l)))))) AS c
  FROM wf
),
cand AS MATERIALIZED (SELECT cand0.w, c.st AS st, c.ln AS ln, v.cost
         FROM cand0 JOIN vocab v ON v.piece = c.piece),
b0 AS MATERIALIZED (SELECT w, CAST(0 AS BIGINT) AS cost, 0 AS np FROM wf),{",".join(parts)},
bp AS MATERIALIZED ({bp_union}),
walk(w, j, enc) AS (
  SELECT w, CAST(len(w) AS INT), '' FROM wf
  UNION ALL
  SELECT k.w, CAST(k.j - p.bp AS INT),
         substr(k.w, k.j - p.bp + 1, p.bp)
           || CASE WHEN k.enc = '' THEN '' ELSE '{SEP}{SEP}' END || k.enc
  FROM walk k JOIN bp p ON p.w = k.w AND p.j = k.j
  WHERE k.j > 0
),
wenc AS MATERIALIZED (SELECT w, '{SEP}' || enc || '{SEP}' AS enc_w
         FROM walk WHERE j = 0)"""


ORACLE_UNIGRAM_ENCODE = f"""
WITH RECURSIVE {_uni_vocab_ctes()},
{_uni_dp_sql()},
d AS MATERIALIZED (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         w -> w != '') AS ws
      FROM documents),
occ0 AS MATERIALIZED (SELECT doc_id, unnest(list_transform(range(1, len(ws)+1),
             i -> struct_pack(pos := i, w := ws[i]))) AS o FROM d),
occ AS MATERIALIZED (SELECT doc_id, o.pos AS pos, o.w AS w FROM occ0),
enc_doc AS MATERIALIZED (
  SELECT o.doc_id, CAST(count(*) AS BIGINT) AS n_words,
         string_agg(we.enc_w, ' ' ORDER BY o.pos) AS enc
  FROM occ o JOIN wenc we ON we.w = o.w GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(e.n_words, 0) AS BIGINT) AS n_words,
       CAST((length(coalesce(e.enc, ''))
             - length(replace(coalesce(e.enc, ''), '{SEP}', ''))) // 2
            AS BIGINT) AS n_tokens,
       md5(coalesce(e.enc, '')) AS enc_md5
FROM documents d LEFT JOIN enc_doc e ON e.doc_id = d.doc_id
"""


def q_unigram_em_round(spark, sf_dir):
    """One hard-EM re-estimation round over the seed vocabulary
    (Viterbi E-step usage counts → re-derived fixed-point costs, unused
    multi-char pieces pruned, single chars floored at 1) — the
    SentencePiece train-loop step between seeding and encoding. The
    oracle re-runs the full seed + DP + walk replay and counts piece
    usage from the reconstructed encodings."""
    from ..operators.unigram import unigram_em_round, unigram_seed_vocab

    docs = _t(spark, sf_dir, "documents")
    return unigram_em_round(docs, unigram_seed_vocab(docs))


def _oracle_unigram_em() -> str:
    from ..functions.fixedpoint import ilog2_fp_duck_ctes

    return f"""
WITH RECURSIVE {_uni_vocab_ctes()},
{_uni_dp_sql()},
used0 AS MATERIALIZED (
  SELECT unnest(string_split(trim(enc_w, '{SEP}'), '{SEP}{SEP}'))
           AS piece,
         wf.cnt
  FROM wenc JOIN wf ON wf.w = wenc.w),
used AS MATERIALIZED (
  SELECT piece, CAST(sum(cnt) AS BIGINT) AS used FROM used0 GROUP BY 1),
kept AS MATERIALIZED (
  SELECT piece, used FROM used
  UNION ALL
  SELECT v.piece, CAST(1 AS BIGINT) FROM vocab v
  WHERE len(v.piece) = 1
    AND NOT EXISTS (SELECT 1 FROM used u WHERE u.piece = v.piece)),
ut AS (SELECT CAST(sum(used) AS BIGINT) AS utot FROM kept),
keptv AS (SELECT piece, used, utot FROM kept, ut),
{ilog2_fp_duck_ctes("ulg", "keptv", ["piece", "used"],
                    {"fu": "utot", "fs": "used"})}
SELECT piece, used AS cnt, CAST(fu - fs AS BIGINT) AS cost FROM ulg
"""


TOKENIZER_QUERIES = {
    "bpe_train_merges": (q_bpe_train_merges, ORACLE_BPE_TRAIN),
    "bpe_token_vocab": (q_bpe_token_vocab, ORACLE_BPE_VOCAB),
    "bpe_encode_corpus": (q_bpe_encode_corpus, ORACLE_BPE_ENCODE),
    # tokenize-on-arrival shares the batch oracle verbatim — one
    # definition pins both execution modes (15th streaming gate)
    "stream_bpe_encode": (q_stream_bpe_encode, ORACLE_BPE_ENCODE),
    "unigram_vocab_costs": (q_unigram_vocab_costs, ORACLE_UNIGRAM_VOCAB),
    "unigram_encode_corpus": (
        q_unigram_encode_corpus, ORACLE_UNIGRAM_ENCODE,
    ),
    # unigram encode-on-arrival shares the batch oracle (21st streaming
    # gate) — same unification check as stream_bpe_encode
    "stream_unigram_encode": (
        q_stream_unigram_encode, ORACLE_UNIGRAM_ENCODE,
    ),
    "unigram_em_round": (q_unigram_em_round, _oracle_unigram_em()),
}
