"""Unigram-LM (SentencePiece-style) tokenizer: seed vocabulary +
Viterbi segmentation (Kudo, ACL 2018 "Subword Regularization" §3; the
non-BPE half of the SentencePiece toolkit, Kudo & Richardson, EMNLP
2018). The BPE lifecycle (``bpe.py``) covers merge-table tokenizers;
this covers the other production family: a piece vocabulary with costs,
and per-word shortest-path segmentation under those costs.

No libm anywhere: piece costs are integer fixed-point −log2
probabilities from ``functions.fixedpoint`` (mantissa squaring —
bit-identical in Spark and DuckDB), so Viterbi compares exact BIGINTs
and the whole train→encode lifecycle is value-hash gateable.

Scale shape:
  * vocabulary: ONE corpus-sized word-count shuffle (shared with BPE's
    ``word_frequency_table``), then substring counting over the
    DISTINCT-WORD frame (vocabulary-sized, not corpus-sized) and a
    top-K rank — the SentencePiece "seed vocab from substring
    frequencies" step (Kudo 2018 §3.2 trains probs by EM from such a
    seed; the seed's count-normalized costs are the EM's starting
    point and already define a proper segmentation objective).
  * encode: scan-speed projection. The DP is a Catalyst ``aggregate``
    fold over word positions — O(len · max_piece_len) integer ops per
    word, zero joins, zero UDFs. Batch corpora fold once per DISTINCT
    word and attach back by key (the bpe_encode_docs dictionary shape,
    r12); streaming keeps the pure per-occurrence projection (append
    mode forbids the regroup).

Reference parity: the reference engine ships no tokenizer — it
delegates downstream processing entirely (README.md:44-77); this is
part of the training-data-pipeline surface the engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.fixedpoint import ilog2_fp_sql
from .bpe import SEP, _N_TOKENS_EXPR, _words_expr, word_frequency_table

UNI_P = 4        # max piece length considered by vocab + DP
UNI_K = 24       # multi-char pieces kept in the seed vocabulary
UNI_UNK_COST = 10**9   # cost of an out-of-vocabulary single char
_INF = 10**12          # infeasible-candidate cost (no piece at (j, l))
_SENTINEL = 9 * 10**17  # inner-argmin init; > any feasible chain sum


def _pieces_expr(w: str, p: int) -> str:
    """All substrings of ``w`` up to length ``p`` (with multiplicity)."""
    return (
        f"flatten(transform(sequence(1, length({w})), i -> "
        f"transform(sequence(1, least({p}, length({w}) - i + 1)), "
        f"l -> substring({w}, i, l))))"
    )


def unigram_seed_vocab(
    docs: DataFrame,
    text_col: str = "text",
    max_piece_len: int = UNI_P,
    vocab_k: int = UNI_K,
) -> DataFrame:
    """Corpus → (piece, cnt, cost): every single character plus the
    top-``vocab_k`` multi-char substrings (≤ ``max_piece_len``) by
    occurrence count weighted by word frequency, with integer
    fixed-point costs −log2(cnt / total) over the SELECTED set.

    Single chars are always kept so Viterbi segmentation is total on
    the training corpus (the SentencePiece invariant: character
    coverage 1.0). Ties in the top-K cut break (cnt desc, piece asc) —
    a TakeOrderedAndProject over the distinct-substring frame (each
    partition keeps a local K-heap; the frame is distinct-words ×
    O(len·p) sized and grows with the corpus, so the pre-r12
    single-partition rank window was the scale straggler)."""
    words = word_frequency_table(docs, text_col)
    pieces = (
        words.select(
            F.explode(F.expr(_pieces_expr("w", max_piece_len)))
            .alias("piece"),
            "cnt",
        )
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    chars = pieces.filter(F.length("piece") == 1)
    # r12 optimization round: the top-K cut was a row_number over an
    # UNPARTITIONED window — every distinct substring moved to ONE
    # partition (WindowExec warns; the piece frame is vocabulary-sized
    # and grows with the corpus, so at scale that partition is the
    # straggler). orderBy().limit() lowers to TakeOrderedAndProject —
    # each partition keeps its local top-K heap, the driver merges
    # K-row heaps — and with the same total order (cnt desc, piece asc)
    # selects EXACTLY the rows the rank filter kept (the rank column
    # was dropped anyway).
    top = (
        pieces.filter(F.length("piece") > 1)
        .orderBy(F.desc("cnt"), "piece")
        .limit(vocab_k)
    )
    sel = chars.unionByName(top)
    tot = sel.agg(F.sum("cnt").cast("long").alias("vtot"))
    return (
        sel.crossJoin(F.broadcast(tot))
        .select(
            "piece", "cnt",
            F.expr(
                f"({ilog2_fp_sql('vtot')}) - ({ilog2_fp_sql('cnt')})"
            ).cast("long").alias("cost"),
        )
    )


def _encode_word_expr(w: str, vm: str, p: int, unk: int) -> str:
    """One-expression Viterbi encode of word ``w`` under piece-cost map
    ``vm`` → the ``•p1••p2•…•`` encoding (the BPE marker format, so
    token counting and md5 pinning are shared).

    best[j] (positions 1..len, best[0] = (0,0,0)) minimizes
    struct(cost, n_pieces, −piece_len) lexicographically — cheapest
    segmentation, then fewest pieces, then longest final piece: a
    deterministic backpointer with no RNG and no float. Unknown single
    chars cost ``unk``; absent longer pieces are infeasible (the
    ``_INF`` guard; the sentinel exceeds any feasible chain by design
    — 1e5 positions × (UNK + piece cost) still sits 100× under it).

    The DP table is bound ONCE via transform(array(dp), a -> walk) —
    the let-binding idiom — so the backpointer walk does not recompute
    the fold per reference."""
    pc = (
        f"coalesce(element_at({vm}, substring({w}, j - l + 1, l)), "
        f"CASE WHEN l = 1 THEN CAST({unk} AS BIGINT) "
        f"ELSE CAST({_INF} AS BIGINT) END)"
    )
    cand = (
        f"struct(element_at(acc, j - l + 1).cost + {pc} AS cost, "
        f"element_at(acc, j - l + 1).np + 1 AS np, "
        f"CAST(-l AS INT) AS nbp)"
    )
    inner = (
        f"aggregate(sequence(1, least({p}, j)), "
        f"struct(CAST({_SENTINEL} AS BIGINT) AS cost, "
        f"CAST(0 AS INT) AS np, CAST(0 AS INT) AS nbp), "
        f"(m, l) -> CASE WHEN {cand} < m THEN {cand} ELSE m END)"
    )
    dp = (
        f"aggregate(sequence(1, length({w})), "
        f"array(struct(CAST(0 AS BIGINT) AS cost, CAST(0 AS INT) AS np, "
        f"CAST(0 AS INT) AS nbp)), "
        f"(acc, j) -> concat(acc, array({inner})))"
    )
    walk = (
        f"aggregate(sequence(1, length({w})), "
        f"struct(CAST(length({w}) AS INT) AS j, '' AS enc), "
        f"(st, i) -> CASE WHEN st.j <= 0 THEN st ELSE struct("
        f"CAST(st.j + element_at(a, st.j + 1).nbp AS INT) AS j, "
        f"substring({w}, st.j + element_at(a, st.j + 1).nbp + 1, "
        f"-element_at(a, st.j + 1).nbp) "
        f"|| CASE WHEN st.enc = '' THEN '' ELSE '{SEP}{SEP}' END "
        f"|| st.enc AS enc) END)"
    )
    return (
        f"element_at(transform(array({dp}), a -> "
        f"'{SEP}' || ({walk}).enc || '{SEP}'), 1)"
    )


def _vocab_map_expr(vocab: list) -> str:
    """Shipped-artifact vocabulary → a map literal (the stream_bpe
    merge-table idiom): [(piece, cost), …] as ``map(...)`` with BIGINT
    costs. Pieces are ``[a-z]+`` substrings by construction."""
    if not vocab:
        return "map()"
    for piece, cost in vocab:
        if not piece or not piece.isalpha() or not piece.islower():
            raise ValueError(f"non-[a-z]+ piece in vocabulary: {piece!r}")
    entries = ", ".join(
        f"'{piece}', CAST({int(cost)} AS BIGINT)" for piece, cost in vocab
    )
    return f"map({entries})"


def unigram_encode_docs(
    docs: DataFrame,
    vocab,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = UNI_P,
    unk_cost: int = UNI_UNK_COST,
) -> DataFrame:
    """Viterbi-encode every document under a unigram-LM piece
    vocabulary — the apply side of the SentencePiece lifecycle, output-
    compatible with ``bpe_encode_docs``: (id_col, n_words, n_tokens,
    enc_md5), the md5 pinning the full segmentation.

    ``vocab``: the ``unigram_seed_vocab`` frame (batch: aggregated to a
    ONE-ROW broadcast map, so encode is a scan-speed projection), or a
    ``[(piece, cost), …]`` list (shipped-artifact form; required under
    streaming, where it inlines as a map literal and the whole encode
    is a stateless append-mode projection).

    Batch corpora fold once per DISTINCT word and attach back by key —
    the bpe_encode_docs dictionary shape: Zipf makes distinct words ≪
    occurrences, so the O(len·p) DP runs on the small frame and the
    corpus pays two keyed exchanges (join on w, regroup by doc).
    Streaming runs the DP per occurrence (micro-batches bound it)."""
    ws = _words_expr(text_col)
    if isinstance(vocab, list):
        vm_attach = None
        vm = _vocab_map_expr(vocab)
    else:
        vm_attach = F.broadcast(
            vocab.agg(
                F.map_from_entries(
                    F.collect_list(F.struct("piece", "cost"))
                ).alias("_vm")
            )
        )
        vm = "_vm"
    if docs.isStreaming:
        if vm_attach is not None:
            raise ValueError(
                "streaming encode needs the shipped-artifact vocabulary "
                "list — collect unigram_seed_vocab first (bounded: "
                "vocab_k + alphabet rows)"
            )
        enc = (
            f"array_join(transform({ws}, w -> "
            f"{_encode_word_expr('w', vm, max_piece_len, unk_cost)}), ' ')"
        )
        return (
            docs.select(
                id_col,
                F.expr(f"cast(size({ws}) AS BIGINT)").alias("n_words"),
                F.expr(enc).alias("_enc"),
            )
            .select(
                id_col,
                "n_words",
                F.expr(_N_TOKENS_EXPR).alias("n_tokens"),
                F.expr("md5(cast(_enc AS BINARY))").alias("enc_md5"),
            )
        )
    occ = docs.select(
        id_col, F.posexplode_outer(F.expr(ws)).alias("_pos", "w")
    )
    dictionary = occ.select("w").where(F.col("w").isNotNull()).distinct()
    if vm_attach is not None:
        dictionary = dictionary.crossJoin(vm_attach)
    dictionary = dictionary.select(
        "w",
        F.expr(_encode_word_expr("w", vm, max_piece_len, unk_cost))
        .alias("_enc_w"),
    )
    return (
        occ.join(dictionary, "w", "left")
        .groupBy(id_col)
        .agg(
            F.count("w").alias("n_words"),
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "CASE WHEN w IS NOT NULL THEN struct(_pos, _enc_w) END)), "
                "s -> s._enc_w), ' ')"
            ).alias("_enc"),
        )
        .select(
            id_col,
            F.col("n_words").cast("long").alias("n_words"),
            F.expr(_N_TOKENS_EXPR).alias("n_tokens"),
            F.expr("md5(cast(_enc AS BINARY))").alias("enc_md5"),
        )
    )


def unigram_em_round(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    max_piece_len: int = UNI_P,
    unk_cost: int = UNI_UNK_COST,
) -> DataFrame:
    """One hard-EM re-estimation round of the unigram LM (the Viterbi-
    approximated E-step of Kudo 2018 §3.2's EM loop, plus the prune
    step): segment every DISTINCT word under the current costs
    (E-step), count how often each piece is actually USED weighted by
    word frequency, and re-derive costs from the usage distribution
    (M-step). Pieces no segmentation uses are PRUNED — the SentencePiece
    vocabulary-shrink move — except single characters, which are always
    retained at a usage floor of 1 (character coverage 1.0, the same
    invariant the seed vocabulary establishes; a floor because the
    fixed-point log needs cnt ≥ 1 and a zero-usage char still must be
    encodable later).

    Iterating seed → em_round → em_round … → encode is the full
    SentencePiece training shape; each round costs ONE pass over the
    distinct-word frame (the DP fold) + a piece-count agg — nothing
    corpus-sized beyond the word-frequency shuffle the seed already
    paid (pass the same ``words`` via docs; the operator re-derives it,
    Catalyst dedupes nothing across calls — persist upstream when
    chaining many rounds).

    Returns (piece, cnt, cost): usage counts and re-estimated
    fixed-point costs, schema-identical to ``unigram_seed_vocab`` so
    rounds compose."""
    words = word_frequency_table(docs, text_col)
    vm_attach = F.broadcast(
        vocab.agg(
            F.map_from_entries(
                F.collect_list(F.struct("piece", "cost"))
            ).alias("_vm")
        )
    )
    segmented = (
        words.crossJoin(vm_attach)
        .select(
            "w", "cnt",
            F.expr(
                _encode_word_expr("w", "_vm", max_piece_len, unk_cost)
            ).alias("_enc_w"),
        )
    )
    used = (
        segmented.select(
            F.explode(
                F.expr(f"split(trim(BOTH '{SEP}' FROM _enc_w), "
                       f"'{SEP}{SEP}')")
            ).alias("piece"),
            "cnt",
        )
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("used"))
    )
    floor_chars = (
        vocab.filter(F.length("piece") == 1)
        .select("piece")
        .join(used, "piece", "left_anti")
        .withColumn("used", F.lit(1).cast("long"))
    )
    kept = used.unionByName(floor_chars)
    tot = kept.agg(F.sum("used").cast("long").alias("utot"))
    return (
        kept.crossJoin(F.broadcast(tot))
        .select(
            "piece",
            F.col("used").alias("cnt"),
            F.expr(
                f"({ilog2_fp_sql('utot')}) - ({ilog2_fp_sql('used')})"
            ).cast("long").alias("cost"),
        )
    )
