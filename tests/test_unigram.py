"""Unigram-LM tokenizer: the Catalyst Viterbi DP must agree EXACTLY
with a sequential Python Viterbi under the same integer costs and tie
rule, on adversarial words (repeats, overlaps, unknown chars), and the
batch dictionary path must equal the streaming per-occurrence fold."""

from __future__ import annotations

import hashlib

import pytest

from hypothesis import given, settings, strategies as st

from osm_pbf_parquet_spark.functions.fixedpoint import ilog2_fp_py
from osm_pbf_parquet_spark.operators.unigram import (
    UNI_P,
    UNI_UNK_COST,
    _INF,
    unigram_encode_docs,
    unigram_seed_vocab,
)

SEP = "•"


def _ref_viterbi(word: str, costs: dict[str, int], p: int,
                 unk: int) -> list[str]:
    """Sequential reference: minimize (cost, n_pieces, longest-last-
    piece) lexicographically; unknown single chars cost `unk`."""
    n = len(word)
    # best[j] = (cost, np, nbp) with nbp = -piece_len of the last piece
    best = [(0, 0, 0)] + [None] * n
    for j in range(1, n + 1):
        cur = (9 * 10**17, 0, 0)
        for piece_len in range(1, min(p, j) + 1):
            piece = word[j - piece_len:j]
            c = costs.get(piece)
            if c is None:
                c = unk if piece_len == 1 else _INF
            prev = best[j - piece_len]
            cand = (prev[0] + c, prev[1] + 1, -piece_len)
            if cand < cur:
                cur = cand
        best[j] = cur
    out = []
    j = n
    while j > 0:
        piece_len = -best[j][2]
        out.append(word[j - piece_len:j])
        j -= piece_len
    return list(reversed(out))


def _enc(pieces: list[str]) -> str:
    return SEP + (SEP + SEP).join(pieces) + SEP


words_st = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=9), min_size=1, max_size=5
)
vocab_st = st.dictionaries(
    st.text(alphabet="abc", min_size=2, max_size=UNI_P),
    st.integers(min_value=1, max_value=10**6),
    max_size=8,
)


@settings(max_examples=15, deadline=None)
@given(words_st, vocab_st, st.sampled_from(["ab", "abc"]))
@pytest.mark.slow  # r13 driver tier: operator keeps oracle-parity coverage; full tier runs this each round
def test_viterbi_matches_sequential(spark, words, multi, alphabet):
    costs = {ch: 1000 * (ord(ch) - 96) for ch in alphabet}
    costs.update(multi)
    vocab = sorted(costs.items())
    text = " ".join(words)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    [row] = unigram_encode_docs(df, vocab).collect()
    ref_pieces = [_ref_viterbi(w, costs, UNI_P, UNI_UNK_COST)
                  for w in words]
    ref_enc = " ".join(_enc(ps) for ps in ref_pieces)
    assert row.n_words == len(words)
    assert row.n_tokens == sum(len(ps) for ps in ref_pieces)
    assert row.enc_md5 == hashlib.md5(ref_enc.encode()).hexdigest()


def test_unknown_chars_fall_back_to_unk(spark):
    """'q' is not in the vocabulary: it must segment as a single char at
    UNK cost, never block the DP."""
    vocab = [("a", 10), ("b", 10), ("ab", 5)]
    df = spark.createDataFrame(
        [(0, "aqb abqab")], "doc_id long, text string"
    )
    [row] = unigram_encode_docs(df, vocab).collect()
    ref = " ".join(
        _enc(_ref_viterbi(w, dict(vocab), UNI_P, UNI_UNK_COST))
        for w in ["aqb", "abqab"]
    )
    # aqb → a|q|b, abqab → ab|q|ab (merges beat singles around the unk)
    assert ref == _enc(["a", "q", "b"]) + " " + _enc(["ab", "q", "ab"])
    assert row.enc_md5 == hashlib.md5(ref.encode()).hexdigest()
    assert row.n_tokens == 6


def test_dictionary_path_equals_fold_path(spark):
    """The batch distinct-word dictionary plan and the streaming-style
    per-occurrence projection must produce byte-identical outputs
    (the bpe two-path unification check, applied to unigram)."""
    docs = [(i, t) for i, t in enumerate(
        ["the cat the cat cat", "", "a", "abcabc cababa", "the the the"]
    )]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    vocab = [r for r in unigram_seed_vocab(df)
             .select("piece", "cost").collect()]
    vocab = sorted((r.piece, r.cost) for r in vocab)
    batch = {r.doc_id: (r.n_words, r.n_tokens, r.enc_md5)
             for r in unigram_encode_docs(df, vocab).collect()}
    # the fold path is what streaming runs; exercise it on a batch frame
    # by calling the expression directly through a streaming=False
    # bypass: encode via the list-vocab pure projection
    from osm_pbf_parquet_spark.operators.bpe import _words_expr
    from osm_pbf_parquet_spark.operators.unigram import (
        _encode_word_expr,
        _vocab_map_expr,
    )
    from pyspark.sql import functions as F

    ws = _words_expr("text")
    vm = _vocab_map_expr(vocab)
    enc = (f"array_join(transform({ws}, w -> "
           f"{_encode_word_expr('w', vm, UNI_P, UNI_UNK_COST)}), ' ')")
    fold = {
        r.doc_id: (r.n_words, r.n_tokens, r.enc_md5)
        for r in df.select(
            "doc_id",
            F.expr(f"cast(size({ws}) AS BIGINT)").alias("n_words"),
            F.expr(enc).alias("_enc"),
        ).select(
            "doc_id", "n_words",
            F.expr(
                "cast((length(_enc) - length(replace(_enc, '•', ''))) "
                "DIV 2 AS BIGINT)"
            ).alias("n_tokens"),
            F.expr("md5(cast(_enc AS BINARY))").alias("enc_md5"),
        ).collect()
    }
    assert batch == fold


def test_seed_vocab_costs_are_fixedpoint_exact(spark):
    df = spark.createDataFrame(
        [(0, "aba ab aba"), (1, "ba ab")], "doc_id long, text string"
    )
    rows = {r.piece: (r.cnt, r.cost)
            for r in unigram_seed_vocab(df).collect()}
    # counts: substring occurrences weighted by word frequency over the
    # distinct-word table {aba:2, ab:2, ba:1}
    # 'a': aba has 2 per occurrence ×2 + ab 1×2 + ba 1×1 = 7
    assert rows["a"][0] == 7
    assert rows["b"][0] == 2 * 1 + 2 * 1 + 1 * 1
    assert rows["ab"][0] == 2 + 2          # in aba once, in ab once
    assert rows["aba"][0] == 2
    total = sum(c for c, _cost in rows.values())
    for piece, (cnt, cost) in rows.items():
        assert cost == ilog2_fp_py(total) - ilog2_fp_py(cnt), piece
    # rarer piece → strictly larger cost than the commonest char
    assert rows["aba"][1] > rows["a"][1]


def test_vocab_literal_rejects_non_word_pieces():
    import pytest

    from osm_pbf_parquet_spark.operators.unigram import _vocab_map_expr

    with pytest.raises(ValueError):
        _vocab_map_expr([("a'b", 1)])
    with pytest.raises(ValueError):
        _vocab_map_expr([("", 1)])


def test_em_round_matches_reference(spark):
    """Hard-EM usage counts and re-estimated costs vs a sequential
    composition of the reference Viterbi: segment each distinct word,
    count used pieces weighted by corpus word frequency, prune unused
    multis, floor unseen chars at 1, re-derive fixed-point costs."""
    from collections import Counter

    from osm_pbf_parquet_spark.operators.unigram import (
        unigram_em_round,
        unigram_seed_vocab,
    )

    docs = [(i, t) for i, t in enumerate(
        ["the cat the cat cat", "catcat thethe", "a cab act", "", "cat"]
    )]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    seed = {r.piece: r.cost for r in unigram_seed_vocab(df).collect()}
    got = {r.piece: (r.cnt, r.cost)
           for r in unigram_em_round(df, unigram_seed_vocab(df)).collect()}
    # reference: word frequencies over the same [a-z]+ tokenization
    words = Counter()
    import re as _re
    for _i, t in docs:
        words.update(w for w in _re.split("[^a-z]+", t.lower()) if w)
    used = Counter()
    for w, wc in words.items():
        for piece in _ref_viterbi(w, seed, UNI_P, UNI_UNK_COST):
            used[piece] += wc
    kept = dict(used)
    for piece in seed:
        if len(piece) == 1 and piece not in kept:
            kept[piece] = 1
    total = sum(kept.values())
    want = {p: (c, ilog2_fp_py(total) - ilog2_fp_py(c))
            for p, c in kept.items()}
    assert got == want
    # pruning really happened: the seed has multis the segmentation
    # never uses
    assert set(seed) - set(got), "expected at least one pruned piece"
