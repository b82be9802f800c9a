"""Property test for BPE merge training: the distributed plan (corpus →
word-frequency shuffle → per-round pair-count agg + 1-row argmax
broadcast + replace rewrite) must produce the IDENTICAL merge table to
a sequential pure-Python reference on arbitrary corpora — same winning
pairs, same tie-breaks, same greedy-left rewrite effects feeding the
next round. Tiny alphabets maximize merge collisions and tie pressure,
the shapes where argmax ordering and overlapping-pair semantics
diverge first (e.g. 'aaaa' → pair (a,a) counted 3×, merged
non-overlapping left-to-right)."""

from __future__ import annotations

import pytest

import re
from collections import Counter

from hypothesis import given, settings, strategies as st

from osm_pbf_parquet_spark.operators.bpe import SEP, bpe_train

words = st.text(alphabet="ab", min_size=1, max_size=4)
docs = st.lists(
    st.lists(words, min_size=1, max_size=5).map(" ".join),
    min_size=1,
    max_size=6,
)


def _ref_bpe(texts: list[str], rounds: int):
    counts = Counter(
        w
        for t in texts
        for w in re.split(r"[^a-z]+", t.lower())
        if w
    )
    enc = {w: SEP + (SEP + SEP).join(w) + SEP for w in counts}
    merges = []
    for step in range(1, rounds + 1):
        pairs: Counter = Counter()
        for w, c in counts.items():
            toks = enc[w].strip(SEP).split(SEP + SEP)
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break  # engine: empty argmax frame → zero rows this round
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, a, b, a + b, cnt))
        pat, rep = f"{SEP}{a}{SEP}{SEP}{b}{SEP}", f"{SEP}{a}{b}{SEP}"
        # str.replace scans left-to-right, non-overlapping — the same
        # greedy-left contract as the engine's Spark `replace`
        enc = {w: e.replace(pat, rep) for w, e in enc.items()}
    return merges


@settings(max_examples=8, deadline=None)
@given(docs)
@pytest.mark.slow  # r13 driver tier: operator keeps oracle-parity coverage; full tier runs this each round
def test_bpe_train_matches_sequential_reference(spark, texts):
    rounds = 3
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = sorted(
        (r["step"], r["left_tok"], r["right_tok"], r["merged"], r["pair_cnt"])
        for r in bpe_train(df, rounds=rounds).collect()
    )
    want = sorted(_ref_bpe(texts, rounds))
    assert got == want, (texts, got, want)


def test_bpe_dictionary_matches_fold_many_merges(spark):
    """r12 (r11 verdict Next #3 done-criterion): the distinct-word
    dictionary apply and the per-occurrence fold apply must stay
    byte-identical — (n_words, n_tokens, enc_md5) per document — at a
    merge-table size where the restructure actually matters (300
    merges, two orders of magnitude past the 3-merge gate). The merge
    list is synthetic but adversarial: early merges create tokens later
    merges consume (chains like a+a→aa, aa+a→aaa), repeated-char runs
    exercise the greedy-left non-overlap rule, and most merges never
    fire (a real vocabulary applied to a small doc), so the fold's
    no-op steps are covered too."""
    from osm_pbf_parquet_spark.operators.bpe import (
        _bpe_encode_docs_fold, bpe_encode_docs,
    )

    merges = []
    # chains: x+x -> xx, xx+x -> xxx, xxx+x -> xxxx for every letter
    for ch in "abcdefghij":
        merges += [(ch, ch), (ch * 2, ch), (ch * 3, ch)]
    # cross-letter pairs, most of which never fire on the corpus below
    letters = "abcdefghijklmnopqrstuvwxyz"
    for i in range(270):
        a = letters[i % 26] * (i % 3 + 1)
        b = letters[(i * 7 + 3) % 26]
        merges.append((a, b))
    assert len(merges) == 300

    texts = []
    for i in range(40):
        ws = []
        for j in range(1 + i % 7):
            ch = letters[(i * 31 + j * 11) % 26]
            ws.append(ch * (1 + (i + j) % 6) + letters[(i + j * 5) % 26])
        texts.append(" ".join(ws) + (" 42!" if i % 3 == 0 else ""))
    texts.append("")  # empty doc: both paths must yield md5('')
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    via_dict = sorted(map(tuple, bpe_encode_docs(docs, merges).collect()))
    via_fold = sorted(map(tuple, _bpe_encode_docs_fold(docs, merges).collect()))
    assert via_dict == via_fold
    assert len(via_dict) == len(texts)
