"""BPE training suite: DuckDB-oracle parity at sf0.01, a pure-Python
greedy-BPE reference (token-list semantics — deliberately NOT the
string-replace trick both engines share, so it checks the trick itself),
tie-break determinism, and degenerate-corpus guards."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from osm_pbf_parquet_spark.operators.bpe import bpe_train, bpe_vocab
from osm_pbf_parquet_spark.plans.tokenizer_queries import TOKENIZER_QUERIES

from oracle_harness import run_compare

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(TOKENIZER_QUERIES))
def test_tokenizer_oracle_parity(spark, name):
    fn, oracle = TOKENIZER_QUERIES[name]
    run_compare(spark, SF_DIR, name, fn, oracle)


# --- pure-Python reference: greedy BPE on token lists -----------------------


def _ref_words(texts):
    c = Counter()
    for t in texts:
        c.update(w for w in re.split(r"[^a-z]+", t.lower()) if w)
    return c


def _ref_merge_word(toks, pair):
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and (toks[i], toks[i + 1]) == pair:
            out.append(toks[i] + toks[i + 1])
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def _ref_bpe(texts, rounds):
    words = {w: (list(w), c) for w, c in _ref_words(texts).items()}
    merges = []
    for step in range(1, rounds + 1):
        pairs = Counter()
        for toks, c in words.values():
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # max count, then lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, best[0][0], best[0][1], best[1]))
        words = {
            w: (_ref_merge_word(toks, best[0]), c)
            for w, (toks, c) in words.items()
        }
    vocab = Counter()
    for toks, c in words.values():
        for t in toks:
            vocab[t] += c
    return merges, vocab


CORPUS = [
    "the cat sat on the mat",
    "the bats chatter, the cats scatter!",
    "at that, the hat fell flat",
    "lower lowest low low slower slowest",
]


def test_bpe_train_matches_python_reference(spark):
    docs = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    got = [
        (r.step, r.left_tok, r.right_tok, r.merged, r.pair_cnt)
        for r in bpe_train(docs, rounds=4).orderBy("step").collect()
    ]
    ref, _ = _ref_bpe(CORPUS, 4)
    assert got == [(s, a, b, a + b, c) for s, a, b, c in ref]


def test_bpe_vocab_matches_python_reference(spark):
    docs = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    got = {
        r.token: r.total_cnt
        for r in bpe_vocab(docs, rounds=3, k=1000).collect()
    }
    _, ref_vocab = _ref_bpe(CORPUS, 3)
    assert got == dict(ref_vocab)


def test_bpe_greedy_left_run_semantics(spark):
    # 'aaaa' must segment as (aa)(aa) and 'aaa' as (aa)(a) after merging
    # the dominant (a,a) pair — the leftmost-first contract the
    # string-replace implementation must honor inside runs.
    docs = spark.createDataFrame([("aaaa aaa aaaa",)], ["text"])
    rows = bpe_train(docs, rounds=1).collect()
    assert [(r.left_tok, r.right_tok) for r in rows] == [("a", "a")]
    # 'aaaa'×2 → 2 pairs each, 'aaa' → 1 pair... weighted by word count
    vocab = {
        r.token: r.total_cnt for r in bpe_vocab(docs, rounds=1, k=10).collect()
    }
    assert vocab == {"aa": 5, "a": 1}


def test_bpe_tiebreak_is_lexicographic(spark):
    # 'ab' and 'cd' both occur exactly twice: (a,b) must win over (c,d).
    docs = spark.createDataFrame([("ab cd",), ("cd ab",)], ["text"])
    rows = bpe_train(docs, rounds=1).collect()
    assert (rows[0].left_tok, rows[0].right_tok) == ("a", "b")


def test_bpe_degenerate_single_char_corpus(spark):
    # no adjacent pairs anywhere: zero merges, vocabulary passes through
    docs = spark.createDataFrame([("a b c a",)], ["text"])
    assert bpe_train(docs, rounds=2).count() == 0
    vocab = {
        r.token: r.total_cnt for r in bpe_vocab(docs, rounds=2, k=10).collect()
    }
    assert vocab == {"a": 2, "b": 1, "c": 1}
