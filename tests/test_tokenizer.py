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


# --- encode side: apply the learned table to documents ----------------------


def _ref_encode_doc(text, merges):
    """Per-doc reference encode in TOKEN-LIST semantics (one greedy-left
    pass per merge) — independent of the string-replace trick."""
    words = [w for w in re.split(r"[^a-z]+", text.lower()) if w]
    toklists = [list(w) for w in words]
    for a, b in merges:
        toklists = [_ref_merge_word(t, (a, b)) for t in toklists]
    enc = " ".join("•" + "••".join(t) + "•" for t in toklists)
    return len(words), sum(len(t) for t in toklists), enc


def test_bpe_encode_matches_python_reference(spark):
    import hashlib

    from osm_pbf_parquet_spark.operators.bpe import bpe_encode_docs

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )
    merges_df = bpe_train(docs, rounds=3)
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["enc_md5"])
        for r in bpe_encode_docs(docs, merges_df).collect()
    }
    ref_merges = [(a, b) for _, a, b, _ in _ref_bpe(CORPUS, 3)[0]]
    want = {}
    for i, t in enumerate(CORPUS):
        nw, nt, enc = _ref_encode_doc(t, ref_merges)
        want[i] = (nw, nt, hashlib.md5(enc.encode()).hexdigest())
    assert got == want
    # unification with the vocabulary readout: corpus token mass agrees
    vocab_total = sum(
        r["total_cnt"] for r in bpe_vocab(docs, rounds=3, k=10**6).collect()
    )
    assert vocab_total == sum(nt for _, nt, _ in want.values())


def test_bpe_encode_literal_merges_match_frame_merges(spark):
    """The shipped-artifact form (collected (left, right) literals — the
    streaming gate's path) must encode identically to the in-plan
    broadcast of the merge frame."""
    from osm_pbf_parquet_spark.operators.bpe import bpe_encode_docs

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )
    merges_df = bpe_train(docs, rounds=3)
    lits = [
        (r["left_tok"], r["right_tok"])
        for r in merges_df.orderBy("step").collect()
    ]
    via_frame = sorted(map(tuple, bpe_encode_docs(docs, merges_df).collect()))
    via_lits = sorted(map(tuple, bpe_encode_docs(docs, lits).collect()))
    assert via_frame == via_lits


def test_bpe_encode_edge_docs(spark):
    import hashlib

    from osm_pbf_parquet_spark.operators.bpe import bpe_encode_docs

    docs = spark.createDataFrame(
        [(0, "123 !!"), (1, ""), (2, "abc de")], ["doc_id", "text"]
    )
    # empty merge table: char-level tokens, letterless docs hash md5('')
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["enc_md5"])
        for r in bpe_encode_docs(docs, []).collect()
    }
    empty_md5 = hashlib.md5(b"").hexdigest()
    assert got[0] == (0, 0, empty_md5)
    assert got[1] == (0, 0, empty_md5)
    enc = "•a••b••c• •d••e•"
    assert got[2] == (2, 5, hashlib.md5(enc.encode()).hexdigest())


from hypothesis import given as _given, settings as _settings
from hypothesis import strategies as _st

_word = _st.text(alphabet="ab", min_size=1, max_size=4)
_doc = _st.lists(_word, min_size=0, max_size=6).map(" ".join)


@_settings(max_examples=8, deadline=None)
@_given(_st.lists(_doc, min_size=1, max_size=5))
@pytest.mark.slow  # r13 driver tier: operator keeps oracle-parity coverage; full tier runs this each round
def test_bpe_encode_matches_reference_on_arbitrary_corpora(spark, texts):
    """Hypothesis sweep: train-then-encode agrees with the token-list
    reference on arbitrary small corpora — runs of repeated characters
    (greedy-left inside runs), single-char words, empty docs."""
    import hashlib

    from osm_pbf_parquet_spark.operators.bpe import bpe_encode_docs

    rounds = 2
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges_df = bpe_train(docs, rounds=rounds)
    ref_merges = [(a, b) for _, a, b, _ in _ref_bpe(texts, rounds)[0]]
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["enc_md5"])
        for r in bpe_encode_docs(docs, merges_df).collect()
    }
    want = {}
    for i, t in enumerate(texts):
        nw, nt, enc = _ref_encode_doc(t, ref_merges)
        want[i] = (nw, nt, hashlib.md5(enc.encode()).hexdigest())
    assert got == want


def test_bpe_encode_rejects_non_vocabulary_literal_tokens(spark):
    """Shipped-artifact merges inline as SQL literals — anything outside
    the trainer's [a-z]+ vocabulary must raise, not mis-quote."""
    from osm_pbf_parquet_spark.operators.bpe import bpe_encode_docs

    docs = spark.createDataFrame([(0, "ab ab")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="merge tokens"):
        bpe_encode_docs(docs, [("a'b", "c")])
    with pytest.raises(ValueError, match="merge tokens"):
        bpe_encode_docs(docs, [("", "c")])
