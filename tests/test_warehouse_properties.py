"""Property tests pinning the warehouse-maintenance distributed claims
against independent sequential Python references on arbitrary inputs:

- SCD-2 change-log compression ≡ a sequential sort-and-compress (runs
  of equal attr collapse; valid_to chains to the NEXT CHANGE's ts,
  open intervals stay NULL; version numbering over changes only)
- MERGE upsert ≡ dict-merge semantics on key-unique sides (updates
  replace, unmatched updates insert, unmatched target survives)
- the salted two-phase count(DISTINCT) ≡ the naive per-group distinct
  count on arbitrary skew (hot keys, NULL values skipped by both)
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from osm_pbf_parquet_spark.operators import ordered
from osm_pbf_parquet_spark.operators.skew import salted_distinct_count


# --- SCD-2 intervals vs sequential compression ---------------------------------------


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 3),      # key
            st.integers(0, 2),      # attr
            st.integers(0, 9),      # ts
        ),
        min_size=1,
        max_size=18,
    )
)
def test_scd2_intervals_match_sequential(spark, raw):
    # a per-key sequence number makes (ts, tiebreak) a total order even
    # when hypothesis repeats timestamps — same contract the operator
    # documents (tiebreak_col exists exactly for colliding ts)
    rows = [
        (k, a, ts, i) for i, (k, a, ts) in enumerate(raw)
    ]
    df = spark.createDataFrame(rows, "k long, attr long, ts long, tb long")
    got = {
        (r["k"], r["version_no"]): (r["attr"], r["valid_from"], r["valid_to"])
        for r in ordered.scd2_intervals(df, "k", "attr", "ts", "tb").collect()
    }
    want = {}
    for k in {r[0] for r in rows}:
        seq = sorted((r for r in rows if r[0] == k), key=lambda r: (r[2], r[3]))
        changes = [
            r for i, r in enumerate(seq) if i == 0 or r[1] != seq[i - 1][1]
        ]
        for v, r in enumerate(changes):
            nxt = changes[v + 1][2] if v + 1 < len(changes) else None
            want[(k, v + 1)] = (r[1], r[2], nxt)
    assert got == want


# --- MERGE upsert vs dict-merge semantics --------------------------------------------


@settings(max_examples=10, deadline=None)
@given(
    st.dictionaries(st.integers(1, 10), st.integers(0, 99), max_size=8),
    st.dictionaries(st.integers(1, 10), st.integers(100, 199), max_size=8),
)
def test_merge_upsert_matches_dict_merge(spark, target, updates):
    tdf = spark.createDataFrame(
        list(target.items()) or [(None, None)], "k long, v long"
    ).where("k IS NOT NULL")
    udf_ = spark.createDataFrame(
        list(updates.items()) or [(None, None)], "k long, v long"
    ).where("k IS NOT NULL")
    got = {
        r["k"]: r["v"]
        for r in ordered.merge_upsert(tdf, udf_, "k").collect()
    }
    assert got == {**target, **updates}


# --- salted two-phase distinct vs naive ----------------------------------------------


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            # key 0 drawn often: the hot-key shape the operator exists for
            st.sampled_from([0, 0, 0, 1, 2]),
            st.one_of(st.none(), st.integers(0, 6)),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_salted_distinct_matches_naive(spark, rows):
    df = spark.createDataFrame(rows, "key long, value long")
    got = {
        r["key"]: r["n_distinct_value"]
        for r in salted_distinct_count(df, ["key"], "value").collect()
    }
    want: dict[int, set] = {}
    for k, v in rows:
        want.setdefault(k, set())
        if v is not None:
            want[k].add(v)
    assert got == {k: len(s) for k, s in want.items()}
