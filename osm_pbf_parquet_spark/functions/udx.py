"""User-defined extension surface: Python UDTF and pandas UDAF.

The reference's only extension points are Rust closures handed to
``for_each`` / ``par_map_reduce`` / ``read_ways_and_deps``
(``osmpbf/src/reader.rs:67,119``, ``osmpbf/src/indexed.rs:264``). The
Spark engine's equivalents are typed, optimizer-visible extension
points; this module exercises the two not already covered elsewhere
(scalar pandas UDFs and mapInArrow/mapInPandas kernels are used
throughout operators/):

- **UDTF** (``top_words_udtf``): a Python table function consumed via
  SQL ``LATERAL`` — one input row fans out to N output rows with
  schema declared up front. Arrow-batched (``useArrow``): rows move in
  columnar batches, not pickled one by one.
- **UDAF** (``median_udaf``): a grouped-aggregate pandas UDF — the
  whole group's column arrives as one pandas Series per group. Spark
  plans it as a full-shuffle aggregate (no partial aggregation — the
  semantics of a median don't decompose), which is exactly the
  documented trade-off vs built-in ``percentile_approx`` at scale.

Scale note: a grouped-agg UDAF materializes each group in one executor.
Fine for bounded groups (per-language stats); for unbounded groups
prefer the sketch/exact-percentile operators in plans/relational.py.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf

TOP_WORDS_K = 3


@udtf(returnType="word: string, n: int", useArrow=True)
class TopWordsUdtf:
    """Top-k most frequent whitespace words per document; deterministic
    tie-break by (count desc, word asc)."""

    def eval(self, text: str):
        if text is None:
            return
        counts = Counter(text.split(" "))
        for word, n in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_WORDS_K]:
            yield word, n


def register_udtfs(spark) -> None:
    spark.udtf.register("top_words", TopWordsUdtf)


@pandas_udf("double")
def median_udaf(v: pd.Series) -> float:
    """Exact median as a grouped-agg pandas UDF. On whole-number inputs
    the midpoint average is FP-exact, so the DuckDB ``quantile_cont``
    oracle matches bit-for-bit."""
    return float(np.median(v.to_numpy(dtype=np.float64)))


def cogroup_reconcile(events: "DataFrame", orders: "DataFrame") -> "DataFrame":
    """Per-key reconciliation of two fact streams via
    ``groupby().cogroup().applyInPandas`` — the two-sided grouped-map
    API (each key's rows from BOTH frames arrive as pandas frames in one
    call; no join materialization of the pair space).

    Emits one row per key present on either side: row/value totals from
    each frame and their deltas. Determinism: monetary values are
    scaled to exact integer cents before summation (numpy int64 sums
    are order-independent; float sums are not), so a SQL oracle pins
    the output bit-for-bit.

    Scale: cogroup shuffles each side ONCE on the key — the same cost
    as the aggregate-then-outer-join plan — while keeping per-key logic
    in vectorized pandas; state is bounded by the largest single key
    group."""
    import numpy as np

    def _cents(series: pd.Series) -> "np.ndarray":
        # match the engines' round-half-AWAY-FROM-ZERO (DuckDB round /
        # Spark F.round HALF_UP) — np.round is half-to-even and diverges
        # on exact .5 products (e.g. 0.125*100); NULLs drop out like a
        # SQL sum (NaN.astype(int64) is silent garbage otherwise)
        x = series.to_numpy(dtype="float64") * 100.0
        x = x[~np.isnan(x)]
        return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype("int64")

    def reconcile(key, ev: pd.DataFrame, od: pd.DataFrame) -> pd.DataFrame:
        ev_cents = _cents(ev["value"])
        od_cents = _cents(od["o_totalprice"])
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [np.int64(len(ev))],
                "n_orders": [np.int64(len(od))],
                "event_cents": [ev_cents.sum(dtype="int64")],
                "order_cents": [od_cents.sum(dtype="int64")],
                "delta_cents": [
                    od_cents.sum(dtype="int64") - ev_cents.sum(dtype="int64")
                ],
            }
        )

    return (
        events.groupby("user_id")
        .cogroup(orders.groupby("user_id"))
        .applyInPandas(
            reconcile,
            schema=(
                "user_id long, n_events long, n_orders long, "
                "event_cents long, order_cents long, delta_cents long"
            ),
        )
    )
