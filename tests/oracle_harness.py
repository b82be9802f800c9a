"""DuckDB-oracle comparison harness — mirrors the driver's correctness
check (row-count + schema + order-insensitive values) so failures surface
in pytest before the driver runs."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


# r13 suite-wall fix: several hundred parity tests each opened a fresh
# in-memory DuckDB and re-registered the 10 parquet views per call —
# pure per-test fixture overhead. One memoized connection per sf_dir
# serves every run_compare; views are read-only and each execute() is
# independent, so sharing changes nothing about what is compared.
_CON_MEMO: dict[str, duckdb.DuckDBPyConnection] = {}


def _duck_cached(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = _CON_MEMO.get(sf_dir)
    if con is None:
        con = _CON_MEMO[sf_dir] = duck_connect(sf_dir)
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = pd.to_datetime(s)
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif s.dtype == object:
            df[c] = s.where(pd.notna(s), None)
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str,
                   float_tol: float = 1e-9) -> None:
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch {list(a.columns)} vs {list(b.columns)}"
    )
    # the driver's value-hash is dtype-sensitive: an int column on one side
    # vs float on the other (e.g. DuckDB HUGEINT → pandas float64) hashes
    # differently even when values compare equal — r2's
    # multi_supplier_late_orders failure passed this harness before this
    # check existed. Require identical canonical dtypes.
    for c in a.columns:
        assert str(a[c].dtype) == str(b[c].dtype), (
            f"{name}.{c}: dtype mismatch spark={a[c].dtype} duck={b[c].dtype} "
            "— cast the oracle (HUGEINT sums → CAST AS BIGINT) or the query"
        )
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            both_nan = av.isna() & bv.isna()
            close = np.isclose(av.fillna(0), bv.fillna(0), rtol=float_tol, atol=1e-12)
            ok = (both_nan | (close & ~(av.isna() ^ bv.isna()))).all()
            exact = (both_nan | (av.fillna(0) == bv.fillna(0))).all()
            assert ok, f"{name}.{c}: float mismatch\n{a[~close][c].head()}\n{b[~close][c].head()}"
            if not exact:
                # surfacing near-misses that a strict hash would reject
                diffs = (~(both_nan | (av.fillna(0) == bv.fillna(0)))).sum()
                raise AssertionError(
                    f"{name}.{c}: {diffs} values differ in last ulp — tighten rounding"
                )
        else:
            eq = (av.isna() & bv.isna()) | (av == bv)
            assert eq.all(), (
                f"{name}.{c}: value mismatch, first diffs:\n"
                f"spark: {av[~eq].head(3).tolist()}\nduck:  {bv[~eq].head(3).tolist()}"
            )


def run_compare(spark, sf_dir: str, name: str, fn, oracle: str | None) -> None:
    sdf = fn(spark, sf_dir).toPandas()
    if oracle is None:
        assert len(sdf) >= 0
        return
    ddf = _duck_cached(sf_dir).execute(oracle).df()
    compare_frames(sdf, ddf, name)
