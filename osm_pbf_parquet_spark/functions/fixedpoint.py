"""Integer fixed-point base-2 logarithm — data-dependent logs with
ZERO libm in either engine.

The repo's value-hash gates cannot tolerate libm ulp drift between
Spark and DuckDB (see ``ndcg_at_k``'s pre-scaled discount table, which
dodged the problem because its log arguments were compile-time
constants). Language-model scoring needs logs of DATA-DEPENDENT counts,
so a lookup table cannot work. This module implements

    ilog2_fp(x) ≈ floor(2^F · log2(x)),  F = 16 fraction bits

with the classic mantissa-squaring algorithm (Majithia & Levan 1973;
the "binary logarithm by repeated squaring" in Knuth TAOCP §1.2.2
ex. 25) using ONLY integer ops both engines define identically:

    msb = bit_length(x) − 1                      (via length(bin(x)))
    y   = x scaled to [2^F, 2^(F+1))             (integer shift)
    repeat F times:
        y = (y·y) div 2^F                        (square the mantissa)
        if y ≥ 2^(F+1): y = y div 2; emit bit 1  (mantissa passed 2 →
        else:                        emit bit 0   integer part gained
                                                  a bit, fold it out)
    ilog2_fp = msb·2^F + (emitted bits as an F-bit integer)

Every step is integer multiply/divide/compare, so Spark and DuckDB
produce bit-identical results, task retries cannot drift, and the
function is monotone non-decreasing in x (equal prefixes of emitted
bits force equal truncated mantissas). |ilog2_fp(x)/2^F − log2(x)| <
~2e-5 for x up to 2^62 — far below any LM-scoring need, and the
approximation error is DEFINED (both engines compute the same number,
which the oracle replays exactly).

Overflow: y < 2^(F+1) so y² < 2^(2F+2) = 2^34 — safe in BIGINT for any
BIGINT input. Inputs must be ≥ 1 (counts); x < 1 yields NULL.

Natural-log / bits conversion is the caller's concern: argmax/compare
uses are scale-free, and reporting in milli-bits is an exact integer
division (see ``kneser_ney_score``).
"""

from __future__ import annotations

ILOG2_F = 16  # fraction bits
_SC = 1 << ILOG2_F          # 65536
_SC2 = 1 << (ILOG2_F + 1)   # 131072


def ilog2_fp_py(x: int) -> int:
    """Reference implementation (tests + driver-side artifact costs)."""
    if x < 1:
        raise ValueError("ilog2_fp is defined for x >= 1")
    msb = x.bit_length() - 1
    y = (x >> (msb - ILOG2_F)) if msb >= ILOG2_F else (x << (ILOG2_F - msb))
    r = 0
    for _ in range(ILOG2_F):
        y = (y * y) >> ILOG2_F
        if y >= _SC2:
            y >>= 1
            r = 2 * r + 1
        else:
            r = 2 * r
    return (msb << ILOG2_F) + r


def ilog2_fp_sql(x: str) -> str:
    """Spark SQL expression computing ``ilog2_fp(x)`` for a BIGINT
    expression ``x`` — one ``aggregate`` fold over ``sequence(1, F)``,
    fully inside whole-stage codegen (no UDF, no shuffle)."""
    msb = f"CAST(length(bin({x})) - 1 AS BIGINT)"
    y0 = (
        f"CAST(CASE WHEN {msb} >= {ILOG2_F} "
        f"THEN shiftright({x}, CAST({msb} - {ILOG2_F} AS INT)) "
        f"ELSE shiftleft({x}, CAST({ILOG2_F} - {msb} AS INT)) END AS BIGINT)"
    )
    return (
        f"CASE WHEN {x} >= 1 THEN ({msb} * {_SC}) + aggregate("
        f"sequence(1, {ILOG2_F}), "
        f"struct({y0} AS y, CAST(0 AS BIGINT) AS r), "
        f"(acc, i) -> CASE WHEN (acc.y * acc.y) div {_SC} >= {_SC2} "
        f"THEN struct((acc.y * acc.y) div {_SC2} AS y, acc.r * 2 + 1 AS r) "
        f"ELSE struct((acc.y * acc.y) div {_SC} AS y, acc.r * 2 AS r) END, "
        f"acc -> acc.r) ELSE NULL END"
    )


def ilog2_fp_duck_ctes(name: str, src: str, keys: list[str],
                       vals: dict[str, str]) -> str:
    """DuckDB replay: emit CTE text (``name_base``, ``name_it``,
    ``name``) computing ``<out> = ilog2_fp(<expr>)`` for every
    ``out → expr`` in ``vals`` over rows of CTE ``src``, carrying the
    ``keys`` columns through. One recursive CTE iterates all value
    columns in lockstep — identical arithmetic to ``ilog2_fp_sql``."""
    base_cols = ", ".join(keys) if keys else ""
    base_sel = [base_cols] if base_cols else []
    it_cols = []
    base_vals = []
    steps = []
    finals = []
    for out, expr in vals.items():
        msb = f"CAST(length(bin({expr})) - 1 AS BIGINT)"
        base_vals.append(f"{msb} AS {out}_msb")
        base_vals.append(
            f"CAST(CASE WHEN {msb} >= {ILOG2_F} "
            f"THEN ({expr}) >> ({msb} - {ILOG2_F}) "
            f"ELSE ({expr}) << ({ILOG2_F} - {msb}) END AS BIGINT) AS {out}_y"
        )
        it_cols += [f"{out}_msb", f"{out}_y", f"{out}_r"]
        steps.append(
            f"{out}_msb, "
            f"CASE WHEN ({out}_y * {out}_y) // {_SC} >= {_SC2} "
            f"THEN ({out}_y * {out}_y) // {_SC2} "
            f"ELSE ({out}_y * {out}_y) // {_SC} END, "
            f"CASE WHEN ({out}_y * {out}_y) // {_SC} >= {_SC2} "
            f"THEN {out}_r * 2 + 1 ELSE {out}_r * 2 END"
        )
        finals.append(f"{out}_msb * {_SC} + {out}_r AS {out}")
    keyd = (base_cols + ", ") if base_cols else ""
    it_sig = keyd + ", ".join(it_cols) + ", it"
    init_r = ", ".join(
        f"{out}_msb, {out}_y, CAST(0 AS BIGINT) AS {out}_r" for out in vals
    )
    return f"""{name}_base AS (
  SELECT {', '.join(base_sel + base_vals)} FROM {src}
),
{name}_it({it_sig}) AS (
  SELECT {keyd}{init_r}, 0 FROM {name}_base
  UNION ALL
  SELECT {keyd}{', '.join(steps)}, it + 1
  FROM {name}_it WHERE it < {ILOG2_F}
),
{name} AS (
  SELECT {keyd}{', '.join(finals)} FROM {name}_it WHERE it = {ILOG2_F}
)"""
