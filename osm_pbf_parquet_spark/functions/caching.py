"""Persist-lifetime management for operators that cache intermediates.

Several operators (LSH signatures, CMS term counts, IVF cell
assignments, k-means feature vectors) persist an intermediate DataFrame
because two or more branches of the returned plan reuse it. The
functions return LAZY plans, so there is no safe unpersist point inside
them — but leaving blocks cached forever is a session-level leak
(previously papered over by a "callers clearCache() between sketches"
convention).

Two explicit lifecycles replace that convention:

- **Caller-managed**: pass a ``PersistSet`` into the operator and call
  ``release()`` (or use it as a context manager) once the returned plan
  has been acted on. Deterministic, for callers that chain many
  operators in one session.
- **Automatic (default)**: when the caller passes nothing, the operator
  ties release to the *result* DataFrame's lifetime via
  ``weakref.finalize`` — CPython's refcounting unpersists the
  intermediates as soon as the caller drops the result (typically right
  after ``.collect()``/``.count()``), so no blocks outlive the query.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

# Spark's CacheManager keys cache entries by PLAN EQUALITY, not by
# DataFrame instance: unpersist() on frame A evicts the entry of any
# OTHER still-live frame B with the same canonicalized plan (verified:
# persist+count df1, persist an identical df2, df1.unpersist() →
# df2.storageLevel drops to uncached). Without the refcount below, two
# sequential runs of the same operator on the same input silently race
# WHENEVER the first result outlives the second run's persist calls (a
# driver or notebook holding results across runs — observed directly as
# pagerank's supersteps recomputing the whole edge chain uncached in
# the plan-audit repro): releasing run 1's set evicts run 2's freshly
# persisted intermediates. Prompt-release patterns (bench's
# thunk-scoped results, whose finalizer fires before the next rep
# persists) were never exposed. ``_LIVE`` counts live persists per
# semantic plan so only the LAST release of a plan actually
# unpersists. ``semanticHash``
# collisions (32-bit) at worst leak one entry until session end;
# an external ``spark.catalog.clearCache()`` at worst strands a count,
# making a later release skip one unpersist — both bounded, neither
# affects results.
_LIVE: dict[int, int] = {}


class PersistSet:
    """Tracks DataFrames persisted on a caller's behalf.

    Usage::

        with PersistSet() as ps:
            pairs = lsh_ann_pairs(df, dim=16, cache=ps)
            pairs.count()
        # signature table unpersisted here
    """

    def __init__(self) -> None:
        self._dfs: list[tuple[DataFrame, int | None]] = []

    def persist(self, df: DataFrame) -> DataFrame:
        try:
            key = df.semanticHash()
        except Exception:
            key = None
        if key is not None:
            _LIVE[key] = _LIVE.get(key, 0) + 1
        self._dfs.append((df.persist(), key))
        return df

    def release(self) -> None:
        dfs, self._dfs = self._dfs, []
        for df, key in dfs:
            if key is not None:
                left = _LIVE.get(key, 1) - 1
                if left > 0:
                    _LIVE[key] = left
                    continue  # an identical plan is still live elsewhere
                _LIVE.pop(key, None)
            try:
                df.unpersist()
            except Exception:
                # session already stopped (interpreter shutdown) — blocks
                # are gone with the executors anyway
                pass

    def __enter__(self) -> "PersistSet":
        return self

    def __exit__(self, *exc) -> bool:
        self.release()
        return False


def owned_set(cache: PersistSet | None) -> tuple[PersistSet, bool]:
    """Resolve an operator's ``cache`` parameter: the caller's set (they
    release) or a fresh operator-owned one (released automatically when
    the result is garbage-collected — see ``tie_release``)."""
    return (PersistSet(), True) if cache is None else (cache, False)


def tie_release(result: DataFrame, ps: PersistSet, owned: bool) -> DataFrame:
    """For an operator-owned ``PersistSet``, unpersist its blocks when
    ``result`` is garbage-collected. The finalizer holds only ``ps``
    (never ``result``), so it fires as soon as the caller drops the
    returned DataFrame."""
    if owned:
        weakref.finalize(result, ps.release)
    return result
