"""PersistSet lifecycle: Spark's CacheManager keys entries by PLAN
EQUALITY, so releasing one run's persists must not evict a later
identical run's still-live cache (the r6 bench-spread root cause:
min-of-3 reps of a cache-using anchor ran rep 1 cached, reps 2-3
evicted)."""

from __future__ import annotations

from pyspark.storagelevel import StorageLevel

from osm_pbf_parquet_spark.functions.caching import PersistSet


def _is_cached(df) -> bool:
    lvl = df.storageLevel
    return lvl.useMemory or lvl.useDisk


def test_release_keeps_identical_live_plan_cached(spark):
    """Two operator runs persist the same (semantic) plan; releasing the
    first run's set must NOT evict the second run's entry — only the
    last release unpersists."""
    ps1, ps2 = PersistSet(), PersistSet()
    df1 = ps1.persist(spark.range(64).selectExpr("id % 7 as k").distinct())
    df1.count()
    df2 = ps2.persist(spark.range(64).selectExpr("id % 7 as k").distinct())
    df2.count()
    assert _is_cached(df2)
    ps1.release()  # run 1 finishes first
    assert _is_cached(df2), (
        "releasing run 1's PersistSet evicted run 2's identical-plan "
        "cache (plan-equality unpersist, the pre-refcount behavior)"
    )
    ps2.release()
    assert not _is_cached(df2)


def test_release_unpersists_distinct_plans(spark):
    """Non-shared plans release immediately (no leak from refcounting)."""
    ps = PersistSet()
    df = ps.persist(spark.range(32).selectExpr("id * 3 as v").distinct())
    df.count()
    assert _is_cached(df)
    ps.release()
    assert not _is_cached(df)


def test_context_manager_releases(spark):
    with PersistSet() as ps:
        df = ps.persist(spark.range(16).selectExpr("id + 41 as v").distinct())
        df.count()
        assert _is_cached(df)
    assert not _is_cached(df)
