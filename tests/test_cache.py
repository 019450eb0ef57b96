"""scoped_caches: the release contract for long-running callers
(foreachBatch callbacks, driver-side shard loops) that can never reach
the global release_caches()."""

from mdataframe_spark import cache as _cache
from mdataframe_spark.cache import persist_tracked, scoped_caches


def test_scoped_caches_releases_only_inner_persists(spark):
    df_outer = spark.range(10)
    outer = persist_tracked(df_outer)
    outer.count()
    n_before = len(_cache._PERSISTED)
    jvm_before = spark.sparkContext._jsc.getPersistentRDDs().size()

    with scoped_caches():
        inner = persist_tracked(spark.range(20))
        inner.count()
        assert len(_cache._PERSISTED) == n_before + 1
        assert inner.storageLevel.useMemory

    # inner released (registry back to the mark, JVM block gone)...
    assert len(_cache._PERSISTED) == n_before
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == jvm_before
    assert not inner.storageLevel.useMemory
    # ...the pre-existing persist untouched
    assert outer.storageLevel.useMemory
    _cache.release_caches()


def test_scoped_caches_releases_on_exception(spark):
    n_before = len(_cache._PERSISTED)
    try:
        with scoped_caches():
            persist_tracked(spark.range(5)).count()
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert len(_cache._PERSISTED) == n_before
