"""persist_scoped lifecycle: one generation per scope, safe eviction."""


def test_persist_scoped_evicts_previous_generation(spark):
    from open_data_linter_spark.dedup._cache import _LIVE, persist_scoped

    a = persist_scoped("t.scope", spark.range(10))
    a.count()  # materialize
    assert a.storageLevel.useMemory
    b = persist_scoped("t.scope", spark.range(20))
    b.count()
    # previous generation evicted, new one live, registry holds exactly one
    assert not a.storageLevel.useMemory
    assert b.storageLevel.useMemory
    assert _LIVE["t.scope"] is b
    # different scope does not evict
    c = persist_scoped("t.other", spark.range(5))
    c.count()
    assert b.storageLevel.useMemory and c.storageLevel.useMemory
    b.unpersist()
    c.unpersist()


def test_persist_scoped_evicted_plan_still_computes(spark):
    from open_data_linter_spark.dedup._cache import persist_scoped

    a = persist_scoped("t.recompute", spark.range(100))
    assert a.count() == 100
    persist_scoped("t.recompute", spark.range(1)).count()
    # a's cache is gone but the plan recomputes fine
    assert a.count() == 100
