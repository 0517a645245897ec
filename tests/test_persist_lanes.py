"""Lane-scoped persist bookkeeping (plans/core.persist_lane, r15).

The r14 verdict (item 5): the lazily-persisted per-corpus
intermediates (bigram c12, ccnet score proxy, capstone tokc) were
never unpersisted, so a long session touching many corpora accumulated
CacheManager entries per (lane, sf_dir) for its whole lifetime.
persist_lane bounds that to one corpus per lane: building the same
lane for a new sf_dir releases the previous corpus's entry. The
assertion rides ``sc._jsc.getPersistentRDDs()`` — the surface the
verdict named — which lists the cached RDDs backing materialized
InMemoryRelations.
"""

from __future__ import annotations

from map_reduce_framework_using_python_spark.plans.core import (
    _LANE_PERSISTS,
    REGISTRY,
)

from tests.conftest import SF_CORRECT, SF_SMOKE


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_bigram_lane_swaps_corpora_without_cache_growth(spark):
    spark.catalog.clearCache()
    base = _n_persistent(spark)

    REGISTRY["ns_bigram_lm_score"].fn(spark, SF_SMOKE).count()
    after_first = _n_persistent(spark)
    assert after_first > base  # the c12 persist materialized

    # Same corpus again: CacheManager dedups the identical plan — no
    # growth, and the lane registry still points at sf0.001.
    REGISTRY["ns_bigram_lm_score"].fn(spark, SF_SMOKE).count()
    assert _n_persistent(spark) == after_first
    assert _LANE_PERSISTS["bigram_c12"][0] == SF_SMOKE

    # New corpus: the previous corpus's entry is released (async, so
    # poll briefly), leaving the lane at one persisted corpus.
    REGISTRY["ns_bigram_lm_score"].fn(spark, SF_CORRECT).count()
    assert _LANE_PERSISTS["bigram_c12"][0] == SF_CORRECT
    import time

    for _ in range(50):
        if _n_persistent(spark) <= after_first:
            break
        time.sleep(0.1)
    assert _n_persistent(spark) <= after_first
    spark.catalog.clearCache()


def test_ccnet_lane_swaps_both_nested_lanes(spark):
    """_ccnet_scaled_assign persists BOTH its own score proxy and
    (via _bigram_lm) the c12 lane — a corpus swap must release both."""
    spark.catalog.clearCache()
    base = _n_persistent(spark)

    REGISTRY["ns_ccnet_buckets_scaled"].fn(spark, SF_SMOKE).count()
    after_first = _n_persistent(spark)
    assert after_first >= base + 2  # c12 + score proxy

    REGISTRY["ns_ccnet_buckets_scaled"].fn(spark, SF_CORRECT).count()
    assert _LANE_PERSISTS["ccnet_score_proxy"][0] == SF_CORRECT
    import time

    for _ in range(50):
        if _n_persistent(spark) <= after_first:
            break
        time.sleep(0.1)
    assert _n_persistent(spark) <= after_first
    spark.catalog.clearCache()
