"""LRUQueryCache + UsageTrackingQueryCachingPolicy behavior.

Reference behavior (LRUQueryCache.java, UsageTrackingQueryCachingPolicy.java;
demo lucene/util/LRUCacheTest.java): trivial queries are never cached; costly
queries become cacheable at 2 sightings, cheap composites at 5; eviction is
least-recently-used; cached results equal uncached ones; hit/miss/cache/
eviction counters match the access history.
"""

import pytest

from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.querycache import (
    LRUQueryCache, UsageTrackingQueryCachingPolicy)
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher

DOCS = [
    (0, "spark index engine"),
    (1, "spark merge policy"),
    (2, "table scan spark"),
    (3, "merge sort table"),
    (4, "spark spark spark table"),
    (5, "scan plan scale"),
]


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("qc")) + "/idx"
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, docs, "doc_id", "text", d,
                docs_per_segment=3, int_keys=True, term_shards=4)
    return IndexSearcher(spark, d)


def _ids(df):
    return sorted((int(r["segment_id"]), int(r["docid"]))
                  for r in df.collect())


def test_policy_thresholds():
    p = UsageTrackingQueryCachingPolicy()
    costly = Q.PrefixQuery("sc")
    cheap = Q.BooleanQuery(should=(Q.TermQuery("spark"), Q.TermQuery("table")))
    # never-cache class
    assert not p.should_cache(Q.TermQuery("spark"))
    p.on_use(Q.TermQuery("spark"))
    assert not p.should_cache(Q.TermQuery("spark"))
    # costly: cacheable at the 2nd sighting
    p.on_use(costly)
    assert not p.should_cache(costly)
    p.on_use(costly)
    assert p.should_cache(costly)
    # cheap composite: cacheable at the 5th sighting
    for i in range(4):
        p.on_use(cheap)
        assert not p.should_cache(cheap) or i >= 4
    p.on_use(cheap)
    assert p.should_cache(cheap)


def test_cached_results_equal_and_counters(searcher):
    cache = LRUQueryCache(max_entries=4)
    q = Q.PrefixQuery("sc")
    direct = _ids(searcher.matches_df(q))
    r1 = _ids(cache.cached_matches(searcher, q))  # miss (1st sighting)
    r2 = _ids(cache.cached_matches(searcher, q))  # miss, NOW cached (2nd)
    r3 = _ids(cache.cached_matches(searcher, q))  # hit
    assert direct == r1 == r2 == r3
    assert cache.stats.miss_count == 2
    assert cache.stats.hit_count == 1
    assert cache.stats.cache_count == 1
    assert q in cache
    cache.clear()


def test_term_query_never_cached(searcher):
    cache = LRUQueryCache(max_entries=4)
    q = Q.TermQuery("spark")
    for _ in range(6):
        cache.cached_matches(searcher, q)
    assert q not in cache
    assert cache.stats.hit_count == 0 and cache.stats.cache_count == 0


def test_lru_eviction_unpersists_oldest(searcher):
    cache = LRUQueryCache(max_entries=2)
    qs = [Q.PrefixQuery("sp"), Q.PrefixQuery("ta"), Q.PrefixQuery("me")]
    for q in qs:
        cache.cached_matches(searcher, q)
        cache.cached_matches(searcher, q)  # 2nd sighting -> cached
    assert cache.stats.cache_count == 3
    assert cache.stats.eviction_count == 1
    assert qs[0] not in cache  # least recently used fell out
    assert qs[1] in cache and qs[2] in cache
    # touching qs[1] makes qs[2] the LRU victim for the next insert
    cache.cached_matches(searcher, qs[1])
    q4 = Q.PrefixQuery("pl")
    cache.cached_matches(searcher, q4)
    cache.cached_matches(searcher, q4)
    assert qs[2] not in cache and qs[1] in cache and q4 in cache
    cache.clear()
