"""LRUQueryCache + UsageTrackingQueryCachingPolicy analogs.

Semantics source (behavior only): o.a.l/search/LRUQueryCache.java (per-leaf
cached DocIdSets with LRU eviction, hit/miss counters) and
UsageTrackingQueryCachingPolicy.java (a 256-entry ring buffer of recently
seen query keys; a query becomes cacheable only once seen often enough —
costly queries at 2 uses, cheap ones at 5 — and trivial queries are never
cached); demos lucene/util/LRUCacheTest.java.

Spark-first mapping: "cached per-leaf DocIdSet" becomes a PERSISTED
(segment_id, docid) match DataFrame — Spark's block manager distributes the
cached bitset across executors exactly where the leaves live, so a cache hit
skips the postings scan + kernel entirely (the same work Lucene's cached
BitSetIterator skips). Eviction unpersists, releasing executor memory.

Scale shape: the cache registry on the driver holds only (query key ->
DataFrame handle, counters) — O(max_entries) metadata; the cached bits
themselves live in executor storage, never on the driver.
"""

from __future__ import annotations

from collections import OrderedDict, deque
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

from . import query as Q

__all__ = ["LRUQueryCache", "UsageTrackingQueryCachingPolicy"]

# MultiTermQuery rewrites and point/range scans re-walk the term dictionary
# every time — Lucene's policy calls these "costly" and caches them after
# only 2 sightings (UsageTrackingQueryCachingPolicy.isCostly)
_COSTLY = (Q.PrefixQuery, Q.WildcardQuery, Q.RegexpQuery, Q.FuzzyQuery,
           Q.TermRangeQuery, Q.TermInSetQuery, Q.TermPredicateQuery)

# Queries whose match is a single postings walk (or constant) gain nothing
# from caching — shouldNeverCache: TermQuery, MatchAll/MatchNo, empty bool
_NEVER = (Q.TermQuery, Q.MatchAllDocsQuery, Q.MatchNoDocsQuery)


class UsageTrackingQueryCachingPolicy:
    """Ring-buffer usage tracker: onUse records a sighting, shouldCache says
    whether the query has been seen often enough to be worth caching."""

    def __init__(self, history_size: int = 256):
        self._history: deque = deque(maxlen=history_size)

    @staticmethod
    def _min_frequency(q: Q.Query) -> int:
        return 2 if isinstance(q, _COSTLY) else 5

    @staticmethod
    def _never(q: Q.Query) -> bool:
        if isinstance(q, _NEVER):
            return True
        if isinstance(q, Q.BooleanQuery) and not (
                q.must or q.should or q.filter or q.must_not):
            return True
        return False

    def on_use(self, q: Q.Query) -> None:
        if not self._never(q):
            self._history.append(q)

    def should_cache(self, q: Q.Query) -> bool:
        if self._never(q):
            return False
        return sum(1 for h in self._history if h == q) >= self._min_frequency(q)


@dataclass
class CacheStats:
    """LRUQueryCache counter surface (getHitCount/getMissCount/
    getCacheCount/getEvictionCount)."""
    hit_count: int = 0
    miss_count: int = 0
    cache_count: int = 0
    eviction_count: int = 0


class LRUQueryCache:
    """LRU cache of match sets keyed by the (immutable, hashable) query.

    cached_matches(searcher, q) returns the (segment_id, docid) match
    DataFrame, serving repeats from a persisted DataFrame once the policy
    admits the query; least-recently-used entries are unpersisted when
    max_entries is exceeded (LRUQueryCache.java evictIfNecessary)."""

    def __init__(self, max_entries: int = 32,
                 policy: UsageTrackingQueryCachingPolicy | None = None,
                 storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK):
        self.max_entries = max_entries
        self.policy = policy or UsageTrackingQueryCachingPolicy()
        self.storage_level = storage_level
        self._entries: OrderedDict = OrderedDict()
        self.stats = CacheStats()

    def cached_matches(self, searcher, q: Q.Query) -> DataFrame:
        if q in self._entries:
            self._entries.move_to_end(q)  # LRU touch
            self.stats.hit_count += 1
            return self._entries[q]
        self.stats.miss_count += 1
        self.policy.on_use(q)
        m = searcher.matches_df(q)
        if not self.policy.should_cache(q):
            return m
        m = m.persist(self.storage_level)
        self._entries[q] = m
        self.stats.cache_count += 1
        while len(self._entries) > self.max_entries:
            _, old = self._entries.popitem(last=False)
            old.unpersist()
            self.stats.eviction_count += 1
        return m

    def __contains__(self, q: Q.Query) -> bool:
        return q in self._entries

    def clear(self) -> None:
        for df in self._entries.values():
            df.unpersist()
        self._entries.clear()
