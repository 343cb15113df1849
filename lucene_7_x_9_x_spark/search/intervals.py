"""Minimal-interval algebra: the Lucene `queries/intervals` module analog.

The IntervalQuery family (o.a.l.queries.intervals, 8.x) scores documents by
*minimal intervals* — spans of positions such that no smaller matching span is
contained in them — produced by an algebra of sources (term, phrase/block,
ordered, unordered, or, maxgaps/maxwidth filters, containing/contained_by).
Per doc, `freq = sum over minimal intervals of 1/max(length - minExtent + 1, 1)`
(IntervalScorer.java:62-72) and `score = boost * (1 - pivot/(pivot + freq))`
(IntervalScoreFunction.java saturation; sigmoid variant uses pow in double).

The iterator classes below are faithful per-doc ports of the reference
iteration algorithms — the emitted interval SET (and order) matches the
reference, including its minimization subtleties:

  * OrderedIter      — OrderedIntervalsSource.java:70-137 (lazy minimization
                       via advancing the first sub-iterator)
  * UnorderedIter    — UnorderedIntervalsSource.java:92-190 (priority queue by
                       (start asc, end desc), right-extreme tracking)
  * BlockIter        — BlockIntervalsSource.java (adjacency: each sub starts
                       exactly at previous end + 1)
  * DisjunctionIter  — DisjunctionIntervalsSource.java:146-210 (queue by
                       (end asc, start desc), containment suppression)
  * FilterIter       — FilteredIntervalsSource.java / IntervalFilter (maxgaps
                       keeps intervals with gaps() <= g; maxwidth with
                       end - start + 1 <= w)
  * ContainingIter / ContainedByIter — ContainingIntervalsSource.java:41-62,
                       ContainedByIntervalsSource.java:41-66 over
                       FilteringIntervalIterator (bpos priming)

Execution model (same shape as the spans family, kernel.py): a vectorized
candidate cut (conjunction of required postings, plus a pairwise position
window cut for gap-bounded ordered/phrase shapes) shrinks the doc set, then
the faithful per-doc algebra runs only on survivors. Per-doc Python is bounded
by the cut — the same trade the span family makes, documented in SURVEY §2.3.
"""

from __future__ import annotations

from typing import List

from . import query as Q

NO_MORE = 2**31 - 1  # IntervalIterator.NO_MORE_INTERVALS == Integer.MAX_VALUE
_MAX = 2**31 - 1     # Integer.MAX_VALUE


def min_extent(src: "Q.IntervalsSource") -> int:
    """IntervalsSource.minExtent(): the smallest interval length the source
    can produce (each source class defines it; see *IntervalsSource.java)."""
    if isinstance(src, Q.ITerm):
        return 1
    if isinstance(src, (Q.IOrdered, Q.IUnordered, Q.IPhrase)):
        return sum(min_extent(s) for s in src.sources)
    if isinstance(src, Q.IOr):
        return min(min_extent(s) for s in src.sources)
    if isinstance(src, (Q.IMaxGaps, Q.IMaxWidth)):
        return min_extent(src.source)
    if isinstance(src, Q.IContaining):
        return min_extent(src.big)
    if isinstance(src, Q.IContainedBy):
        return min_extent(src.small)
    raise TypeError(type(src))


class _TermIter:
    """TermIntervalsIterator: one interval [p, p] per position."""

    __slots__ = ("positions", "idx", "start", "end")

    def __init__(self, positions):
        self.positions = positions
        self.idx = -1
        self.start = -1
        self.end = -1

    def reset(self):
        self.idx = -1
        self.start = self.end = -1

    def next_interval(self) -> int:
        self.idx += 1
        if self.idx >= len(self.positions):
            self.start = self.end = NO_MORE
            return NO_MORE
        p = int(self.positions[self.idx])
        self.start = self.end = p
        return p

    def gaps(self) -> int:
        return 0


class _OrderedIter:
    """OrderedIntervalsSource.OrderedIntervalIterator port (lazy minimal
    ordered conjunction; gaps() from live sub positions + saved firstEnd).

    DOCUMENTED DIVERGENCE from 8.4 (OrderedIntervalsSource.java:108-136):
    the reference breaks out of the positioning loop at the first already-
    positioned sub-iterator, assuming the remaining chain is still in order.
    When a sub-iterator overshoots a later one during minimization (needs
    >= 3 clauses), that assumption fails on the NEXT nextInterval call: the
    stale chain yields corrupted candidates (including start > end) and can
    drop real minimal intervals. We validate the full chain instead — the
    `advanced` flag preserves the reference's termination semantics (the
    `end >= b` check applies only to freshly-advanced iterators) so 2-clause
    behavior is identical; >= 3-clause behavior is the *intended* minimal
    semantics, verified differentially against brute-force enumeration
    (test_intervals.py)."""

    def __init__(self, subs: list):
        self.subs = subs
        self.start = self.end = self.first_end = -1

    def reset(self):
        self.subs[0].next_interval()
        self.start = self.end = self.first_end = -1

    def next_interval(self) -> int:
        subs = self.subs
        n = len(subs)
        self.start = self.end = NO_MORE
        b = _MAX
        while True:
            i = 1
            advanced = True  # subs[0] advanced at entry / candidate creation
            while True:
                if advanced and subs[i - 1].end >= b:
                    return self.start
                if i == n:
                    break
                if subs[i].start > subs[i - 1].end:
                    advanced = False
                    i += 1
                    continue
                while subs[i].start <= subs[i - 1].end:
                    if (subs[i].end >= b
                            or subs[i].next_interval() == NO_MORE):
                        return self.start
                advanced = True
                i += 1
            start = subs[0].start
            if start == NO_MORE:
                self.end = NO_MORE
                return NO_MORE
            self.start = start
            self.first_end = subs[0].end
            self.end = subs[n - 1].end
            b = subs[n - 1].start
            if subs[0].next_interval() == NO_MORE:
                return self.start

    def gaps(self) -> int:
        subs = self.subs
        g = subs[1].start - self.first_end - 1
        for i in range(2, len(subs)):
            g += subs[i].start - subs[i - 1].end - 1
        return g


class _UnorderedIter:
    """UnorderedIntervalsSource.UnorderedIntervalIterator port. The priority
    queue orders by (start asc, end desc) — lessThan at
    UnorderedIntervalsSource.java:103-106; queueEnd tracks the right extreme."""

    def __init__(self, subs: list):
        self.subs = subs
        self.queue: List = []   # kept sorted by (start, -end); small n
        self.start = self.end = self.first_end = self.queue_end = -1

    def _push(self, it):
        key = (it.start, -it.end)
        lo, hi = 0, len(self.queue)
        while lo < hi:
            mid = (lo + hi) // 2
            if (self.queue[mid].start, -self.queue[mid].end) < key:
                lo = mid + 1
            else:
                hi = mid
        self.queue.insert(lo, it)

    def _update_right_extreme(self, it):
        if it.end > self.queue_end:
            self.queue_end = it.end

    def reset(self):
        self.queue = []
        self.queue_end = self.start = self.end = -1
        for it in self.subs:
            if it.next_interval() == NO_MORE:
                break
            self._push(it)
            self._update_right_extreme(it)

    def next_interval(self) -> int:
        n = len(self.subs)
        # first, find a matching interval
        while len(self.queue) == n and self.queue[0].start == self.start:
            it = self.queue.pop(0)
            if it.next_interval() != NO_MORE:
                self._push(it)
                self._update_right_extreme(it)
        if len(self.queue) < n:
            self.start = self.end = NO_MORE
            return NO_MORE
        # then, minimize it
        while True:
            self.start = self.queue[0].start
            self.first_end = self.queue[0].end
            self.end = self.queue_end
            if self.queue[0].end == self.end:
                return self.start
            it = self.queue.pop(0)
            if it.next_interval() != NO_MORE:
                self._push(it)
                self._update_right_extreme(it)
            if not (len(self.queue) == len(self.subs)
                    and self.end == self.queue_end):
                return self.start

    def gaps(self) -> int:
        # UnorderedIntervalsSource.java:162-177: sub positions clipped to the
        # emitted interval (subs already advanced past `end` contribute the
        # (start, firstEnd) pair), then gap-sum over the sorted bounds
        inner = []
        for it in self.subs:
            if it.end > self.end:
                inner.append((self.start, self.first_end))
            else:
                inner.append((it.start, it.end))
        flat = sorted(p for se in inner for p in se)  # Arrays.sort(innerPositions)
        g = 0
        for i in range(1, len(inner)):
            g += flat[i * 2] - flat[i * 2 - 1] - 1
        return g


class _BlockIter:
    """BlockIntervalsSource.BlockIntervalIterator port (strict adjacency)."""

    def __init__(self, subs: list):
        self.subs = subs
        self.start = self.end = -1

    def reset(self):
        self.start = self.end = -1

    def next_interval(self) -> int:
        subs = self.subs
        if subs[0].next_interval() == NO_MORE:
            self.start = self.end = NO_MORE
            return NO_MORE
        i = 1
        while i < len(subs):
            while subs[i].start <= subs[i - 1].end:
                if subs[i].next_interval() == NO_MORE:
                    self.start = self.end = NO_MORE
                    return NO_MORE
            if subs[i].start == subs[i - 1].end + 1:
                i += 1
            else:
                if subs[0].next_interval() == NO_MORE:
                    self.start = self.end = NO_MORE
                    return NO_MORE
                i = 1
        self.start = subs[0].start
        self.end = subs[-1].end
        return self.start

    def gaps(self) -> int:
        return 0


class _DisjunctionIter:
    """DisjunctionIntervalsSource.DisjunctionIntervalIterator port: queue by
    (end asc, start desc), suppressing intervals containing the current one."""

    def __init__(self, subs: list):
        self.subs = subs
        self.queue: List = []
        self.current = None   # None == EMPTY/EXHAUSTED
        self.start = self.end = -1

    def _push(self, it):
        key = (it.end, -it.start)
        lo, hi = 0, len(self.queue)
        while lo < hi:
            mid = (lo + hi) // 2
            if (self.queue[mid].end, -self.queue[mid].start) < key:
                lo = mid + 1
            else:
                hi = mid
        self.queue.insert(lo, it)

    def reset(self):
        self.queue = []
        for it in self.subs:
            if it.next_interval() != NO_MORE:
                self._push(it)
        self.current = None
        self.start = self.end = -1

    def _sync(self):
        if self.current is None:
            self.start = self.end = NO_MORE
        else:
            self.start = self.current.start
            self.end = self.current.end

    def next_interval(self) -> int:
        if self.current is None:
            if self.queue:
                self.current = self.queue[0]
                self._sync()
                return self.start
            self._sync()
            return NO_MORE
        start, end = self.current.start, self.current.end
        while self.queue and self._contains(self.queue[0], start, end):
            it = self.queue.pop(0)
            if it.next_interval() != NO_MORE:
                self._push(it)
        if not self.queue:
            self.current = None
            self._sync()
            return NO_MORE
        self.current = self.queue[0]
        self._sync()
        return self.start

    @staticmethod
    def _contains(it, start, end):
        return (it.start <= start <= it.end) and (it.start <= end <= it.end)

    def gaps(self) -> int:
        return self.current.gaps() if self.current is not None else 0


class _FilterIter:
    """IntervalFilter: keep inner intervals passing `accept(inner)`."""

    def __init__(self, inner, accept):
        self.inner = inner
        self.accept = accept

    def reset(self):
        pass  # inner reset happens in the bottom-up reset sweep

    @property
    def start(self):
        return self.inner.start

    @property
    def end(self):
        return self.inner.end

    def next_interval(self) -> int:
        while self.inner.next_interval() != NO_MORE:
            if self.accept(self.inner):
                return self.inner.start
        return NO_MORE

    def gaps(self) -> int:
        return self.inner.gaps()


class _ContainingIter:
    """ContainingIntervalsSource.combine port: emit big (a) intervals that
    contain some small (b) interval; FilteringIntervalIterator bpos priming."""

    def __init__(self, a, b):
        self.a = a
        self.b = b
        self.bpos = False

    def reset(self):
        self.bpos = self.b.next_interval() != NO_MORE

    @property
    def start(self):
        return self.a.start if self.bpos else NO_MORE

    @property
    def end(self):
        return self.a.end if self.bpos else NO_MORE

    def next_interval(self) -> int:
        if not self.bpos:
            return NO_MORE
        a, b = self.a, self.b
        while a.next_interval() != NO_MORE:
            while b.start < a.start and b.end < a.end:
                if b.next_interval() == NO_MORE:
                    return NO_MORE
            if a.start <= b.start and a.end >= b.end:
                return a.start
        return NO_MORE

    def gaps(self) -> int:
        return self.a.gaps()


class _ContainedByIter:
    """ContainedByIntervalsSource.combine port: emit small (a) intervals that
    lie inside some big (b) interval."""

    def __init__(self, a, b):
        self.a = a
        self.b = b
        self.bpos = False

    def reset(self):
        self.bpos = self.b.next_interval() != NO_MORE

    @property
    def start(self):
        return self.a.start if self.bpos else NO_MORE

    @property
    def end(self):
        return self.a.end if self.bpos else NO_MORE

    def next_interval(self) -> int:
        if not self.bpos:
            return NO_MORE
        a, b = self.a, self.b
        while a.next_interval() != NO_MORE:
            while b.end < a.end:
                if b.next_interval() == NO_MORE:
                    self.bpos = False
                    return NO_MORE
            if b.start <= a.start:
                return a.start
        self.bpos = False
        return NO_MORE

    def gaps(self) -> int:
        return self.a.gaps()


def build_iterator(src: "Q.IntervalsSource", positions_of) -> object:
    """Construct the per-doc iterator tree; `positions_of(term)` returns the
    doc's position list for a term ([] if absent). Returns None when a
    required sub-source has no positions (conjunction can't match — the
    reference's ConjunctionDISI would not have put this doc on the iterator)."""
    if isinstance(src, Q.ITerm):
        pos = positions_of(src.term)
        if len(pos) == 0:
            return None
        return _TermIter(pos)
    if isinstance(src, (Q.IOrdered, Q.IUnordered, Q.IPhrase)):
        subs = [build_iterator(s, positions_of) for s in src.sources]
        if any(s is None for s in subs):
            return None
        if isinstance(src, Q.IOrdered):
            return _OrderedIter(subs)
        if isinstance(src, Q.IUnordered):
            return _UnorderedIter(subs)
        return _BlockIter(subs)
    if isinstance(src, Q.IOr):
        subs = [build_iterator(s, positions_of) for s in src.sources]
        subs = [s for s in subs if s is not None]
        if not subs:
            return None
        return _DisjunctionIter(subs)
    if isinstance(src, Q.IMaxGaps):
        inner = build_iterator(src.source, positions_of)
        if inner is None:
            return None
        g = src.gaps
        return _FilterIter(inner, lambda it: it.gaps() <= g)
    if isinstance(src, Q.IMaxWidth):
        inner = build_iterator(src.source, positions_of)
        if inner is None:
            return None
        w = src.width
        return _FilterIter(inner, lambda it: it.end - it.start + 1 <= w)
    if isinstance(src, Q.IContaining):
        a = build_iterator(src.big, positions_of)
        b = build_iterator(src.small, positions_of)
        if a is None or b is None:
            return None
        return _ContainingIter(a, b)
    if isinstance(src, Q.IContainedBy):
        a = build_iterator(src.small, positions_of)
        b = build_iterator(src.big, positions_of)
        if a is None or b is None:
            return None
        return _ContainedByIter(a, b)
    raise TypeError(type(src))


def _reset_tree(it) -> None:
    """Bottom-up reset: children first (reference: each sub's nextDoc resets
    it before the parent ConjunctionIntervalIterator's own reset runs)."""
    for attr in ("subs",):
        for child in getattr(it, attr, ()):
            _reset_tree(child)
    for attr in ("inner", "a", "b"):
        child = getattr(it, attr, None)
        if child is not None and not callable(child):
            _reset_tree(child)
    it.reset()


def doc_intervals(src: "Q.IntervalsSource", positions_of) -> list:
    """All minimal intervals (start, end) of `src` in one doc, in the
    reference's emission order."""
    it = build_iterator(src, positions_of)
    if it is None:
        return []
    _reset_tree(it)
    out = []
    while it.next_interval() != NO_MORE:
        out.append((it.start, it.end))
    return out
