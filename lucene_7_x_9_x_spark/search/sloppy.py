"""Faithful port of Lucene's SloppyPhraseMatcher (pure Python, per segment).

Semantics mirror solr-8.4.0/lucene/core/src/java/org/apache/lucene/search/
SloppyPhraseMatcher.java (679 LoC) including repeats handling:

  * PhrasePositions keep ``position = doc_position - offset`` so an exact
    phrase aligns all pps at the same position (PhrasePositions.java:58-67).
  * The matcher always advances the least pp (PhraseQueue order: position,
    then offset, then ord — PhraseQueue.java:28-40), minimizing the current
    match length before emitting a match (SloppyPhraseMatcher.java:165-197).
  * Each match contributes sloppyWeight = 1/(1+matchLength)
    (SloppyPhraseMatcher.java:160-162); the doc's phrase freq is the sum
    (PhraseScorer.java:76-79), accumulated in the caller's dtype (float32 for
    Lucene bit-parity, float64 for the SQL-oracle path).
  * Repeats: repetition groups are detected once, on the first candidate doc
    (initFirstTime, :482-501), each group sorted by query offset; at every
    doc start the j-th member of a group is advanced j times
    (advanceRepeatGroups, :433-465), and collisions after an advance are
    resolved by advancing the lesser pp (advanceRpts, :279-316; collide,
    :332-342). Multi-term slots (MultiPhraseQuery) use the bipartite
    term-group union (:528-583).

The known quirk documented in the reference javadoc (:44-54) — not all valid
combinations are counted because only the least pp is propagated — is
reproduced, not "fixed": rank parity with Lucene is the contract.
"""

from __future__ import annotations

import numpy as np

__all__ = ["SloppyPhraseMatcher"]


class _PP:
    """PhrasePositions analog (PhrasePositions.java)."""

    __slots__ = ("plist", "count", "idx", "position", "offset", "ord",
                 "terms", "rpt_group", "rpt_ind")

    def __init__(self, offset: int, ord_: int, terms: tuple):
        self.offset = offset
        self.ord = ord_
        self.terms = terms
        self.rpt_group = -1
        self.rpt_ind = 0
        self.plist = None
        self.count = 0
        self.idx = 0
        self.position = 0

    def first_position(self) -> bool:
        self.count = len(self.plist)
        self.idx = 0
        return self.next_position()

    def next_position(self) -> bool:
        if self.count > 0:
            self.count -= 1
            self.position = int(self.plist[self.idx]) - self.offset
            self.idx += 1
            return True
        return False

    def tp_pos(self) -> int:
        return self.position + self.offset

    def sort_key(self):
        # PhraseQueue.lessThan: position, then offset, then ord
        return (self.position, self.offset, self.ord)


class SloppyPhraseMatcher:
    """One matcher per (query, segment); feed docs in docid order via freq().

    offsets: query position of each pp (PhraseQuery positions).
    terms_per_pp: tuple of terms per pp (len>1 only for MultiPhraseQuery
    slots, which triggers the multi-term repeats logic)."""

    def __init__(self, offsets, terms_per_pp, slop: int):
        self.slop = int(slop)
        self.pps = [
            _PP(int(offsets[i]), i, tuple(terms_per_pp[i]))
            for i in range(len(offsets))
        ]
        self.num_postings = len(self.pps)
        self.checked_rpts = False
        self.has_rpts = False
        self.has_multi_term_rpts = False
        self.rpt_groups: list[list[_PP]] = []
        # per-doc state
        self.pq: list[_PP] = []
        self.end = 0
        self.positioned = False
        self.match_length = 0

    # --- queue ops (PhraseQueue analog; O(n) scan — n is tiny) -------------
    def _pq_pop(self) -> _PP:
        i = min(range(len(self.pq)), key=lambda j: self.pq[j].sort_key())
        return self.pq.pop(i)

    def _pq_top(self) -> _PP:
        return min(self.pq, key=lambda p: p.sort_key())

    # --- public API --------------------------------------------------------
    def freq(self, plists, dtype=np.float64) -> float:
        """Sloppy phrase freq of one candidate doc.

        plists: per-pp sorted arrays of actual doc positions (for multi-term
        pps: the union of the member terms' positions). Returns 0.0 when the
        doc has no match."""
        for pp, pl in zip(self.pps, plists):
            pp.plist = np.asarray(pl, dtype=np.int64)
        self.positioned = self._init_phrase_positions()
        self.match_length = 1 << 30
        freq = dtype(0.0)
        while self._next_match():
            freq = dtype(freq + dtype(1.0) / dtype(1.0 + self.match_length))
        return float(freq)

    # --- core loop (nextMatch, SloppyPhraseMatcher.java:165-197) -----------
    def _next_match(self) -> bool:
        if not self.positioned:
            return False
        pp = self._pq_pop()
        self.match_length = self.end - pp.position
        next_pos = self._pq_top().position if self.pq else pp.position
        while self._advance_pp(pp):
            if self.has_rpts and not self._advance_rpts(pp):
                break  # pps exhausted
            if pp.position > next_pos:  # done minimizing current match-length
                self.pq.append(pp)
                if self.match_length <= self.slop:
                    return True
                pp = self._pq_pop()
                next_pos = self._pq_top().position if self.pq else pp.position
                self.match_length = self.end - pp.position
            else:
                ml2 = self.end - pp.position
                if ml2 < self.match_length:
                    self.match_length = ml2
        self.positioned = False
        return self.match_length <= self.slop

    def _advance_pp(self, pp: _PP) -> bool:
        if not pp.next_position():
            return False
        if pp.position > self.end:
            self.end = pp.position
        return True

    # --- repeats collision handling (advanceRpts, :279-316) ----------------
    def _advance_rpts(self, pp: _PP) -> bool:
        if pp.rpt_group < 0:
            return True  # not a repeater
        rg = self.rpt_groups[pp.rpt_group]
        while True:
            k = self._collide(pp)
            if k < 0:
                break
            pp = self._lesser(pp, rg[k])  # advance the lesser of the two
            if not self._advance_pp(pp):
                return False  # exhausted
        # (re-queue bookkeeping is unnecessary: _pq_pop scans by comparator)
        return True

    @staticmethod
    def _lesser(pp: _PP, pp2: _PP) -> _PP:
        if (pp.position < pp2.position
                or (pp.position == pp2.position and pp.offset < pp2.offset)):
            return pp
        return pp2

    def _collide(self, pp: _PP) -> int:
        tp = pp.tp_pos()
        for pp2 in self.rpt_groups[pp.rpt_group]:
            if pp2 is not pp and pp2.tp_pos() == tp:
                return pp2.rpt_ind
        return -1

    # --- per-doc initialization (initPhrasePositions, :360-421) ------------
    def _init_phrase_positions(self) -> bool:
        self.end = -(1 << 30)
        if not self.checked_rpts:
            return self._init_first_time()
        if not self.has_rpts:
            self._init_simple()
            return True
        return self._init_complex()

    def _init_simple(self) -> None:
        self.pq = []
        for pp in self.pps:
            pp.first_position()
            if pp.position > self.end:
                self.end = pp.position
            self.pq.append(pp)

    def _init_complex(self) -> bool:
        for pp in self.pps:
            pp.first_position()
        if not self._advance_repeat_groups():
            return False
        self._fill_queue()
        return True

    def _fill_queue(self) -> None:
        self.pq = []
        for pp in self.pps:
            if pp.position > self.end:
                self.end = pp.position
            self.pq.append(pp)

    def _advance_repeat_groups(self) -> bool:
        """advanceRepeatGroups (:433-465): at doc start, sorted-by-offset
        group member j is advanced j times (no multi-term), or advanced until
        collision-free (multi-term)."""
        for rg in self.rpt_groups:
            if self.has_multi_term_rpts:
                i = 0
                while i < len(rg):
                    incr = 1
                    pp = rg[i]
                    while True:
                        k = self._collide(pp)
                        if k < 0:
                            break
                        pp2 = self._lesser(pp, rg[k])
                        if not self._advance_pp(pp2):
                            return False  # exhausted
                        if pp2.rpt_ind < i:  # should not happen?
                            incr = 0
                            break
                    i += incr
            else:
                for j in range(1, len(rg)):
                    for _ in range(j):
                        if not rg[j].next_position():
                            return False  # pps exhausted
        return True

    # --- first-candidate-doc repeats detection (initFirstTime, :482-501) ---
    def _init_first_time(self) -> bool:
        self.checked_rpts = True
        for pp in self.pps:
            pp.first_position()
        rpt_terms = self._repeating_terms()
        self.has_rpts = bool(rpt_terms)
        if self.has_rpts:
            rgs = self._gather_rpt_groups(rpt_terms)
            self._sort_rpt_groups(rgs)
            if not self._advance_repeat_groups():
                return False
        self._fill_queue()
        return True

    def _repeating_terms(self) -> dict:
        """term -> ordinal, for terms appearing in >= 2 pps (insertion order,
        repeatingTerms :595-607)."""
        tord: dict = {}
        tcnt: dict = {}
        for pp in self.pps:
            for t in pp.terms:
                tcnt[t] = tcnt.get(t, 0) + 1
                if tcnt[t] == 2:
                    tord[t] = len(tord)
        return tord

    def _repeating_pps(self, rpt_terms: dict) -> list[_PP]:
        rp = []
        for pp in self.pps:
            for t in pp.terms:
                if t in rpt_terms:
                    rp.append(pp)
                    self.has_multi_term_rpts |= len(pp.terms) > 1
                    break
        return rp

    def _gather_rpt_groups(self, rpt_terms: dict) -> list[list[_PP]]:
        rpp = self._repeating_pps(rpt_terms)
        res: list[list[_PP]] = []
        if not self.has_multi_term_rpts:
            # group by equal actual position in the FIRST candidate doc
            # (gatherRptGroups :531-557 — a faithful copy, quirks included)
            for i, pp in enumerate(rpp):
                if pp.rpt_group >= 0:
                    continue
                tp = pp.tp_pos()
                for pp2 in rpp[i + 1:]:
                    if (pp2.rpt_group >= 0 or pp2.offset == pp.offset
                            or pp2.tp_pos() != tp):
                        continue
                    g = pp.rpt_group
                    if g < 0:
                        g = len(res)
                        pp.rpt_group = g
                        res.append([pp])
                    pp2.rpt_group = g
                    res[g].append(pp2)
        else:
            # bipartite union of term groups (:558-581)
            bb = []
            for pp in rpp:
                bb.append({rpt_terms[t] for t in pp.terms if t in rpt_terms})
            self._union_term_groups(bb)
            tg = self._term_groups(rpt_terms, bb)
            tmp: list[list[_PP]] = [[] for _ in range(len(set(tg.values())))]
            for pp in rpp:
                for t in pp.terms:
                    if t in rpt_terms:
                        g = tg[t]
                        if pp not in tmp[g]:
                            tmp[g].append(pp)
                        pp.rpt_group = g
            res.extend(tmp)
        return res

    @staticmethod
    def _union_term_groups(bb: list[set]) -> None:
        i = 0
        while i < len(bb) - 1:
            incr = 1
            j = i + 1
            while j < len(bb):
                if bb[i] & bb[j]:
                    bb[i] |= bb[j]
                    del bb[j]
                    incr = 0
                else:
                    j += 1
            i += incr

    @staticmethod
    def _term_groups(tord: dict, bb: list[set]) -> dict:
        t = list(tord.keys())
        tg = {}
        for i, bits in enumerate(bb):
            for ord_ in bits:
                tg[t[ord_]] = i
        return tg

    def _sort_rpt_groups(self, rgs: list[list[_PP]]) -> None:
        self.rpt_groups = []
        for rl in rgs:
            rg = sorted(rl, key=lambda p: p.offset)
            for j, pp in enumerate(rg):
                pp.rpt_ind = j
            self.rpt_groups.append(rg)
