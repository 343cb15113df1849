"""Porter stemmer — the original 1980 algorithm as shipped by Lucene.

Semantics source (behavior only): analysis/common/src/java/org/apache/lucene/
analysis/en/PorterStemmer.java (Martin Porter's reference implementation,
public spec at tartarus.org), including its documented departures from the
paper: words of length <= 2 are untouched, step3 'bli'->'ble' (paper: 'abli'
->'able'), step3 'logi'->'log', and the two "Bug 1/Bug 2" guards. Golden
vectors in tests/test_english_analyzer.py freeze the contract.

Implementation is an idiomatic Python string-slice version (the Java works on
a mutable char buffer); a module-level memo makes repeated tokens ~free
(Zipfian corpora), which is what the tokenizer hot loop needs.
"""

from __future__ import annotations

__all__ = ["porter_stem"]

_VOWELS = frozenset("aeiou")


def _cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m(): number of VC sequences in [C](VC){m}[V]."""
    m = 0
    i = 0
    n = len(stem)
    while i < n and _cons(stem, i):
        i += 1
    while i < n:
        while i < n and not _cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _cons(stem, i) for i in range(len(stem)))


def _doublec(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    """Ends consonant-vowel-consonant, last consonant not w/x/y."""
    if len(w) < 3 or not _cons(w, len(w) - 1) or _cons(w, len(w) - 2) \
            or not _cons(w, len(w) - 3):
        return False
    return w[-1] not in "wxy"


def _r(w: str, suffix: str, repl: str) -> str:
    """Replace suffix by repl when the remaining stem has m() > 0."""
    stem = w[: len(w) - len(suffix)]
    return stem + repl if _measure(stem) > 0 else w


_STEP3 = [  # longest-match per final-letter bucket, reference order
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("bli", "ble"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
    ("iviti", "ive"), ("biliti", "ble"), ("logi", "log"),
]
_STEP4 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP5 = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
          "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive",
          "ize"]

_memo: dict = {}


def porter_stem(word: str) -> str:
    """Stem one lowercase token (words of length <= 2 pass through)."""
    hit = _memo.get(word)
    if hit is not None:
        return hit
    w = word
    if len(w) > 2:
        # step 1: plurals and -ed/-ing
        if w.endswith("s"):
            if w.endswith("sses"):
                w = w[:-2]
            elif w.endswith("ies"):
                w = w[:-3] + "i"
            elif not w.endswith("ss"):
                w = w[:-1]
        if w.endswith("eed"):
            if _measure(w[:-3]) > 0:
                w = w[:-1]
        else:
            stem = None
            if w.endswith("ed") and _has_vowel(w[:-2]):
                stem = w[:-2]
            elif w.endswith("ing") and _has_vowel(w[:-3]):
                stem = w[:-3]
            if stem is not None:
                w = stem
                if w.endswith(("at", "bl", "iz")):
                    w += "e"
                elif _doublec(w) and w[-1] not in "lsz":
                    w = w[:-1]
                elif _measure(w) == 1 and _cvc(w):
                    w += "e"
        # step 2: terminal y -> i when a vowel remains in the stem
        if w.endswith("y") and _has_vowel(w[:-1]):
            w = w[:-1] + "i"
        # step 3: double suffices -> single (m > 0)
        if len(w) > 1:  # "Bug 1" guard
            for suf, repl in _STEP3:
                if w.endswith(suf):
                    w = _r(w, suf, repl)
                    break
        # step 4
        for suf, repl in _STEP4:
            if w.endswith(suf):
                w = _r(w, suf, repl)
                break
        # step 5: strip residual suffix when m > 1
        if len(w) > 1:  # "Bug 1" guard
            for suf in _STEP5:
                if w.endswith(suf):
                    stem = w[: len(w) - len(suf)]
                    if suf == "ion" and not (stem and stem[-1] in "st"):
                        continue  # "Bug 2" guard rides stem truthiness
                    if _measure(stem) > 1:
                        w = stem
                    break
        # step 6: final -e / -ll cleanup
        if w.endswith("e"):
            a = _measure(w[:-1])
            if a > 1 or (a == 1 and not _cvc(w[:-1])):
                w = w[:-1]
        if w.endswith("ll") and _measure(w) > 1:
            w = w[:-1]
    _memo[word] = w
    return w
