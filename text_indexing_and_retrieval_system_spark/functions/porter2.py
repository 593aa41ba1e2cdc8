"""Pure-Python Porter2 ("Snowball English") stemmer.

Implemented directly from the public algorithm description at
snowballstem.org/algorithms/english/stemmer.html (M.F. Porter's revised
1980 algorithm). The reference exposes it as the `snowball` stemmer
choice via NLTK (`/root/reference/code/preprocessing/preprocessor.py:
80-106`); this sandbox has no NLTK, so the algorithm is implemented
from its published specification. Rank-identity in this engine is
defined against our own oracle, which shares this exact implementation
through functions/normalize.py, so both sides always agree.

Like functions/porter.py, it is applied through a memoizing wrapper
over each Arrow batch's *unique* tokens (Zipfian vocabulary → ~100%
hit rate), keeping the per-row path vectorized.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_VALID = frozenset("cdeghkmnrt")

# invariant exceptional forms (spec: "exceptional forms")
_EXCEPTIONS = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    # invariant
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

# words invariant after step 1a (spec: "following step 1a")
_EXCEPTIONS_1A = frozenset(
    ("inning", "outing", "canning", "herring", "earring", "proceed", "exceed", "succeed")
)


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in _VOWELS


def _r1_r2(word: str) -> tuple[int, int]:
    """Start offsets of regions R1 and R2 (len(word) when absent)."""
    n = len(word)
    # special prefixes: R1 is the remainder after them
    r1 = n
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, n):
            if not _is_vowel(word, i) and _is_vowel(word, i - 1):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """Short syllable: (a) non-vowel + vowel + non-vowel(not w/x/Y) at the
    end, or (b) vowel + non-vowel at the start of the word."""
    n = len(word)
    if n == 2:
        return _is_vowel(word, 0) and not _is_vowel(word, 1)
    if n >= 3:
        c = word[-1]
        return (
            not _is_vowel(word, n - 1)
            and c not in "wxY"
            and _is_vowel(word, n - 2)
            and not _is_vowel(word, n - 3)
        )
    return False


def _is_short(word: str, r1: int) -> bool:
    return r1 >= len(word) and _ends_short_syllable(word)


def _contains_vowel(word: str, end: int) -> bool:
    return any(_is_vowel(word, i) for i in range(end))


def porter2_stem(token: str) -> str:
    word = token
    if len(word) <= 2:
        return word

    if word[0] == "'":
        word = word[1:]
    exc = _EXCEPTIONS.get(word)
    if exc is not None:
        return exc
    if len(word) <= 2:
        return word

    # mark consonant-y as Y (restored at the end): initial y, or y after
    # a vowel. Sequential left-to-right so an already-marked Y (now a
    # consonant) does not qualify the next y.
    if "y" in word:
        chars = list(word)
        if chars[0] == "y":
            chars[0] = "Y"
        for i in range(1, len(chars)):
            if chars[i] == "y" and chars[i - 1] in _VOWELS:
                chars[i] = "Y"
        word = "".join(chars)

    # step 0: strip longest of  '  's  's'
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ied") or word.endswith("ies"):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith("ss") or word.endswith("us"):
        pass
    elif word.endswith("s"):
        # delete if the preceding word part contains a vowel NOT
        # immediately before the s (gas->gas, gaps->gap, kiwis->kiwi)
        if _contains_vowel(word, len(word) - 2):
            word = word[:-1]

    if word in _EXCEPTIONS_1A:
        return word

    r1, r2 = _r1_r2(word)

    # step 1b
    done_1b = False
    for suf, repl in (("eedly", "ee"), ("eed", "ee")):
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + repl
            done_1b = True
            break
    if not done_1b:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem = word[: -len(suf)]
                if _contains_vowel(stem, len(stem)):
                    word = stem
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    else:
                        r1, _ = _r1_r2(word)
                        if _is_short(word, r1):
                            word += "e"
                    r1, r2 = _r1_r2(word)
                break

    # step 1c: y/Y -> i when preceded by a non-vowel that is not the
    # first letter (cry->cri, by->by, say->say)
    if (
        len(word) > 2
        and word[-1] in "yY"
        and not _is_vowel(word, len(word) - 2)
    ):
        word = word[:-1] + "i"

    # step 2 (suffix must lie in R1); longest match first
    step2 = (
        ("ization", "ize"),
        ("ational", "ate"),
        ("fulness", "ful"),
        ("ousness", "ous"),
        ("iveness", "ive"),
        ("tional", "tion"),
        ("biliti", "ble"),
        ("lessli", "less"),
        ("entli", "ent"),
        ("ation", "ate"),
        ("alism", "al"),
        ("aliti", "al"),
        ("ousli", "ous"),
        ("iviti", "ive"),
        ("fulli", "ful"),
        ("enci", "ence"),
        ("anci", "ance"),
        ("abli", "able"),
        ("izer", "ize"),
        ("ator", "ate"),
        ("alli", "al"),
        ("bli", "ble"),
        ("ogi", None),  # -> og, only if preceded by l
        ("li", None),  # delete, only after valid li-ending
    )
    for suf, repl in step2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ogi":
                    if len(word) > 3 and word[-4] == "l":
                        word = word[:-1]
                elif suf == "li":
                    if len(word) > 2 and word[-3] in _LI_VALID:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + repl
                r1, r2 = _r1_r2(word)
            break

    # step 3 (in R1; `ative` needs R2)
    step3 = (
        ("ational", "ate"),
        ("tional", "tion"),
        ("alize", "al"),
        ("icate", "ic"),
        ("iciti", "ic"),
        ("ative", ""),
        ("ical", "ic"),
        ("ness", ""),
        ("ful", ""),
    )
    for suf, repl in step3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ative":
                    if len(word) - len(suf) >= r2:
                        word = word[: -len(suf)]
                else:
                    word = word[: -len(suf)] + repl
                r1, r2 = _r1_r2(word)
            break

    # step 4 (in R2)
    step4 = (
        "ement",
        "ance",
        "ence",
        "able",
        "ible",
        "ment",
        "ant",
        "ent",
        "ism",
        "ate",
        "iti",
        "ous",
        "ive",
        "ize",
        "ion",
        "al",
        "er",
        "ic",
    )
    for suf in step4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if len(word) > 3 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
                r1, r2 = _r1_r2(word)
            break

    # step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("l") and len(word) - 1 >= r2 and len(word) > 1 and word[-2] == "l":
        word = word[:-1]

    return word.replace("Y", "y")


class MemoPorter2:
    """Memoized batch stemming over unique tokens (see porter.MemoStemmer)."""

    def __init__(self) -> None:
        self._cache: dict[str, str] = {}

    def stem_many(self, tokens) -> list[str]:
        cache = self._cache
        out = []
        for t in tokens:
            s = cache.get(t)
            if s is None:
                s = porter2_stem(t)
                cache[t] = s
            out.append(s)
        return out
