"""Lancaster (Paice/Husk) stemmer, implemented from the published
algorithm: C. D. Paice, "Another stemmer", ACM SIGIR Forum 24(3), 1990.

Reference parity target: the reference pipeline offers
``algo='lancaster'`` via ``nltk.stem.LancasterStemmer()``
(``/root/reference/code/preprocessing/preprocessor.py:96-101``); NLTK
uses this same published default rule table (no prefix stripping, no
custom rules), so outputs match it on the attested examples in
tests/test_lancaster.py.

Rule encoding (Paice's notation): each rule string is
``<reversed-ending><intact?'*'><remove-count><append><cont '>' | stop '.'>``
e.g. ``"dei3y>"`` = ending "ied" -> remove 3, append "y", continue;
``"mu*2."`` = ending "um" -> remove 2 only if the word is still intact,
then stop; ``"ss0."`` = protect "-ss" (remove nothing, stop).

Acceptability (Paice §"the stemming procedure"): a candidate stem is
kept only if (a) it starts with a vowel and has >= 2 letters, or (b) it
starts with a consonant, has >= 3 letters, and contains at least one
vowel or 'y'.
"""

from __future__ import annotations

import re

# The published Paice/Husk default rule table (118 rules), grouped here
# by the last letter of the ending for direct indexing.
_RULE_STRINGS = (
    "ai*2.", "a*1.",
    "bb1.",
    "city3s.", "ci2>", "cn1t>",
    "dd1.", "dei3y>", "deec2ss.", "dee1.", "de2>", "dooh4>",
    "e1>",
    "feil1v.", "fi2>",
    "gni3>", "gai3y.", "ga2>", "gg1.",
    "ht*2.", "hsiug5ct.", "hsi3>",
    "i*1.", "i1y>",
    "ji1d.", "juf1s.", "ju1d.", "jo1d.", "jeh1r.", "jrev1t.",
    "jsim2t.", "jn1d.", "j1s.",
    "lbaifi6.", "lbai4y.", "lba3>", "lbi3.", "lib2l>", "lc1.",
    "lufi4y.", "luf3>", "lu2.", "lai3>", "lau3>", "la2>", "ll1.",
    "mui3.", "mu*2.", "msi3>", "mm1.",
    "nois4j>", "noix4ct.", "noi3>", "nai3>", "na2>", "nee0.",
    "ne2>", "nn1.",
    "pihs4>", "pp1.",
    "re2>", "rae0.", "ra2.", "ro2>", "ru2>", "rr1.", "rt1>", "rei3y>",
    "sei3y>", "sis2.", "si2>", "ssen4>", "ss0.", "suo3>", "su*2.",
    "s*1>", "s0.",
    "tacilp4c.", "ta2>", "tnem4>", "tne3>", "tna3>", "tpir2b.",
    "tpro2b.", "tcud1.", "tpmus2.", "tpec2iv.", "tulo2v.", "tsis0.",
    "tsi3>", "tt1.",
    "uqi3.", "ugo1.",
    "vis3j>", "vie0.", "vi2>",
    "ylb1>", "yli3y>", "ylp0.", "yl2>", "ygo1.", "yhp1.", "ymo1.",
    "ypo1.", "yti3>", "yte3>", "ytl2.", "yrtsi5.", "yra3>", "yro3>",
    "yfi3.", "ycn2t>", "yca3>",
    "zi2>", "zy1s.",
)

_RULE_RE = re.compile(r"^([a-z]+)(\*?)(\d)([a-z]*)([.>])$")

_VOWELS = frozenset("aeiou")


def _parse_rules():
    by_letter: dict[str, list[tuple[str, bool, int, str, bool]]] = {}
    for raw in _RULE_STRINGS:
        m = _RULE_RE.match(raw)
        if not m:  # pragma: no cover - table is static
            raise ValueError(f"bad rule {raw!r}")
        rev_ending, intact, remove, append, cont = m.groups()
        ending = rev_ending[::-1]
        by_letter.setdefault(ending[-1], []).append(
            (ending, intact == "*", int(remove), append, cont == ">")
        )
    return by_letter


_RULES = _parse_rules()


def _acceptable(stem: str) -> bool:
    if not stem:
        return False
    if stem[0] in _VOWELS:
        return len(stem) >= 2
    return len(stem) >= 3 and any(c in _VOWELS or c == "y" for c in stem)


def lancaster_stem(token: str) -> str:
    """Stem one lowercase token (iterative rule application)."""
    word = token
    intact = True
    while word:
        rules = _RULES.get(word[-1])
        if not rules:
            break
        applied = False
        for ending, need_intact, remove, append, cont in rules:
            if need_intact and not intact:
                continue
            if not word.endswith(ending):
                continue
            candidate = word[: len(word) - remove] + append
            if not _acceptable(candidate):
                continue
            word = candidate
            intact = False
            applied = True
            if not cont:
                return word
            break
        if not applied:
            break
    return word


class MemoLancaster:
    """Vocabulary-memoized batch stemmer (Zipfian token streams hit the
    memo almost always; same shape as MemoPorter2)."""

    def __init__(self) -> None:
        self._memo: dict[str, str] = {}

    def stem_many(self, tokens) -> list[str]:
        memo = self._memo
        out = []
        for t in tokens:
            s = memo.get(t)
            if s is None:
                s = lancaster_stem(t)
                memo[t] = s
            out.append(s)
        return out
