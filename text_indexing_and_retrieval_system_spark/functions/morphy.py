"""Rule-based noun lemmatizer approximating WordNet morphy.

Reference parity target: the reference pipeline's ``algo='wordnet'``
branch calls ``nltk.stem.WordNetLemmatizer().lemmatize(word)``
(``/root/reference/code/preprocessing/preprocessor.py:108-130``), whose
default POS is NOUN. Real morphy = irregular-form exception list +
suffix detachment rules + a membership check against the WordNet lemma
lexicon. The lexicon cannot be shipped here (WordNet corpus download),
so this implementation is the documented approximation:

1. irregular plurals via a vendored slice of WordNet's published
   ``noun.exc`` exception list (the high-frequency entries);
2. the published morphy NOUN detachment rules, longest suffix first;
3. identity fallback.

The missing lexicon check means words whose detached form is not a real
lemma ("series" -> "sery" instead of "series") can differ from WordNet.
That limitation is inherent to the offline environment and is asserted
explicitly in tests/test_morphy.py. The reference default config has
lemmatization DISABLED (config.yaml preprocessing block), so this
operator is opt-in there and here.
"""

from __future__ import annotations

# vendored slice of WordNet's noun.exc irregular-plural list
_NOUN_EXCEPTIONS: dict[str, str] = {
    "children": "child",
    "feet": "foot",
    "geese": "goose",
    "lice": "louse",
    "men": "man",
    "women": "woman",
    "mice": "mouse",
    "oxen": "ox",
    "teeth": "tooth",
    "people": "person",
    "dice": "die",
    "criteria": "criterion",
    "phenomena": "phenomenon",
    "indices": "index",
    "matrices": "matrix",
    "vertices": "vertex",
    "appendices": "appendix",
    "analyses": "analysis",
    "bases": "basis",
    "crises": "crisis",
    "hypotheses": "hypothesis",
    "theses": "thesis",
    "corpora": "corpus",
    "genera": "genus",
    "media": "medium",
    "curricula": "curriculum",
    "memoranda": "memorandum",
    "alumni": "alumnus",
    "fungi": "fungus",
    "nuclei": "nucleus",
    "radii": "radius",
    "stimuli": "stimulus",
    "syllabi": "syllabus",
    "larvae": "larva",
    "antennae": "antenna",
    "wives": "wife",
    "knives": "knife",
    "lives": "life",
    "selves": "self",
    "axes": "axis",
}

# Published morphy NOUN suffix detachment rules. Real morphy tries all
# of them and keeps the candidates found in the lexicon; without the
# lexicon, the third field approximates that filter: rules marked
# "consonant" apply only when the suffix is preceded by a consonant
# (wolves->wolf, glasses->glass, buzzes->buzz) and otherwise fall
# through to plain s-removal (waves->wave, houses->house, sizes->size —
# exactly the candidates the lexicon would have picked). "long" gates
# ies->y to tokens over 4 chars (cities->city but ties->tie).
_VOWELS = frozenset("aeiou")
_NOUN_RULES: tuple[tuple[str, str, str], ...] = (
    ("ches", "ch", "consonant"),
    ("shes", "sh", "always"),
    ("ses", "s", "consonant"),
    ("ves", "f", "consonant"),
    ("xes", "x", "always"),
    ("zes", "z", "consonant"),
    ("ies", "y", "long"),
    ("s", "", "always"),
)
# morphy's ("men","man") rule is intentionally omitted: without the
# lexicon filter it corrupts singulars like "specimen"; irregular
# -men plurals go through the exception list instead.


# invariant s-final lemmas (in WordNet as-is; the lexicon check is what
# keeps real morphy from singularizing them)
_INVARIANT = frozenset(
    {"news", "series", "species", "means", "headquarters", "scissors"}
)


def morphy_noun(token: str) -> str:
    """Lemmatize one lowercase token as a noun."""
    exc = _NOUN_EXCEPTIONS.get(token)
    if exc is not None:
        return exc
    if token in _INVARIANT:
        return token
    if len(token) <= 2 or token.endswith(("ss", "us", "is")):
        # tiny tokens and -ss/-us/-is finals ("glass", "bus", "axis")
        # are never detached — the lexicon would have rejected them
        return token
    for suffix, repl, mode in _NOUN_RULES:
        if not token.endswith(suffix) or len(token) <= len(suffix):
            continue
        if mode == "consonant" and token[-len(suffix) - 1] in _VOWELS:
            continue
        if mode == "long" and len(token) <= 4:
            continue
        return token[: len(token) - len(suffix)] + repl
    return token


class MemoMorphy:
    """Vocabulary-memoized batch lemmatizer (same shape as the memoized
    stemmers in porter.py / porter2.py / lancaster.py)."""

    def __init__(self) -> None:
        self._memo: dict[str, str] = {}

    def lemmatize_many(self, tokens) -> list[str]:
        memo = self._memo
        out = []
        for t in tokens:
            s = memo.get(t)
            if s is None:
                s = morphy_noun(t)
                memo[t] = s
            out.append(s)
        return out
