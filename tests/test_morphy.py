"""morphy-lite noun lemmatizer (functions/morphy.py) — the documented
rule approximation of the reference's WordNet lemmatize branch
(preprocessor.py:108-130; reference default config has it disabled)."""

import pandas as pd
import pytest

from text_indexing_and_retrieval_system_spark.functions.morphy import (
    MemoMorphy,
    morphy_noun,
)
from text_indexing_and_retrieval_system_spark.functions.normalize import (
    NormalizeConfig,
    normalize_to_tokens,
)


def test_regular_plurals():
    cases = {
        "cars": "car",
        "keys": "key",
        "dogs": "dog",
        "churches": "church",
        "bushes": "bush",
        "boxes": "box",
        "taxes": "tax",
        "glasses": "glass",
        "buzzes": "buzz",
        "wolves": "wolf",
        "shelves": "shelf",
        "cities": "city",
        "babies": "baby",
    }
    got = {w: morphy_noun(w) for w in cases}
    assert got == cases


def test_vowel_stem_plurals_fall_through_to_s_removal():
    # the consonant guard stands in for the lexicon filter: these hit a
    # sibilant rule pattern but the right candidate is plain s-removal
    cases = {
        "houses": "house",
        "causes": "cause",
        "sizes": "size",
        "waves": "wave",
        "gloves": "glove",
        "aches": "ache",
        "ties": "tie",
        "pies": "pie",
    }
    got = {w: morphy_noun(w) for w in cases}
    assert got == cases


def test_irregular_exceptions():
    cases = {
        "children": "child",
        "feet": "foot",
        "mice": "mouse",
        "women": "woman",
        "criteria": "criterion",
        "indices": "index",
        "corpora": "corpus",
        "wives": "wife",
    }
    got = {w: morphy_noun(w) for w in cases}
    assert got == cases


def test_protected_forms():
    for w in ("glass", "bus", "axis", "news", "is", "as", "specimen"):
        assert morphy_noun(w) == w, w


def test_known_divergence_from_wordnet_is_documented():
    # without the lexicon, -rves words detach to -rf (WordNet would
    # keep "curve"); asserting the divergence keeps it visible
    assert morphy_noun("curves") == "curf"


def test_pipeline_dispatch_and_memo():
    cfg = NormalizeConfig(
        stemming=None, lemmatization="morphy", stopword_languages=()
    )
    out = normalize_to_tokens(pd.Series(["the wolves chased mice"]), cfg)
    assert list(out.iloc[0]) == ["the", "wolf", "chased", "mouse"]
    memo = MemoMorphy()
    words = ["wolves", "wolves", "cities"]
    assert memo.lemmatize_many(words) == ["wolf", "wolf", "city"]


def test_wordnet_still_raises():
    cfg = NormalizeConfig(lemmatization="wordnet")
    with pytest.raises(NotImplementedError):
        normalize_to_tokens(pd.Series(["x"]), cfg)
