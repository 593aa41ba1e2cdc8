"""Tokenize/normalize pipeline — vectorized Arrow (pandas) implementation.

Reproduces the reference's fixed preprocessing order — lowercase →
stopword-removal → char-strip → stem → (lemmatize) — documented at
`/root/reference/code/dataset_managers/dataset_news.py:283-308` and
implemented per-step at `preprocessor.py:15-106`, but as ONE vectorized
pandas pass per Arrow batch instead of five per-document Python string
rewrites:

    series of text  →  explode to tokens  →  isin() stopword filter
    →  regex char-strip (str.replace, vectorized)  →  memoized stem over
    unique tokens  →  regroup to list<token> per row

Equivalences that make this identical to the reference semantics:
- the reference splits/rejoins on whitespace at every step, so token
  boundaries are fixed by the FIRST whitespace split; char-strip never
  introduces whitespace, so per-token stripping is equivalent
  (`preprocessor.py:71-78`).
- tokens that become empty after stripping vanish in the reference's
  final `content.split()` (`index_custom.py:216`); we drop them before
  assigning positions, so positions agree.
- char classes: punctuation/special = not alnum, not space
  (`preprocessor.py:73-75`) → regex `[^\\w\\s]|_` (underscore is not
  alnum); numbers = `\\d`.

The only per-word Python is the memoized Porter stem over *unique*
tokens of a batch (Zipfian vocabulary ⇒ tiny); everything else is
pandas/numpy vectorized. Queries are normalized with the identical
pipeline so index and query vocabularies always agree (the reference's
runtime query preprocessing is a no-op because its query sets are
generated pre-stemmed — `query_processing_engine.py:180-181`).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

from .porter import MemoStemmer
from .stopwords import stopwords_for


@dataclass(frozen=True)
class NormalizeConfig:
    """Mirrors reference `config.yaml:11-21` preprocessing block."""

    lowercase: bool = True
    remove_punctuation: bool = True
    remove_numbers: bool = True
    remove_special_characters: bool = True
    stopword_languages: tuple[str, ...] = ("english",)
    stemming: str | None = "porter"  # porter | snowball/porter2 | lancaster | None
    lemmatization: str | None = None  # None | morphy (wordnet needs corpus)

    def strip_pattern(self) -> str | None:
        parts = []
        if self.remove_punctuation or self.remove_special_characters:
            parts.append(r"[^\w\s]|_")
        if self.remove_numbers:
            parts.append(r"\d")
        return "|".join(parts) if parts else None


DEFAULT_CONFIG = NormalizeConfig()

_stemmer = MemoStemmer()

from .lancaster import MemoLancaster  # noqa: E402
from .porter2 import MemoPorter2  # noqa: E402  (shares the module cache)

_stemmer2 = MemoPorter2()
_stemmer_lanc = MemoLancaster()

from .morphy import MemoMorphy  # noqa: E402

_lemmatizer = MemoMorphy()


def normalize_to_tokens(texts: pd.Series, cfg: NormalizeConfig = DEFAULT_CONFIG) -> pd.Series:
    """Series[str] -> Series[list[str]] of normalized tokens (positions =
    list index). Vectorized; the only Python loop is memoized stemming
    over the batch's unique tokens."""
    if cfg.lemmatization not in (None, "morphy"):
        raise NotImplementedError(
            "lemmatization=wordnet needs a WordNet corpus (unavailable in "
            "this environment); use 'morphy' for the documented rule "
            "approximation; reference default is null (config.yaml:17)"
        )
    s = texts.fillna("")
    if cfg.lowercase:
        s = s.str.lower()

    tokens = s.str.split()
    exploded = tokens.explode()
    mask_valid = exploded.notna()
    exploded = exploded[mask_valid]

    if cfg.stopword_languages:
        stops: set[str] = set()
        for lang in cfg.stopword_languages:
            stops |= stopwords_for(lang)
        # reference lowercases the word for the membership test
        # (`preprocessor.py:50`) even when lowercase=False upstream
        keep = ~exploded.str.lower().isin(stops)
        exploded = exploded[keep]

    pat = cfg.strip_pattern()
    if pat is not None:
        exploded = exploded.str.replace(pat, "", regex=True)
    exploded = exploded[exploded != ""]

    if cfg.stemming == "porter":
        uniq = pd.unique(exploded)
        mapping = dict(zip(uniq, _stemmer.stem_many(uniq)))
        exploded = exploded.map(mapping)
    elif cfg.stemming in ("snowball", "porter2"):
        uniq = pd.unique(exploded)
        mapping = dict(zip(uniq, _stemmer2.stem_many(uniq)))
        exploded = exploded.map(mapping)
    elif cfg.stemming == "lancaster":
        uniq = pd.unique(exploded)
        mapping = dict(zip(uniq, _stemmer_lanc.stem_many(uniq)))
        exploded = exploded.map(mapping)
    elif cfg.stemming is not None:
        raise NotImplementedError(
            f"stemming algorithm {cfg.stemming!r} not available "
            "(porter | snowball/porter2 | lancaster)"
        )

    if cfg.lemmatization == "morphy":
        # reference order is stem THEN lemmatize when both are on
        # (preprocessor.py applies them as successive pipeline steps)
        uniq = pd.unique(exploded)
        mapping = dict(zip(uniq, _lemmatizer.lemmatize_many(uniq)))
        exploded = exploded.map(mapping)

    regrouped = exploded.groupby(level=0).agg(list)
    out = pd.Series([[] for _ in range(len(texts))], index=texts.index, dtype=object)
    out[regrouped.index] = regrouped
    return out


_QUERY_NORM_CACHE: dict[tuple[str, NormalizeConfig], tuple[str, ...]] = {}
_QUERY_NORM_CACHE_MAX = 262144


def prime_query_norm_cache(
    terms: list[str], cfg: NormalizeConfig = DEFAULT_CONFIG
) -> None:
    """Bulk-normalize many query terms in ONE vectorized pandas pass and
    prime the per-term cache. The per-term pipeline costs ~2-4 ms of
    pandas overhead COLD, so a 256-query batch with a few hundred fresh
    terms pays >1 s of constant driver time without this (which is pure
    serial floor in the N->4N scaling criterion)."""
    fresh = [t for t in dict.fromkeys(terms) if (t, cfg) not in _QUERY_NORM_CACHE]
    if not fresh:
        return
    lists = normalize_to_tokens(pd.Series(fresh), cfg)
    if len(_QUERY_NORM_CACHE) + len(fresh) > _QUERY_NORM_CACHE_MAX:
        _QUERY_NORM_CACHE.clear()
    for t, toks in zip(fresh, lists):
        _QUERY_NORM_CACHE[(t, cfg)] = tuple(toks)


def normalize_query_terms(
    terms: list[str], cfg: NormalizeConfig = DEFAULT_CONFIG
) -> list[list[str]]:
    """Normalize query terms/phrases with the identical pipeline.

    One token-list per input string (a TERM may normalize to 0, 1, or N
    tokens; a PHRASE body normalizes to its token sequence). Memoized per
    (term, config) — query batches repeat pool terms heavily; callers
    with many queries should prime_query_norm_cache() first.
    """
    if not terms:
        return []
    missing = [t for t in terms if (t, cfg) not in _QUERY_NORM_CACHE]
    if missing:
        prime_query_norm_cache(missing, cfg)
    return [list(_QUERY_NORM_CACHE[(t, cfg)]) for t in terms]
