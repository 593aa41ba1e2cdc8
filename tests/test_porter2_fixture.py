"""Independent oracle for Snowball (Porter2) stemming over the driver's
`documents` testdata.

tests/fixtures/porter2_vocab_stems.csv maps the ENTIRE token vocabulary
of /root/testdata/sf*/documents.parquet (31 words) to expected stems
that were derived BY HAND from the published Porter2 spec
(https://snowballstem.org/algorithms/english/stemmer.html), not from
this repo's implementation. The driver-gate query
`stem_snowball_top50` joins its DuckDB oracle against this fixture, so
the previously rows-only row is now value-hashed end-to-end.

Hand derivations of every non-identity row (R1 = region after the first
non-vowel that follows a vowel; step 5 deletes final e when in R2, or
in R1 and not preceded by a short syllable):

- customer -> custom   "er" is a step-4 suffix deleted when in R2;
                       R1 = "tomer", R2 = "er" -> delete.
- merge    -> merg     final e is in R1 ("ge") and preceded by "rg"
                       (consonant-consonant, not a short syllable).
- query    -> queri    step 1c: final y preceded by a non-vowel (r)
                       and not at position 0 -> replace with i.
- table    -> tabl     final e in R1 ("le"), preceded by "bl" -> delete.
- value    -> valu     final e in R1 ("ue"), preceded by "lu"
                       (consonant-vowel, not c-v-c) -> delete.

Identity rows that look deletable but are not:
- line     -> line     final e in R1 but preceded by the SHORT syllable
                       "lin" (c-v-c, n not w/x/Y) -> kept.
- the      -> the      R1 is empty (no non-vowel after the first vowel).
- key      -> key      final y preceded by a vowel -> step 1c skipped.
- order/filter/vector  end "er"/"or" but R2 is empty -> step 4 skipped.
"""

import csv
import os

import duckdb
import pandas as pd

from text_indexing_and_retrieval_system_spark.functions.normalize import (
    NormalizeConfig,
    normalize_to_tokens,
)
from text_indexing_and_retrieval_system_spark.functions.porter2 import porter2_stem

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "porter2_vocab_stems.csv")


def _fixture_rows() -> dict[str, str]:
    with open(FIXTURE, newline="") as f:
        return {r["term"]: r["stem"] for r in csv.DictReader(f)}


def test_fixtures_cover_full_testdata_vocabulary():
    cfg = NormalizeConfig(stemming=None, stopword_languages=())
    vocab: set[str] = set()
    for sf in ("0.001", "0.01", "0.1"):
        path = f"/root/testdata/sf{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        texts = duckdb.sql(f"select text from read_parquet('{path}')").df()["text"]
        for toks in normalize_to_tokens(texts, cfg):
            vocab.update(toks)
    assert vocab, "no testdata found"
    for fixture in (FIXTURE, FIXTURE.replace("porter2_", "lancaster_")):
        with open(fixture, newline="") as f:
            rows = {r["term"]: r["stem"] for r in csv.DictReader(f)}
        missing = vocab - set(rows)
        assert not missing, f"{fixture} must cover the corpus vocabulary: {missing}"


def test_implementation_matches_hand_derived_stems():
    """Implementation vs spec-on-paper: every fixture row was stemmed by
    hand from the published algorithm (see module docstring); the code
    must agree with ALL of them."""
    rows = _fixture_rows()
    got = {t: porter2_stem(t) for t in rows}
    assert got == rows


def test_fixture_has_nontrivial_rows():
    """Guard against the fixture degenerating into identity mappings —
    it must keep exercising suffix removal, e-deletion and y->i."""
    rows = _fixture_rows()
    changed = {t: s for t, s in rows.items() if t != s}
    assert {"customer", "merge", "query", "table", "value"} <= set(changed)
