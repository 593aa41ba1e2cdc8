"""Parser semantics vs the reference grammar
(`query_processing_engine.py:91-170`)."""

import pytest

from text_indexing_and_retrieval_system_spark.operators import query_parser as qp


def test_precedence_or_and_not():
    # OR < AND < NOT: a OR b AND NOT c  =>  or(a, and(b, not c))
    node = qp.parse('"a" OR "b" AND NOT "c"')
    assert node == ("or", ("term", "a"), ("and", ("term", "b"), ("not", ("term", "c"))))


def test_left_assoc():
    assert qp.parse('"a" AND "b" AND "c"') == (
        "and",
        ("and", ("term", "a"), ("term", "b")),
        ("term", "c"),
    )


def test_parens_and_phrase():
    node = qp.parse('("a" OR "b") AND PHRASE "x y"')
    assert node == ("and", ("or", ("term", "a"), ("term", "b")), ("phrase", "x y"))


def test_not_parens():
    assert qp.parse('NOT ("a" OR "b")') == ("not", ("or", ("term", "a"), ("term", "b")))


def test_lexer_drops_junk():
    # anything outside the token language is ignored, like the reference lexer
    assert qp.lex('hello "a" world AND "b"') == ['"a"', "AND", '"b"']


def test_missing_paren_raises():
    with pytest.raises(qp.QueryParseError):
        qp.parse('("a" AND "b"')


def test_scoring_terms_dedup_not():
    node = qp.parse('("a" AND "b") OR (NOT "c" AND "a")')
    # duplicates preserved, NOT-subtree terms excluded
    assert qp.scoring_terms(node) == ["a", "b", "a"]
    assert qp.collect_positive_terms(node) == ["a", "b", "c", "a"]


def test_phrase_requires_quoted_term():
    with pytest.raises(qp.QueryParseError):
        qp.parse("PHRASE (\"a\" AND \"b\")")
