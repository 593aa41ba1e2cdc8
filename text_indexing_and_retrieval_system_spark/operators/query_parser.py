"""Boolean mini-language parser (driver-side; queries are tiny).

Grammar is the reference's, reproduced from its spec
(`/root/reference/code/indexes/query_processing/query_processing_engine.py:51`
lexer pattern; `:91-138` precedence OR < AND < NOT < PHRASE/parens/term;
left-associative binaries; NOT binds one atom-level operand), implemented
here as a precedence-climbing parser over an immutable token stream.

AST is tuple-shaped (not the reference's nested dicts):
    ("term", text) | ("phrase", text) | ("and", l, r) | ("or", l, r)
    | ("not", x)

`scoring_terms` mirrors `get_scoring_terms`
(`query_processing_engine.py:141-170`): all TERM/PHRASE words NOT under a
NOT, duplicates preserved, left-to-right order (a term appearing twice is
scored twice).
"""

from __future__ import annotations

import re

TOKEN_RE = re.compile(r'"[^"]+"|\(|\)|AND|OR|NOT|PHRASE')

Node = tuple


def lex(query: str) -> list[str]:
    # same token language as the reference: anything that is not a quoted
    # string, paren, or operator keyword is dropped
    return [t.strip() for t in TOKEN_RE.findall(query) if t.strip()]


class QueryParseError(ValueError):
    pass


def parse(query: str) -> Node:
    tokens = lex(query)
    pos = 0

    def peek() -> str | None:
        return tokens[pos] if pos < len(tokens) else None

    def advance() -> str:
        nonlocal pos
        tok = tokens[pos]
        pos += 1
        return tok

    def parse_atom() -> Node:
        tok = peek()
        if tok is None:
            raise QueryParseError("unexpected end of query")
        if tok == "(":
            advance()
            node = parse_binary(0)
            if peek() != ")":
                raise QueryParseError("Missing closing parenthesis")
            advance()
            return node
        if tok == "PHRASE":
            advance()
            inner = parse_atom()
            if inner[0] != "term":
                raise QueryParseError(
                    'PHRASE operator must be followed by a single quoted term '
                    '(e.g., PHRASE "hello world")'
                )
            return ("phrase", inner[1])
        if tok == "NOT":
            advance()
            return ("not", parse_atom())
        advance()
        if tok.startswith('"') and tok.endswith('"') and len(tok) >= 2:
            return ("term", tok[1:-1])
        raise QueryParseError(f"Unexpected token: {tok}")

    _PREC = {"OR": 1, "AND": 2}

    def parse_binary(min_prec: int) -> Node:
        left = parse_atom()
        while True:
            tok = peek()
            if tok not in _PREC or _PREC[tok] < min_prec:
                return left
            op = advance().lower()
            right = parse_binary(_PREC[tok.upper()] + 1)
            left = (op, left, right)

    node = parse_binary(0)
    if peek() is not None:
        raise QueryParseError(f"trailing tokens at {peek()!r}")
    return node


def scoring_terms(node: Node) -> list[str]:
    """TERM texts not under NOT; duplicates preserved; phrase words expand."""
    kind = node[0]
    if kind == "term":
        return [node[1]]
    if kind == "phrase":
        return [node[1]]
    if kind == "not":
        return []
    if kind in ("and", "or"):
        return scoring_terms(node[1]) + scoring_terms(node[2])
    raise QueryParseError(f"unknown node kind {kind!r}")


def collect_positive_terms(node: Node) -> list[str]:
    """All raw term/phrase texts in the tree (including under NOT) —
    used for posting-list pre-fetch pruning."""
    kind = node[0]
    if kind in ("term", "phrase"):
        return [node[1]]
    if kind == "not":
        return collect_positive_terms(node[1])
    return collect_positive_terms(node[1]) + collect_positive_terms(node[2])
