"""Property test: the oracle's set-algebra boolean evaluation must equal
a brute-force per-document check on random ASTs (SURVEY.md §5 property
strategy). Pure Python — no Spark — so hypothesis can run many cases.
"""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from text_indexing_and_retrieval_system_spark.functions.normalize import (
    NormalizeConfig,
    normalize_to_tokens,
)
from text_indexing_and_retrieval_system_spark.oracle import OracleIndex

CFG = NormalizeConfig(stopword_languages=(), stemming=None)

VOCAB = ["alpha", "beta", "gamma", "delta", "epsil", "zeta"]

DOCS = pd.DataFrame(
    {
        "doc_id": [f"d{i:02d}" for i in range(24)],
        "text": [
            " ".join(VOCAB[(i + j) % len(VOCAB)] for j in range(i % 7 + 1))
            for i in range(24)
        ],
    }
)

IDX = OracleIndex.build(DOCS, cfg=CFG)
TOKENS = {
    doc_id: list(toks)
    for doc_id, toks in zip(DOCS["doc_id"], normalize_to_tokens(DOCS["text"], CFG))
}


def brute_eval(node, tokens: list[str]) -> bool:
    kind = node[0]
    if kind == "term":
        return node[1] in tokens
    if kind == "and":
        return brute_eval(node[1], tokens) and brute_eval(node[2], tokens)
    if kind == "or":
        return brute_eval(node[1], tokens) or brute_eval(node[2], tokens)
    if kind == "not":
        return not brute_eval(node[1], tokens)
    if kind == "phrase":
        words = node[1].split()
        for s in range(len(tokens) - len(words) + 1):
            if tokens[s : s + len(words)] == words:
                return True
        return False
    raise ValueError(kind)


terms = st.sampled_from(VOCAB + ["missing"])


def ast(depth):
    if depth == 0:
        return st.one_of(
            terms.map(lambda t: ("term", t)),
            st.tuples(terms, terms).map(lambda p: ("phrase", f"{p[0]} {p[1]}")),
        )
    sub = ast(depth - 1)
    return st.one_of(
        terms.map(lambda t: ("term", t)),
        st.tuples(sub, sub).map(lambda p: ("and", p[0], p[1])),
        st.tuples(sub, sub).map(lambda p: ("or", p[0], p[1])),
        sub.map(lambda x: ("not", x)),
    )


@given(ast(3))
@settings(max_examples=300, deadline=None)
def test_oracle_equals_bruteforce(node):
    got = IDX.eval_boolean(node)
    want = {d for d, toks in TOKENS.items() if brute_eval(node, toks)}
    assert got == want, node
