"""Boolean query algebra as DataFrame plans.

Maps the reference's set evaluation (`/root/reference/code/indexes/
query_processing/query_processing_engine.py:227-293`) to joins Catalyst
can optimize:

    TERM   -> pruned posting scan (partition dir + parquet min/max on term)
    AND    -> left-semi hash join on doc_id_int
    OR     -> union + distinct
    NOT    -> left-anti join against the doclen universe
    PHRASE -> chained inner joins on doc_id_int + a JVM-side higher-order
              expression checking positional adjacency (no Python UDF):
              exists p in pos0 s.t. pos_i contains p+i for all i
              (reference `_check_phrase_in_doc`, `:183-225`)

A multi-token TERM (a quoted string whose normalization yields several
tokens) behaves as the implicit AND of its tokens.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import NormalizeConfig, normalize_query_terms
from . import query_parser as qp


class BooleanPlanner:
    """Builds a DataFrame of candidate doc ids for a parsed query node.

    `postings_provider(token) -> DataFrame(doc_id_int, positions)` must
    return an (already pruned) posting scan for one normalized token.
    `universe() -> DataFrame(doc_id_int)` is the all-docs relation used
    by NOT.
    """

    def __init__(self, postings_provider, universe, cfg: NormalizeConfig):
        self._postings = postings_provider
        self._universe = universe
        self._cfg = cfg

    def _norm(self, text: str) -> list[str]:
        return normalize_query_terms([text], self._cfg)[0]

    def _empty(self) -> DataFrame:
        return self._universe().limit(0).select("doc_id_int")

    def _token_docs(self, token: str) -> DataFrame:
        return self._postings(token).select("doc_id_int")

    def plan(self, node: qp.Node) -> DataFrame:
        kind = node[0]
        if kind == "term":
            toks = self._norm(node[1])
            if not toks:
                return self._empty()
            out = self._token_docs(toks[0])
            for t in toks[1:]:
                out = out.join(self._token_docs(t), "doc_id_int", "left_semi")
            return out
        if kind == "and":
            return self.plan(node[1]).join(self.plan(node[2]), "doc_id_int", "left_semi")
        if kind == "or":
            return self.plan(node[1]).union(self.plan(node[2])).distinct()
        if kind == "not":
            return self._universe().select("doc_id_int").join(
                self.plan(node[1]), "doc_id_int", "left_anti"
            )
        if kind == "phrase":
            return self.plan_phrase(node[1])
        raise ValueError(f"unknown node kind: {kind!r}")

    def plan_phrase(self, text: str) -> DataFrame:
        words = self._norm(text)
        if not words:
            return self._empty()
        if len(words) == 1:
            return self._token_docs(words[0])
        df = self._postings(words[0]).select("doc_id_int", F.col("positions").alias("p0"))
        for i, w in enumerate(words[1:], start=1):
            nxt = self._postings(w).select(
                "doc_id_int", F.col("positions").alias(f"p{i}")
            )
            df = df.join(nxt, "doc_id_int")
        # adjacency: some start position p in p0 with p+i present in each p_i
        def ok_for_start(p):
            return reduce(
                lambda a, b: a & b,
                [
                    F.array_contains(F.col(f"p{i}"), p + F.lit(i))
                    for i in range(1, len(words))
                ],
            )

        starts = F.filter(F.col("p0"), ok_for_start)
        return df.filter(F.size(starts) > 0).select("doc_id_int")
