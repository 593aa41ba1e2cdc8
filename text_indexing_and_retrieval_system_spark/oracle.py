"""Pure-Python/numpy oracle: reference-semantics boolean retrieval + scoring.

Deliberately simple (dict-of-dicts, like the reference's in-memory index,
`/root/reference/code/indexes/index_custom.py:199-250`) so its correctness
is auditable by eye. Used ONLY to generate goldens and check the Spark
engine in tests — never in the data path.

Semantics reproduced:
- boolean eval over doc-id sets: TERM lookup / AND=∩ / OR=∪ /
  NOT=complement vs all docs / PHRASE positional adjacency
  (`query_processing_engine.py:227-293`)
- scoring terms = TERMs not under NOT, duplicates preserved
  (`query_processing_engine.py:141-170`)
- scorers:
  * wordcount: score(term,doc)=tf (`index_custom.py:233-238`)
  * tfidf:    tf * ln(N/df)       (`index_custom.py:240-250`)
  * bm25:     Lucene/ES BM25, k1=1.2 b=0.75,
              idf = ln(1 + (N-df+0.5)/(df+0.5)) — the reference's ES
              ground-truth scorer (`docs/DOCUMENTATION.md:34`)
- docs in the filtered set matching no scoring term score 0.0
  (`query_processing_engine.py:356-358`)
- total order: score DESC, then (conv_id, turn_idx) ASC — the same order
  as the engine's doc_id_int tie-break on every path (the reference is
  tie-ambiguous — SURVEY.md §2.6). Tie-breaking on the raw doc_id string
  would diverge when one conv_id is a prefix of another.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import pandas as pd

from .functions.normalize import DEFAULT_CONFIG, NormalizeConfig, normalize_to_tokens
from .operators import query_parser as qp

K1 = 1.2
B = 0.75


@dataclass
class OracleIndex:
    postings: dict[str, dict[str, list[int]]] = field(default_factory=dict)
    doclen: dict[str, int] = field(default_factory=dict)
    cfg: NormalizeConfig = DEFAULT_CONFIG

    @property
    def n_docs(self) -> int:
        return len(self.doclen)

    @property
    def avgdl(self) -> float:
        return sum(self.doclen.values()) / max(len(self.doclen), 1)

    @classmethod
    def build(
        cls, docs: pd.DataFrame, id_col: str = "doc_id", text_col: str = "text",
        cfg: NormalizeConfig = DEFAULT_CONFIG,
    ) -> "OracleIndex":
        idx = cls(cfg=cfg)
        token_lists = normalize_to_tokens(docs[text_col], cfg)
        for doc_id, tokens in zip(docs[id_col].astype(str), token_lists):
            if doc_id in idx.doclen:  # first occurrence wins (reference dedup,
                continue  # dataset_news.py:330-343)
            idx.doclen[doc_id] = len(tokens)
            for pos, term in enumerate(tokens):
                idx.postings.setdefault(term, {}).setdefault(doc_id, []).append(pos)
        return idx

    # ----------------------------- boolean -----------------------------

    def _norm_term(self, text: str) -> list[str]:
        from .functions.normalize import normalize_query_terms

        return normalize_query_terms([text], self.cfg)[0]

    def eval_boolean(self, node: qp.Node) -> set[str]:
        kind = node[0]
        if kind == "term":
            toks = self._norm_term(node[1])
            if not toks:
                return set()
            if len(toks) > 1:
                # a multi-word TERM behaves like implicit AND of its tokens
                out = self.eval_boolean(("term_raw", toks[0]))
                for t in toks[1:]:
                    out &= self.eval_boolean(("term_raw", t))
                return out
            return set(self.postings.get(toks[0], {}))
        if kind == "term_raw":
            return set(self.postings.get(node[1], {}))
        if kind == "and":
            return self.eval_boolean(node[1]) & self.eval_boolean(node[2])
        if kind == "or":
            return self.eval_boolean(node[1]) | self.eval_boolean(node[2])
        if kind == "not":
            return set(self.doclen) - self.eval_boolean(node[1])
        if kind == "phrase":
            words = self._norm_term(node[1])
            if not words:
                return set()
            first = self.postings.get(words[0], {})
            out = set()
            for doc_id, first_positions in first.items():
                for p in first_positions:
                    if all(
                        (p + i) in self.postings.get(w, {}).get(doc_id, [])
                        for i, w in enumerate(words[1:], start=1)
                    ):
                        out.add(doc_id)
                        break
            return out
        raise ValueError(f"unknown node {kind!r}")

    # ----------------------------- scoring -----------------------------

    def _idf_bm25(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def score_one(self, term: str, doc_id: str, scorer: str) -> float:
        plist = self.postings.get(term, {})
        if doc_id not in plist:
            return 0.0
        tf = len(plist[doc_id])
        if scorer == "wordcount":
            return float(tf)
        if scorer == "tfidf":
            df = len(plist)
            idf = math.log(self.n_docs / df) if df else 0.0
            return tf * idf
        if scorer == "bm25":
            dl = self.doclen[doc_id]
            # float association fixed as idf * (tf*(k1+1)/denom) — the same
            # expression tree the Spark paths use, for bit-identical scores
            denom = tf + K1 * ((1 - B) + (B * dl) / self.avgdl)
            return self._idf_bm25(term) * (tf * (K1 + 1) / denom)
        raise ValueError(scorer)

    def search(
        self, query: str, k: int = 50, scorer: str = "bm25"
    ) -> list[tuple[str, float]]:
        """Two-stage ranked boolean: filter then rank, reference
        `process_custom_query` (`query_processing_engine.py:549-651`)."""
        node = qp.parse(query)
        candidates = self.eval_boolean(node)
        # expand raw scoring terms through the normalizer, duplicates kept
        raw_terms = qp.scoring_terms(node)
        terms: list[str] = []
        for raw in raw_terms:
            terms.extend(self._norm_term(raw))
        scores = {d: 0.0 for d in candidates}
        for term in terms:
            for doc_id in self.postings.get(term, {}):
                if doc_id in scores:
                    scores[doc_id] += self.score_one(term, doc_id, scorer)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], _doc_order_key(kv[0])))
        return ranked[:k]


def _doc_order_key(doc_id: str) -> tuple[str, int]:
    """(conv_id, turn) sort key == the engine's doc_id_int order. Ids not
    in conv:turn form fall back to plain string order."""
    conv, _, turn = doc_id.rpartition(":")
    if conv and turn.isdigit():
        return (conv, int(turn))
    return (doc_id, -1)
