"""High-level engine: build / load an index directory, answer queries.

Query lifecycle (Spark rebuild of the reference's
`process_custom_query`, `/root/reference/code/indexes/query_processing/
query_processing_engine.py:549-651`):

    query string ──(driver)── parse → AST → scoring terms
      → strategy dispatch (auto):
        "wand"     pure disjunctions — block-max bucket scorer with
                   MaxScore skipping + certified cross-bucket θ seeds
        "kernel"   every other bm25 query — the whole boolean/phrase
                   tree set-evaluated in numpy per doc-range bucket
                   (NOT via doclen cogroup), then scored exactly
        "dataframe" non-bm25 scorers / verification — semi/anti-join
                   candidate plan + deterministic-order fold aggregate
      → top-k (score DESC, doc_id_int ASC) → optional hydration join

All strategies are bit-identical in scores and order (golden suite runs
them against the same oracle). Control crosses driver→executor once per
query on the kernel/wand paths (plus a dict-lookup id resolution from
the driver-cached convmap), matching SURVEY.md §3.1's target.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import codec
from .functions.normalize import NormalizeConfig, normalize_query_terms
from .operators import query_parser as qp
from .operators import ranking, wand
from .operators.boolean import BooleanPlanner
from .operators.index_build import TURN_BITS, IndexBuildConfig
from .operators.segments import Manifests, build_index, term_bucket_py

POSTINGS_SCHEMA = "term string, doc_id_int long, tf int, dl int, positions array<int>"

# search_batch winner-merge crossover: at or below this many estimated
# per-(query, bucket) winner rows the driver merges locally; above it the
# distributed merge keeps the collect at ~k x queries rows (env override
# for scaling experiments)
DRIVER_MERGE_MAX_ROWS = int(os.environ.get("TIRS_DRIVER_MERGE_MAX_ROWS", "2000000"))


def _unpack_blocks(blocks: DataFrame, with_positions: bool) -> DataFrame:
    """Compressed block rows → exploded postings (Arrow-batched numpy).
    Positions live in their own `pos_payload` column, only selected (and
    so only scanned/decoded) when the caller needs them."""
    cols = ["term", "payload"] + (["pos_payload"] if with_positions else [])

    import numpy as np

    def run(batches):
        empty = pd.DataFrame(columns=["term", "doc_id_int", "tf", "dl", "positions"])
        for pdf in batches:
            if not len(pdf):
                yield empty
                continue
            if with_positions:
                outs = []
                for row in pdf.itertuples(index=False):
                    d, tf, dl, _ = codec.unpack_postings(bytes(row.payload))
                    pos = codec.unpack_positions(bytes(row.pos_payload), len(d))
                    outs.append(
                        pd.DataFrame(
                            {
                                "term": row.term,
                                "doc_id_int": d,
                                "tf": tf.astype("int32"),
                                "dl": dl.astype("int32"),
                                "positions": [list(p) for p in pos],
                            }
                        )
                    )
                yield pd.concat(outs, ignore_index=True)
                continue
            # no-positions fast path: one vectorized decode per Arrow batch
            bn, d, tf, dl = codec.unpack_postings_batch(pdf["payload"].to_list())
            yield pd.DataFrame(
                {
                    "term": np.repeat(pdf["term"].to_numpy(), bn),
                    "doc_id_int": d,
                    "tf": tf.astype("int32"),
                    "dl": dl.astype("int32"),
                    "positions": [None] * int(bn.sum()),
                }
            )

    return blocks.select(*cols).mapInPandas(run, schema=POSTINGS_SCHEMA)


@dataclass
class SearchResult:
    query: str
    docs: list[str]
    scores: list[float]


class InvertedIndex:
    """A built index on disk (postings/lexicon/doclen/docs/stats)."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.dir = index_dir
        self.reload()

    def reload(self) -> None:
        """(Re-)read stats.json + the build manifest and drop the lexicon
        cache. Call after `streaming.incremental.refresh_postings` /
        `add_documents` — a handle held across a refresh otherwise serves
        stale n_docs/avgdl/idf and keeps negative-caching new terms."""
        stats_path = os.path.join(self.dir, "stats.json")
        if not os.path.exists(stats_path):
            raise FileNotFoundError(
                f"no built index at {self.dir} (missing stats.json — "
                "was it dropped or never built?)"
            )
        with open(stats_path) as f:
            self.stats = json.load(f)
        # index version: every build / refresh_postings commit writes a
        # fresh random generation id into stats.json, distinguishing index
        # generations even when n_docs/avgdl happen to be unchanged (e.g.
        # tombstone + re-add of same-length docs). Folded into the wand
        # theta-seed key so executor-cached seeds from a previous
        # generation can never prune against the new postings. mtime_ns is
        # only the fallback for pre-round-4 indexes — coarse-mtime
        # filesystems can give two generations the same tick.
        self.index_version = self.stats.get("generation") or os.stat(
            stats_path
        ).st_mtime_ns
        man = Manifests(self.dir)
        build_info = man.read("build") or man.read("stage3_postings")
        cfg = (build_info or {}).get("config", {})
        self.n_term_buckets = cfg.get("n_term_buckets", 16)
        self.n_range_buckets = cfg.get("n_range_buckets", 32)
        self.store_positions = bool(cfg.get("store_positions", True))
        self.range_shift = None  # doc-id range bucketing of the postings
        for unit in ("refresh_postings", "stage3_postings"):
            info = man.read(unit)
            if info and info.get("range_shift") is not None:
                self.range_shift = int(info["range_shift"])
                break
        # kernel tasks: one shuffle partition per ACTUAL range bucket via
        # the slot mapping (wand._with_slot) — no collision stragglers,
        # no empty partitions paying closure ship + unpickle. The bucket
        # count follows from the doc-id geometry (shift is chosen from
        # n_convs, so the realized count can be below n_range_buckets);
        # +1 covers the edge bucket.
        if self.range_shift is not None:
            n_convs = int(self.stats.get("n_convs") or 0)
            max_doc = (n_convs << TURN_BITS) + (1 << TURN_BITS)
            self.kernel_buckets = (max_doc >> self.range_shift) + 1
        else:
            self.kernel_buckets = self.n_range_buckets + 1
        norm = cfg.get("normalize", {})
        if norm:
            norm = dict(norm)
            norm["stopword_languages"] = tuple(norm.get("stopword_languages", ()))
            self.normalize_cfg = NormalizeConfig(**norm)
        else:
            self.normalize_cfg = NormalizeConfig()
        self._lex_cache: dict[str, dict | None] = {}
        doclen_df = getattr(self, "_doclen_df", None)
        if doclen_df is not None:
            doclen_df.unpersist()
        self._doclen_df = None
        # session-lifetime driver caches (loaded lazily, size-gated): the
        # full lexicon and the convmap turn two per-batch Spark jobs
        # (lexicon lookup, doc_id resolution join) into dict lookups
        self._full_lex: dict | None = None
        self._convmap: dict[int, str] | None = None
        self._turn_strs: list[str] | None = None
        self._postings_df = None
        self._n_terms = None
        # driver-local posting-block cache (the interactive head cache):
        # term -> its block frame, LRU-bounded by payload bytes. Cleared
        # here so a refresh can never serve stale blocks.
        from collections import OrderedDict

        self._block_cache: OrderedDict[tuple, pd.DataFrame] = OrderedDict()
        self._block_cache_bytes = 0
        # one-shot whole-index block preload state (see
        # _maybe_bulk_load_blocks): None = not yet decided, False =
        # over-budget (stay per-term), True = preloaded
        self._bulk_blocks: bool | None = None
        self._bulk_empty: pd.DataFrame | None = None
        self._total_df: int | None = None
        self._driver_theta: dict[str, float] = {}
        self._doclen_ids_cache = None
        for unit in ("refresh_postings", "stage3_postings"):
            info = man.read(unit)
            if info and info.get("n_terms") is not None:
                self._n_terms = int(info["n_terms"])
                break

    # ------------------------------ scans ------------------------------

    def blocks_for(self, tokens: list[str], with_positions: bool = False) -> DataFrame:
        """Posting blocks for normalized tokens — bucket-dir pruned +
        term predicate pushed to parquet row groups. The reader relation
        is built once per handle (a fresh spark.read.parquet costs a
        1-task schema/footer job per query).

        `with_positions=False` (the ranked/boolean default) drops the
        `pos_payload` column BEFORE any shuffle, so parquet column
        pruning keeps position bytes entirely off the hot path — only
        phrase queries pay for them."""
        if with_positions and not self.store_positions:
            raise ValueError(
                f"index at {self.dir} was built with store_positions=False; "
                "phrase queries require positions — rebuild with "
                "store_positions=True"
            )
        buckets = sorted({term_bucket_py(t, self.n_term_buckets) for t in tokens})
        df = self._blocks_relation(with_positions)
        # one-shot SQL IN expression: Column.isin(tokens) costs a py4j
        # round trip PER literal (~1.5 s at 2k terms, pure driver time);
        # expr() ships one string and parses JVM-side. Same plan, same
        # parquet row-group pushdown.
        if not tokens:
            return df.filter(F.lit(False))
        # backslash FIRST, then quote: a term ending in '\' (reachable
        # with remove_punctuation=False) must not escape the closing quote
        quoted = ",".join(
            "'" + t.replace("\\", "\\\\").replace("'", "\\'") + "'" for t in tokens
        )
        return df.filter(F.col("bucket").isin(buckets)).filter(
            F.expr(f"term IN ({quoted})")
        )

    def _blocks_relation(self, with_positions: bool) -> DataFrame:
        """The postings block relation (built once per handle) with the
        read-time impact bound folded in; position payload dropped before
        any downstream operator unless requested."""
        if self._postings_df is None:
            self._postings_df = self.spark.read.parquet(
                os.path.join(self.dir, "postings")
            )
            if "pos_payload" not in self._postings_df.columns:
                raise ValueError(
                    f"index at {self.dir} predates the split payload/pos_payload "
                    "block format — rebuild it (positions were inlined in "
                    "`payload` before round 3)"
                )
        df = self._postings_df
        if "block_max_impact" not in df.columns:
            # round-3 block format stores (max_tf, min_dl); the impact
            # upper bound is folded in here with the index's avgdl (an
            # exact-pruning bound — see ib.impact_bound_col)
            from .operators.index_build import impact_bound_col

            df = df.withColumn(
                "block_max_impact", impact_bound_col(self.stats["avgdl"])
            )
        if not with_positions:
            df = df.drop("pos_payload")
        return df

    def postings_for(self, tokens: list[str], with_positions: bool = False) -> DataFrame:
        return _unpack_blocks(
            self.blocks_for(tokens, with_positions=with_positions), with_positions
        )

    LEX_DRIVER_CACHE_MAX = 5_000_000  # terms; ~0.5 GB driver budget
    # interactive head-cache gate: queries whose terms' total df is under
    # this run driver-local (one single-stage pruned fetch + in-process
    # scoring) instead of paying a 2-stage shuffle job (~0.4 s of
    # scheduling for microseconds of math at low df). ~8 payload
    # bytes/posting -> <=~32 MB fetched worst-case; on a 10^12-doc
    # deployment hot terms blow past the cap and take the distributed
    # kernel automatically.
    DRIVER_WAND_MAX_DF = 4_000_000
    BLOCK_CACHE_MAX_BYTES = 256 << 20  # driver posting-block LRU budget
    # interactive whole-index preload gate: when the ENTIRE postings
    # table's df total is under this cap (~12 payload bytes/posting ->
    # ~200 MB, inside the block-cache budget), the first driver-local
    # query fetches every block in ONE pruned collect instead of paying
    # a per-query Spark fetch job for each new term (measured
    # ~0.15-0.25 s of scheduling per sequential interactive query at
    # sf0.1 — the dominant cost of the wand_16 suite entry). Big
    # deployments blow past the cap (the 4.84M-turn scaling corpus is
    # ~110M df) and keep per-term fetches + the distributed kernel;
    # gate value is df-based (lexicon stats), not filesystem probing,
    # so it is storage-agnostic.
    BULK_PRELOAD_MAX_DF = int(os.environ.get("TIRS_BULK_PRELOAD_MAX_DF", "16000000"))
    DRIVER_NOT_MAX_DOCS = 2_000_000  # NOT complement needs the universe
    CONVMAP_DRIVER_CACHE_MAX = 5_000_000  # convs

    @staticmethod
    def _frame_bytes(g: pd.DataFrame) -> int:
        """LRU budget charge for one cached block frame: payload PLUS
        pos_payload when present — position blobs are typically several
        times the doc/tf payload, so counting payload alone let
        phrase-heavy workloads overshoot BLOCK_CACHE_MAX_BYTES."""
        if not len(g):
            return 0
        n = int(g["payload"].map(len).sum())
        if "pos_payload" in g.columns:
            n += int(g["pos_payload"].map(len).sum())
        return n

    def lexicon_for(self, tokens: list[str]) -> pd.DataFrame:
        """Pruned lexicon lookup with a per-instance driver cache
        (vocabulary is Zipfian — repeated query terms hit the cache;
        unknown terms are negatively cached). When the whole vocabulary
        fits the driver (manifest n_terms under the cap — true far beyond
        this sandbox), it is loaded ONCE and every later lookup is a dict
        hit instead of a Spark job; bigger vocabularies keep the pruned
        per-term scan."""
        if (
            self._full_lex is None
            and self._n_terms is not None
            and self._n_terms <= self.LEX_DRIVER_CACHE_MAX
        ):
            pdf = self.spark.read.parquet(
                os.path.join(self.dir, "lexicon")
            ).select("term", "df", "cf", "idf", "max_impact", "n_blocks").toPandas()
            self._full_lex = {r["term"]: r for r in pdf.to_dict("records")}
            self._total_df = int(pdf["df"].sum() or 0)
        if self._full_lex is not None:
            rows = [self._full_lex[t] for t in tokens if t in self._full_lex]
            return pd.DataFrame(
                rows, columns=["term", "df", "cf", "idf", "max_impact", "n_blocks"]
            )
        missing = [t for t in tokens if t not in self._lex_cache]
        if missing:
            buckets = sorted({term_bucket_py(t, self.n_term_buckets) for t in missing})
            df = self.spark.read.parquet(os.path.join(self.dir, "lexicon"))
            got = (
                df.filter(F.col("bucket").isin(buckets) & F.col("term").isin(missing))
                .select("term", "df", "cf", "idf", "max_impact", "n_blocks")
                .toPandas()
            )
            for rec in got.to_dict("records"):
                self._lex_cache[rec["term"]] = rec
            for t in missing:
                self._lex_cache.setdefault(t, None)  # negative cache
        rows = [self._lex_cache[t] for t in tokens if self._lex_cache.get(t)]
        return pd.DataFrame(
            rows, columns=["term", "df", "cf", "idf", "max_impact", "n_blocks"]
        )

    def doclen(self) -> DataFrame:
        """doclen table, persisted for the handle's lifetime — it appears
        2-3x in every boolean plan (NOT universe, id resolution, top-k
        join), and interactive serving re-reads it per query otherwise.
        reload() drops the cached relation. (On a 10^12-doc deployment the
        executors' storage tier holds it the same way.)"""
        if self._doclen_df is None:
            self._doclen_df = (
                self.spark.read.parquet(os.path.join(self.dir, "doclen"))
                # a fresh build writes doclen/chunk=<i>/ (per-chunk
                # pipeline); drop the inferred partition column so the
                # relation is shape-identical to a refreshed (flat) one
                .select("doc_id_int", "doc_id", "dl")
                .persist()
            )
        return self._doclen_df

    def docs(self) -> DataFrame:
        from .operators.segments import DOC_COLS

        # fresh builds write docs/chunk=<i>/ (per-chunk pipeline); select
        # the contract columns so the inferred partition column never
        # leaks (mirrors doclen())
        return self.spark.read.parquet(os.path.join(self.dir, "docs")).select(
            *DOC_COLS
        )

    # ----------------------------- search ------------------------------

    def _query_tokens(self, node: qp.Node) -> tuple[list[tuple[int, str]], list[str]]:
        """(scoring occurrences [(term_idx, token)], all distinct tokens
        incl. under-NOT/phrase for prefetch)."""
        raw_scoring = qp.scoring_terms(node)
        occ: list[tuple[int, str]] = []
        i = 0
        for raw in raw_scoring:
            for tok in normalize_query_terms([raw], self.normalize_cfg)[0]:
                occ.append((i, tok))
                i += 1
        all_raw = qp.collect_positive_terms(node)
        all_tokens: set[str] = set()
        for raw in all_raw:
            all_tokens.update(normalize_query_terms([raw], self.normalize_cfg)[0])
        return occ, sorted(all_tokens)

    def _is_pure_disjunction(self, node: qp.Node) -> bool:
        kind = node[0]
        if kind == "term":
            return len(normalize_query_terms([node[1]], self.normalize_cfg)[0]) == 1
        if kind == "or":
            return self._is_pure_disjunction(node[1]) and self._is_pure_disjunction(
                node[2]
            )
        return False

    def _resolve_strategy(self, node: qp.Node, scorer: str, strategy: str) -> str:
        """auto -> wand for pure disjunctions (block-max pruning applies),
        kernel for every other bm25 query (single-pass boolean+score),
        dataframe otherwise (non-bm25 scorers, or no range metadata)."""
        if strategy != "auto":
            return strategy
        if self._is_pure_disjunction(node):
            return "wand"
        if scorer == "bm25" and self.range_shift is not None:
            return "kernel"
        return "dataframe"

    def search(
        self,
        query: str,
        k: int = 50,
        scorer: str = "bm25",
        strategy: str = "auto",
        hydrate: bool = False,
    ) -> DataFrame:
        """Returns DataFrame (doc_id, doc_id_int, score[, text...]) of the
        top-k, totally ordered by (score DESC, doc_id_int ASC) — the
        engine-wide tie-break contract (see ranking.top_k)."""
        node = qp.parse(query)
        occ, all_tokens = self._query_tokens(node)
        strategy = self._resolve_strategy(node, scorer, strategy)
        rows = self._search_rows(node, occ, all_tokens, k, scorer, strategy)
        out = self.spark.createDataFrame(
            rows, "doc_id string, doc_id_int long, score double"
        )
        if hydrate:
            out = out.join(
                self.docs().select(
                    "doc_id_int", "conv_id", "turn_idx", "role", "text", "tool", "ts"
                ),
                "doc_id_int",
                "left",
            ).orderBy(F.desc("score"), F.asc("doc_id_int"))
        return out

    def _search_dataframe_rows(
        self,
        node: qp.Node,
        occ: list[tuple[int, str]],
        all_tokens: list[str],
        k: int,
        scorer: str,
    ) -> list[tuple]:
        """Boolean + ranked plan executed as ONE Spark job returning the
        k winner tuples. Interactive-latency choices (round-1 verdict
        wrong-#4: ~1.9 s/query floor from persist + 3 jobs + rebuild):
        - no persist: where the boolean plan and the scorer reuse a
          token's postings, the identical shuffle children dedupe via
          ReusedExchange instead of paying a separate materialize job;
        - per-term metadata (occurrence indexes, idf, df) folded in as
          literal MAP expressions — two broadcast joins less to plan;
        - the k rows are returned to the caller; search() wraps them in a
          local DataFrame, search_collect() consumes them directly."""
        needs_positions = "phrase" in _kinds(node)
        postings = self.postings_for(all_tokens, with_positions=needs_positions)
        by_token = lambda t: postings.filter(F.col("term") == t)  # noqa: E731
        planner = BooleanPlanner(by_token, self.doclen, self.normalize_cfg)
        candidates = planner.plan(node)

        lex = self.lexicon_for(sorted({t for _, t in occ})) if occ else None
        if occ and len(lex):
            idf_by_term = dict(zip(lex["term"], lex["idf"]))
            df_by_term = dict(zip(lex["term"], lex["df"]))
            occ_by_term: dict[str, list[int]] = {}
            for i, t in occ:
                if t in idf_by_term:
                    occ_by_term.setdefault(t, []).append(i)
            terms = sorted(occ_by_term)
            tidx_map = F.create_map(
                *[
                    x
                    for t in terms
                    for x in (
                        F.lit(t),
                        F.array(*[F.lit(i) for i in occ_by_term[t]]),
                    )
                ]
            )
            idf_map = F.create_map(
                *[x for t in terms for x in (F.lit(t), F.lit(float(idf_by_term[t])))]
            )
            df_map = F.create_map(
                *[x for t in terms for x in (F.lit(t), F.lit(int(df_by_term[t])))]
            )
            tp = postings.filter(F.col("term").isin(terms)).select(
                F.explode(tidx_map[F.col("term")]).alias("term_idx"),
                "doc_id_int",
                "tf",
                "dl",
                df_map[F.col("term")].alias("df"),
                idf_map[F.col("term")].alias("idf"),
            )
            scored = ranking.score_candidates(
                candidates, tp, scorer, self.stats["avgdl"], self.stats["n_docs"]
            )
        else:
            scored = candidates.select("doc_id_int", F.lit(0.0).alias("score"))
        out = ranking.top_k(scored, self.doclen(), k)
        return [(r["doc_id"], r["doc_id_int"], r["score"]) for r in out.collect()]

    def _term_meta(
        self, occ: list[tuple[int, str]]
    ) -> dict[str, list[tuple[int, float]]]:
        """term -> [(occurrence_idx, idf)] for the query's scoring terms
        found in the lexicon."""
        tokens = sorted({t for _, t in occ})
        if not tokens:
            return {}
        lex = self.lexicon_for(tokens)
        idf_by_term = dict(zip(lex["term"], lex["idf"]))
        meta: dict[str, list[tuple[int, float]]] = {}
        for i, t in occ:
            if t in idf_by_term:
                meta.setdefault(t, []).append((i, float(idf_by_term[t])))
        return meta

    def _search_rows(
        self,
        node: qp.Node,
        occ: list[tuple[int, str]],
        all_tokens: list[str],
        k: int,
        scorer: str,
        strategy: str,
    ) -> list[tuple]:
        """Strategy dispatch returning the k winner TUPLES — search()
        wraps them in a DataFrame; search_collect() consumes them
        directly (no local-DataFrame round trip, ~0.3 s/query saved)."""
        if strategy == "wand":
            return self._search_wand_rows(node, occ, k, scorer)
        if strategy == "kernel":
            if scorer != "bm25":
                # the kernel scores BM25 only; an explicit strategy="kernel"
                # with another scorer (reachable via the CLI's independent
                # --scorer/--strategy flags) falls back to the DataFrame
                # plan instead of silently returning BM25 scores
                return self._search_dataframe_rows(node, occ, all_tokens, k, scorer)
            return self._search_kernel_rows(node, occ, all_tokens, k)
        return self._search_dataframe_rows(node, occ, all_tokens, k, scorer)

    def _finalize_topk(self, rows: list, k: int) -> list[tuple]:
        """Per-bucket winners -> global top-k tuples: driver merge on
        (score DESC, doc_id_int ASC) + one pruned doc_id lookup."""
        rows = sorted(rows, key=lambda r: (-r["score"], r["doc_id_int"]))[:k]
        id_map = self._doc_ids_for([r["doc_id_int"] for r in rows])
        return [(id_map[r["doc_id_int"]], r["doc_id_int"], r["score"]) for r in rows]

    def _search_kernel_rows(
        self, node: qp.Node, occ: list[tuple[int, str]], all_tokens: list[str], k: int
    ) -> list[tuple]:
        """Full boolean/phrase + BM25 in one bucket-kernel job (see
        wand.boolean_topk) — the interactive path for non-disjunctive
        queries; results bit-identical to the DataFrame plan."""
        tree = wand.normalize_tree(
            node, lambda s: normalize_query_terms([s], self.normalize_cfg)[0]
        )
        term_meta = self._term_meta(occ)
        has_phrase = wand.tree_has(tree, "phrase")
        needs_universe = wand.tree_has(tree, "not")
        # interactive head-cache gate (see DRIVER_WAND_MAX_DF): small-df
        # queries score driver-local over cached block frames. NOT needs
        # the complement universe (every doc id), so it additionally
        # requires a small corpus — at deployment scale NOT queries stay
        # on the distributed cogroup path.
        lex = self.lexicon_for(all_tokens)
        if int(lex["df"].sum() or 0) <= self.DRIVER_WAND_MAX_DF and (
            not needs_universe
            or (
                self.range_shift is not None
                and int(self.stats.get("n_docs") or 0) <= self.DRIVER_NOT_MAX_DOCS
            )
        ):
            return self._search_kernel_driver_rows(
                tree, term_meta, all_tokens, k, has_phrase, needs_universe
            )
        blocks = self.blocks_for(all_tokens, with_positions=has_phrase)
        local = wand.boolean_topk(
            blocks,
            tree,
            term_meta,
            self.stats["avgdl"],
            k,
            doclen=self.doclen() if needs_universe else None,
            range_shift=self.range_shift,
            n_buckets=self.kernel_buckets,
        )
        return self._finalize_topk(local.collect(), k)

    def _doclen_ids(self) -> "np.ndarray":
        """Sorted int64 doc-id universe, driver-cached (gated by
        DRIVER_NOT_MAX_DOCS at the call site)."""
        if self._doclen_ids_cache is None:
            import numpy as np

            pdf = self.doclen().select("doc_id_int").toPandas()
            self._doclen_ids_cache = np.sort(
                pdf["doc_id_int"].to_numpy(dtype="int64")
            )
        return self._doclen_ids_cache

    def _search_kernel_driver_rows(
        self,
        tree,
        term_meta: dict,
        all_tokens: list[str],
        k: int,
        has_phrase: bool,
        needs_universe: bool,
    ) -> list[tuple]:
        """Driver-local boolean/phrase+BM25: same per-bucket kernel body
        (wand.boolean_score_bucket) as the distributed path, run
        in-process over cached block frames — bit-identical results,
        none of the 2-stage shuffle job's scheduling floor."""
        import numpy as np

        pdf = self._blocks_pdf_for(all_tokens, with_positions=has_phrase)
        empty_cols = list(wand.KERNEL_COLS) + (
            ["pos_payload"] if has_phrase else []
        )
        empty = (
            pdf.iloc[0:0] if pdf is not None else pd.DataFrame(columns=empty_cols)
        )
        groups: dict[int, pd.DataFrame] = (
            {int(b): g for b, g in pdf.groupby("range_bucket", sort=False)}
            if pdf is not None
            else {}
        )
        buckets = set(groups)
        uni_by_bucket: dict[int, "np.ndarray"] = {}
        if needs_universe:
            ids = self._doclen_ids()
            ub = (ids >> np.int64(self.range_shift)).astype(np.int64)
            # ids are sorted, so each bucket's slice is contiguous
            edges = np.flatnonzero(np.r_[True, ub[1:] != ub[:-1]])
            ends = np.r_[edges[1:], ids.size]
            for s, e in zip(edges, ends):
                uni_by_bucket[int(ub[s])] = ids[s:e]
            buckets |= set(uni_by_bucket)
        outs = []
        for b in sorted(buckets):
            out = wand.boolean_score_bucket(
                groups.get(b, empty),
                tree,
                term_meta,
                self.stats["avgdl"],
                k,
                universe=uni_by_bucket.get(b) if needs_universe else None,
            )
            if len(out):
                outs.append(out)
        if not outs:
            return []
        merged = pd.concat(outs, ignore_index=True)
        rows = [
            {"doc_id_int": int(d), "score": float(s)}
            for d, s in zip(merged["doc_id_int"], merged["score"])
        ]
        return self._finalize_topk(rows, k)

    def _search_wand_rows(
        self, node: qp.Node, occ: list[tuple[int, str]], k: int, scorer: str
    ) -> list[tuple]:
        if scorer != "bm25":
            return self._search_dataframe_rows(
                node, occ, sorted({t for _, t in occ}), k, scorer
            )
        term_meta = self._term_meta(occ)
        # cross-bucket theta key: worker processes reuse certified k-th
        # scores across this query's buckets and across repeats of the
        # query in the session; index_version (stats.json generation id,
        # bumped by every build/refresh commit) pins the index generation
        # so a refresh invalidates stale seeds even when n_docs/avgdl are
        # coincidentally unchanged
        qkey = (
            f"{self.dir}|v{self.index_version}|{self.stats['n_docs']}|"
            f"{self.stats['avgdl']}|k={k}|"
            + "|".join(f"{t}:{len(m)}" for t, m in sorted(term_meta.items()))
        )
        lex = self.lexicon_for(sorted(term_meta))
        if int(lex["df"].sum() or 0) <= self.DRIVER_WAND_MAX_DF:
            return self._search_wand_driver_rows(term_meta, k, qkey)
        blocks = self.blocks_for(sorted(term_meta))
        acc_total, acc_decoded = self._prune_accs()
        t0, d0 = acc_total.value, acc_decoded.value
        local = wand.topk_disjunctive(
            blocks,
            term_meta,
            self.stats["avgdl"],
            k,
            query_key=qkey,
            acc_total=acc_total,
            acc_decoded=acc_decoded,
            n_buckets=self.kernel_buckets,
        )
        # per-bucket winners are tiny (<= k x n_buckets): merge on the
        # driver and resolve doc_id strings with one pruned point-lookup —
        # 2 small jobs total instead of join+sort+limit stages. Ties break
        # on doc_id_int, the engine-wide contract (ranking.top_k).
        rows = local.collect()
        self.last_prune_stats = {
            "blocks_total": acc_total.value - t0,
            "blocks_decoded": acc_decoded.value - d0,
        }
        return self._finalize_topk(rows, k)

    def _blocks_pdf_for(
        self, tokens: list[str], with_positions: bool = False
    ) -> pd.DataFrame | None:
        """Per-term block frames through the driver LRU cache; missing
        terms fetched in ONE single-stage pruned collect (parquet bucket
        dirs + row-group IN pruning; no shuffle, no python workers).
        Position-bearing frames are cached under a separate key so the
        ranked path never carries position bytes. Returns None when no
        token has postings."""
        cols = list(wand.KERNEL_COLS) + (["pos_payload"] if with_positions else [])
        keys = [(t, with_positions) for t in tokens]
        missing = [t for t in tokens if (t, with_positions) not in self._block_cache]
        if missing and not with_positions and self._maybe_bulk_load_blocks():
            # whole index preloaded: a missing term that is absent from
            # the (driver-cached) lexicon has no postings — negative-
            # cache the shared empty frame. A missing term that IS in
            # the lexicon was LRU-EVICTED after the preload and must be
            # re-fetched per-term (treating it as empty would silently
            # drop its postings — caught by test_block_cache_lru_eviction)
            refetch = []
            for t in missing:
                if (t, False) in self._block_cache:
                    continue  # just preloaded
                if t in self._full_lex:
                    refetch.append(t)
                else:
                    self._block_cache[(t, False)] = self._bulk_empty
            missing = refetch
        if missing:
            pdf = (
                self.blocks_for(missing, with_positions=with_positions)
                .select(*cols)
                .toPandas()
            )
            groups = {t: g for t, g in pdf.groupby("term", sort=False)}
            empty = pdf.iloc[0:0]
            for t in missing:
                g = groups.get(t, empty)
                self._block_cache[(t, with_positions)] = g
                self._block_cache_bytes += self._frame_bytes(g)
        frames = []
        for key in keys:
            g = self._block_cache[key]
            self._block_cache.move_to_end(key)  # LRU touch
            if len(g):
                frames.append(g)
        # evict AFTER the lookups: this call's keys were just touched, so
        # the cold end goes first; references held in `frames` stay valid
        # even if an over-budget fetch immediately evicts its own keys
        while (
            self._block_cache_bytes > self.BLOCK_CACHE_MAX_BYTES
            and self._block_cache
        ):
            _, old = self._block_cache.popitem(last=False)
            self._block_cache_bytes -= self._frame_bytes(old)
        if not frames:
            return None
        return pd.concat(frames, ignore_index=True)

    def _maybe_bulk_load_blocks(self) -> bool:
        """One-shot driver preload of ALL posting blocks (no positions)
        into the per-term block cache. Returns True when the cache holds
        the whole index. Gated on the driver-cached lexicon's total df
        (BULK_PRELOAD_MAX_DF) so the decision needs no extra Spark job
        and no filesystem probing; decided once per handle. Positions
        stay per-term — phrase queries are the rare consumer and their
        payloads are several times larger."""
        if self._bulk_blocks is not None:
            return self._bulk_blocks
        if self._full_lex is None or self._total_df is None:
            return False  # lexicon not driver-cached: stay per-term
        if self._total_df > self.BULK_PRELOAD_MAX_DF:
            self._bulk_blocks = False
            return False
        pdf = self._blocks_relation(False).select(*wand.KERNEL_COLS).toPandas()
        self._bulk_empty = pdf.iloc[0:0]
        for t, g in pdf.groupby("term", sort=False):
            old = self._block_cache.get((t, False))
            if old is not None:  # fetched per-term before the lexicon cached
                self._block_cache_bytes -= self._frame_bytes(old)
            self._block_cache[(t, False)] = g
            self._block_cache_bytes += self._frame_bytes(g)
        self._bulk_blocks = True
        return True

    def _search_wand_driver_rows(
        self, term_meta: dict, k: int, qkey: str
    ) -> list[tuple]:
        """Driver-local exact WAND: buckets scored sequentially in one
        process with a rising merged-kth theta (a certified lower bound
        on the global k-th — same exactness argument as the distributed
        cross-bucket seeds; skipping is strict, so plateau ties are
        never dropped). Results bit-identical to the distributed path
        (asserted in test_wand_pruning.py)."""
        import numpy as np

        pdf = self._blocks_pdf_for(sorted(term_meta))
        theta = self._driver_theta.get(qkey, -np.inf)
        n_total = n_decoded = 0
        scores_parts: list[np.ndarray] = []
        docs_parts: list[np.ndarray] = []
        if pdf is not None:
            for _, grp in pdf.groupby("range_bucket", sort=True):
                out, t, d = wand.score_bucket_pruned(
                    grp, term_meta, self.stats["avgdl"], k, theta_seed=theta
                )
                n_total += t
                n_decoded += d
                if len(out):
                    scores_parts.append(out["score"].to_numpy())
                    docs_parts.append(out["doc_id_int"].to_numpy())
                    sc = np.concatenate(scores_parts)
                    if sc.size >= k:
                        theta = max(theta, float(np.partition(sc, -k)[-k]))
        self.last_prune_stats = {
            "blocks_total": n_total,
            "blocks_decoded": n_decoded,
        }
        if np.isfinite(theta):
            self._driver_theta[qkey] = theta
        if not docs_parts:
            return []
        rows = [
            {"doc_id_int": int(d), "score": float(s)}
            for d, s in zip(np.concatenate(docs_parts), np.concatenate(scores_parts))
        ]
        return self._finalize_topk(rows, k)

    def _prune_accs(self):
        if getattr(self, "_acc_total", None) is None:
            sc = self.spark.sparkContext
            self._acc_total = sc.accumulator(0)
            self._acc_decoded = sc.accumulator(0)
        return self._acc_total, self._acc_decoded

    def _doc_ids_for(self, ids: list[int]) -> dict[int, str]:
        if not ids:
            return {}
        # doc_id strings are derivable from doc_id_int + the convmap
        # (conv_int = id >> TURN_BITS); when the convmap fits the driver
        # it is loaded once and resolution is pure python — no Spark job.
        n_convs = self.stats.get("n_convs")
        if (
            self._convmap is None
            and n_convs is not None
            and n_convs <= self.CONVMAP_DRIVER_CACHE_MAX
        ):
            pdf = self.spark.read.parquet(
                os.path.join(self.dir, "convmap")
            ).toPandas()
            # stored colon-suffixed: resolution below is one dict lookup
            # + one table index + one concat per id (the f-string loop
            # was ~1.6 us/id — a visible driver-tail constant at 45k ids
            # per 1024-query batch)
            self._convmap = {
                int(c): s + ":" for c, s in zip(pdf["conv_int"], pdf["conv_id"])
            }
        if self._convmap is not None:
            from .operators.index_build import TURN_BITS

            cm = self._convmap
            tt = self._turn_strs
            if tt is None:
                # %04d: zero-pad to 4 but NEVER truncate — mirrors the
                # build side's format_string("%04d") so conversations with
                # >9,999 turns keep collision-free doc_id strings; the
                # table covers the common low turn indexes, rare higher
                # ones fall back to the formatter
                tt = self._turn_strs = [f"{i:04d}" for i in range(4096)]
            mask = (1 << TURN_BITS) - 1
            return {
                i: cm[i >> TURN_BITS]
                + (tt[t] if (t := i & mask) < 4096 else f"{t:04d}")
                for i in map(int, ids)
            }
        if len(ids) <= 256:
            # small: literal IN-list gets parquet min/max pruning
            scan = self.doclen().filter(F.col("doc_id_int").isin(ids))
        else:
            # large: an IN-list of thousands of literals makes Catalyst
            # plan compilation itself the bottleneck (measured ~9 s at
            # 12k ids); broadcast-join a one-column id relation instead
            ids_df = self.spark.createDataFrame(
                [(int(i),) for i in ids], "doc_id_int long"
            )
            scan = self.doclen().join(F.broadcast(ids_df), "doc_id_int")
        got = scan.select("doc_id_int", "doc_id").collect()
        return {r["doc_id_int"]: r["doc_id"] for r in got}

    def search_batch(
        self, queries: list[str], k: int = 50, timings: dict | None = None
    ) -> dict[str, SearchResult]:
        """Batched free-text BM25 top-k: ONE distributed pass for all
        queries (shared block scan + decode). Each query's scoring terms
        are its normalized TERM occurrences (NOT-subtrees excluded) —
        ranked-retrieval semantics; boolean filtering uses search().
        Duplicate query strings are answered once (the result dict is
        keyed by query string). `timings`, when passed, is filled with
        per-phase wall seconds (driver-tail attribution for the scaling
        bench)."""
        import time as _time

        marks = [("start", _time.time())]

        def mark(label: str) -> None:
            marks.append((label, _time.time()))

        queries = list(dict.fromkeys(queries))  # dedupe, keep first-seen order
        nodes = [qp.parse(q) for q in queries]
        # bulk-normalize every raw term across the batch in one vectorized
        # pass (per-term cold normalization costs ~2-4 ms of driver time)
        from .functions.normalize import prime_query_norm_cache

        raw_terms: list[str] = []
        for node in nodes:
            raw_terms.extend(qp.scoring_terms(node))
            raw_terms.extend(qp.collect_positive_terms(node))
        prime_query_norm_cache(raw_terms, self.normalize_cfg)
        mark("parse_normalize")

        metas: dict[int, dict[str, list[tuple[int, float]]]] = {}
        all_tokens: set[str] = set()
        occ_by_q: list[list[tuple[int, str]]] = []
        for node in nodes:
            occ, _ = self._query_tokens(node)
            occ_by_q.append(occ)
            all_tokens.update(t for _, t in occ)
        if not all_tokens:
            return {q: SearchResult(q, [], []) for q in queries}
        mark("tokens")
        lex = self.lexicon_for(sorted(all_tokens))
        mark("lexicon")
        idf_by_term = dict(zip(lex["term"], lex["idf"]))
        for qid, occ in enumerate(occ_by_q):
            meta: dict[str, list[tuple[int, float]]] = {}
            for i, t in occ:
                if t in idf_by_term:
                    meta.setdefault(t, []).append((i, float(idf_by_term[t])))
            metas[qid] = meta
        known = sorted({t for m in metas.values() for t in m})
        blocks = self.blocks_for(known)
        # broadcast the per-query metadata: as a plain closure capture it
        # would be re-unpickled by every kernel task (grows with batch
        # size); as a broadcast it's fetched once per worker process
        bc_metas = self.spark.sparkContext.broadcast(metas)
        local = wand.topk_disjunctive_batch(
            blocks,
            bc_metas,
            self.stats["avgdl"],
            k,
            n_buckets=self.kernel_buckets,
            # unique per batch: worker-process theta stores never leak
            # across batches (or index generations)
            batch_key=uuid.uuid4().hex,
        )
        mark("plan")
        # merge the per-(query, bucket) winners to per-query top-k:
        # small batches (k x queries x buckets winners fit the driver)
        # merge in numpy on the driver — one Spark stage less; beyond the
        # threshold, the distributed merge keeps the driver collect at
        # k x queries rows (the 1000-executor path).
        # measured at 2.4M-turn scale: the driver merge (Arrow toPandas +
        # one lexsort) beats the distributed merge (an extra stage with a
        # python pass per query group) up to at least 1.6M winner rows
        est_rows = k * len(queries) * self.n_range_buckets
        if est_rows <= DRIVER_MERGE_MAX_ROWS:
            lpdf = local.toPandas()
            mark("kernel_and_collect")
            per_q_np = wand.merge_query_topk_driver(lpdf, k)
            mark("driver_merge")
        else:
            # distributed merge: one query_id shuffle folds the winner
            # volume down to ~k rows per query BEFORE the driver collect
            # (merge_query_topk emits per-Arrow-batch top-ks — a small
            # superset, since a query's rows share a partition but may
            # span batches); the final exact cut reuses the vectorized
            # driver merge on that superset
            merged = wand.merge_query_topk(local, k)
            lpdf = merged.toPandas()
            mark("kernel_and_collect")
            per_q_np = wand.merge_query_topk_driver(lpdf, k)
            mark("distributed_merge")
        bc_metas.unpersist(blocking=False)
        need_ids: set[int] = set()
        for rows in per_q_np.values():
            need_ids.update(d for d, _ in rows)
        id_map = self._doc_ids_for(sorted(need_ids))
        mark("id_resolution")
        out = {q: SearchResult(q, [], []) for q in queries}
        for qid, rows in per_q_np.items():
            res = out[queries[qid]]
            for d, s in rows:
                res.docs.append(id_map[d])
                res.scores.append(s)
        mark("assemble")
        if timings is not None:
            for (_, t0), (label, t1) in zip(marks, marks[1:]):
                timings[label] = timings.get(label, 0.0) + (t1 - t0)
        return out

    def search_collect(self, query: str, k: int = 50, **kw) -> SearchResult:
        if not kw.get("hydrate"):
            # all strategies produce driver-side tuples — skip the
            # local-DataFrame round trip entirely
            node = qp.parse(query)
            occ, all_tokens = self._query_tokens(node)
            scorer = kw.get("scorer", "bm25")
            strategy = self._resolve_strategy(node, scorer, kw.get("strategy", "auto"))
            rows = self._search_rows(node, occ, all_tokens, k, scorer, strategy)
            return SearchResult(
                query=query, docs=[r[0] for r in rows], scores=[r[2] for r in rows]
            )
        rows = self.search(query, k, **kw).collect()
        return SearchResult(
            query=query,
            docs=[r["doc_id"] for r in rows],
            scores=[r["score"] for r in rows],
        )

    def search_es_shaped(self, query: str, k: int = 50, index_id: str = "tirs") -> dict:
        """ES-shaped hits envelope, the reference's result contract
        (`index_custom.py:789-797`, `query_processing_engine.py:639-645`):
        {"hits": {"total": {...}, "hits": [{_index,_id,_score,_source}]}}."""
        rows = self.search(query, k, hydrate=True).collect()
        hits = [
            {
                "_index": index_id,
                "_id": r["doc_id"],
                "_score": r["score"],
                "_source": {
                    "conv_id": r["conv_id"],
                    "turn_idx": r["turn_idx"],
                    "role": r["role"],
                    "text": r["text"],
                    "tool": r["tool"],
                    "ts": None if r["ts"] is None else str(r["ts"]),
                },
            }
            for r in rows
        ]
        return {
            "hits": {
                "total": {"value": len(hits), "relation": "eq"},
                "hits": hits,
            }
        }


def _kinds(node: qp.Node) -> set[str]:
    kind = node[0]
    if kind in ("term", "phrase"):
        return {kind}
    if kind == "not":
        return {"not"} | _kinds(node[1])
    return {kind} | _kinds(node[1]) | _kinds(node[2])


def build(
    spark: SparkSession,
    transcripts: DataFrame,
    index_dir: str,
    cfg: IndexBuildConfig = IndexBuildConfig(),
    input_desc: str = "",
    **kw,
) -> InvertedIndex:
    build_index(spark, transcripts, index_dir, cfg, input_desc, **kw)
    return InvertedIndex(spark, index_dir)


def load(spark: SparkSession, index_dir: str) -> InvertedIndex:
    return InvertedIndex(spark, index_dir)
