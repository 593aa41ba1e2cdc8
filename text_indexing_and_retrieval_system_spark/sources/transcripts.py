"""Deterministic synthetic multi-turn transcript corpus.

Schema fixed by BASELINE.json `input_hint`:
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Design points:
- **Distributed + partition-invariant determinism**: generation runs as
  `spark.range(n_convs)` → `mapInPandas`, with an RNG seeded per
  conversation from (seed, conv_id). The produced rows are identical for
  any partitioning / executor count, which the resume and scaling tests
  rely on. At 10^12-turn scale the same generator shape works — no
  driver-side materialization.
- **Zipfian vocabulary** (~20k terms) so the reference's H/M/L
  frequency query pools (`/root/reference/code/generate_queries.py:13-20`)
  are realizable, plus embedded stopwords and morphological suffixes to
  exercise the normalize pipeline.
- No wall-clock anywhere: `ts` is a fixed base epoch + offset.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterator

import numpy as np
import pandas as pd

try:  # pyspark only needed for the distributed generator
    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql import types as T
except ImportError:  # pragma: no cover
    DataFrame = SparkSession = T = None  # type: ignore

TRANSCRIPT_SCHEMA_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_ROLES = np.array(["user", "assistant", "system", "tool"])
_ROLE_P = np.array([0.40, 0.40, 0.05, 0.15])
_TOOLS = np.array(["", "search", "calculator", "browser", "python", "sql"])
_TOOL_P = np.array([0.55, 0.12, 0.08, 0.09, 0.09, 0.07])

_BASE_EPOCH = _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc)

_SYL_A = "br cl dr fl gr pl pr sk sl sp st tr ch sh th b c d f g h j k l m n p r s t v w".split()
_SYL_B = "a e i o u ai ea ou io oa".split()
_SYL_C = "ck ll ss nd nt rd rt st mp ng b d g k l m n p r t x z".split()
_SUFFIXES = ["", "", "", "", "s", "ing", "ed", "er", "ation", "ness", "ly", "ment"]


def build_vocabulary(size: int = 20000, seed: int = 7) -> np.ndarray:
    """Deterministic pseudo-English vocabulary, unique, stable order."""
    rng = np.random.RandomState(seed)
    words: list[str] = []
    seen: set[str] = set()
    # seed with common stopwords so removal is exercised (they land in the
    # top Zipf ranks, mirroring natural text)
    for w in (
        "the of and to a in is it you that he was for on are with as his "
        "they i at be this have from or had by not but what all were we "
        "when your can said there use an each which she do how their if"
    ).split():
        if w not in seen:
            words.append(w)
            seen.add(w)
    while len(words) < size:
        w = (
            _SYL_A[rng.randint(len(_SYL_A))]
            + _SYL_B[rng.randint(len(_SYL_B))]
            + _SYL_C[rng.randint(len(_SYL_C))]
        )
        if rng.rand() < 0.5:
            w += _SYL_B[rng.randint(len(_SYL_B))] + _SYL_C[rng.randint(len(_SYL_C))]
        w += _SUFFIXES[rng.randint(len(_SUFFIXES))]
        if w not in seen:
            words.append(w)
            seen.add(w)
    return np.array(words)


def zipf_probs(size: int, alpha: float = 1.07) -> np.ndarray:
    ranks = np.arange(1, size + 1, dtype=np.float64)
    p = 1.0 / (ranks + 2.7) ** alpha
    return p / p.sum()


_VOCAB_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def _vocab(size: int = 20000, seed: int = 7):
    key = (size, seed)
    if key not in _VOCAB_CACHE:
        v = build_vocabulary(size, seed)
        _VOCAB_CACHE[key] = (v, zipf_probs(size))
    return _VOCAB_CACHE[key]


def generate_conversation(conv_idx: int, seed: int = 42, vocab_size: int = 20000) -> pd.DataFrame:
    """All turns of one conversation — pure function of (seed, conv_idx)."""
    vocab, probs = _vocab(vocab_size)
    rng = np.random.RandomState((seed * 1_000_003 + conv_idx) % (2**31 - 1))
    n_turns = 1 + int(rng.zipf(1.6) % 40)  # zipfian turns/conv, 1..40
    conv_id = f"conv-{conv_idx:08d}"
    lengths = np.clip(rng.lognormal(mean=3.0, sigma=0.8, size=n_turns), 3, 400).astype(int)
    total = int(lengths.sum())
    word_idx = rng.choice(vocab_size, size=total, p=probs)
    words = vocab[word_idx]
    # sprinkle punctuation/digits so char-strip matters
    deco = rng.rand(total)
    words = words.copy()
    words[deco < 0.03] = np.char.add(words[deco < 0.03], ",")
    words[(deco >= 0.03) & (deco < 0.04)] = np.char.add(
        words[(deco >= 0.03) & (deco < 0.04)], "!"
    )
    words[(deco >= 0.04) & (deco < 0.05)] = rng.randint(
        0, 10000, size=int(((deco >= 0.04) & (deco < 0.05)).sum())
    ).astype(str)
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    texts = [" ".join(words[offsets[i] : offsets[i + 1]]) for i in range(n_turns)]
    roles = _ROLES[rng.choice(len(_ROLES), size=n_turns, p=_ROLE_P)]
    tools = _TOOLS[rng.choice(len(_TOOLS), size=n_turns, p=_TOOL_P)]
    tools = np.where(roles == "tool", np.where(tools == "", "search", tools), tools)
    ts = [
        _BASE_EPOCH + _dt.timedelta(seconds=int(conv_idx) * 3600 + i * 7)
        for i in range(n_turns)
    ]
    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": np.arange(n_turns, dtype=np.int32),
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts,
        }
    )


def generate_transcripts_pandas(n_convs: int, seed: int = 42, vocab_size: int = 20000) -> pd.DataFrame:
    """Driver-side generation for small fixtures/oracles."""
    return pd.concat(
        [generate_conversation(i, seed, vocab_size) for i in range(n_convs)],
        ignore_index=True,
    )


def generate_transcripts(
    spark: "SparkSession",
    n_convs: int,
    seed: int = 42,
    vocab_size: int = 20000,
    partitions: int | None = None,
) -> "DataFrame":
    """Distributed generator: spark.range over conv ids → mapInPandas."""
    if partitions is None:
        partitions = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for conv_idx in pdf["id"].tolist():
                yield generate_conversation(int(conv_idx), seed, vocab_size)

    return (
        spark.range(0, n_convs, numPartitions=partitions)
        .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA_DDL)
    )
