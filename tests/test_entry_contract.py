"""Mimics the driver's correctness gate: every queries() entry vs its
DuckDB oracle at sf0.01 (row count + schema + order-insensitive values)."""

import math
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def entry_mod():
    import __spark_entry__ as m

    return m


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{SF_DIR}/{t}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _compare(name, spark_pdf, duck_pdf):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(duck_pdf)}"
    )
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    )
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            assert (
                (a[c] - b[c].astype(float)).abs().max() or 0.0
            ) < 1e-6, f"{name}: float col {c} mismatch"
        else:
            eq = a[c].astype(str).values == b[c].astype(str).values
            assert eq.all(), f"{name}: col {c} first diff at {(~eq).argmax()}"


def test_entry_smoke(entry_mod, spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns


def test_all_queries_vs_oracle(entry_mod, spark, ddb):
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    unmatched = [k for k in oracles if k not in queries]
    assert not unmatched, f"oracle without query: {unmatched}"
    failures = []
    for name, fn in sorted(queries.items()):
        spark_pdf = fn(spark, SF_DIR).toPandas()
        if name in oracles:
            duck_pdf = ddb.execute(oracles[name]).df()
            try:
                _compare(name, spark_pdf, duck_pdf)
            except AssertionError as e:
                failures.append(str(e))
        else:
            assert spark_pdf is not None  # rows-only check
    assert not failures, "\n".join(failures)
