"""Table-provider seam: the index's storage operations behind one
interface, so a deployment can swap the parquet-directory catalog for an
Iceberg (or Delta) catalog without touching the build/query code.

The reference switches document-store strategies behind a single flag
(`/root/reference/code/indexes/index_custom.py:62-68,193-211` — dstore
REDIS/ROCKSDB/FILE); this is the Spark-native equivalent for the index's
tables. The operations are exactly what segments.py / incremental.py
need:

    write            overwrite a table from a (pre-shaped) DataFrame
    append           add rows (add_documents' docs-store append)
    read             DataFrame over the table
    stage + commit   the refresh_postings pattern: write new versions of
                     several tables, then swap them in so readers never
                     see a partial index. Parquet: write to `<t>__stage`
                     dirs then rename. Iceberg: CREATE OR REPLACE staged
                     tables then RENAME swap per table (a real deployment
                     folds this into one REPLACE TABLE ... AS SELECT
                     snapshot commit per table — same seam, stronger
                     atomicity).
    num_rows         row count without a Spark job (parquet footers /
                     Iceberg snapshot summary)
    exists / drop / list_tables

Only ParquetDirProvider is runnable in this sandbox (no Iceberg runtime
jar is vendored); IcebergProvider maps every operation onto Spark SQL
against a configured Iceberg catalog and raises a clear error at
construction when the catalog is absent. Both must pass the same
contract test (tests/test_sources_catalog.py::test_provider_contract).
"""

from __future__ import annotations

import os
import shutil
from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession

STAGE_SUFFIX = "__stage"


class TableProvider(ABC):
    """Storage backend for one index's tables."""

    @abstractmethod
    def read(self, spark: SparkSession, table: str) -> DataFrame: ...

    @abstractmethod
    def write(
        self, df: DataFrame, table: str, partition_by: tuple[str, ...] = (), options: dict | None = None
    ) -> None: ...

    @abstractmethod
    def append(self, df: DataFrame, table: str) -> None: ...

    @abstractmethod
    def exists(self, table: str) -> bool: ...

    @abstractmethod
    def drop(self, table: str) -> bool: ...

    @abstractmethod
    def list_tables(self) -> list[str]: ...

    @abstractmethod
    def num_rows(self, table: str) -> int: ...

    # -- staged multi-table replace (refresh_postings' swap) --

    def stage_name(self, table: str) -> str:
        return table + STAGE_SUFFIX

    def write_staged(
        self, df: DataFrame, table: str, partition_by: tuple[str, ...] = (), options: dict | None = None
    ) -> None:
        self.write(df, self.stage_name(table), partition_by, options)

    @abstractmethod
    def commit_staged(self, tables: list[str]) -> None:
        """Swap each staged table in as the live version. Tables without
        a staged version are skipped (refresh may stage a subset)."""


class ParquetDirProvider(TableProvider):
    """One directory per table under `root` — the sandbox/file-system
    backend. Atomicity = directory rename (same-FS, POSIX-atomic per
    table; the multi-table commit is ordered, not transactional — the
    documented gap an Iceberg catalog closes)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def location(self, table: str) -> str:
        return os.path.join(self.root, table)

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self.location(table))

    def write(self, df, table, partition_by=(), options=None):
        w = df.write.mode("overwrite")
        for k, v in (options or {}).items():
            w = w.option(k, v)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.location(table))

    def append(self, df, table):
        if df.isEmpty():
            # the common replay case (everything anti-joined away): a
            # write here would accumulate one empty partition dir per
            # replay and pollute partition discovery
            return
        loc = self.location(table)
        if os.path.isdir(loc):
            # hive-partitioned layout (e.g. docs/chunk=<i>/ from the
            # per-chunk build): a flat append at the root would mix leaf
            # depths and break Spark's partition discovery — append as a
            # fresh partition directory instead
            parts = [
                d
                for d in os.listdir(loc)
                if "=" in d and os.path.isdir(os.path.join(loc, d))
            ]
            if parts:
                key = parts[0].split("=", 1)[0]
                # keep the inferred partition-column type numeric: build
                # chunks are chunk=<int>, so the append dir must be an
                # int too (a string like append_000001 silently flips
                # the discovered column to string for every reader)
                nums = []
                for d in parts:
                    try:
                        nums.append(int(d.split("=", 1)[1]))
                    except ValueError:
                        pass
                n = (max(nums) + 1) if nums else len(parts)
                sub = os.path.join(loc, f"{key}={n}")
                while os.path.isdir(sub):
                    n += 1
                    sub = os.path.join(loc, f"{key}={n}")
                df.write.mode("overwrite").parquet(sub)
                return
        df.write.mode("append").parquet(loc)

    def exists(self, table):
        return os.path.isdir(self.location(table))

    def drop(self, table):
        if not self.exists(table):
            return False
        shutil.rmtree(self.location(table))
        return True

    def list_tables(self):
        return sorted(
            d
            for d in os.listdir(self.root)
            if os.path.isdir(self.location(d)) and not d.endswith(STAGE_SUFFIX)
            and not d.startswith("_")
        )

    def num_rows(self, table):
        from ..operators.segments import parquet_num_rows

        return parquet_num_rows(self.location(table))

    def commit_staged(self, tables):
        for t in tables:
            staged = self.location(self.stage_name(t))
            if not os.path.isdir(staged):
                continue
            live = self.location(t)
            if os.path.exists(live):
                shutil.rmtree(live)
            os.rename(staged, live)


class IcebergProvider(TableProvider):
    """Iceberg-catalog backend: every operation is Spark SQL / writeTo
    against `<catalog>.<namespace>.<table>`. Requires the session to be
    launched with the Iceberg runtime jar and a catalog configured
    (spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog);
    this sandbox ships no Iceberg jar, so construction fails with a
    clear error — the class documents the exact mapping the seam needs.

    Vendoring attempt (round 4, 2026-08-17): no iceberg jar anywhere on
    the box (`find / -name '*iceberg*'` — only this repo's tests) and
    Maven Central is unreachable (curl rc=6, DNS resolution fails — the
    sandbox has no outbound network), so the real-runtime contract run
    remains impossible here; `tests/test_provider_iceberg.py` covers
    the provider contract against the fake catalog instead.
    Re-attempted round 5 (2026-08-17): still no jar on the box and
    Maven Central still unreachable (curl HTTP 000) — unchanged.
    Re-attempted round 6 (2026-08-21): curl rc=6 ("Could not resolve
    host: repo1.maven.org") — no outbound DNS, unchanged.
    """

    def __init__(self, spark: SparkSession, catalog: str, namespace: str):
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
        if not impl:
            raise RuntimeError(
                f"Iceberg catalog {catalog!r} is not configured on this session "
                f"(spark.sql.catalog.{catalog} unset — add the iceberg-spark-runtime "
                "jar and catalog conf); use ParquetDirProvider here instead"
            )
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace

    def _fq(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.{table}"

    def read(self, spark, table):
        return spark.read.table(self._fq(table))

    def write(self, df, table, partition_by=(), options=None):
        w = df.writeTo(self._fq(table)).using("iceberg")
        for k, v in (options or {}).items():
            w = w.tableProperty(k, str(v))
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        w.createOrReplace()

    def append(self, df, table):
        df.writeTo(self._fq(table)).append()

    def exists(self, table):
        return self.spark.catalog.tableExists(self._fq(table))

    def drop(self, table):
        if not self.exists(table):
            return False
        self.spark.sql(f"DROP TABLE {self._fq(table)}")
        return True

    def list_tables(self):
        rows = self.spark.sql(f"SHOW TABLES IN {self.catalog}.{self.namespace}").collect()
        return sorted(
            r["tableName"] for r in rows if not r["tableName"].endswith(STAGE_SUFFIX)
        )

    def num_rows(self, table):
        # snapshot summary: total-records, no scan job
        row = self.spark.sql(
            f"SELECT summary['total-records'] AS n FROM {self._fq(table)}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return int(row[0]["n"]) if row else 0

    def commit_staged(self, tables):
        for t in tables:
            if not self.exists(self.stage_name(t)):
                continue
            if self.exists(t):
                self.spark.sql(f"DROP TABLE {self._fq(t)}")
            self.spark.sql(
                f"ALTER TABLE {self._fq(self.stage_name(t))} RENAME TO {self._fq(t)}"
            )
