"""Document sources: JSON-per-doc dirs and zip archives of JSON docs.

Reference parity: the News dataset is one JSON file per document,
optionally inside .zip archives, walked by a Python generator
(`/root/reference/code/dataset_managers/dataset_news.py:28-94`).
Spark-first equivalents:

- a directory tree of JSON docs → `spark.read.json` (distributed scan,
  schema inference or explicit schema, predicate pushdown on the parsed
  columns)
- zip archives → `spark.read.format("binaryFile")` + an Arrow-batched
  mapInPandas that opens each archive *on the executor* and yields its
  member JSONs — the archive list parallelizes across the cluster, no
  driver-side unzip (Spark has no native zip codec)
- id-dedup: first occurrence wins (`dataset_news.py:330-343`) →
  dropDuplicates on the id column

`max_num_docs` truncation (`config.yaml:46`) maps to `limit(n)`.
"""

from __future__ import annotations

import io
import json
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_json_docs(
    spark: SparkSession,
    path: str,
    id_field: str,
    attributes: list[str] | None = None,
    max_num_docs: int | None = None,
) -> DataFrame:
    """Directory (or glob) of JSON documents → DataFrame with first-wins
    id dedup and optional attribute projection + doc cap."""
    df = spark.read.option("multiLine", "true").json(path)
    if attributes:
        df = df.select(*attributes)
    df = df.dropDuplicates([id_field])
    if max_num_docs:
        df = df.limit(max_num_docs)
    return df


def read_zipped_json_docs(
    spark: SparkSession,
    zip_glob: str,
    id_field: str,
    attributes: list[str] | None = None,
    max_num_docs: int | None = None,
) -> DataFrame:
    """Zip archives of JSON member files → (member docs as rows).

    Output columns: the union requested via `attributes` (all values
    read as strings when no schema given — callers cast as needed),
    plus `_archive` and `_member` lineage columns.
    """
    bins = spark.read.format("binaryFile").load(zip_glob)
    attrs = attributes

    def explode_zip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                with zipfile.ZipFile(io.BytesIO(bytes(content))) as zf:
                    for member in zf.namelist():
                        if not member.lower().endswith(".json"):
                            continue
                        try:
                            doc = json.loads(zf.read(member))
                        except (ValueError, KeyError):
                            continue
                        row = {
                            a: (None if doc.get(a) is None else str(doc.get(a)))
                            for a in (attrs or doc.keys())
                        }
                        row["_archive"] = path
                        row["_member"] = member
                        rows.append(row)
            cols = (attrs or []) + ["_archive", "_member"]
            yield pd.DataFrame(rows, columns=cols if attrs else None)

    if not attrs:
        raise ValueError("attributes list is required for zipped JSON reads")
    schema = ", ".join(f"`{a}` string" for a in attrs) + ", _archive string, _member string"
    df = bins.select("path", "content").mapInPandas(explode_zip, schema=schema)
    df = df.dropDuplicates([id_field])
    if max_num_docs:
        df = df.limit(max_num_docs)
    return df
