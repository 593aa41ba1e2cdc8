"""Index catalog: create/list/inspect/delete indexes under a storage root.

Reference parity for the global catalog + per-index metadata CRUD
(`/root/reference/code/indexes/index_custom.py:254-338,415-486,799-855`;
`storage/metadata.yaml`). Here the filesystem IS the catalog (one
directory per index with its `_manifests/`). The per-index TABLE
operations (write/append/staged-replace/read/row-count) live behind the
TableProvider interface in sources/provider.py — ParquetDirProvider for
this layout, IcebergProvider mapping the same calls onto an Iceberg
catalog (`CREATE/DROP TABLE`, `SHOW TABLES`, snapshot summaries).
"""

from __future__ import annotations

import json
import os
import shutil


def list_indices(storage_root: str) -> list[str]:
    if not os.path.isdir(storage_root):
        return []
    out = []
    for name in sorted(os.listdir(storage_root)):
        if os.path.isdir(os.path.join(storage_root, name, "_manifests")):
            out.append(name)
    return out


def index_exists(storage_root: str, index_id: str) -> bool:
    return index_id in list_indices(storage_root)


def get_index_info(storage_root: str, index_id: str) -> dict:
    """Metadata + build metrics assembled from the manifests
    (reference `get_index_info`, `index_custom.py:415-467`)."""
    idx_dir = os.path.join(storage_root, index_id)
    mdir = os.path.join(idx_dir, "_manifests")
    if not os.path.isdir(mdir):
        raise FileNotFoundError(f"no such index: {index_id}")
    info: dict = {"index_id": index_id, "path": idx_dir, "units": {}}
    for fname in sorted(os.listdir(mdir)):
        if fname.endswith(".json"):
            with open(os.path.join(mdir, fname)) as f:
                info["units"][fname[:-5]] = json.load(f)
    build = info["units"].get("build", {})
    info["complete"] = build.get("status") == "complete"
    info["stats"] = build.get("stats")
    info["config"] = build.get("config")
    stats_path = os.path.join(idx_dir, "stats.json")
    if info["stats"] is None and os.path.exists(stats_path):
        with open(stats_path) as f:
            info["stats"] = json.load(f)
    return info


def delete_index(storage_root: str, index_id: str) -> bool:
    """DROP (reference `delete_index`, `index_custom.py:799-855`)."""
    idx_dir = os.path.join(storage_root, index_id)
    if not os.path.isdir(os.path.join(idx_dir, "_manifests")):
        return False
    shutil.rmtree(idx_dir)
    return True
