"""File catalog — the honest replacement for the reference's metastore.

The reference tracks every stored file in ``Master/Metadata/references.json``
(filename → worker ports, ``masterhandler.py:29-41,171-175,207-213``)
plus a per-file manifest CSV (``masterhandler.py:42-46,150-156``). Here
the "cluster placement" half dissolves (Spark owns block placement); what
remains catalog-worthy is name → storage path + partition count, kept in
one JSON file under the DFS root. Spark-native tables should use
``saveAsTable``/Hive instead; this exists for Lane-A CLI parity.
"""

from __future__ import annotations

import json
import os

DEFAULT_ROOT = os.environ.get("SPARK_GRAFT_DFS", os.path.expanduser("~/.spark_graft_dfs"))


class FileCatalog:
    def __init__(self, root: str = DEFAULT_ROOT) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._path = os.path.join(root, "references.json")

    def _load(self) -> dict:
        if os.path.exists(self._path):
            with open(self._path) as fh:
                return json.load(fh)
        return {}

    def _save(self, data: dict) -> None:
        with open(self._path, "w") as fh:
            json.dump(data, fh, indent=2, sort_keys=True)

    def register(self, name: str, n_partitions: int) -> str:
        """Record a stored file; returns its storage directory."""
        data = self._load()
        path = os.path.join(self.root, "store", name)
        data[name] = {"path": path, "n_partitions": n_partitions}
        self._save(data)
        return path

    def lookup(self, name: str) -> dict:
        data = self._load()
        if name not in data:
            # The reference answers a missing file with HTTP 500
            # (masterhandler.py:30-36); here it's an exception.
            raise KeyError(f"file not in catalog: {name}")
        return data[name]

    def names(self) -> list[str]:
        return sorted(self._load())
