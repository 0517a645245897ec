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

import contextlib
import fcntl
import json
import os

DEFAULT_ROOT = os.environ.get("SPARK_GRAFT_DFS", os.path.expanduser("~/.spark_graft_dfs"))


class FileCatalog:
    def __init__(self, root: str = DEFAULT_ROOT) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._path = os.path.join(root, "references.json")
        self._lock_path = os.path.join(root, ".references.lock")

    @contextlib.contextmanager
    def _locked(self):
        # Serialize load-modify-save across concurrent CLI invocations.
        with open(self._lock_path, "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(lk, fcntl.LOCK_UN)

    def _load(self) -> dict:
        if os.path.exists(self._path):
            with open(self._path) as fh:
                return json.load(fh)
        return {}

    def _save(self, data: dict) -> None:
        tmp = self._path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(data, fh, indent=2, sort_keys=True)
        os.replace(tmp, self._path)

    def path_for(self, name: str) -> str:
        """Storage directory a file of this name would occupy — without
        registering it (write the data first, register on success)."""
        return os.path.join(self.root, "store", name)

    def register(self, name: str, n_partitions: int) -> str:
        """Record a stored file; returns its storage directory."""
        with self._locked():
            data = self._load()
            path = self.path_for(name)
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
