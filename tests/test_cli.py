"""Compat-CLI tests: the reference's -w / -r / -mr lifecycle
(``Client/client_v1.py:62``) against a temp DFS root."""

from __future__ import annotations

import glob
import os

import pytest

from map_reduce_framework_using_python_spark.catalog import FileCatalog
from map_reduce_framework_using_python_spark.cli import cmd_mapreduce, cmd_read, cmd_write

MAPPER = (
    "import sys\n"
    "for line in sys.stdin:\n"
    "    for w in line.strip().lower().split():\n"
    "        if w:\n"
    "            print(f'{w},1')\n"
)
REDUCER = (
    "import sys\n"
    "cur, cnt = None, 0\n"
    "for line in sys.stdin:\n"
    "    line = line.rstrip('\\n')\n"
    "    if not line: continue\n"
    "    k, v = line.split(',', 1)\n"
    "    if k != cur:\n"
    "        if cur is not None: print(f'{cur},{cnt}')\n"
    "        cur, cnt = k, 0\n"
    "    cnt += int(v)\n"
    "if cur is not None: print(f'{cur},{cnt}')\n"
)


def test_write_mapreduce_read_lifecycle(spark, tmp_path):
    root = str(tmp_path / "dfs")
    src = tmp_path / "input.txt"
    src.write_text("the quick brown fox\nthe lazy dog\nthe quick dog\n")
    mp, rp = tmp_path / "mapper.py", tmp_path / "reducer.py"
    mp.write_text(MAPPER)
    rp.write_text(REDUCER)

    name = cmd_write(str(src), root=root, n_partitions=6)
    assert name == "input.txt"
    # Padding invariant: 3 lines, 6 partition files.
    entry = FileCatalog(root).lookup(name)
    assert entry["n_partitions"] == 6
    assert len(glob.glob(os.path.join(entry["path"], "part-*"))) == 6

    out_name = cmd_mapreduce(str(mp), str(rp), name, root=root)
    assert out_name == "input-part-00000.txt"  # worker_v1.py:193 naming

    outdir = str(tmp_path / "out")
    out_path = cmd_read(out_name, outdir, root=root)
    counts = dict(
        line.split(",") for line in open(out_path).read().splitlines() if line
    )
    assert counts == {"the": "3", "quick": "2", "dog": "2", "brown": "1", "fox": "1", "lazy": "1"}


def test_read_missing_file_raises(tmp_path):
    with pytest.raises(KeyError, match="not in catalog"):
        cmd_read("ghost.txt", str(tmp_path), root=str(tmp_path / "dfs2"))


def test_write_read_roundtrip_is_byte_identical(tmp_path, spark):
    """Reference parity (r7 review): WRITE splits contiguously by line
    count and READ merges in part order, so the roundtrip returns the
    file with lines in the ORIGINAL order — the identity contract the
    reference's client keeps (client_v1.py:103-115, 164-176). The old
    repartition/size-packed path permuted lines and only sorted()
    comparisons hid it."""
    from map_reduce_framework_using_python_spark.cli import cmd_read, cmd_write

    src = tmp_path / "ordered.txt"
    lines = [f"line-{i:03d}" for i in range(40)]
    src.write_text("\n".join(lines) + "\n")
    root = str(tmp_path / "dfs")
    cmd_write(str(src), root=root, n_partitions=6)
    out = cmd_read("ordered.txt", str(tmp_path / "out"), root=root)
    assert open(out).read().splitlines() == lines
    # and the contiguous-split layout: part 0 holds the FIRST lines
    import os

    from map_reduce_framework_using_python_spark.catalog import FileCatalog

    path = FileCatalog(root).lookup("ordered.txt")["path"]
    parts = sorted(f for f in os.listdir(path) if f.startswith("part-"))
    assert len(parts) == 6
    first = open(os.path.join(path, parts[0])).read().splitlines()
    assert first == lines[: len(first)]
