"""Sources & sinks (reference ops 1-2: partitioned WRITE / distributed READ).

The reference's only format is line-delimited text shipped over HTTP
(``Client/client_v1.py:75-176``, ``Worker/worker_v1.py:44-98``); its
catalog is ``references.json`` (``Master/masterhandler.py:193-220``).
Here the format surface is text/CSV/JSON/Parquet (+ binaryFile for
multimodal blobs) and the catalog is Spark's own.
"""

from map_reduce_framework_using_python_spark.sources.io import (
    TABLES,
    load_table,
    load_tables,
    read_text,
    register_views,
    write_text,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_text",
    "register_views",
    "write_text",
]
