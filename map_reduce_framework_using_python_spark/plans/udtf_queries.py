"""Python UDTF (Spark 3.5+/4.x table function API) — the most literal
modern analog of the reference's mapper contract: arbitrary user Python
emitting 0..n rows per input (``Worker/worker_v1.py:100-122``), but
lateral-joined in the plan instead of piped through a subprocess.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from map_reduce_framework_using_python_spark.plans.core import query, t


@udtf(returnType="word string, pos int")
class SplitWordsUDTF:
    """Tokenize with 1-based positions; the reference's mapper emitting
    multiple output lines per input line. Guard NULL only — an EMPTY
    string must emit ('', 1) exactly like both engines' split(' ') of
    '' (r7 review: the old truthiness guard silently diverged from the
    oracle on empty text)."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, w in enumerate(text.split(" "), start=1):
            yield (w, i)


@query(
    "q_python_udtf",
    oracle="""
        WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        SELECT doc_id, w[i] AS word, CAST(i AS INTEGER) AS pos
        FROM tok, UNNEST(range(1, len(w) + 1)) AS t(i)
        WHERE doc_id < 25
    """,
    tags=("udf", "udtf", "python"),
)
def q_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL Python UDTF over the documents table (restricted to a
    25-doc slice — the UDTF row-at-a-time path is deliberately the slow
    lane; the vectorized twin is q_explode_udtf)."""
    spark.udtf.register("split_words", SplitWordsUDTF)
    t(spark, sf_dir, "documents").filter("doc_id < 25").createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, s.word, s.pos
        FROM _udtf_docs d, LATERAL split_words(d.text) s
        """
    )


class FirstWordsUDTF:
    """POLYMORPHIC UDTF (Spark 4 ``analyze()``): the output schema is
    computed from the call's literal ``n`` — w1..wn string columns —
    at plan time, not declared statically. The dynamic-schema table
    function a SQL-only client can't otherwise express."""

    @staticmethod
    def analyze(text, n):
        from pyspark.sql.types import StringType, StructType
        from pyspark.sql.udtf import AnalyzeResult

        schema = StructType()
        for i in range(n.value):
            schema = schema.add(f"w{i + 1}", StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, text: str, n: int):  # noqa: D102
        if text is None:
            return
        ws = text.split(" ")
        yield tuple(ws[i] if i < len(ws) else None for i in range(n))


@query(
    "q_udtf_polymorphic",
    oracle="""
        SELECT doc_id, w[1] AS w1, w[2] AS w2, w[3] AS w3
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        WHERE doc_id < 25
    """,
    tags=("udf", "udtf", "python", "polymorphic"),
)
def q_udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL polymorphic UDTF: ``first_words(text, 3)`` resolves to
    (w1, w2, w3) via ``analyze()`` at plan time; calling it with a
    different literal would change the schema without touching the
    UDTF. The oracle indexes the split list (out-of-range → NULL on
    both engines). Same 25-doc slice discipline as q_python_udtf (the
    row-at-a-time path is deliberately the slow lane)."""
    from pyspark.sql.functions import udtf as _udtf

    spark.udtf.register("first_words", _udtf(FirstWordsUDTF))
    t(spark, sf_dir, "documents").filter("doc_id < 25").createOrReplaceTempView(
        "_udtf_docs_poly"
    )
    return spark.sql(
        """
        SELECT d.doc_id, s.*
        FROM _udtf_docs_poly d, LATERAL first_words(d.text, 3) s
        """
    )


@udtf(returnType="lang string, n_docs bigint, n_words bigint")
class LangStatsUDTF:
    """TABLE-argument UDTF (Spark 4): consumes an entire PARTITION BY
    group row-by-row in ``eval`` and emits the group's summary from
    ``terminate`` — the user-defined-aggregation shape of the table
    function API (the reference's reducer contract, lateral-joined
    instead of piped)."""

    def __init__(self):
        self._lang = None
        self._docs = 0
        self._words = 0

    def eval(self, row):  # noqa: D102
        self._lang = row["lang"]
        self._docs += 1
        self._words += len(row["text"].split(" "))

    def terminate(self):  # noqa: D102
        if self._docs:
            yield (self._lang, self._docs, self._words)


@query(
    "q_udtf_table_arg",
    oracle="""
        SELECT lang, count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_words
        FROM documents
        WHERE lang IS NOT NULL
        GROUP BY lang
    """,
    tags=("udf", "udtf", "python", "table_arg"),
)
def q_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``lang_stats(TABLE(docs) PARTITION BY lang)``: Spark routes each
    language's rows through one UDTF instance (eval per row, terminate
    per group) — the table-argument API under the oracle gate, with the
    one-shot GROUP BY as the DuckDB twin. The partitioning is a hash
    shuffle on lang, same exchange the aggregate would pay; the UDTF
    itself is row-at-a-time Python (the slow lane, bounded here by the
    small language cardinality × document count)."""
    spark.udtf.register("lang_stats", LangStatsUDTF)
    t(spark, sf_dir, "documents").filter(
        "lang IS NOT NULL"
    ).createOrReplaceTempView("_udtf_docs_tbl")
    return spark.sql(
        """
        SELECT * FROM lang_stats(TABLE(_udtf_docs_tbl) PARTITION BY lang)
        """
    )
