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
