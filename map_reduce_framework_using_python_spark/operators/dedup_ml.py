"""Alternate near-dup backend on spark.ml's MinHashLSH estimator.

Same contract as :func:`operators.dedup.minhash_lsh_pairs` (doc_a <
doc_b pairs with exact-verified Jaccard ≥ threshold), different
machinery: HashingTF shingle vectors → ``MinHashLSH.approxSimilarityJoin``
(ml's OR-amplified band join) → exact verification. Exists to
cross-check the hand-rolled sketch against the library implementation
and as the drop-in for pipelines already on spark.ml.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.dedup import (
    _spread,
    word_shingles,
)


def minhash_lsh_pairs_ml(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    threshold: float = 0.6,
    num_features: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs via spark.ml MinHashLSH, exact-verified.

    approxSimilarityJoin's Jaccard distance is computed on the *hashed*
    feature vectors (HashingTF collisions make it approximate), so
    candidates are re-verified against the true shingle sets before
    output — same discipline as the hand-rolled path.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    base = _spread(df).select(
        F.col(id_col), word_shingles(text_col, n).alias("sh_set")
    ).filter(F.size("sh_set") > 0)
    tf = HashingTF(
        inputCol="sh_set", outputCol="features", numFeatures=num_features, binary=True
    )
    feats = tf.transform(base)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hashes, seed=seed
    )
    model = lsh.fit(feats)
    # Distance threshold with slack: hashed-vector Jaccard ≈ true
    # Jaccard; exact verification below prunes false positives.
    joined = model.approxSimilarityJoin(
        feats, feats, 1.0 - threshold + 0.1, distCol="_dist"
    )
    cand = (
        joined.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("doc_a"),
            F.col(f"datasetA.sh_set").alias("sh_a"),
            F.col(f"datasetB.{id_col}").alias("doc_b"),
            F.col(f"datasetB.sh_set").alias("sh_b"),
        )
    )
    # The shared verification expression (operators/dedup.py) — the
    # third backend must verify identically to the one-shot operator
    # and the persisted-index probe (r7 review).
    from map_reduce_framework_using_python_spark.operators.dedup import (
        shingle_jaccard,
    )

    jac = shingle_jaccard("sh_a", "sh_b")
    return (
        cand.filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .distinct()
    )
