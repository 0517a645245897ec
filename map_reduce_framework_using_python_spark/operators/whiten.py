"""ZCA whitening of an embedding column — the distributed linear-algebra
pattern: bounded model state, one data pass per phase.

Embedding pipelines whiten before cosine retrieval / clustering because
raw encoder outputs are anisotropic (a few dominant directions swamp
the metric); ZCA decorrelates while staying closest (in least-squares
sense) to the original basis. The Spark decomposition:

1. **moments** — one pass: per-Arrow-batch partial (count, Σx, XᵀX)
   via ``mapInPandas`` (numpy does the d×d outer-product accumulation
   vectorized), then the PARTIAL rows — O(partitions) rows of d²+d+1
   doubles, model state, not data — combine on the driver.
2. **eig** — numpy ``eigh`` of the d×d covariance on the driver
   (d is the embedding width: 64 here, ≤ a few thousand in practice —
   a driver-sized problem by construction, exactly like k-means
   centroids in :mod:`.clustering`).
3. **project** — map-only second pass: v' = W·(v − μ) with W broadcast
   inside a vectorized pandas UDF (one numpy matmul per Arrow batch).

Nothing shuffles in any phase; the only driver traffic is the moment
partials and the broadcast W. The 100 TB story is therefore two scans.

Pinned in tests/test_whiten.py: the whitened sample covariance is the
identity (up to eps regularization and float tolerance) and the Spark
projection equals the numpy reference exactly.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

#: Eigenvalue floor: directions with variance below this are damped
#: instead of amplified into noise (standard ZCA regularization).
DEFAULT_EPS = 1e-5


def embedding_moments(
    df: DataFrame, vec_col: str = "embedding"
) -> tuple[int, np.ndarray, np.ndarray]:
    """One distributed pass → (n, mean, covariance) of the vectors.

    Each Arrow batch reduces to a single partial row; the driver sums
    partials — O(partitions) rows cross the wire, never vectors.
    """

    def partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "s": [x.sum(axis=0).tolist()],
                    "ss": [(x.T @ x).ravel().tolist()],
                }
            )

    rows = df.select(vec_col).mapInPandas(
        partials, schema="n long, s array<double>, ss array<double>"
    ).collect()  # O(partitions) partial rows: model state, not data
    n = sum(r["n"] for r in rows)
    if n == 0:
        raise ValueError("embedding_moments: no vectors")
    # d derives from the collected partials — a head() probe would be a
    # whole extra Spark job just to learn the width (r7 review; the
    # docstring promises ONE distributed pass).
    d = len(rows[0]["s"])
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.asarray(r["ss"]).reshape(d, d) for r in rows], axis=0)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    return n, mean, cov


def zca_matrix(cov: np.ndarray, eps: float = DEFAULT_EPS) -> np.ndarray:
    """W = U·diag(1/√(λ+eps))·Uᵀ — symmetric whitening (driver-side
    d×d eig; deterministic for a given covariance)."""
    lam, u = np.linalg.eigh(cov)
    # eigh on a cancellation-noisy covariance (E[xxT] - mu muT) can
    # return slightly NEGATIVE eigenvalues; below -eps the sqrt would
    # be NaN and the whole whitening matrix with it (r7 review) —
    # floor at zero so eps alone sets the scale of degenerate
    # directions.
    lam = np.maximum(lam, 0.0)
    return (u * (1.0 / np.sqrt(lam + eps))) @ u.T


def whiten(
    df: DataFrame,
    mean: np.ndarray,
    w: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "whitened",
) -> DataFrame:
    """Map-only projection v' = W·(v − μ), one numpy matmul per Arrow
    batch (W and μ ride the closure → Spark broadcast)."""
    mu = np.asarray(mean, dtype=np.float64)
    wt = np.asarray(w, dtype=np.float64).T  # x @ Wᵀ == (W @ xᵀ)ᵀ

    def project(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            out = (x - mu) @ wt
            res = pdf.drop(columns=[vec_col]).copy()
            res[out_col] = list(out)
            yield res

    fields = [f"{f.name} {f.dataType.simpleString()}" for f in df.schema
              if f.name != vec_col]
    schema = ", ".join(fields + [f"{out_col} array<double>"])
    return df.mapInPandas(project, schema=schema)
