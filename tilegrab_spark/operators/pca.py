"""Distributed PCA / whitening over the embedding column — the
standard preprocessing in front of the ANN / dedup suite (PQ codebooks
train better on decorrelated axes; whitening is OPQ's first step;
SemDeDup-style pipelines whiten before cosine thresholds).

The statistic is tiny even when the corpus is not: PCA needs only the
d-vector sum and the d×d Gramian. Fit is a two-level reduce —

1. ONE pass over the corpus (``mapInPandas``): each PARTITION emits a
   single partial ``(n, Σx, ΣxxT)`` row (numpy-accumulated across its
   Arrow batches — no per-batch rows, no vector ever shuffles);
2. partials combine in ``applyInPandas`` groups of ~√P (P = partition
   count), so no single task nor the driver ever holds more than
   √P × d² doubles;
3. the driver eigendecomposes the d×d covariance (``numpy.linalg.eigh``
   — d is 64-4096 for real embedding tables, microseconds) and fixes
   eigenvector signs deterministically (largest-|component| positive).

Transform is one broadcast matmul in a pandas UDF: ``(x − mean) @ Wᵀ``
(÷ √eigval for whitening) — shuffle-free, output inherits the input
partitioning. The reference has no analogue; this extends the
training-data suite alongside similarity.py / quantization.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["PCAModel", "fit_pca", "transform_pca"]

_PARTIAL_SCHEMA = "g int, n long, s array<double>, xtx array<double>"


@dataclass
class PCAModel:
    mean: np.ndarray        # (d,)
    components: np.ndarray  # (d_out, d) rows = top eigenvectors, desc eigval
    eigvals: np.ndarray     # (d_out,) sample covariance eigenvalues
    n: int

    @property
    def d(self) -> int:
        return self.mean.shape[0]

    @property
    def d_out(self) -> int:
        return self.components.shape[0]


def _partials_kernel(fan_in: int):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, s, xtx, g = 0, None, None, 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
            g = int(pdf["_g"].iloc[0])
            if s is None:
                s = np.zeros(X.shape[1])
                xtx = np.zeros((X.shape[1], X.shape[1]))
            n += X.shape[0]
            s += X.sum(axis=0)
            xtx += X.T @ X
        if n:
            yield pd.DataFrame(
                [{"g": g % fan_in, "n": n, "s": list(s), "xtx": list(xtx.ravel())}]
            )

    return kernel


def _combine(key, pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        [{
            "g": 0,
            "n": int(pdf["n"].sum()),
            "s": list(np.sum([np.asarray(v) for v in pdf["s"]], axis=0)),
            "xtx": list(np.sum([np.asarray(v) for v in pdf["xtx"]], axis=0)),
        }]
    )


def fit_pca(df: DataFrame, *, vec_col: str = "embedding", d_out: int | None = None) -> PCAModel:
    """Fit PCA on the vector column. ``d_out`` defaults to full rank
    (d). Returns mean, top-``d_out`` components (rows, descending
    eigenvalue), sample-covariance eigenvalues, and n."""
    vecs = df.select(F.col(vec_col).alias("_v")).where(F.col("_v").isNotNull())
    nparts = vecs.rdd.getNumPartitions()
    fan_in = max(1, int(math.sqrt(max(1, nparts))))
    partials = vecs.withColumn("_g", F.spark_partition_id()).mapInPandas(
        _partials_kernel(fan_in), schema=_PARTIAL_SCHEMA
    )
    combined = partials.groupBy("g").applyInPandas(_combine, schema=_PARTIAL_SCHEMA)
    rows = combined.collect()  # <= fan_in rows of d + d^2 doubles
    if not rows:
        raise ValueError(f"no non-null vectors in column {vec_col!r}")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    xtx = np.sum([np.asarray(r["xtx"]) for r in rows], axis=0)
    d = s.shape[0]
    if n < 2:
        raise ValueError(f"need >= 2 vectors to fit PCA, got {n}")
    xtx = xtx.reshape(d, d)
    mean = s / n
    cov = (xtx - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    k = d if d_out is None else int(d_out)
    if not 1 <= k <= d:
        raise ValueError(f"d_out must be in [1, {d}], got {k}")
    W = evecs[:, :k].T.copy()  # (k, d)
    # deterministic sign: largest-|component| of each eigenvector positive
    for i in range(k):
        j = int(np.argmax(np.abs(W[i])))
        if W[i, j] < 0:
            W[i] = -W[i]
    return PCAModel(mean=mean, components=W, eigvals=np.maximum(evals[:k], 0.0), n=int(n))


def transform_pca(
    df: DataFrame,
    model: PCAModel,
    *,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-9,
) -> DataFrame:
    """Project the vector column onto the model's components (appended
    as ``out_col``, array<double> of length d_out). ``whiten=True``
    additionally scales each axis by 1/√eigval so the output has unit
    sample covariance. Shuffle-free broadcast matmul."""
    sess = df.sparkSession
    W = model.components / np.sqrt(model.eigvals + eps)[:, None] if whiten else model.components
    bc = sess.sparkContext.broadcast((model.mean, W))

    @F.pandas_udf("array<double>")
    def project(vs: pd.Series) -> pd.Series:
        mean, Wm = bc.value
        X = np.array([np.asarray(v, dtype=np.float64) for v in vs])
        if len(X) == 0:
            return pd.Series([], dtype=object)
        Y = (X - mean) @ Wm.T
        return pd.Series(list(Y))

    return df.withColumn(out_col, project(F.col(vec_col)))
