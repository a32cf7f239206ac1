"""Embedding-matrix operators: distributed gram/covariance, PCA fit,
and low-rank projection -- the dimensionality-reduction step a
large-scale embedding pipeline runs before ANN indexing or clustering
(reduce 768-d to 64-d, whiten, then bucket).

Scale design: the only distributed work is one pass computing
per-Arrow-batch partial statistics (numpy float64 X^T X via BLAS,
column sums, count) that reduce to a single d x d matrix -- bytes
shuffled are O(d^2 * n_batches), never O(rows). The
eigendecomposition happens on the driver over the d x d result (d is
64..1024 in practice: microseconds) and the projection matrix
broadcasts back into a vectorized pandas_udf matmul. Nothing
row-scale ever leaves the executors.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["gram_stats", "pca_fit", "pca_project"]


def gram_stats(df: DataFrame, col: str = "embedding", *,
               dim: int) -> tuple[np.ndarray, np.ndarray, int]:
    """(d x d gram matrix X^T X, column-sum vector, row count) in ONE
    distributed pass.

    Each Arrow batch emits a flattened float64 [gram | sums | count]
    array; a posexplode + index-keyed sum reduces them. The collected
    result is d^2 + d + 1 doubles -- bounded by the embedding
    dimension, independent of corpus size.
    """
    d = dim

    def _partial(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf[col].to_numpy()).astype(np.float64)
            flat = np.concatenate([(x.T @ x).ravel(), x.sum(axis=0),
                                   [float(len(x))]])
            yield pd.DataFrame({"p": [flat.tolist()]})

    rows = (df.select(col).mapInPandas(_partial, "p array<double>")
            .select(F.posexplode("p").alias("i", "v"))
            .groupBy("i").agg(F.sum("v").alias("v"))
            .collect())
    flat = np.zeros(d * d + d + 1)
    for r in rows:
        flat[r.i] = r.v
    gram = flat[:d * d].reshape(d, d)
    sums = flat[d * d:d * d + d]
    n = int(round(flat[-1]))
    return gram, sums, n


def pca_fit(df: DataFrame, col: str = "embedding", *, dim: int,
            k: int) -> dict:
    """Fit PCA: top-``k`` eigenvectors of the centered covariance.

    Returns {"components": (k x d), "explained_variance": (k,),
    "mean": (d,), "n": rows}. Deterministic up to eigenvector sign;
    signs are canonicalized (largest-|coord| positive) so repeated
    fits agree.
    """
    gram, sums, n = gram_stats(df, col, dim=dim)
    mean = sums / n
    cov = gram / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T                   # k x d
    for i in range(comps.shape[0]):            # canonical sign
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {"components": comps, "explained_variance": vals[order],
            "mean": mean, "n": n}


def pca_project(df: DataFrame, model: dict, col: str = "embedding",
                out_col: str = "projected") -> DataFrame:
    """Project embeddings onto the fitted components (centered matmul).

    The (k x d) component matrix broadcasts inside a vectorized
    pandas_udf -- one BLAS gemm per Arrow batch, no per-row Python.
    """
    comps = np.ascontiguousarray(model["components"], dtype=np.float64)
    mean = np.ascontiguousarray(model["mean"], dtype=np.float64)

    @F.pandas_udf("array<double>")
    def _proj(s: pd.Series) -> pd.Series:
        x = np.vstack(s.to_numpy()).astype(np.float64) - mean
        y = x @ comps.T
        return pd.Series(list(y))

    return df.withColumn(out_col, _proj(F.col(col)))
