"""Unit tests for the embedding gram/PCA operators: the distributed
(mapInPandas-partial) statistics must match a single-machine numpy
computation on the collected data, and projections must behave like
PCA (orthonormal basis, variance ordering, centered matmul).
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from bodo_spark.operators.embeddings import gram_stats, pca_fit, pca_project
from bodo_spark.queries._util import tbl

from .conftest import SF_DIR

DIM = 64


def _collect_matrix(spark):
    emb = tbl(spark, SF_DIR, "embeddings").orderBy("vec_id")
    x = np.vstack([r.embedding for r in emb.collect()]).astype(np.float64)
    return emb, x


def test_gram_stats_matches_numpy(spark):
    emb, x = _collect_matrix(spark)
    gram, sums, n = gram_stats(emb, "embedding", dim=DIM)
    assert n == len(x)
    np.testing.assert_allclose(gram, x.T @ x, rtol=1e-10)
    np.testing.assert_allclose(sums, x.sum(axis=0), rtol=1e-10)


def test_gram_stats_partitioning_invariant(spark):
    emb, _ = _collect_matrix(spark)
    g1, s1, n1 = gram_stats(emb, "embedding", dim=DIM)
    g2, s2, n2 = gram_stats(emb.repartition(7), "embedding", dim=DIM)
    assert n1 == n2
    np.testing.assert_allclose(g1, g2, rtol=1e-12)


def test_pca_fit_matches_numpy_eigh(spark):
    emb, x = _collect_matrix(spark)
    model = pca_fit(emb, "embedding", dim=DIM, k=8)
    cov = np.cov(x, rowvar=False, bias=True)
    vals = np.sort(np.linalg.eigvalsh(cov))[::-1][:8]
    np.testing.assert_allclose(model["explained_variance"], vals,
                               rtol=1e-8)
    # components: orthonormal rows, variance-ordered
    c = model["components"]
    np.testing.assert_allclose(c @ c.T, np.eye(8), atol=1e-10)
    ev = model["explained_variance"]
    assert all(ev[i] >= ev[i + 1] - 1e-12 for i in range(len(ev) - 1))


def test_pca_project_is_centered_matmul(spark):
    emb, x = _collect_matrix(spark)
    model = pca_fit(emb, "embedding", dim=DIM, k=4)
    out = (pca_project(emb, model).orderBy("vec_id")
           .select("projected").collect())
    y = np.vstack([r.projected for r in out])
    expect = (x - model["mean"]) @ model["components"].T
    np.testing.assert_allclose(y, expect, rtol=1e-9, atol=1e-12)
    # projected coordinates are uncorrelated with variance = eigenvalue
    emp = np.cov(y, rowvar=False, bias=True)
    np.testing.assert_allclose(np.diag(emp), model["explained_variance"],
                               rtol=1e-8)


def test_repetition_fractions_hand_example(spark):
    from bodo_spark.operators.text import (dup_ngram_fraction,
                                           top_ngram_fraction)
    df = spark.createDataFrame(
        [("a b a b a",), ("all words differ here now",), ("tiny",)],
        "text string")
    rows = (df.select(
        F.round(dup_ngram_fraction("text", 2), 6).alias("dup"),
        F.round(top_ngram_fraction("text", 2), 6).alias("top"))
        .collect())
    # "a b a b a": bigrams [a b, b a, a b, b a] -> dup 0.5, top 0.5
    assert (rows[0].dup, rows[0].top) == (0.5, 0.5)
    # all-distinct bigrams -> dup 0, top 1/4
    assert (rows[1].dup, rows[1].top) == (0.0, 0.25)
    # <2 words: whole-text fallback, single gram
    assert (rows[2].dup, rows[2].top) == (0.0, 1.0)
