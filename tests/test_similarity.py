"""Unit tests for the ANN/similarity operators, including the BLAS
(mapInPandas GEMM) path and its self-match candidate-count regression."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from bodo_spark.operators import similarity as S

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    from bodo_spark.queries._util import tbl
    return tbl(spark, SF_DIR, "embeddings")


def _queries_df(emb, n=3):
    from pyspark.sql import functions as F
    return (emb.where(F.col("vec_id") < n)
            .select(F.col("vec_id").alias("q_id"),
                    F.col("embedding").alias("q_vec")))


def test_topk_pandas_matches_brute_force(spark, emb):
    """The GEMM path must agree with the exact brute-force baseline on
    (q_id, vec_id) sets. Cosines are rounded to 6 digits in both."""
    q = _queries_df(emb).toPandas()
    got = (S.topk_pandas(emb, q, k=5).toPandas()
           .sort_values(["q_id", "rn"]).reset_index(drop=True))
    exp = (S.brute_force_topk(emb, _queries_df(emb), k=5).toPandas()
           .sort_values(["q_id", "rn"]).reset_index(drop=True))
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(got[["q_id", "vec_id"]],
                                  exp[["q_id", "vec_id"]])


def test_topk_pandas_self_match_keeps_k_candidates(spark):
    """Regression: a single batch containing the query's own vector must
    still yield k non-self neighbors (the local top-k takes k+1)."""
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(6, 4))
    sdf = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(6),
                      "embedding": [list(map(float, v)) for v in vecs]})
    ).coalesce(1)
    q = pd.DataFrame({"q_id": [0], "q_vec": [vecs[0]]})
    out = S.topk_pandas(sdf, q, k=5).toPandas()
    assert len(out) == 5
    assert 0 not in set(out["vec_id"])
