"""Numeric-mode contract: exact (decimal, oracle-bit-identical) vs fast
(double, the library default) must agree to float tolerance, fast mode must
not leave decimal types in the output schema, and a bare import must give
fast mode (library users never pay the decimal/md5 tax by default).
"""

from __future__ import annotations

import os

import pytest

from .conftest import SF_DIR


@pytest.fixture
def exact_mode_env():
    os.environ["BODO_SPARK_EXACT"] = "1"
    yield
    os.environ.pop("BODO_SPARK_EXACT", None)


def _run(spark, qname, exact):
    from bodo_spark.queries import all_queries
    os.environ["BODO_SPARK_EXACT"] = "1" if exact else "0"
    try:
        return all_queries()[qname].fn(spark, SF_DIR).toPandas()
    finally:
        os.environ.pop("BODO_SPARK_EXACT", None)


def test_default_is_fast_mode():
    from bodo_spark.modes import exact_mode
    assert os.environ.get("BODO_SPARK_EXACT") is None
    assert exact_mode() is False


def test_entry_contract_opts_into_exact(spark):
    """__spark_entry__.queries() wraps every fn so the driver's oracle
    comparison builds exact-mode plans even though the library default
    is fast -- and restores the env afterwards."""
    import __spark_entry__ as entry
    df = entry.queries()["q1_pricing_summary"](spark, SF_DIR)
    # Output schema is double in BOTH modes (dsum casts the aggregate back);
    # exactness lives in the internal decimal aggregation buffers, so assert
    # on the analyzed plan text, not the result schema.
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "decimal" in plan.lower()  # plan built exact
    # env restored: a subsequent bare query builds fast plans
    assert os.environ.get("BODO_SPARK_EXACT") is None
    from bodo_spark.queries import all_queries
    fast_df = all_queries()["q1_pricing_summary"].fn(spark, SF_DIR)
    fast_plan = fast_df._jdf.queryExecution().analyzed().toString()
    assert "decimal" not in fast_plan.lower()


@pytest.mark.parametrize("qname", ["q1_pricing_summary", "q6_forecast_revenue"])
def test_fast_mode_matches_exact_to_tolerance(spark, qname):
    exact = _run(spark, qname, exact=True)
    fast = _run(spark, qname, exact=False)
    assert list(exact.columns) == list(fast.columns)
    assert len(exact) == len(fast)
    for c in exact.columns:
        if exact[c].dtype.kind == "f":
            import numpy as np
            assert np.allclose(exact[c], fast[c], rtol=1e-9), c
        else:
            assert (exact[c] == fast[c]).all(), c


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for _, r in df.iterrows()}


def _exact_jaccard(spark, ids):
    """Ground-truth n-gram Jaccard for specific id pairs, computed directly
    (no MinHash estimate) on the driver -- the pair lists are tiny."""
    from bodo_spark.queries._util import tbl
    docs = {r["doc_id"]: r["text"]
            for r in tbl(spark, SF_DIR, "documents")
            .select("doc_id", "text").collect()}

    def shingles(text):
        w = text.strip().split()
        if len(w) < 3:
            return {text.strip()}
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    out = {}
    for a, b in ids:
        sa, sb = shingles(docs[a]), shingles(docs[b])
        out[(a, b)] = len(sa & sb) / len(sa | sb) if sa | sb else 0.0
    return out


def test_minhash_modes_no_false_positives_and_high_jaccard_recall(spark):
    """Fast mode swaps md5->xxhash64 in MinHash/LSH. The two hash families
    band borderline pairs differently (both are valid MinHash estimators),
    so exact pair-set equality is data-dependent; what MUST hold in both
    modes: (a) zero false positives -- verification is exact Jaccard, and
    (b) every very-high-jaccard pair (>= 0.9: banding miss probability
    (1-0.81)^8 ~ 1.7e-6 per scheme) is found."""
    exact_pairs = _pairs(_run(spark, "dedup_minhash_lsh", exact=True))
    fast_pairs = _pairs(_run(spark, "dedup_minhash_lsh", exact=False))
    jac = _exact_jaccard(spark, exact_pairs | fast_pairs)
    for name, pairs in (("exact", exact_pairs), ("fast", fast_pairs)):
        for p in pairs:
            assert jac[p] >= 0.5, (name, p, jac[p])  # query threshold
    # recall floor: near-identical pairs one mode found must appear in both
    strong = {p for p, j in jac.items() if j >= 0.9}
    assert strong, "testdata should contain at least one planted near-dup"
    assert strong <= exact_pairs, strong - exact_pairs
    assert strong <= fast_pairs, strong - fast_pairs


def test_fast_mode_has_no_decimal_columns(spark):
    from bodo_spark.queries.tpch import q1_pricing_summary
    df = q1_pricing_summary(spark, SF_DIR)
    assert "decimal" not in str(df.schema).lower(), df.schema


def test_cc_star_checksum_survives_ansi_mode(spark):
    """Regression: the star-CC convergence checksum was sum(xxhash64),
    which overflows a signed long under ANSI mode (the Spark 4 DRIVER
    default -- the engine's own sessions set ansi=false, which is why
    pytest alone never caught it and the r7 driver row went red). The
    bit_xor checksum must converge a 64-node chain under ansi=true."""
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        from bodo_spark.operators.dedup import connected_components_star
        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(64)], "id_a long, id_b long")
        labels = {r.id: r.comp
                  for r in connected_components_star(chain).collect()}
        assert labels == {i: 0 for i in range(65)}
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_exact_wrapper_applies_engine_confs(spark):
    """Conf parity: the driver runs queries()[name] under ITS session
    (Spark 4 defaults: ansi=true, local timezone). The _exact wrapper
    must re-assert the engine posture so driver-run plans execute under
    documented semantics."""
    import __spark_entry__ as entry
    spark.conf.set("spark.sql.ansi.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        entry.queries()["q1_pricing_summary"](spark, SF_DIR)
        assert spark.conf.get("spark.sql.ansi.enabled") == "false"
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        from bodo_spark.session import _apply_runtime_confs
        _apply_runtime_confs(spark)
