"""Unit tests for URL canonicalization + URL dedup (operators/web.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bodo_spark.operators import web as Wb


def _canon(spark, urls, **kw):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in
            df.select(Wb.canonicalize_url("url", **kw).alias("c")).collect()]


CASES = [
    ("https://Example.COM/a/b?x=1#frag", "https://example.com/a/b?x=1"),
    ("https://example.com:443/a/", "https://example.com/a"),
    ("http://example.com:80/", "http://example.com"),
    # :443 is NOT default for http -- stays
    ("http://example.com:443/a", "http://example.com:443/a"),
    ("https://example.com/a?utm_source=x&b=2&a=1",
     "https://example.com/a?a=1&b=2"),
    ("https://example.com/a?utm_source=x&fbclid=z",
     "https://example.com/a"),
    ("https://example.com", "https://example.com"),
    ("https://example.com/?ref=home", "https://example.com"),
]


def test_canonicalize_cases(spark):
    got = _canon(spark, [u for u, _ in CASES])
    for (u, want), g in zip(CASES, got):
        assert g == want, f"{u} -> {g}, want {want}"


def test_www_stripped_only_when_asked(spark):
    u = ["https://www.example.com/a"]
    assert _canon(spark, u) == ["https://www.example.com/a"]
    assert _canon(spark, u, strip_www=True) == ["https://example.com/a"]


def test_custom_tracking_lists(spark):
    u = ["https://e.com/a?sid=9&x=1"]
    assert _canon(spark, u) == ["https://e.com/a?sid=9&x=1"]
    assert _canon(spark, u, tracking_params=("sid",)) == \
        ["https://e.com/a?x=1"]


def test_url_dedup_min_id_and_score(spark):
    rows = [(1, "https://E.com/a?b=2&a=1", 10),
            (2, "https://e.com/a?a=1&b=2#f", 30),
            (3, "https://e.com/a/?a=1&b=2&utm_x=1", 30),
            (4, "https://e.com/other", 5)]
    df = spark.createDataFrame(rows, "doc_id bigint, url string, sc bigint")
    # no score: lowest id per canonical url wins
    kept = sorted(r.doc_id for r in Wb.url_dedup(df).collect())
    assert kept == [1, 4]
    # score: highest sc wins, ties to the LOWEST id (2 beats 3)
    kept = sorted(r.doc_id for r in
                  Wb.url_dedup(df, score_col="sc").collect())
    assert kept == [2, 4]
    out = Wb.url_dedup(df, score_col="sc")
    assert "canon_url" in out.columns


def test_dedup_plan_has_no_window(spark):
    df = spark.createDataFrame([(1, "https://e.com/a", 1)],
                               "doc_id bigint, url string, sc bigint")
    plan = Wb.url_dedup(df, score_col="sc")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan  # min(struct) + join, map-side combinable
