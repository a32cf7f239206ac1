"""Unit tests for the lexical-retrieval operators (BM25 inverted index,
top-k ranking, stopword pruning, reciprocal-rank fusion)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bodo_spark.operators import retrieval as R


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "apple banana cherry apple"),
        (1, "banana durian elderberry"),
        (2, "cherry cherry cherry fig grape"),
        (3, "the the the the apple"),
        (4, "durian fig grape honeydew kiwi lemon"),
        (5, "the the banana"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_index_shape_and_tf(spark, corpus):
    idx = R.bm25_index(corpus).toPandas()
    assert set(idx.columns) == {"term", "doc_id", "tf", "dl"}
    row = idx[(idx.term == "apple") & (idx.doc_id == 0)].iloc[0]
    assert row.tf == 2 and row.dl == 4
    # dl counts every token of the doc, once per (term, doc) row
    assert set(idx[idx.doc_id == 2].dl) == {5}


def test_max_df_ratio_prunes_terms_not_lengths(spark, corpus):
    idx = R.bm25_index(corpus, max_df_ratio=0.4).toPandas()
    # 'the' appears in 2/6 docs = 0.33 <= 0.4 -> kept; a term in 3+/6
    # docs (> 0.4) is pruned
    by_df = (R.bm25_index(corpus).toPandas()
             .groupby("term").doc_id.nunique())
    pruned = set(by_df[by_df > 0.4 * 6].index)
    assert pruned and not (set(idx.term) & pruned)
    # dl is unchanged by pruning (length normalization keeps all tokens)
    assert set(idx[idx.doc_id == 3].dl) == {5}


def test_bm25_self_retrieval_and_score(spark, corpus):
    idx = R.bm25_index(corpus)
    q = spark.createDataFrame([(0, "apple banana")],
                              "q_id bigint, q_text string")
    got = (R.bm25_topk(idx, q, k=3).toPandas()
           .sort_values("rn").reset_index(drop=True))
    # doc 0 holds both query terms (one twice) -> must rank first
    assert got.doc_id.iloc[0] == 0 and got.rn.iloc[0] == 1
    # hand-compute doc 0's score with the documented formula
    n, k1, b = 6, 1.2, 0.75
    dls = [4, 3, 5, 5, 6, 3]
    avgdl = sum(dls) / float(n)

    def idf(df):
        return round(math.log(1.0 + (n - df + 0.5) / (df + 0.5)), 9)

    def part(tf, df, dl):
        return round(idf(df) * (tf * (k1 + 1.0))
                     / (tf + k1 * (1.0 - b + b * dl / avgdl)), 9)

    exp = round(part(2, 2, 4) + part(1, 3, 4), 6)  # apple df=2, banana df=3
    assert got[got.doc_id == 0].score.iloc[0] == pytest.approx(exp, abs=2e-6)


def test_bm25_query_terms_deduplicated(spark, corpus):
    idx = R.bm25_index(corpus)
    q1 = spark.createDataFrame([(0, "apple")], "q_id bigint, q_text string")
    q2 = spark.createDataFrame([(0, "apple apple apple")],
                               "q_id bigint, q_text string")
    s1 = R.bm25_topk(idx, q1, k=6).toPandas().sort_values("doc_id")
    s2 = R.bm25_topk(idx, q2, k=6).toPandas().sort_values("doc_id")
    assert list(s1.score) == list(s2.score)


def test_bm25_stored_stats_match_inline(spark, corpus):
    idx = R.bm25_index(corpus)
    ts, cs = R.bm25_corpus_stats(idx)
    q = spark.createDataFrame([(0, "cherry fig"), (1, "banana the")],
                              "q_id bigint, q_text string")
    inline = R.bm25_topk(idx, q, k=4).toPandas()
    stored = R.bm25_topk(idx, q, k=4, term_stats=ts,
                         corpus_stats=cs).toPandas()
    key = ["q_id", "doc_id", "score", "rn"]
    assert (inline[key].sort_values(key).values.tolist()
            == stored[key].sort_values(key).values.tolist())


def test_rrf_fuse_ranks_and_scores(spark):
    a = spark.createDataFrame([(0, 10, 1), (0, 11, 2), (0, 12, 3)],
                              "q_id bigint, doc_id bigint, rn bigint")
    b = spark.createDataFrame([(0, 12, 1), (0, 10, 2), (0, 13, 3)],
                              "q_id bigint, doc_id bigint, rn bigint")
    got = (R.rrf_fuse([a, b], k=60, topk=4).toPandas()
           .sort_values("rn").reset_index(drop=True))
    score = {10: round(1 / 61, 9) + round(1 / 62, 9),
             11: round(1 / 62, 9),
             12: round(1 / 63, 9) + round(1 / 61, 9),
             13: round(1 / 63, 9)}
    order = sorted(score, key=lambda d: (-score[d], d))
    assert list(got.doc_id) == order
    for _, r in got.iterrows():
        assert r.rrf == pytest.approx(score[r.doc_id], abs=1e-9)


def test_rrf_requires_input(spark):
    with pytest.raises(ValueError):
        R.rrf_fuse([])


def test_bm25_append_equals_one_shot(spark, corpus):
    one_shot = R.bm25_index(corpus).toPandas()
    staged = R.bm25_append(
        R.bm25_index(corpus.where("doc_id % 2 = 0")),
        corpus.where("doc_id % 2 != 0")).toPandas()
    key = ["term", "doc_id"]
    cols = ["term", "doc_id", "tf", "dl"]
    assert (one_shot.sort_values(key)[cols].values.tolist()
            == staged.sort_values(key)[cols].values.tolist())


def test_mmr_rerank_prefers_diversity(spark):
    # q=[1,0]; A most relevant; B ~ duplicate of A; C orthogonal-ish.
    # Plain top-2 would pick (A, B); MMR at lam=0.5 must pick (A, C).
    cands = spark.createDataFrame(
        [(0, 1, 0.99, [1.0, 0.05]),   # A
         (0, 2, 0.98, [1.0, 0.06]),   # B near-dup of A
         (0, 3, 0.60, [0.2, 1.0])],   # C diverse
        "q_id bigint, doc_id bigint, score double, "
        "vec array<double>")
    got = (R.mmr_rerank(cands, k=2, lam=0.5).toPandas()
           .sort_values("rn"))
    assert list(got.doc_id) == [1, 3]
    # lam=1.0 degenerates to pure relevance order
    rel = (R.mmr_rerank(cands, k=3, lam=1.0).toPandas()
           .sort_values("rn"))
    assert list(rel.doc_id) == [1, 2, 3]
    import pytest as _pt
    with _pt.raises(ValueError):
        R.mmr_rerank(cands, lam=1.5)
    with _pt.raises(ValueError):
        R.mmr_rerank(cands, k=0)


def test_fuzzy_join_blocks_thresholds_best(spark):
    from bodo_spark.operators.linkage import fuzzy_join
    left = spark.createDataFrame(
        [(1, "jonathan smith"), (2, "maria garcia"), (3, "wei chen")],
        "lk long, name string")
    right = spark.createDataFrame(
        [(10, "jonathon smith"),    # typo twin of 1 (same block 'j')
         (11, "jon smith"),         # weaker variant of 1
         (20, "maria garcia"),      # exact twin of 2
         (30, "zzzz chen")],        # same-initial decoy for nobody
        "rk long, name string")
    from pyspark.sql import functions as F
    out = fuzzy_join(left, right, left_key="lk", right_key="rk",
                     left_col="name", right_col="name",
                     left_block=F.col("name").substr(1, 1),
                     right_block=F.col("name").substr(1, 1),
                     threshold=0.9, keep="best")
    got = {r.lk: (r.rk, r.score100) for r in out.collect()}
    assert got[1][0] == 10 and got[1][1] >= 90   # best typo twin wins
    assert got[2] == (20, 100)                   # exact match
    assert 3 not in got                          # decoy under threshold
    allp = fuzzy_join(left, right, left_key="lk", right_key="rk",
                      left_col="name", right_col="name",
                      left_block=F.col("name").substr(1, 1),
                      right_block=F.col("name").substr(1, 1),
                      threshold=0.8, keep="all").collect()
    assert len(allp) >= 3                        # looser: jon smith too


def test_bm25_stored_append_rewrites_only_batch_term_shards(spark,
                                                            tmp_path):
    """The in-place stored append must leave postings/term_stats files
    OUTSIDE the batch terms' buckets byte-identical, and the appended
    store must serve exactly like a one-shot store."""
    import glob
    import os

    from pyspark.sql import functions as F

    from bodo_spark.operators import retrieval as R
    from bodo_spark.operators.merge import _bucket_expr
    d1 = spark.createDataFrame(
        [(i, f"alpha bravo w{i} w{i} common") for i in range(20)],
        "doc_id long, text string")
    d2 = spark.createDataFrame(
        [(100 + i, f"zulu yankee z{i}") for i in range(3)],
        "doc_id long, text string")
    p_inc = str(tmp_path / "inc")
    R.bm25_store_index(R.bm25_index(d1), p_inc, n_term_buckets=32)
    batch_terms = (R.bm25_index(d2).select("term").distinct()
                   .select(_bucket_expr(["term"], 32).alias("b")))
    touched = {r[0] for r in batch_terms.distinct().collect()}
    tdirs = [f"tbucket={t}" for t in touched]

    def files(sub):
        return {(p, os.path.getmtime(p), os.path.getsize(p))
                for p in glob.glob(os.path.join(p_inc, sub, "**",
                                                "*.parquet"),
                                   recursive=True)
                if not any(os.sep + t + os.sep in p for t in tdirs)}

    before_p, before_t = files("postings"), files("term_stats")
    R.bm25_stored_append(d2, p_inc)
    assert files("postings") == before_p
    assert files("term_stats") == before_t and len(touched) < 32
    # value parity with a one-shot store
    p_one = str(tmp_path / "one")
    R.bm25_store_index(R.bm25_index(d1.unionByName(d2)), p_one,
                       n_term_buckets=32)
    q = spark.createDataFrame([(1, "common zulu alpha")],
                              "q_id long, q_text string")
    a = sorted(map(tuple,
                   R.bm25_stored_topk(spark, p_inc, q, k=5).collect()))
    b = sorted(map(tuple,
                   R.bm25_stored_topk(spark, p_one, q, k=5).collect()))
    assert a == b and len(a) == 5
