"""Unit tests for the BPE tokenizer: hand-computed merge tables and
encodings, determinism, and the distributed frequency count.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from bodo_spark.operators import bpe as B


def test_train_bpe_hand_example():
    # the Sennrich paper's shape: 'low'x5, 'lower'x2, 'newest'x6, 'widest'x3
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = B.train_bpe(wf, num_merges=4)
    # pair counts: (e,s)=9, (s,t)=9, (w,e)=8(newest)+...; ties (e,s)/(s,t)
    # break lexicographically -> (e,s) first, then (es,t)=9
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    # after est: (l,o)=7 from low+lower; (w,est)... newest has (w,est)=6,
    # widest (d,est)=3 -> (l,o)=7 wins
    assert merges[2] == ("l", "o")
    assert merges[3] == ("lo", "w")


def test_encode_word_follows_rank_order():
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert B._encode_word("newest", ranks) == ["n", "e", "w", "est"]
    assert B._encode_word("lowest", ranks) == ["low", "est"]
    assert B._encode_word("low", ranks) == ["low"]
    assert B._encode_word("a", ranks) == ["a"]
    # unknown symbols stay as characters
    assert B._encode_word("xyz", ranks) == ["x", "y", "z"]


def test_train_is_deterministic_and_incremental_counts_correct():
    wf = [("abab", 3), ("abc", 2), ("bca", 1)]
    m1 = B.train_bpe(wf, num_merges=6)
    m2 = B.train_bpe(list(wf), num_merges=6)
    assert m1 == m2
    # (a,b)=3*2+2=8 wins round 1
    assert m1[0] == ("a", "b")


def test_end_to_end_roundtrip_on_spark(spark):
    df = spark.createDataFrame(
        [("the cat sat on the mat",), ("the mat the cat",)],
        "text string")
    merges = B.train_bpe(B.word_frequencies(df, "text"), num_merges=10)
    out = (df.withColumn("toks", B.bpe_tokens("text", merges))
           .select(F.array_join("toks", "").alias("joined"),
                   F.regexp_replace("text", r"\s+", "").alias("orig"))
           .collect())
    for r in out:
        assert r.joined == r.orig
    # frequent words fully merged after 10 merges
    toks = (df.withColumn("toks", B.bpe_tokens("text", merges))
            .select(F.explode("toks").alias("t")).collect())
    assert "the" in {r.t for r in toks}


def test_word_frequencies_cap_and_order(spark):
    df = spark.createDataFrame(
        [("b b b a a c",)], "text string")
    wf = B.word_frequencies(df, "text", max_words=2)
    assert wf == [("b", 3), ("a", 2)]


def test_bpe_factory_plugs_into_ai_tokenize(spark):
    """The in-repo BPE fulfills ai.tokenize's tokenizer_factory contract
    (the seam an external tokenizers library would use)."""
    from bodo_spark.operators.ai import tokenize

    df = spark.createDataFrame(
        [(0, "the cat sat"), (1, "the the the")], "doc_id bigint, text string")
    wf = B.word_frequencies(df, "text")
    merges = B.train_bpe(wf, num_merges=8)
    vocab = B.bpe_vocab(wf, merges)
    out = {r.doc_id: r.tokens for r in
           tokenize(df, tokenizer_factory=B.bpe_tokenizer_factory(
               merges, vocab)).collect()}
    # 'the' is frequent -> fully merged -> one in-vocab id, repeated
    assert out[1] == [vocab["the"]] * 3
    # every id is deterministic and in-vocab for trained words
    assert all(i >= 0 for i in out[0])
    out2 = {r.doc_id: r.tokens for r in
            tokenize(df, tokenizer_factory=B.bpe_tokenizer_factory(
                merges, vocab)).collect()}
    assert out == out2


def test_bpe_vocab_layout_and_oov():
    wf = [("ab", 2)]
    merges = B.train_bpe(wf, num_merges=1)
    vocab = B.bpe_vocab(wf, merges)
    assert vocab == {"a": 0, "b": 1, "ab": 2}
    enc = B.bpe_tokenizer_factory(merges, vocab)()
    assert enc("ab ab") == [2, 2]
    # OOV chars get stable negative ids, never raise
    oov = enc("zz")
    assert oov == enc("zz") and all(i < 0 for i in oov)
