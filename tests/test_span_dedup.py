"""Substring/span-level exact dedup (Lee et al. 2022 ExactSubstr):
hand-constructed corpora pin the excision semantics -- first occurrence
keeps its text, later occurrences lose exactly the covered tokens,
short docs are untouched, and fast mode (xxhash chain) agrees with
exact mode (md5 gram strings) on which tokens survive."""

from __future__ import annotations

import pytest

from bodo_spark.operators import dedup as D


def _clean_map(spark, rows, span):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = D.excise_duplicate_spans(df, span=span, out_col="clean")
    return {r["doc_id"]: r["clean"]
            for r in out.select("doc_id", "clean").collect()}


BOILER = "the quick brown fox jumps over the lazy dog again"  # 10 tokens


def test_cross_doc_span_excised_first_kept(spark):
    rows = [
        (1, f"alpha beta {BOILER} gamma delta"),
        (2, f"epsilon zeta {BOILER} eta theta"),
    ]
    got = _clean_map(spark, rows, span=10)
    # doc 1 holds the canonical occurrence: normalized but intact
    assert got[1] == f"alpha beta {BOILER} gamma delta"
    # doc 2 loses every token covered by a duplicated 10-gram.  The
    # shared run is 10 tokens; its single 10-gram in doc 2 is the
    # non-canonical occurrence, so exactly those 10 tokens go.
    assert got[2] == "epsilon zeta eta theta"


def test_short_docs_untouched(spark):
    rows = [(1, "same tiny text"), (2, "same tiny text")]
    got = _clean_map(spark, rows, span=10)
    assert got[1] == "same tiny text"
    assert got[2] == "same tiny text"


def test_within_doc_repeat_second_occurrence_cut(spark):
    rows = [(7, f"{BOILER} middle words here {BOILER}")]
    got = _clean_map(spark, rows, span=10)
    assert got[7] == f"{BOILER} middle words here"


def test_overlapping_spans_merge_into_one_interval(spark):
    # 12 shared tokens -> three duplicated 10-grams in doc 2 at
    # positions 1,2,3; they merge to one [1,13) interval
    shared = BOILER + " extra more"
    rows = [(1, f"x {shared} y"), (2, f"z {shared} w")]
    got = _clean_map(spark, rows, span=10)
    assert got[1] == f"x {shared} y"
    assert got[2] == "z w"


def test_whitespace_normalized_everywhere(spark):
    rows = [(1, "  a   b\tc  ")]
    got = _clean_map(spark, rows, span=3)
    assert got[1] == "a b c"


def test_fast_mode_matches_exact_mode(spark, monkeypatch):
    rows = [
        (1, f"alpha beta {BOILER} gamma delta"),
        (2, f"epsilon zeta {BOILER} eta theta"),
        (3, "unrelated text with nothing shared across documents at all"),
    ]
    monkeypatch.setenv("BODO_SPARK_EXACT", "1")
    exact = _clean_map(spark, rows, span=10)
    monkeypatch.setenv("BODO_SPARK_EXACT", "0")
    fast = _clean_map(spark, rows, span=10)
    assert exact == fast


def test_positions_are_sparse_not_corpus_sized(spark):
    """duplicate_span_positions returns only duplicated occurrences --
    a corpus with no duplication yields zero rows."""
    rows = [(i, f"totally unique document number {i} "
                f"with words {i*3} {i*5} {i*7} {i*11} {i*13} {i*17}")
            for i in range(1, 9)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    assert D.duplicate_span_positions(df, span=5).count() == 0


def test_excise_contaminated_spans_removes_only_hits(spark):
    """Span-level decontamination keeps the clean remainder of a
    contaminated doc (the whole-doc drop would lose it), excises the
    planted benchmark gram everywhere it appears, and leaves clean and
    short docs untouched."""
    from pyspark.sql import functions as F

    from bodo_spark.operators.dedup import (excise_contaminated_spans,
                                            unpersist_cached)

    bench = spark.createDataFrame(
        [(1, "the secret eval answer is")], "doc_id long, text string")
    train = spark.createDataFrame([
        (10, "clean text stays wholly intact here"),
        # leak in the middle: prefix/suffix must survive
        (11, "intro words the secret eval answer is tail words kept"),
        # leak twice, back to back: one merged interval
        (12, "the secret eval answer is the secret eval answer is end"),
        (13, "short doc"),  # < k tokens: never excised
    ], "doc_id long, text string")
    out = {r.doc_id: r.clean for r in
           excise_contaminated_spans(train, bench, k=5, out_col="clean")
           .collect()}
    assert out[10] == "clean text stays wholly intact here"
    assert out[11] == "intro words tail words kept"
    assert out[12] == "end"
    assert out[13] == "short doc"
    unpersist_cached()
