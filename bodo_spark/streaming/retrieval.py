"""Streaming lexical retrieval: incoming query text ranked against a
STORED BM25 inverted index (operators/retrieval.py) -- the serving-side
twin of the batch bm25_topk, closing the search side of the lexical
tier the way streaming/ann.py closes the vector tier.

Plan shape (all streaming-legal, mirroring batch exactly):
  stream queries -> per-row array_distinct token explode (value-
  identical to the batch (q_id, term) distinct: terms dedupe WITHIN a
  query; no streaming aggregation needed) -> stream-static joins
  against the stored postings and term-stats frames on the term ->
  the SAME round-9 JVM partial expression as batch (bm25_partial_col;
  corpus N/sum_dl ride as literals, the stored-artifact scalars) ->
  per-query sum + top-k in applyInPandasWithState (grouping vehicle:
  a query's candidates land in one micro-batch together; partials are
  int-scaled to 1e-9 grains so the pandas sum is the decimal sum).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf/applyInPandas hints
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_bm25_topk"]


def stream_bm25_topk(
    stream_queries: DataFrame,
    postings: DataFrame,
    term_stats: DataFrame,
    corpus_stats: tuple[int, int],
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    q_id_col: str = "q_id",
    q_text_col: str = "q_text",
) -> DataFrame:
    """Streaming BM25 search: each arriving query joins the stored
    ``postings`` (term, doc_id, tf, dl) and ``term_stats`` (term, df)
    frames (reload from parquet and persist) on its distinct terms
    only. ``corpus_stats`` is the stored ``(n_docs, sum_dl)`` scalar
    artifact (bm25_corpus_stats, persisted with the index). Emits
    (q_id, doc_id, score, rn), rn 1..k by descending score, ties to
    the lowest doc id -- value-identical to batch bm25_topk over the
    same inputs (the stream_bm25_topk gate shares the batch oracle).

    Determinism of the pandas sum: the JVM partial is a 9-dp-rounded
    double, so ``round(part * 1e9)`` recovers its exact integer grain
    count; int64 summation is exact and order-independent; the final
    ``grains / 1e9`` is one correctly-rounded double division, then
    the house half-up 6-dp round -- bit-identical to the batch
    DECIMAL(28,9) sum."""
    from ..operators.retrieval import bm25_partial_col
    from ..operators.similarity import _round_half_up
    from ..operators.text import tokenize_ws

    n_docs, sum_dl = int(corpus_stats[0]), int(corpus_stats[1])
    q = (stream_queries
         .select(F.col(q_id_col).alias("q_id"),
                 F.explode(F.array_distinct(tokenize_ws(q_text_col)))
                 .alias("term")))
    cand = (q.join(postings.select("term", "doc_id", "tf", "dl"), "term")
            .join(term_stats.select("term", "df"), "term")
            .withColumn("n_docs", F.lit(n_docs).cast("bigint"))
            .withColumn("sum_dl", F.lit(sum_dl).cast("bigint")))
    part = bm25_partial_col(k1=k1, b=b)
    scored = cand.select("q_id", "doc_id",
                         F.round(part * F.lit(1e9)).cast("long")
                         .alias("grains"))

    def topk(key, pdfs, state):
        parts = [pdf for pdf in pdfs if len(pdf)]
        state.update((0,))
        if not parts:
            return
        allc = pd.concat(parts)
        agg = (allc.groupby("doc_id", as_index=False)["grains"].sum())
        agg["score"] = _round_half_up(agg["grains"] / 1e9, 6)
        agg = (agg.sort_values(["score", "doc_id"],
                               ascending=[False, True])
               .head(k).reset_index(drop=True))
        yield pd.DataFrame({
            "q_id": key[0],
            "doc_id": agg["doc_id"],
            "score": agg["score"],
            "rn": pd.RangeIndex(1, len(agg) + 1).astype("int64")})

    from pyspark.sql.streaming.state import GroupStateTimeout
    # derive id output types from the inputs (batch bm25_topk preserves
    # them; hardcoding long would fail string/int32 ids at runtime)
    q_typ = stream_queries.schema[q_id_col].dataType.simpleString()
    d_typ = postings.schema["doc_id"].dataType.simpleString()
    out_schema = (f"q_id {q_typ}, doc_id {d_typ}, "
                  "score double, rn long")
    return (scored.groupBy("q_id")
            .applyInPandasWithState(
                topk, out_schema,
                "dummy int", "update", GroupStateTimeout.NoTimeout))
