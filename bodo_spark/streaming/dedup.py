"""Streaming incremental dedup: flag documents arriving on a stream
that are near-duplicates of an already-indexed static corpus -- the
production ingest shape (index once, dedup every incoming micro-batch)
run on Structured Streaming instead of batch jobs.

Plan shape (all streaming-legal):
  stream docs -> per-row MinHash signature (stateless projection,
  operators/dedup.minhash_signature_cols) -> band explode ->
  stream-static join against the stored corpus band frame ->
  stream-static join for the corpus verify sets -> Jaccard filter ->
  stateful dropDuplicates on the pair key (multi-band repeats).
The corpus side should be persisted (or a parquet reload) -- it is
re-evaluated per micro-batch otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dedup as D

__all__ = ["stream_minhash_flags", "stream_bloom_new_rows"]


def stream_bloom_new_rows(
    stream_docs: DataFrame,
    words: DataFrame,
    corpus_keys: DataFrame,
    *,
    key_col: str = "_key",
    m_bits: int,
    k: int = 5,
) -> DataFrame:
    """Streaming twin of operators/bloom.exact_new_rows: emit only the
    stream rows whose ``key_col`` is NOT in the indexed corpus.
    ``words`` is the stored Bloom word table (read_bloom_index);
    ``corpus_keys`` is a one-column (``key_col``) frame of corpus keys
    -- persist it (or point it at a key-only parquet) so micro-batches
    don't re-derive it.

    Everything is stateless and stream-legal: the k bit probes are k
    broadcast stream-static joins against the (tiny, <= m/64 rows)
    word table -- no explode-then-aggregate, so no streaming-state
    machinery; the corpus confirm is ONE stream-static left join whose
    join key is NULLed for rows the filter already cleared (SQL
    equi-joins never match NULL), so definitely-new rows pass through
    without probing the corpus at all. False positives come back
    matched = null cleared or matched -> filtered exactly; false
    negatives are impossible. At corpus scale the confirm join is the
    rare path by construction (fpp * batch + true dups); keep
    ``corpus_keys`` persisted/bucketed so its per-batch cost is a hash
    lookup, not a rebuild."""
    from ..operators.bloom import probe_hit_flag

    key = F.col(key_col)
    # the probe kernel is SHARED with the batch operator (one
    # implementation, bit-identical by construction) and is
    # streaming-legal: broadcast joins + narrow expressions only
    out, helper = probe_hit_flag(stream_docs, words, key,
                                 m_bits=m_bits, k=k, flag_col="_maybe")
    probe_key = F.when(F.col("_maybe"), key).otherwise(F.lit(None))
    ck = (corpus_keys.select(F.col(key_col).alias("_ck"))
          .dropDuplicates(["_ck"]))  # repeated corpus keys must not fan out
    out = (out.withColumn("_pk", probe_key)
           .join(ck, F.col("_pk") == F.col("_ck"), "left")
           .where(F.col("_ck").isNull()))
    return out.drop(*helper, "_maybe", "_pk", "_ck")


def stream_minhash_flags(
    stream_docs: DataFrame,
    corpus_sig: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_perm: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """(new_id, corpus_id, jaccard) pairs, streaming: every stream doc
    whose true Jaccard against a band-colliding corpus doc clears the
    threshold. ``corpus_sig`` is a `minhash_signatures` frame built with
    the same (k, num_perm) -- typically reloaded from parquet.

    Value-identical to the batch `minhash_lsh_pairs_between` over the
    same inputs: signatures, banding, and verification use the same
    expressions; only the execution engine differs. The Jaccard filter
    runs BEFORE the stateful dropDuplicates so pair state holds only
    true near-dups, not every band collision.
    """
    # the corpus frame feeds TWO static branches (bands + verify sets)
    # and is re-evaluated once per micro-batch on top of that; persist
    # unless the caller already has (same discipline as the batch
    # minhash_lsh_pairs_between)
    sl = corpus_sig.storageLevel
    if not (sl.useMemory or sl.useDisk):
        from pyspark.storagelevel import StorageLevel
        corpus_sig = corpus_sig.persist(StorageLevel.MEMORY_AND_DISK)
        D._PERSISTED.append(corpus_sig)
    sig = D.minhash_signature_cols(stream_docs, id_col, text_col,
                                   k, num_perm)
    band_cols = D._band_sig_cols(num_perm, bands)
    nb = (sig.select("id", "sh",
                     F.explode(F.array(*band_cols)).alias("band_sig"))
          .select(F.col("id").alias("new_id"),
                  F.col("sh").alias("sh_a"), "band_sig"))
    cb = (corpus_sig.select(
        F.col("id").alias("corpus_id"),
        F.explode(F.array(*band_cols)).alias("band_sig")))
    sets_b = corpus_sig.select(F.col("id").alias("corpus_id"),
                               F.col("sh").alias("sh_b"))
    cand = (nb.join(cb, "band_sig")
            .join(sets_b, "corpus_id"))
    jac = F.round(
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_union("sh_a", "sh_b")), 6)
    return (cand.select("new_id", "corpus_id", jac.alias("jaccard"))
            .where(F.col("jaccard") >= threshold)
            .dropDuplicates(["new_id", "corpus_id"]))
