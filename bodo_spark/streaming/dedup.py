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

__all__ = ["stream_minhash_flags", "stream_bloom_new_rows",
           "stream_excise_spans", "stream_drop_boilerplate_lines"]


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


def _rebuild_excised(id_col: str, text_col: str, span: int):
    """Grouped rebuild fn for stream_excise_spans: positions flagged as
    index hits are merged into [p, p+span) intervals and the covered
    tokens dropped -- the same interval-merge excision the batch
    operator does in Column space (operators/dedup.py
    excise_duplicate_spans), here in plain python over one doc's rows.
    State is unused (a source row's exploded grams land in one
    micro-batch together); applyInPandasWithState is the grouping
    vehicle -- streaming groupBy without watermarked aggregation."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    def fn(key, pdfs, state: GroupState):
        text, hits = None, []
        for pdf in pdfs:
            for t in pdf[text_col]:
                if t is not None:
                    text = t
                    break
            hits.extend(int(p) for p, h in
                        zip(pdf["pos"], pdf["_hit"])
                        if pd.notna(p) and h)
        toks = (text or "").split()
        ivs: list[list[int]] = []
        for p in sorted(hits):
            if ivs and ivs[-1][1] >= p:
                ivs[-1][1] = p + span
            else:
                ivs.append([p, p + span])
        kept = [t for i, t in enumerate(toks)
                if not any(s <= i < e for s, e in ivs)]
        state.update((0,))  # stateless pass-through; required API
        yield pd.DataFrame({id_col: [key[0]],
                            "clean": [" ".join(kept)]})

    return fn


def stream_excise_spans(
    stream_docs: DataFrame,
    gram_index: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    span: int = 50,
) -> DataFrame:
    """Streaming twin of operators/dedup.excise_duplicate_spans against
    an INDEXED corpus: every ``span``-token gram of an incoming doc
    whose hash is in ``gram_index`` is excised -- the corpus already
    holds the canonical occurrence, so every stream occurrence is
    non-canonical by construction (the r9 ingest pattern: index once,
    clean every micro-batch; intra-batch first-occurrence resolution
    remains the batch operator's job, run at index-append time).

    Plan: stateless positional-gram explode (posexplode_outer keeps
    gram-less short docs alive) -> stream-static LEFT join against the
    stored gram-hash frame (the only index access; hash-join per
    micro-batch, corpus text never read) -> per-doc rebuild in
    applyInPandasWithState (grouping only -- no watermark, state
    unused). Returns (id, clean)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.dedup import _positional_gram_hashes

    occ = stream_docs.select(
        F.col(id_col), F.col(text_col),
        F.posexplode_outer(
            _positional_gram_hashes(F.col(text_col), span))
        .alias("pos", "gh"))
    idx = gram_index.select(F.col("gh").alias("_igh")).distinct() \
        .withColumn("_in", F.lit(1))
    flagged = (occ.join(idx, occ["gh"] == F.col("_igh"), "left")
               .withColumn("_hit", F.col("_in").isNotNull())
               .select(id_col, text_col, "pos", "_hit"))
    fn = _rebuild_excised(id_col, text_col, span)
    return (flagged.groupBy(id_col)
            .applyInPandasWithState(
                fn, f"{id_col} long, clean string", "dummy int",
                "update", GroupStateTimeout.NoTimeout))


def stream_drop_boilerplate_lines(
    stream_docs: DataFrame,
    line_index: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
) -> DataFrame:
    """Streaming twin of operators/curation.remove_boilerplate_lines
    against a stored boilerplate-line-hash index (`line_index`: one
    ``_key`` column of normalized-line hashes -- the `bad` frame the
    batch operator derives). Lines hashing into the index are dropped,
    everything else survives in order. Same plan shape as
    stream_excise_spans: stateless posexplode, one stream-static LEFT
    join, grouped rebuild."""
    import re as _re

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..modes import exact_mode

    line = F.col("_line")
    norm = F.lower(F.trim(line))
    key = F.md5(norm) if exact_mode() else F.xxhash64(norm).cast("string")
    ex = (stream_docs.select(
        F.col(id_col),
        F.posexplode_outer(F.split(F.col(text_col), _re.escape(delim)))
        .alias("_pos", "_line"))
        .withColumn("_key", key))
    idx = line_index.select(F.col("_key").alias("_ik")).distinct() \
        .withColumn("_in", F.lit(1))
    flagged = (ex.join(idx, ex["_key"] == F.col("_ik"), "left")
               .withColumn("_bad", F.col("_in").isNotNull())
               .select(id_col, "_pos", "_line", "_bad"))

    def fn(k, pdfs, state: GroupState):
        rows = []
        for pdf in pdfs:
            rows.extend(zip(pdf["_pos"], pdf["_line"], pdf["_bad"]))
        kept = [ln for p, ln, bad in sorted(rows, key=lambda r: r[0])
                if pd.notna(p) and not bad and ln is not None]
        state.update((0,))
        yield pd.DataFrame({id_col: [k[0]], "clean": [delim.join(kept)]})

    return (flagged.groupBy(id_col)
            .applyInPandasWithState(
                fn, f"{id_col} long, clean string", "dummy int",
                "update", GroupStateTimeout.NoTimeout))


def stream_semantic_new_rows(
    stream_vecs: DataFrame,
    index: DataFrame,
    centroids: list,
    *,
    eps: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    coarse_dim: int = 16,
) -> DataFrame:
    """Streaming incremental SemDeDup against a stored cell index
    (operators/similarity.semantic_cell_index): emit only the arriving
    vectors that are NOT a semantic duplicate of the indexed corpus.

    This is deliberately just the shared kernel
    (similarity.semantic_dedup_between) applied to a streaming frame --
    the kernel is streaming-legal by construction: the gemm pandas_udf
    assignment is per-row (no shuffle), and the duplicate test is one
    stream-static LEFT ANTI join (no aggregation, no state), so batch
    and stream cannot drift."""
    from ..operators.similarity import semantic_dedup_between
    return semantic_dedup_between(stream_vecs, index, centroids,
                                  eps=eps, id_col=id_col,
                                  vec_col=vec_col, coarse_dim=coarse_dim)


def stream_decontaminate_new_rows(
    stream_docs: DataFrame,
    bench_grams: DataFrame,
    *,
    k: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming benchmark decontamination against a stored gram index
    (the batch operator's ``bench`` side, distinct word k-grams written
    to parquet once): emit only the arriving docs that share NO k-gram
    with the benchmark -- operators/curation.decontaminate's streaming
    twin, the index-once pattern once more.

    Plan: stateless gram posexplode (outer -- gram-less short docs must
    survive) -> ONE stream-static LEFT join against the gram index ->
    per-doc any-hit reduction in applyInPandasWithState (grouping
    vehicle only, state unused: a source row's grams land in one
    micro-batch together). Emits the original (id, text) of clean
    docs."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.dedup import word_shingles

    ex = stream_docs.select(
        F.col(id_col), F.col(text_col),
        F.posexplode_outer(word_shingles(text_col, k, distinct=False))
        .alias("_pos", "_gram"))
    idx = bench_grams.select(F.col("gram").alias("_ig")).distinct() \
        .withColumn("_in", F.lit(1))
    flagged = (ex.join(idx, ex["_gram"] == F.col("_ig"), "left")
               .withColumn("_hit", F.col("_in").isNotNull())
               .select(id_col, text_col, "_hit"))

    def fn(key, pdfs, state):
        import pandas as pd
        hit = False
        text = None
        for pdf in pdfs:
            if len(pdf):
                text = pdf[text_col].iloc[0]
                hit = hit or bool(pdf["_hit"].any())
        state.update((0,))
        if not hit:
            yield pd.DataFrame({id_col: [key[0]], text_col: [text]})

    return (flagged.groupBy(id_col)
            .applyInPandasWithState(
                fn, f"{id_col} long, {text_col} string", "dummy int",
                "update", GroupStateTimeout.NoTimeout))
