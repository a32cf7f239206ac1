"""Deduplication battery over the documents table: exact, MinHash+LSH,
SimHash, blocked n-gram Jaccard. Implementations in
bodo_spark.operators.dedup; in exact mode (the correctness gate) every
hash derives from md5 so the DuckDB oracles reproduce signatures
bit-for-bit; fast mode (bench) swaps in the xxhash64 intrinsic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ._util import QueryDef, tbl

# ---- DuckDB twins of the operator building blocks ----
_SQL_WORDS = "regexp_split_to_array(trim(text), '\\s+')"
_SQL_SHINGLES = (
    "CASE WHEN len({w}) >= 3 THEN "
    "list_distinct(list_transform(range(1, len({w}) - 1), "
    "i -> array_to_string(({w})[i:i+2], ' '))) "
    "ELSE [trim(text)] END"
).format(w=_SQL_WORDS)


def _sql_h60(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def _sql_minhash(num_perm: int) -> str:
    sigs = ", ".join(
        "list_min(list_transform(sh, s -> "
        + _sql_h60(f"concat('{i}|', s)") + "))"
        for i in range(num_perm))
    return f"[{sigs}]"


def _sql_bands(bands: int, rows: int) -> str:
    outs = []
    for b in range(bands):
        parts = ", ".join(f"CAST(sig[{b * rows + r + 1}] AS VARCHAR)"
                          for r in range(rows))
        outs.append(f"md5(concat_ws('_', '{b}', {parts}))")
    return f"[{', '.join(outs)}]"


def dedup_exact_subset(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup on a column subset (reference drop_duplicates,
    frame.py:1873): one survivor per (lang, source)."""
    d = tbl(spark, sf, "documents")
    deduped = D.exact_dedup(d.select("lang", "source"), ["lang", "source"])
    return (deduped.groupBy("lang").agg(F.count(F.lit(1)).alias("n_groups"))
            .orderBy("lang"))


_DEDUP_EXACT_SQL = """
SELECT lang, COUNT(*) AS n_groups
FROM (SELECT DISTINCT lang, source FROM documents) t
GROUP BY lang ORDER BY lang
"""


def dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, jaccard-verified (16 perms, 8 bands)."""
    d = tbl(spark, sf, "documents")
    return (D.minhash_lsh_pairs(d, num_perm=16, bands=8, threshold=0.5)
            .orderBy("id_a", "id_b"))


# Jaccard verification runs over the permutation-0 *hash* set (engine-
# identical md5-derived 60-bit values), mirroring the Spark operator: the
# set semantics equal the string-shingle sets (collisions ~2^-60, and any
# collision hits both engines identically).
_PAIRS_CTE = f"""
docs AS (
  SELECT doc_id AS id, {_SQL_SHINGLES} AS sh FROM documents),
hsets AS (
  SELECT id, list_distinct(list_transform(sh, s -> {_sql_h60("concat('0|', s)")})) AS hs
  FROM docs),
sigs AS (
  SELECT id, {_sql_minhash(16)} AS sig FROM docs),
banded AS (
  SELECT id, unnest({_sql_bands(8, 2)}) AS band_sig FROM sigs),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b ON a.band_sig = b.band_sig AND a.id < b.id),
pairs AS (
  SELECT id_a, id_b
  FROM cand JOIN hsets da ON cand.id_a = da.id
            JOIN hsets db ON cand.id_b = db.id
  WHERE round(CAST(len(list_intersect(da.hs, db.hs)) AS DOUBLE)
              / len(list_distinct(list_concat(da.hs, db.hs))), 6) >= 0.5)
"""

_DEDUP_MINHASH_SQL = f"""
WITH docs AS (
  SELECT doc_id AS id, {_SQL_SHINGLES} AS sh FROM documents),
hsets AS (
  SELECT id, list_distinct(list_transform(sh, s -> {_sql_h60("concat('0|', s)")})) AS hs
  FROM docs),
sigs AS (
  SELECT id, {_sql_minhash(16)} AS sig FROM docs),
banded AS (
  SELECT id, unnest({_sql_bands(8, 2)}) AS band_sig FROM sigs),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b ON a.band_sig = b.band_sig AND a.id < b.id),
verified AS (
  SELECT id_a, id_b,
         round(CAST(len(list_intersect(da.hs, db.hs)) AS DOUBLE)
               / len(list_distinct(list_concat(da.hs, db.hs))), 6) AS jaccard
  FROM cand JOIN hsets da ON cand.id_a = da.id
            JOIN hsets db ON cand.id_b = db.id)
SELECT id_a, id_b, jaccard FROM verified
WHERE jaccard >= 0.5 ORDER BY id_a, id_b
"""


def dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """16-bit SimHash fingerprints: histogram of fingerprint collisions
    (docs sharing a simhash are near-dup candidates)."""
    d = tbl(spark, sf, "documents")
    sh = D.simhash64(d, bits=16)
    return (sh.groupBy("simhash").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("id").alias("min_doc"))
        .where(F.col("n_docs") >= 2)
        .orderBy("simhash"))


def _sql_simhash(bits: int = 16) -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(bits))
    fp = " + ".join(f"(CASE WHEN v{j} > 0 THEN {2 ** j} ELSE 0 END)"
                    for j in range(bits))
    return f"""
WITH docs AS (
  SELECT doc_id AS id, {_SQL_SHINGLES} AS sh FROM documents),
hashes AS (
  SELECT id, {_sql_h60('s')} AS h
  FROM (SELECT id, unnest(sh) AS s FROM docs) t),
votes AS (
  SELECT id, {votes} FROM hashes GROUP BY id),
fps AS (
  SELECT id, CAST({fp} AS BIGINT) AS simhash FROM votes)
SELECT simhash, COUNT(*) AS n_docs, MIN(id) AS min_doc
FROM fps GROUP BY simhash HAVING COUNT(*) >= 2 ORDER BY simhash
"""


def dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Blocked exact 3-gram Jaccard pairs (blocked on source)."""
    d = tbl(spark, sf, "documents")
    return (D.ngram_jaccard_pairs(d, block_col="source", threshold=0.5)
            .orderBy("id_a", "id_b"))


_DEDUP_NGRAM_SQL = f"""
WITH docs AS (
  SELECT doc_id AS id, source, {_SQL_SHINGLES} AS sh FROM documents)
SELECT a.id AS id_a, b.id AS id_b,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
FROM docs a JOIN docs b ON a.source = b.source AND a.id < b.id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
ORDER BY id_a, id_b
"""



def dedup_resolve_survivors(spark: SparkSession, sf: str) -> DataFrame:
    """Pairs -> corpus: MinHash near-dup pairs grouped into connected
    components (iterative min-label propagation), one survivor (lowest
    doc_id) kept per cluster. Surviving doc counts per source. The
    oracle resolves the same components with a recursive CTE."""
    d = tbl(spark, sf, "documents")
    pairs = D.minhash_lsh_pairs(d, num_perm=16, bands=8, threshold=0.5)
    surv = D.dedup_survivors(d, pairs, id_col="doc_id")
    return (surv.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("doc_id").alias("min_doc"))
            .orderBy("source"))


_DEDUP_RESOLVE_SQL = f"""
WITH RECURSIVE {_PAIRS_CTE.strip()},
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
reach(u, comp) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
  UNION
  SELECT e.u, r.comp FROM edges e JOIN reach r ON e.v = r.u),
lbl AS (SELECT u, MIN(comp) AS comp FROM reach GROUP BY u),
keep AS (SELECT comp, MIN(u) AS keep_id FROM lbl GROUP BY comp),
drops AS (SELECT u FROM lbl JOIN keep USING (comp) WHERE u <> keep_id)
SELECT source, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc
FROM documents
WHERE doc_id NOT IN (SELECT u FROM drops)
GROUP BY source ORDER BY source
"""



def dedup_leakage_free_split(spark: SparkSession, sf: str) -> DataFrame:
    """Leakage-free train/val/test split: near-dup CLUSTERS (connected
    components over the MinHash pair list) are the split unit, so no
    near-duplicate pair can straddle train and eval. Counts + id-sum
    checksums per split; the oracle re-derives components with the
    recursive CTE and applies the identical cluster-hash thresholds, so
    a hash match proves exact membership of every doc in every split."""
    from ..operators import curation as C
    d = tbl(spark, sf, "documents")
    pairs = D.minhash_lsh_pairs(d, num_perm=16, bands=8, threshold=0.5)
    out = C.leakage_free_split(d, pairs)
    return (out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("id_sum"))
        .orderBy("split"))


def _leakage_split_sql() -> str:
    # thresholds computed with the SAME Python float arithmetic the
    # operator uses, embedded at full repr so both engines compare
    # identical doubles
    acc, cuts = 0.0, []
    for w in (0.8, 0.1):
        acc += w / 1.0
        cuts.append(repr(acc))
    u = ("CAST(((grp % 2147483648) * 2654435761) % 4294967296 AS DOUBLE)"
         " / 4294967296.0")
    return f"""
WITH RECURSIVE {_PAIRS_CTE.strip()},
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
reach(u, comp) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
  UNION
  SELECT e.u, r.comp FROM edges e JOIN reach r ON e.v = r.u),
lbl AS (SELECT u, MIN(comp) AS comp FROM reach GROUP BY u),
base AS (
  SELECT doc_id, COALESCE(l.comp, doc_id) AS grp
  FROM documents LEFT JOIN lbl l ON doc_id = l.u),
assigned AS (
  SELECT doc_id,
         CASE WHEN {u} < {cuts[0]} THEN 'train'
              WHEN {u} < {cuts[1]} THEN 'val'
              ELSE 'test' END AS split
  FROM base)
SELECT split, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM assigned GROUP BY split ORDER BY split
"""


def dedup_cc_star_chains(spark: SparkSession, sf: str) -> DataFrame:
    """connected_components_star on DEEP CHAINS -- the graph shape the
    O(log n) large-star/small-star algorithm exists for (min-label
    propagation needs diameter rounds: 63 here; star converges in ~7).

    Chains are built deterministically from the contiguous doc_id
    space: edge (id, id+1) whenever both ids share the same id DIV 64
    block -- no window, fully parallel construction. The engine
    resolves components from the PAIR LIST via the star rounds
    (operators/dedup.py connected_components_star); the oracle states
    the ground truth the construction implies: component label =
    block minimum = (id DIV 64) * 64. A hash-match therefore proves
    the star fixpoint labeled every 64-node chain correctly."""
    d = tbl(spark, sf, "documents").select("doc_id")
    nxt = d.select((F.col("doc_id")).alias("id_b"))
    pairs = (d.select(F.col("doc_id").alias("id_a"),
                      (F.col("doc_id") + 1).alias("id_b"))
             .where(((F.col("doc_id") + 1) % 64) != 0)
             .join(nxt, "id_b", "semi"))
    labels = D.connected_components_star(pairs)
    full = (d.join(labels.withColumnRenamed("id", "doc_id"),
                   "doc_id", "left")
            .select("doc_id",
                    F.coalesce("comp", F.col("doc_id")).alias("comp")))
    return (full.groupBy("comp")
            .agg(F.count(F.lit(1)).alias("n_nodes"),
                 F.min("doc_id").alias("min_id"),
                 F.max("doc_id").alias("max_id"))
            .orderBy("comp"))


_DEDUP_CC_STAR_SQL = """
SELECT (doc_id // 64) * 64 AS comp, COUNT(*) AS n_nodes,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM documents GROUP BY 1 ORDER BY 1
"""


def dedup_simhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash Hamming-distance pairs (<=3 of 16 bits) with pigeonhole
    band blocking (operators/dedup.simhash_pairs): candidates from 4
    exact band joins, verified by bit_count(xor)."""
    d = tbl(spark, sf, "documents")
    return (D.simhash_pairs(d, bits=16, bands=4, max_hamming=3)
            .orderBy("id_a", "id_b"))


def _sql_simhash_pairs(bits: int = 16) -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(bits))
    fp = " + ".join(f"(CASE WHEN v{j} > 0 THEN {2 ** j} ELSE 0 END)"
                    for j in range(bits))
    return f"""
WITH docs AS (
  SELECT doc_id AS id, {_SQL_SHINGLES} AS sh FROM documents),
hashes AS (
  SELECT id, {_sql_h60('s')} AS h
  FROM (SELECT id, unnest(sh) AS s FROM docs) t),
votes AS (
  SELECT id, {votes} FROM hashes GROUP BY id),
fps AS (
  SELECT id, CAST({fp} AS BIGINT) AS simhash FROM votes),
banded AS (
  SELECT id, simhash, b.band,
         (simhash >> (b.band * 4)) & 15 AS val
  FROM fps, (SELECT unnest([0, 1, 2, 3]) AS band) b),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         a.simhash AS fp_a, b.simhash AS fp_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.val = b.val AND a.id < b.id)
SELECT id_a, id_b,
       CAST(bit_count(xor(fp_a, fp_b)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= 3
ORDER BY id_a, id_b
"""


def dedup_incremental_minhash(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental (new-batch-vs-corpus) MinHash dedup: the corpus is
    indexed ONCE via minhash_signatures and each incoming batch joins
    its bands against the stored signatures -- work ∝ batch + band
    collisions, never corpus x corpus. New batch = exact copies of
    doc_id < 5 re-keyed +100000, so the cross pairs (jaccard 1.0 to
    their corpus twins) make a drop-everything bug visible; any natural
    cross near-dups surface too. Oracle restates the identical banding
    and verification in SQL."""
    from pyspark.storagelevel import StorageLevel

    d = tbl(spark, sf, "documents")
    corpus_sig = D.minhash_signatures(d).persist(StorageLevel.MEMORY_AND_DISK)
    D._PERSISTED.append(corpus_sig)
    new = (d.where(F.col("doc_id") < 5)
           .withColumn("doc_id", F.col("doc_id") + F.lit(100000)))
    return (D.minhash_lsh_pairs_between(new, corpus_sig, threshold=0.5)
            .orderBy("new_id", "corpus_id"))


_H0 = _sql_h60("concat('0|', s)")
_DEDUP_INCR_SQL = f"""
WITH corpus AS (
  SELECT doc_id AS id, {_SQL_SHINGLES} AS sh FROM documents),
newdocs AS (
  SELECT doc_id + 100000 AS id, {_SQL_SHINGLES} AS sh FROM documents
  WHERE doc_id < 5),
chs AS (
  SELECT id, list_distinct(list_transform(sh, s -> {_H0})) AS hs
  FROM corpus),
nhs AS (
  SELECT id, list_distinct(list_transform(sh, s -> {_H0})) AS hs
  FROM newdocs),
csig AS (SELECT id, {_sql_minhash(16)} AS sig FROM corpus),
nsig AS (SELECT id, {_sql_minhash(16)} AS sig FROM newdocs),
cband AS (SELECT id, unnest({_sql_bands(8, 2)}) AS band_sig FROM csig),
nband AS (SELECT id, unnest({_sql_bands(8, 2)}) AS band_sig FROM nsig),
cand AS (
  SELECT DISTINCT n.id AS new_id, c.id AS corpus_id
  FROM nband n JOIN cband c ON n.band_sig = c.band_sig),
verified AS (
  SELECT new_id, corpus_id,
         round(CAST(len(list_intersect(na.hs, ca.hs)) AS DOUBLE)
               / len(list_distinct(list_concat(na.hs, ca.hs))), 6) AS jaccard
  FROM cand JOIN nhs na ON cand.new_id = na.id
            JOIN chs ca ON cand.corpus_id = ca.id)
SELECT new_id, corpus_id, jaccard FROM verified
WHERE jaccard >= 0.5 ORDER BY new_id, corpus_id
"""


def dedup_index_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Production shape of incremental dedup: the corpus signature index
    is STORED as parquet and RELOADED before the batch band-join --
    proving the signature frame's schema (id + array<long> sh + sig
    band columns) survives a parquet round-trip byte-exactly. A silent
    type drift (e.g. minhash lanes widening to decimal, band structs
    reordering) would corrupt every stored index at upgrade time; this
    gate pins it. Same batch and same oracle as
    dedup_incremental_minhash -- identical pairs must come back from
    the reloaded index."""
    import shutil
    import uuid

    from .io_formats import _materialize

    d = tbl(spark, sf, "documents")
    stage = f"/tmp/bodo_spark_sigidx_{uuid.uuid4().hex[:8]}"
    try:
        D.minhash_signatures(d).write.mode("overwrite").parquet(stage)
        corpus_sig = spark.read.parquet(stage)
        new = (d.where(F.col("doc_id") < 5)
               .withColumn("doc_id", F.col("doc_id") + F.lit(100000)))
        out = (D.minhash_lsh_pairs_between(new, corpus_sig, threshold=0.5)
               .orderBy("new_id", "corpus_id"))
        return _materialize(
            out, "new_id long, corpus_id long, jaccard double")
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def dedup_ngram_capped(spark: SparkSession, sf: str) -> DataFrame:
    """n-gram Jaccard with the stop-shingle cap (max_doc_freq=3):
    shingles shared by more than 3 docs are boilerplate for this
    corpus (615 of 16k shingles at sf0.01) and leave both the
    intersection join and the sizes; Jaccard is computed over the
    pruned (informative) sets. Near-dup twins share distinctive
    df<=2 shingles, so their pairs survive -- non-vacuous."""
    d = tbl(spark, sf, "documents")
    return (D.ngram_jaccard_pairs(d, block_col="source", threshold=0.5,
                                  max_doc_freq=3)
            .orderBy("id_a", "id_b"))


_DEDUP_NGRAM_CAP_SQL = f"""
WITH docs AS (
  SELECT doc_id AS id, source, {_SQL_SHINGLES} AS sh FROM documents),
ex AS (SELECT id, source, unnest(sh) AS s FROM docs),
keep AS (
  SELECT s FROM (SELECT s, COUNT(*) AS c FROM ex GROUP BY s)
  WHERE c <= 3),
pruned AS (SELECT id, source, s FROM ex WHERE s IN (SELECT s FROM keep)),
sizes AS (SELECT id, COUNT(*) AS n_sh FROM pruned GROUP BY id),
common AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS common
  FROM pruned a JOIN pruned b
    ON a.source = b.source AND a.s = b.s AND a.id < b.id
  GROUP BY 1, 2),
jac AS (
  SELECT id_a, id_b,
         round(CAST(common AS DOUBLE)
               / (sa.n_sh + sb.n_sh - common), 6) AS jaccard
  FROM common
  JOIN sizes sa ON common.id_a = sa.id
  JOIN sizes sb ON common.id_b = sb.id)
SELECT id_a, id_b, jaccard FROM jac
WHERE jaccard >= 0.5 ORDER BY id_a, id_b
"""


_SPAN = 20  # gate span; production default is 50 (docs here avg ~54 tokens)


def dedup_substring_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Substring-level exact dedup (Lee et al. 2022 ExactSubstr): excise
    every duplicated 20-token span except its first occurrence, keep
    docs. Gate pins per-lang changed-doc counts, surviving char mass,
    and an order-insensitive md5 over the cleaned texts -- WHICH tokens
    survive, not just how many. span=20 (not the production 50) because
    the synthetic docs average ~54 tokens; the operator is
    span-parametric."""
    d = tbl(spark, sf, "documents").select("doc_id", "lang", "text")
    out = D.excise_duplicate_spans(d, span=_SPAN, out_col="clean")
    norm = F.array_join(F.split(F.trim(F.col("text")), r"\s+"), " ")
    return (out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("clean") != norm).cast("int")).cast("bigint")
        .alias("n_changed"),
        F.sum(F.length("clean")).cast("bigint").alias("sum_chars"),
        F.md5(F.array_join(F.array_sort(F.collect_list(F.md5("clean"))),
                           "")).alias("text_hash"))
        .orderBy("lang"))


_DEDUP_SPANS_SQL = f"""
WITH docs AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents),
grams AS (
  SELECT doc_id, i - 1 AS pos,
         {_sql_h60(f"array_to_string(ts[i:i+{_SPAN - 1}], ' ')")} AS gh
  FROM docs, UNNEST(range(1, len(ts) - {_SPAN} + 2)) AS t(i)),
dup AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           ROW_NUMBER() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn
    FROM grams) WHERE rn >= 2),
covered AS (
  SELECT DISTINCT doc_id, pos + d AS idx
  FROM dup, UNNEST(range(0, {_SPAN})) AS t(d)),
toks AS (
  SELECT doc_id, ts[CAST(i AS INTEGER)] AS tok, CAST(i AS INTEGER) - 1 AS idx
  FROM docs, UNNEST(range(1, len(ts) + 1)) AS t(i)),
kept AS (
  SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.idx) AS clean
  FROM toks t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.idx = c.idx
  WHERE c.idx IS NULL GROUP BY t.doc_id),
cleaned AS (
  SELECT d.doc_id, d.lang, array_to_string(d.ts, ' ') AS norm,
         COALESCE(k.clean, '') AS clean
  FROM docs d LEFT JOIN kept k USING (doc_id))
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN clean <> norm THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed,
       CAST(SUM(len(clean)) AS BIGINT) AS sum_chars,
       md5(string_agg(md5(clean), '' ORDER BY md5(clean))) AS text_hash
FROM cleaned GROUP BY lang ORDER BY lang
"""


def dedup_collapse_survivors(spark: SparkSession, sf: str) -> DataFrame:
    """Mega-cluster-safe end-to-end dedup (collapse_exact_texts ->
    LSH pairs over representatives only -> connected components ->
    min-id survivors; operators/dedup.py near_dup_survivors). The
    corpus is adversarially doubled with byte-identical re-keyed
    copies (doc_id + 10^9): without the collapse every doc would
    band-collide with its clone AND its clone's near-dups. Survivor
    equivalence is the oracle: collapse keeps exactly the original
    min-id rows, so surviving (source, count, id-sum) must equal plain
    LSH survivors over the UN-doubled corpus -- proving both the skew
    guard's work bound and its zero-recall-loss claim in one gate.

    The clone offset must clear the REAL id range at every probe scale:
    the original +1,000,000 collided with genuine doc_ids on the 1000x
    ladder corpus (4.95M docs), aliasing clones onto originals -- the
    collapse then kept 8.99M of 9.9M rows and LSH ran over millions of
    uncollapsed exact duplicates (24 -> 933 s at 100x -> 1000x, a gate
    construction defect the ladder itself caught; the operator was
    sound). 10^9 clears any ladder scale; the oracle (un-doubled
    corpus) is offset-independent."""
    d = tbl(spark, sf, "documents")
    doubled = d.union(d.withColumn("doc_id",
                                   F.col("doc_id") + F.lit(1_000_000_000)))
    surv = D.near_dup_survivors(doubled, num_perm=16, bands=8,
                                threshold=0.5, collapse_exact=True)
    return (surv.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("doc_id").cast("bigint").alias("id_sum"))
            .orderBy("source"))


# The doubled corpus collapses back to `documents` exactly (each clone
# shares its original's text; min id = the original), so the oracle is
# the resolve-survivors pipeline over the base table -- the recursive
# CTE does CC, min-id-per-component survives.
_DEDUP_COLLAPSE_SQL = f"""
WITH RECURSIVE {_PAIRS_CTE.strip()},
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
reach(u, comp) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
  UNION
  SELECT e.u, r.comp FROM edges e JOIN reach r ON e.v = r.u),
lbl AS (SELECT u, MIN(comp) AS comp FROM reach GROUP BY u),
keep AS (SELECT comp, MIN(u) AS keep_id FROM lbl GROUP BY comp),
drops AS (SELECT u FROM lbl JOIN keep USING (comp) WHERE u <> keep_id)
SELECT source, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM documents
WHERE doc_id NOT IN (SELECT u FROM drops)
GROUP BY source ORDER BY source
"""


def dedup_index_append(spark: SparkSession, sf: str) -> DataFrame:
    """Index MAINTENANCE loop: build the signature index from half the
    corpus, parquet-append the other half's signatures (work ∝ batch,
    per-row signer), compact the small files, reload, and dedup the
    standard probe batch against it. Pairs must equal the one-shot
    full-corpus index (same oracle as dedup_incremental_minhash) --
    proving two-batch incremental ingest ≡ one-shot indexing through
    a real storage round-trip plus compaction."""
    import shutil
    import uuid

    from .io_formats import _materialize

    d = tbl(spark, sf, "documents")
    stage = f"/tmp/bodo_spark_sigidx_app_{uuid.uuid4().hex[:8]}"
    try:
        # parity split, non-empty at every sf
        D.write_signature_index(d.where(F.col("doc_id") % 2 == 0), stage)
        D.append_signature_index(d.where(F.col("doc_id") % 2 == 1), stage,
                                 compact_after=True)
        corpus_sig = spark.read.parquet(stage)
        new = (d.where(F.col("doc_id") < 5)
               .withColumn("doc_id", F.col("doc_id") + F.lit(100000)))
        out = (D.minhash_lsh_pairs_between(new, corpus_sig, threshold=0.5)
               .orderBy("new_id", "corpus_id"))
        return _materialize(
            out, "new_id long, corpus_id long, jaccard double")
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def dedup_bloom_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-prefiltered exact-dedup ingest (operators/bloom.py): build
    the corpus key filter from half the corpus, LSM-append the other
    half (+compact), then admit only batch rows whose md5(text) key is
    NOT in the corpus. The batch replays every 7th corpus doc under new
    ids (guaranteed true duplicates) alongside the held-out tenth, so
    both the definite-new fast path and the confirm join carry rows.
    The result is pinned against the plain anti join -- the Bloom path
    must be bit-for-bit exact (false positives cleared by the confirm
    join; false negatives impossible)."""
    import shutil
    import uuid

    from ..operators import bloom as B

    d = tbl(spark, sf, "documents").select("doc_id", "lang", "text")
    corpus = d.where(F.col("doc_id") % 10 != 0)
    replay = (corpus.where(F.col("doc_id") % 7 == 1)
              .withColumn("doc_id", F.col("doc_id") + F.lit(1000000)))
    batch = d.where(F.col("doc_id") % 10 == 0).unionByName(replay)
    key = F.md5("text")
    m_bits, k = 1 << 17, 5  # sizing never affects the (exact) result
    stage = f"/tmp/bodo_spark_bloom_{uuid.uuid4().hex[:8]}"
    try:
        B.write_bloom_index(corpus.where(F.col("doc_id") % 2 == 0), stage,
                            key, m_bits=m_bits, k=k)
        B.append_bloom_index(corpus.where(F.col("doc_id") % 2 == 1), stage,
                             key, m_bits=m_bits, k=k, compact_after=True)
        words = B.read_bloom_index(spark, stage)
        new = B.exact_new_rows(batch, corpus, key, key,
                               words=words, m_bits=m_bits, k=k)
        out = (new.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_new"),
            F.bit_xor("doc_id").alias("id_xor"))
            .orderBy("lang"))
        from .io_formats import _materialize
        return _materialize(out, "lang string, n_new bigint, id_xor bigint")
    finally:
        shutil.rmtree(stage, ignore_errors=True)


_DEDUP_BLOOM_SQL = """
WITH corpus AS (
  SELECT doc_id, lang, text FROM documents WHERE doc_id % 10 <> 0),
batch AS (
  SELECT doc_id, lang, text FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, lang, text
  FROM corpus WHERE doc_id % 7 = 1),
new AS (
  SELECT b.* FROM batch b
  WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE md5(c.text) = md5(b.text)))
SELECT lang, COUNT(*) AS n_new, bit_xor(doc_id) AS id_xor
FROM new GROUP BY lang ORDER BY lang
"""


QUERIES: dict[str, QueryDef] = {
    "dedup_bloom_ingest": QueryDef(dedup_bloom_ingest, _DEDUP_BLOOM_SQL),
    "dedup_collapse_survivors": QueryDef(dedup_collapse_survivors,
                                         _DEDUP_COLLAPSE_SQL),
    "dedup_index_append": QueryDef(dedup_index_append, _DEDUP_INCR_SQL),
    "dedup_substring_spans": QueryDef(dedup_substring_spans,
                                      _DEDUP_SPANS_SQL),
    "dedup_ngram_capped": QueryDef(dedup_ngram_capped,
                                   _DEDUP_NGRAM_CAP_SQL),
    "dedup_incremental_minhash": QueryDef(dedup_incremental_minhash,
                                          _DEDUP_INCR_SQL),
    "dedup_index_roundtrip": QueryDef(dedup_index_roundtrip,
                                      _DEDUP_INCR_SQL),
    "dedup_simhash_pairs": QueryDef(dedup_simhash_pairs, _sql_simhash_pairs(16)),
    "dedup_resolve_survivors": QueryDef(dedup_resolve_survivors, _DEDUP_RESOLVE_SQL),
    "dedup_leakage_free_split": QueryDef(dedup_leakage_free_split,
                                         _leakage_split_sql()),
    "dedup_cc_star_chains": QueryDef(dedup_cc_star_chains, _DEDUP_CC_STAR_SQL),
    "dedup_exact_subset": QueryDef(dedup_exact_subset, _DEDUP_EXACT_SQL),
    "dedup_minhash_lsh": QueryDef(dedup_minhash_lsh, _DEDUP_MINHASH_SQL),
    "dedup_simhash": QueryDef(dedup_simhash, _sql_simhash(16)),
    "dedup_ngram_jaccard": QueryDef(dedup_ngram_jaccard, _DEDUP_NGRAM_SQL),
}
