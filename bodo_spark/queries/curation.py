"""Corpus-curation battery: benchmark decontamination, sequence
packing, deterministic domain mixing, PII redaction. Implementations in
bodo_spark.operators.curation; oracles mirror the exact arithmetic in
DuckDB SQL (the id-hash sampler and the offset math are exact integer
ops, so hashes match bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import curation as C
from ..rowframe import local_df
from ..operators import text as T
from ._util import QueryDef, tbl

_SQL_WORDS = "regexp_split_to_array(trim(text), '\\s+')"


def _sql_shingles(k: int) -> str:
    """DuckDB twin of operators.dedup.word_shingles at gram size k."""
    return (
        f"CASE WHEN len({_SQL_WORDS}) >= {k} THEN "
        f"list_distinct(list_transform(range(1, len({_SQL_WORDS}) - {k - 2}), "
        f"i -> array_to_string(({_SQL_WORDS})[i:i+{k - 1}], ' '))) "
        f"ELSE [trim(text)] END")


# --------------------------------------------------------------------------
# decontamination: benchmark = every 19th doc (a synthetic eval set);
# k=5 so the small-vocabulary corpus produces real hits AND real misses

def cur_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source corpus sizes before/after dropping docs that share any
    word 5-gram with the held-out benchmark slice (benchmark members
    themselves excluded from training by id, as real pipelines do)."""
    d = tbl(spark, sf, "documents")
    bench = d.where(F.col("doc_id") % 19 == 0)
    train = d.where(F.col("doc_id") % 19 != 0)
    clean = C.decontaminate(train, bench, k=5)
    tot = train.groupBy("source").agg(F.count(F.lit(1)).alias("n_train"))
    kept = clean.groupBy("source").agg(F.count(F.lit(1)).alias("n_clean"))
    return (tot.join(kept, "source", "left")
            .select("source", "n_train",
                    F.coalesce("n_clean", F.lit(0)).alias("n_clean"),
                    (F.col("n_train")
                     - F.coalesce("n_clean", F.lit(0))).alias("n_dropped"))
            .orderBy("source"))


_DECON_SQL = f"""
WITH grams AS (
  SELECT doc_id, source, {_sql_shingles(5)} AS sh FROM documents),
bench AS (
  SELECT DISTINCT g FROM (SELECT unnest(sh) AS g FROM grams
                          WHERE doc_id % 19 = 0) t),
train AS (SELECT * FROM grams WHERE doc_id % 19 <> 0),
bad AS (
  SELECT DISTINCT doc_id FROM (SELECT doc_id, unnest(sh) AS g FROM train) t
  WHERE g IN (SELECT g FROM bench)),
tot AS (SELECT source, COUNT(*) AS n_train FROM train GROUP BY source),
kept AS (SELECT source, COUNT(*) AS n_clean FROM train
         WHERE doc_id NOT IN (SELECT doc_id FROM bad) GROUP BY source)
SELECT t.source, t.n_train, COALESCE(k.n_clean, 0) AS n_clean,
       t.n_train - COALESCE(k.n_clean, 0) AS n_dropped
FROM tot t LEFT JOIN kept k ON t.source = k.source
ORDER BY t.source
"""


# --------------------------------------------------------------------------
# sequence packing: concat-and-chunk at capacity 256 ws-tokens

_CAP = 256


def cur_pack_chunks(spark: SparkSession, sf: str) -> DataFrame:
    """Pack the corpus into 256-token training chunks (docs in doc_id
    order); verify the chunk map: total chunks, total (chunk, doc)
    assignments, boundary-spanning docs, fattest chunk."""
    d = (tbl(spark, sf, "documents")
         .withColumn("n_tokens", T.token_count("text"))
         .select("doc_id", "n_tokens"))
    packed = C.pack_chunks(d, _CAP, id_col="doc_id", tokens_col="n_tokens")
    per_chunk = packed.groupBy("chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs_in_chunk"))
    spanning = (packed.groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("n_chunks_of_doc")))
    return (per_chunk.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_docs_in_chunk").cast("bigint").alias("n_assignments"),
        F.max("n_docs_in_chunk").cast("bigint").alias("max_docs_in_chunk"))
        .crossJoin(spanning.agg(
            F.count_if(F.col("n_chunks_of_doc") > 1).alias("n_spanning"))))


_PACK_SQL = f"""
WITH toks AS (
  SELECT doc_id, len({_SQL_WORDS}) AS n_tokens FROM documents),
offs AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM toks),
spans AS (
  -- // is floor division; plain / on integers is true division in DuckDB
  -- and CAST(double AS BIGINT) rounds instead of flooring
  SELECT doc_id, CAST(off // {_CAP} AS BIGINT) AS first_c,
         CAST((off + greatest(n_tokens, 1) - 1) // {_CAP} AS BIGINT) AS last_c
  FROM offs),
assign AS (
  SELECT doc_id, unnest(generate_series(first_c, last_c)) AS chunk_id
  FROM spans),
per_chunk AS (
  SELECT chunk_id, COUNT(*) AS n FROM assign GROUP BY chunk_id),
spanning AS (
  SELECT CAST(count_if(last_c > first_c) AS BIGINT) AS n_spanning FROM spans)
SELECT (SELECT COUNT(*) FROM per_chunk) AS n_chunks,
       (SELECT CAST(SUM(n) AS BIGINT) FROM per_chunk) AS n_assignments,
       (SELECT MAX(n) FROM per_chunk) AS max_docs_in_chunk,
       (SELECT n_spanning FROM spanning) AS n_spanning
"""


# --------------------------------------------------------------------------
# domain mixing: 4:2:1:1 over four sources, deterministic id-hash sampler

_MIX = {"src0": 4.0, "src1": 2.0, "src2": 1.0, "src3": 1.0}


def cur_domain_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Sample the corpus to a 4:2:1:1 source mix; report kept counts and
    an id checksum per source (proves WHICH docs, not just how many)."""
    d = tbl(spark, sf, "documents")
    out = C.domain_mix_sample(d, _MIX, domain_col="source", id_col="doc_id")
    return (out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").cast("bigint").alias("id_sum"))
        .orderBy("source"))


def _mix_sql() -> str:
    wvals = ", ".join(f"('{d}', {w})" for d, w in sorted(_MIX.items()))
    return f"""
WITH w(source, wt) AS (VALUES {wvals}),
counts AS (
  SELECT d.source, COUNT(*) AS n, ANY_VALUE(wt) AS wt
  FROM documents d JOIN w ON d.source = w.source GROUP BY d.source),
budget AS (SELECT MIN(n / wt) AS b FROM counts),
frac AS (
  SELECT source, LEAST(b * wt / n, 1.0) AS keep_frac
  FROM counts CROSS JOIN budget)
SELECT d.source, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM documents d JOIN frac f ON d.source = f.source
WHERE CAST(((doc_id % 2147483648) * 2654435761) % 4294967296 AS DOUBLE)
      / 4294967296.0 < keep_frac
GROUP BY d.source ORDER BY d.source
"""


def cur_decontaminate_fuzzy(spark: SparkSession, sf: str) -> DataFrame:
    """FUZZY benchmark decontamination: flag training docs near-duplicate
    (MinHash Jaccard >= 0.5) to any held-out benchmark doc -- catches
    paraphrased/lightly-edited leaks that exact n-gram overlap misses
    (the second decontamination tier of Llama-style protocols).
    Composition of existing machinery at the right asymmetry: the
    BENCHMARK is the small 'batch' side of minhash_lsh_pairs_between, so
    work ∝ benchmark + band collisions, and the training corpus is only
    band-joined, never self-paired."""
    from pyspark.storagelevel import StorageLevel

    from ..operators import dedup as D
    d = tbl(spark, sf, "documents")
    train = d.where(F.col("doc_id") % 19 != 0)
    bench = d.where(F.col("doc_id") % 19 == 0)
    train_sig = (D.minhash_signatures(train)
                 .persist(StorageLevel.MEMORY_AND_DISK))
    D._PERSISTED.append(train_sig)
    pairs = D.minhash_lsh_pairs_between(bench, train_sig, threshold=0.5)
    flagged = pairs.select(F.col("corpus_id").alias("doc_id")).distinct()
    tot = train.groupBy("source").agg(F.count(F.lit(1)).alias("n_train"))
    hit = (train.join(flagged, "doc_id")
           .groupBy("source").agg(F.count(F.lit(1)).alias("n_flagged"),
                                  F.sum("doc_id").cast("bigint")
                                  .alias("flagged_id_sum")))
    return (tot.join(hit, "source", "left")
            .select("source", "n_train",
                    F.coalesce("n_flagged", F.lit(0)).alias("n_flagged"),
                    F.coalesce("flagged_id_sum", F.lit(0))
                    .alias("flagged_id_sum"))
            .orderBy("source"))


def _decon_fuzzy_sql() -> str:
    from .dedup import _SQL_SHINGLES, _sql_bands, _sql_h60, _sql_minhash
    h0 = _sql_h60("concat('0|', s)")
    return f"""
WITH docs AS (
  SELECT doc_id AS id, source, {_SQL_SHINGLES} AS sh FROM documents),
hs AS (
  SELECT id, list_distinct(list_transform(sh, s -> {h0})) AS hs FROM docs),
sigs AS (SELECT id, {_sql_minhash(16)} AS sig FROM docs),
bands AS (SELECT id, unnest({_sql_bands(8, 2)}) AS band_sig FROM sigs),
cand AS (
  SELECT DISTINCT b.id AS bench_id, t.id AS train_id
  FROM bands b JOIN bands t ON b.band_sig = t.band_sig
  WHERE b.id % 19 = 0 AND t.id % 19 <> 0),
verified AS (
  SELECT DISTINCT train_id FROM cand
  JOIN hs ha ON cand.bench_id = ha.id
  JOIN hs hb ON cand.train_id = hb.id
  WHERE round(CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE)
        / len(list_distinct(list_concat(ha.hs, hb.hs))), 6) >= 0.5),
tot AS (
  SELECT source, COUNT(*) AS n_train FROM documents
  WHERE doc_id % 19 <> 0 GROUP BY source),
hit AS (
  SELECT source, COUNT(*) AS n_flagged,
         CAST(SUM(doc_id) AS BIGINT) AS flagged_id_sum
  FROM documents JOIN verified ON doc_id = train_id GROUP BY source)
SELECT t.source, t.n_train, COALESCE(h.n_flagged, 0) AS n_flagged,
       COALESCE(h.flagged_id_sum, 0) AS flagged_id_sum
FROM tot t LEFT JOIN hit h ON t.source = h.source
ORDER BY t.source
"""


def cur_domain_mix_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Token-weighted domain mixing (the production recipe: budgets in
    TOKENS, not documents): 4:2:1:1 over four sources with per-domain
    mass = whitespace token count. Per-source kept counts, kept-token
    totals and id checksums."""
    from ..operators import text as T
    d = (tbl(spark, sf, "documents")
         .withColumn("n_tokens", T.token_count("text")))
    out = C.domain_mix_sample(d, _MIX, domain_col="source",
                              id_col="doc_id", size_col="n_tokens")
    return (out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        F.sum("doc_id").cast("bigint").alias("id_sum"))
        .orderBy("source"))


def _mix_tokens_sql() -> str:
    wvals = ", ".join(f"('{d}', {w})" for d, w in sorted(_MIX.items()))
    ntok = "len(regexp_split_to_array(trim(text), '\\s+'))"
    return f"""
WITH t AS (SELECT doc_id, source, {ntok} AS n_tokens FROM documents),
w(source, wt) AS (VALUES {wvals}),
counts AS (
  SELECT t.source, CAST(SUM(n_tokens) AS DOUBLE) AS n,
         ANY_VALUE(wt) AS wt
  FROM t JOIN w ON t.source = w.source GROUP BY t.source),
budget AS (SELECT MIN(n / wt) AS b FROM counts),
frac AS (
  SELECT source, LEAST(b * wt / n, 1.0) AS keep_frac
  FROM counts CROSS JOIN budget)
SELECT t.source, COUNT(*) AS n_kept,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM t JOIN frac f ON t.source = f.source
WHERE CAST(((doc_id % 2147483648) * 2654435761) % 4294967296 AS DOUBLE)
      / 4294967296.0 < keep_frac
GROUP BY t.source ORDER BY t.source
"""


# --------------------------------------------------------------------------
# PII redaction: synthesize deterministic PII around the real text, then
# verify the redaction kernel end-to-end (counts AND redacted-text hash)

def cur_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    """Inject synthetic email/IP/phone spans into each doc, redact with
    the production kernel, and verify tag counts plus an md5 over the
    redacted text (catches any regex-boundary drift, not just counts)."""
    d = tbl(spark, sf, "documents")
    pii = F.concat(
        F.lit("reach "), F.col("source"), F.lit("@example.com or 10.0."),
        (F.col("doc_id") % 256).cast("string"), F.lit("."),
        (F.col("doc_id") % 100).cast("string"), F.lit(" tel +1 555 01"),
        (F.col("doc_id") % 90 + 10).cast("string"), F.lit(" :: "),
        F.col("text"))
    red = d.select("source", C.redact_pii(pii).alias("r"))

    def tag_count(tag: str):
        return (F.size(F.split(F.col("r"), tag, -1)) - 1).cast("bigint")

    return (red.groupBy("source").agg(
        F.sum(tag_count("<EMAIL>")).cast("bigint").alias("n_email"),
        F.sum(tag_count("<IP>")).cast("bigint").alias("n_ip"),
        F.sum(tag_count("<PHONE>")).cast("bigint").alias("n_phone"),
        F.md5(F.array_join(F.array_sort(F.collect_list(F.md5("r"))), ""))
        .alias("red_hash"))
        .orderBy("source"))


_PII_SQL = """
WITH injected AS (
  SELECT source,
         'reach ' || source || '@example.com or 10.0.' ||
         CAST(doc_id % 256 AS VARCHAR) || '.' ||
         CAST(doc_id % 100 AS VARCHAR) || ' tel +1 555 01' ||
         CAST(doc_id % 90 + 10 AS VARCHAR) || ' :: ' || text AS p
  FROM documents),
red AS (
  SELECT source,
         regexp_replace(
           regexp_replace(
             regexp_replace(p,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
               '<EMAIL>', 'g'),
             '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
           '\\+?\\d([ \\-]?\\d){7,}', '<PHONE>', 'g') AS r
  FROM injected)
SELECT source,
       CAST(SUM(len(r) - len(replace(r, '<EMAIL>', '')) ) / 7 AS BIGINT)
         AS n_email,
       CAST(SUM(len(r) - len(replace(r, '<IP>', ''))) / 4 AS BIGINT) AS n_ip,
       CAST(SUM(len(r) - len(replace(r, '<PHONE>', ''))) / 7 AS BIGINT)
         AS n_phone,
       md5(string_agg(md5(r), '' ORDER BY md5(r))) AS red_hash
FROM red GROUP BY source ORDER BY source
"""


# --------------------------------------------------------------------------
# deterministic global shuffle into fixed-size training shards

_SHARD = 97


def cur_shuffle_shards(spark: SparkSession, sf: str) -> DataFrame:
    """Shuffle the corpus by the id permutation hash and cut into
    97-doc shards; per-shard count + id checksum pins exact membership
    (reproducibility is the whole point of the operator)."""
    d = tbl(spark, sf, "documents").select("doc_id")
    out = C.shuffle_shards(d, _SHARD, id_col="doc_id")
    return (out.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("id_sum"))
        .orderBy("shard_id"))


_SHARDS_SQL = f"""
WITH h AS (
  SELECT doc_id,
         ((doc_id % 2147483648) * 2654435761) % 4294967296 AS hkey
  FROM documents),
r AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY hkey, doc_id) - 1 AS ridx FROM h)
SELECT CAST(ridx // {_SHARD} AS BIGINT) AS shard_id, COUNT(*) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM r GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# the whole curation pipeline in ONE declarative plan

def cur_pipeline_e2e(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end corpus curation as one Catalyst plan: C4-style quality
    filter -> benchmark decontamination (5-gram overlap vs the held-out
    slice) -> exact fingerprint dedup (keep lowest id) -> deterministic
    4:2:1:1 domain mix -> pack survivors into 256-token chunks. The
    single output row pins the corpus size, chunk map, token total, AND
    an id checksum -- so the oracle proves exactly WHICH documents
    survive the full five-stage pipeline, not just how many."""
    from pyspark.sql import Window as W

    from ..operators import text as T
    d = tbl(spark, sf, "documents")
    bench = d.where(F.col("doc_id") % 19 == 0)
    train = (d.where(F.col("doc_id") % 19 != 0)
             .where(T.quality_score("text") >= 0.66))
    clean = C.decontaminate(train, bench, k=5)
    w = W.partitionBy("fp").orderBy("doc_id")
    deduped = (clean.withColumn("fp", T.fingerprint("text"))
               .withColumn("rn", F.row_number().over(w))
               .where(F.col("rn") == 1))
    mixed = C.domain_mix_sample(deduped, _MIX, domain_col="source",
                                id_col="doc_id")
    toks = (mixed.withColumn("n_tokens", T.token_count("text"))
            .select("doc_id", "n_tokens"))
    packed = C.pack_chunks(toks, _CAP, id_col="doc_id",
                           tokens_col="n_tokens")
    return (packed.agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.countDistinct("chunk_id").alias("n_chunks"),
        F.count(F.lit(1)).alias("n_assignments"),
        F.sum(F.when(F.col("chunk_id") == 0, F.col("n_tokens"))
              .otherwise(0)).cast("bigint").alias("chunk0_tokens"),
        F.sum_distinct(F.col("doc_id")).cast("bigint").alias("id_sum")))


_PIPE_NTOK = "len(regexp_split_to_array(trim(text), '\\s+'))"
_PIPE_Q = f"""
((CASE WHEN length(text) >= 100 AND length(text) <= 20000 THEN 1 ELSE 0 END
  + CASE WHEN CAST(length(text) AS DOUBLE) / greatest({_PIPE_NTOK}, 1) >= 3.0
          AND CAST(length(text) AS DOUBLE) / greatest({_PIPE_NTOK}, 1) <= 12.0
         THEN 1 ELSE 0 END
  + CASE WHEN CAST(length(text) - length(regexp_replace(text,
              '[\\.,;:!\\?]', '', 'g')) AS DOUBLE)
              / greatest(length(text), 1) <= 0.1
         THEN 1 ELSE 0 END)) / 3.0
"""


def _pipeline_sql() -> str:
    wvals = ", ".join(f"('{d}', {w})" for d, w in sorted(_MIX.items()))
    return f"""
WITH grams AS (
  SELECT doc_id, source, text, {_sql_shingles(5)} AS sh FROM documents),
bench AS (
  SELECT DISTINCT g FROM (SELECT unnest(sh) AS g FROM grams
                          WHERE doc_id % 19 = 0) t),
train AS (
  SELECT doc_id, source, text, sh FROM grams
  WHERE doc_id % 19 <> 0 AND {_PIPE_Q} >= 0.66),
bad AS (
  SELECT DISTINCT doc_id FROM (SELECT doc_id, unnest(sh) AS g FROM train) t
  WHERE g IN (SELECT g FROM bench)),
clean AS (SELECT * FROM train WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
dedup AS (
  SELECT doc_id, source, text,
         md5(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))) AS fp
  FROM clean
  QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1),
w(source, wt) AS (VALUES {wvals}),
counts AS (
  SELECT d.source, COUNT(*) AS n, ANY_VALUE(wt) AS wt
  FROM dedup d JOIN w ON d.source = w.source GROUP BY d.source),
budget AS (SELECT MIN(n / wt) AS b FROM counts),
frac AS (
  SELECT source, LEAST(b * wt / n, 1.0) AS keep_frac
  FROM counts CROSS JOIN budget),
mixed AS (
  SELECT d.doc_id, {_PIPE_NTOK} AS n_tokens
  FROM dedup d JOIN frac f ON d.source = f.source
  WHERE CAST(((doc_id % 2147483648) * 2654435761) % 4294967296 AS DOUBLE)
        / 4294967296.0 < keep_frac),
offs AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM mixed),
spans AS (
  SELECT doc_id, n_tokens, CAST(off // {_CAP} AS BIGINT) AS first_c,
         CAST((off + greatest(n_tokens, 1) - 1) // {_CAP} AS BIGINT) AS last_c
  FROM offs),
assign AS (
  SELECT doc_id, n_tokens,
         unnest(generate_series(first_c, last_c)) AS chunk_id
  FROM spans)
SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT chunk_id) AS BIGINT) AS n_chunks,
       COUNT(*) AS n_assignments,
       CAST(SUM(CASE WHEN chunk_id = 0 THEN n_tokens ELSE 0 END)
            AS BIGINT) AS chunk0_tokens,
       CAST(SUM(DISTINCT doc_id) AS BIGINT) AS id_sum
FROM assign
"""

# DuckDB inlines CTEs referenced once and re-executes multi-referenced
# ones per consumer unless MATERIALIZED -- the oracle-side twin of the
# recompute hazard the Spark pipeline solves with stage persists. Without
# these hints the probe measured the normalize chain and span explode
# re-running per consumer (minutes instead of seconds at sf0.01).
_PT_MATERIALIZE = (
    "norm", "lex", "sdocs", "spanned", "corpus", "cdocs", "chs",
    "cbanded", "edges", "lbl", "surv", "ttoks", "unic", "ldocs",
    "qual", "qdocs", "bdocs", "decon",
)


def _pretrain_sql_materialized() -> str:
    sql = _pretrain_sql()
    for name in _PT_MATERIALIZE:
        sql = sql.replace(f"{name} AS (", f"{name} AS MATERIALIZED (", 1)
    return sql


# --------------------------------------------------------------------------
# line-level boilerplate removal: synthetic nav headers (per-source) and a
# global footer are woven around each doc's (unique) body; the operator
# must strip exactly the repeated lines. doc_id % 3 == 0 docs get no
# header and % 2 == 0 no footer, so some pages survive unchanged
# (non-vacuous n_changed) and some lines are genuinely rare. A blank
# line and a whitespace-only line are woven into EVERY page so the
# min_chars short-line exemption (blank separators are never counted
# and never dropped, no matter how many docs share them) is pinned by
# the oracle, not just by the unit test.

_FOOTER = "COPYRIGHT FOOTER ALL RIGHTS RESERVED"


def cur_line_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """RefinedWeb-style line dedup: drop lines repeating across >1 docs
    (operators/curation.remove_boilerplate_lines). Verifies per-lang
    changed-doc counts, surviving char mass, and an md5 over every
    cleaned page -- exact line membership AND order."""
    d = tbl(spark, sf, "documents")
    header = F.when(F.col("doc_id") % 3 > 0,
                    F.concat(F.lit("NAV "), F.col("source"),
                             F.lit(" HOME")))
    footer = F.when(F.col("doc_id") % 2 > 0, F.lit(_FOOTER))
    paged = d.select(
        "doc_id", "lang",
        F.concat_ws("\n", header, F.lit(""), F.col("text"), F.lit("  "),
                    footer).alias("page"))
    out = C.remove_boilerplate_lines(paged, id_col="doc_id",
                                     text_col="page", max_doc_freq=1,
                                     out_col="clean")
    return (out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("clean") != F.col("page")).cast("long"))
        .alias("n_changed"),
        F.sum(F.length("clean")).cast("bigint").alias("sum_chars"),
        F.md5(F.array_join(F.array_sort(F.collect_list(F.md5("clean"))),
                           "")).alias("text_hash"))
        .orderBy("lang"))


_LINE_DEDUP_SQL = f"""
WITH paged AS (
  SELECT doc_id, lang,
         concat_ws(chr(10),
           CASE WHEN doc_id % 3 > 0 THEN 'NAV ' || source || ' HOME' END,
           '', text, '  ',
           CASE WHEN doc_id % 2 > 0 THEN '{_FOOTER}' END) AS page
  FROM documents),
ex AS (
  SELECT doc_id, lang, i AS pos, ls[i] AS line
  FROM (SELECT doc_id, lang, str_split(page, chr(10)) AS ls FROM paged) t,
       unnest(range(1, len(ls) + 1)) AS r(i)),
freq AS (
  SELECT lower(trim(line)) AS nl, COUNT(DISTINCT doc_id) AS dfreq
  FROM ex WHERE len(lower(trim(line))) >= 1 GROUP BY 1),
kept AS (
  SELECT e.doc_id, e.pos, e.line FROM ex e
  LEFT JOIN freq f ON lower(trim(e.line)) = f.nl
  WHERE len(lower(trim(e.line))) < 1 OR f.dfreq <= 1),
rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean
  FROM kept GROUP BY doc_id),
final AS (
  SELECT p.lang, p.page, COALESCE(r.clean, '') AS clean
  FROM paged p LEFT JOIN rebuilt r USING (doc_id))
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN clean <> page THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed,
       CAST(SUM(len(clean)) AS BIGINT) AS sum_chars,
       md5(string_agg(md5(clean), '' ORDER BY md5(clean))) AS text_hash
FROM final GROUP BY lang ORDER BY lang
"""


# --------------------------------------------------------------------------
# hashing-trick quality scorer: 32 pinned dyadic weights (multiples of
# 1/64 -- their double sums are EXACT in any fold order, so both engines
# produce bit-identical scores before the final exp/round)

_QW = [((i * 37) % 41 - 20) / 64.0 for i in range(32)]
_QBIAS = 0.25


def cur_quality_model(spark: SparkSession, sf: str) -> DataFrame:
    """fastText-shaped hashed linear quality scorer with pinned weights
    (operators/curation.hashed_quality_score): per-lang doc counts,
    pass counts at the 0.5 cutoff, and a decimal-exact sum of the
    per-doc scores (rounded to 6dp before the exact decimal sum, so a
    single score drifting one ulp flips the hash)."""
    d = tbl(spark, sf, "documents")
    score = C.hashed_quality_score(F.col("text"), _QW, bias=_QBIAS)
    s = d.select("lang", F.round(score, 6).alias("q"))
    return (s.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("q") >= 0.5).cast("long")).alias("n_pass"),
        F.sum(F.col("q").cast("decimal(12,6)")).cast("double")
        .alias("q_sum"))
        .orderBy("lang"))


def _quality_sql() -> str:
    wlist = ", ".join(f"CAST({w!r} AS DOUBLE)" for w in _QW)
    h60 = "CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT)"
    return f"""
WITH toks AS (
  SELECT lang, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
  FROM documents),
scored AS (
  SELECT lang,
         round(1.0 / (1.0 + exp(-({_QBIAS!r} +
           list_sum(list_transform(tk, t ->
             ([{wlist}])[CAST({h60} % 32 AS INT) + 1]))
           / greatest(len(tk), 1)))), 6) AS q
  FROM toks)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN q >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(SUM(CAST(q AS DECIMAL(12,6))) AS DOUBLE) AS q_sum
FROM scored GROUP BY lang ORDER BY lang
"""


def cur_chunk_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """RAG-style sliding-window chunker (operators/curation.py
    chunk_with_overlap): 16-token windows every 8 tokens. The gate pins,
    per window index, the chunk count, total token mass, and an
    order-insensitive md5 over the chunk texts -- WHICH tokens land in
    which window, not just how many."""
    d = tbl(spark, sf, "documents").select("doc_id", "text")
    out = C.chunk_with_overlap(d, chunk=16, stride=8)
    return (out.groupBy("chunk_no").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        F.md5(F.array_join(
            F.array_sort(F.collect_list(F.md5("chunk_text"))), ""))
        .alias("text_hash"))
        .orderBy("chunk_no"))


_CHUNK_SQL = f"""
WITH docs AS (
  SELECT doc_id, {_SQL_WORDS} AS ts FROM documents),
chunks AS (
  SELECT doc_id, CAST(s / 8 AS BIGINT) AS chunk_no,
         array_to_string(ts[CAST(s + 1 AS INTEGER):CAST(s + 16 AS INTEGER)], ' ')
           AS chunk_text,
         CAST(len(ts[CAST(s + 1 AS INTEGER):CAST(s + 16 AS INTEGER)]) AS BIGINT)
           AS n_tokens
  FROM docs, UNNEST(range(0, greatest(len(ts) - 1, 0) + 1, 8)) AS t(s))
SELECT chunk_no, COUNT(*) AS n_chunks,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       md5(string_agg(md5(chunk_text), '' ORDER BY md5(chunk_text)))
         AS text_hash
FROM chunks GROUP BY chunk_no ORDER BY chunk_no
"""


# --------------------------------------------------------------------------
# sketch-percentile tail drop (CCNet): train the bigram LM on the even
# half, score the odd half, drop docs below the sketched 20th percentile
# of avg log-prob. At gate size the KLL sketch is in its exact regime, so
# the survivor set must EQUAL the exact-percentile filter's -- the oracle
# computes the threshold as the value at 1-indexed rank max(1, ceil(p*n))
# (the sketch's pinned rank convention) and filters exactly.

_PPLX_P = 0.2


def cur_perplexity_filter(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet tail-drop (operators/curation.filter_by_score_percentile
    over operators/text.lm_doc_logprob): per-lang kept-doc counts, the
    decimal-exact sum of kept scores, and an md5 over kept doc ids --
    WHICH docs survive, not just how many."""
    d = tbl(spark, sf, "documents")
    train = d.where(F.col("doc_id") % 2 == 0)
    test = d.where(F.col("doc_id") % 2 == 1)
    bigrams, unigrams, vocab = T.bigram_lm_counts(train)
    scored = T.lm_doc_logprob(test, bigrams, unigrams, vocab, k=0.5)
    # k sized past the gate corpus (250 test docs at sf0.01, 2.5k at
    # sf0.1): KLL is exact-rank AND deterministic only while n <= k --
    # beyond that the compaction coin scatters the threshold across
    # runs, which a hash-pinned oracle cannot tolerate (production
    # keeps the default k=200 and the rank envelope)
    kept = C.filter_by_score_percentile(scored, "avg_logprob",
                                        p=_PPLX_P, keep="above", k=4096)
    j = test.select("doc_id", "lang").join(kept, "doc_id")
    return (j.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.col("avg_logprob").cast("decimal(18,6)")).cast("double")
        .alias("sum_lp"),
        F.md5(F.array_join(F.array_sort(F.collect_list(
            F.col("doc_id").cast("string"))), ",")).alias("id_hash"))
        .orderBy("lang"))


_PPLX_SQL = f"""
WITH train AS (SELECT {{toks}} AS t FROM documents WHERE doc_id % 2 = 0),
test AS (SELECT doc_id, lang, {{toks}} AS t FROM documents
         WHERE doc_id % 2 = 1),
tbig AS (
  SELECT t[i] AS w1, t[i+1] AS w2
  FROM train, UNNEST(range(1, len(t))) AS r(i)),
bigc AS (SELECT w1, w2, COUNT(*) AS c12 FROM tbig GROUP BY w1, w2),
unic AS (SELECT w1, COUNT(*) AS c1
         FROM (SELECT unnest(t) AS w1 FROM train) GROUP BY w1),
v AS (SELECT COUNT(*) AS vocab FROM unic),
sbig AS (
  SELECT doc_id, lang, t[i] AS w1, t[i+1] AS w2
  FROM test, UNNEST(range(1, len(t))) AS r(i)),
terms AS (
  SELECT s.doc_id, s.lang,
         round(ln((COALESCE(b.c12, 0) + 0.5)
                  / (COALESCE(u.c1, 0) + 0.5 * (SELECT vocab FROM v))), 9)
           AS lp
  FROM sbig s
  LEFT JOIN bigc b ON s.w1 = b.w1 AND s.w2 = b.w2
  LEFT JOIN unic u ON s.w1 = u.w1),
docs AS (
  SELECT doc_id, lang,
         round(CAST(SUM(CAST(lp AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*), 6)
           AS avg_lp
  FROM terms GROUP BY doc_id, lang),
thr AS (
  SELECT avg_lp AS t FROM docs ORDER BY avg_lp
  LIMIT 1 OFFSET greatest(CAST(ceil({_PPLX_P} * (SELECT COUNT(*) FROM docs))
                               AS BIGINT), 1) - 1),
kept AS (SELECT * FROM docs WHERE avg_lp >= (SELECT t FROM thr))
SELECT lang, COUNT(*) AS n_kept,
       CAST(SUM(CAST(avg_lp AS DECIMAL(18,6))) AS DOUBLE) AS sum_lp,
       md5(string_agg(CAST(doc_id AS VARCHAR), ','
                      ORDER BY CAST(doc_id AS VARCHAR))) AS id_hash
FROM kept GROUP BY lang ORDER BY lang
""".format(toks="regexp_split_to_array(trim(text), '\\s+')")




# --------------------------------------------------------------------------
# THE CAPSTONE: the full pretraining pipeline composed as ONE plan.
# Pages get the line-dedup fodder (nav headers / global footer), the
# normalization fodder (_DIRT mojibake/controls on odd ids), and the raw
# corpus's organic near-dups; the pipeline then runs normalize -> line
# dedup -> span excision -> collapse+LSH survivors -> CCNet tail-drop ->
# quality cutoff -> fuzzy decontamination vs a bench split -> 4:2:1:1
# domain mix -> 256-token packing. The oracle re-derives EVERY stage in
# DuckDB from the shared fragment builders and pins the final
# (doc, chunk) assignment hash -- one value check over the whole
# composition.

_PT_CAP = 256


def cur_pretrain_e2e(spark: SparkSession, sf: str) -> DataFrame:
    """Composed pretraining pipeline (operators/curation.py
    pretrain_pipeline): single-row gate pinning chunk counts,
    assignment counts, kept-doc counts, token mass, and an
    order-insensitive md5 over every (doc, chunk) assignment."""
    from .text import _DIRT
    d = tbl(spark, sf, "documents")
    header = F.when(F.col("doc_id") % 3 > 0,
                    F.concat(F.lit("NAV "), F.col("source"),
                             F.lit(" HOME")))
    footer = F.when(F.col("doc_id") % 2 > 0, F.lit(_FOOTER))
    dirt = F.when(F.col("doc_id") % 2 > 0,
                  F.lit(" " + _DIRT)).otherwise(F.lit(""))
    paged = d.select(
        "doc_id", "lang", "source",
        F.concat_ws("\n", header, F.lit(""),
                    F.concat(F.col("text"), dirt), footer).alias("text"))
    bench = d.where(F.col("doc_id") % 19 == 0).select("doc_id", "text")
    packed = C.pretrain_pipeline(
        paged, bench=bench, span=20, pplx_p=_PPLX_P, pplx_sketch_k=4096,
        quality_weights=_QW, quality_bias=_QBIAS, quality_cutoff=0.5,
        mix_weights=_MIX, capacity=_PT_CAP)
    pair = F.concat_ws(":", F.col("doc_id").cast("string"),
                       F.col("chunk_id").cast("string"))
    return packed.agg(
        F.countDistinct("chunk_id").alias("n_chunks"),
        F.count(F.lit(1)).cast("bigint").alias("n_assignments"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("_n_tokens").cast("bigint").alias("tok_mass"),
        F.md5(F.array_join(F.array_sort(F.collect_list(F.md5(pair))), ""))
        .alias("assign_hash"))


def _pretrain_sql() -> str:
    from ..operators.text import normalize_text_sql_stages, sql_string_lit
    from .dedup import _sql_bands, _sql_h60, _sql_minhash
    from .text import _DIRT

    def shingles(col: str) -> str:
        w = f"regexp_split_to_array(trim({col}), '\\s+')"
        return (f"CASE WHEN len({w}) >= 3 THEN "
                f"list_distinct(list_transform(range(1, len({w}) - 1), "
                f"i -> array_to_string(({w})[i:i+2], ' '))) "
                f"ELSE [trim({col})] END")

    h0 = _sql_h60("concat('0|', s)")
    wlist = ", ".join(f"CAST({w!r} AS DOUBLE)" for w in _QW)
    qh60 = "CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT)"
    span = 20
    norm_stages = normalize_text_sql_stages("page")
    norm_ctes = []
    prev = "paged"
    for i, st in enumerate(norm_stages):
        norm_ctes.append(f"n{i} AS (SELECT doc_id, lang, source, {st} "
                         f"AS _nrm FROM {prev})")
        prev = f"n{i}"
    norm_block = ",\n".join(norm_ctes)

    return f"""
WITH RECURSIVE paged AS (
  SELECT doc_id, lang, source,
         concat_ws(chr(10),
           CASE WHEN doc_id % 3 > 0 THEN 'NAV ' || source || ' HOME' END,
           '',
           text || CASE WHEN doc_id % 2 > 0
                        THEN ' ' || {sql_string_lit(_DIRT)} ELSE '' END,
           CASE WHEN doc_id % 2 > 0 THEN '{_FOOTER}' END) AS page
  FROM documents),
{norm_block},
norm AS (SELECT doc_id, lang, source, _nrm AS t0 FROM {prev}),
-- line dedup (min_chars exemption, doc-freq > 1 dropped)
lex AS (
  SELECT doc_id, i AS pos, ls[i] AS line
  FROM (SELECT doc_id, str_split(t0, chr(10)) AS ls FROM norm) t,
       unnest(range(1, len(ls) + 1)) AS r(i)),
lfreq AS (
  SELECT lower(trim(line)) AS nl, COUNT(DISTINCT doc_id) AS dfreq
  FROM lex WHERE len(lower(trim(line))) >= 1 GROUP BY 1),
lkept AS (
  SELECT e.doc_id, e.pos, e.line FROM lex e
  LEFT JOIN lfreq f ON lower(trim(e.line)) = f.nl
  WHERE len(lower(trim(e.line))) < 1 OR f.dfreq <= 1),
lreb AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS t1
  FROM lkept GROUP BY doc_id),
lined AS (
  SELECT n.doc_id, n.lang, n.source, COALESCE(r.t1, '') AS t1
  FROM norm n LEFT JOIN lreb r USING (doc_id)),
-- span excision (ExactSubstr, span={span})
sdocs AS (
  SELECT doc_id, lang, source,
         regexp_split_to_array(trim(t1), '\\s+') AS ts
  FROM lined),
sgrams AS (
  SELECT doc_id, i - 1 AS pos,
         {_sql_h60(f"array_to_string(ts[i:i+{span - 1}], ' ')")} AS gh
  FROM sdocs, UNNEST(range(1, len(ts) - {span} + 2)) AS t(i)),
sdup AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           ROW_NUMBER() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn
    FROM sgrams) WHERE rn >= 2),
scov AS (
  SELECT DISTINCT doc_id, pos + d AS idx
  FROM sdup, UNNEST(range(0, {span})) AS t(d)),
stoks AS (
  SELECT doc_id, ts[CAST(i AS INTEGER)] AS tok, CAST(i AS INTEGER) - 1 AS idx
  FROM sdocs, UNNEST(range(1, len(ts) + 1)) AS t(i)),
skept AS (
  SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.idx) AS clean
  FROM stoks t LEFT JOIN scov c ON t.doc_id = c.doc_id AND t.idx = c.idx
  WHERE c.idx IS NULL GROUP BY t.doc_id),
spanned AS (
  SELECT d.doc_id, d.lang, d.source, COALESCE(k.clean, '') AS t2
  FROM sdocs d LEFT JOIN skept k USING (doc_id)),
-- collapse byte-identical texts to min-id reps
reps AS (SELECT MIN(doc_id) AS doc_id FROM spanned GROUP BY md5(t2)),
corpus AS (SELECT s.* FROM spanned s JOIN reps USING (doc_id)),
-- MinHash+LSH pairs over reps, CC, min-id survivors
cdocs AS (SELECT doc_id AS id, {shingles('t2')} AS sh FROM corpus),
chs AS (
  SELECT id, list_distinct(list_transform(sh, s -> {h0})) AS hs
  FROM cdocs),
csigs AS (SELECT id, {_sql_minhash(16)} AS sig FROM cdocs),
cbanded AS (SELECT id, unnest({_sql_bands(8, 2)}) AS band_sig FROM csigs),
ccand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM cbanded a JOIN cbanded b
    ON a.band_sig = b.band_sig AND a.id < b.id),
cpairs AS (
  SELECT id_a, id_b
  FROM ccand JOIN chs da ON ccand.id_a = da.id
             JOIN chs db ON ccand.id_b = db.id
  WHERE round(CAST(len(list_intersect(da.hs, db.hs)) AS DOUBLE)
        / len(list_distinct(list_concat(da.hs, db.hs))), 6) >= 0.5),
edges AS (
  SELECT id_a AS u, id_b AS v FROM cpairs
  UNION SELECT id_b, id_a FROM cpairs),
reach(u, comp) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
  UNION
  SELECT e.u, r.comp FROM edges e JOIN reach r ON e.v = r.u),
lbl AS (SELECT u, MIN(comp) AS comp FROM reach GROUP BY u),
keepc AS (SELECT comp, MIN(u) AS keep_id FROM lbl GROUP BY comp),
dropsc AS (SELECT u FROM lbl JOIN keepc USING (comp) WHERE u <> keep_id),
surv AS (
  SELECT c.* FROM corpus c
  WHERE doc_id NOT IN (SELECT u FROM dropsc)),
-- bigram LM trained on the surviving corpus, scored on itself
ttoks AS (
  SELECT doc_id, regexp_split_to_array(trim(t2), '\\s+') AS t FROM surv),
tbig AS (
  SELECT t[i] AS w1, t[i+1] AS w2
  FROM ttoks, UNNEST(range(1, len(t))) AS r(i)),
bigc AS (SELECT w1, w2, COUNT(*) AS c12 FROM tbig GROUP BY w1, w2),
unic AS (SELECT w1, COUNT(*) AS c1
         FROM (SELECT unnest(t) AS w1 FROM ttoks) GROUP BY w1),
v AS (SELECT COUNT(*) AS vocab FROM unic),
sbig AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
  FROM ttoks, UNNEST(range(1, len(t))) AS r(i)),
terms AS (
  SELECT s.doc_id,
         round(ln((COALESCE(b.c12, 0) + 0.5)
                  / (COALESCE(u.c1, 0) + 0.5 * (SELECT vocab FROM v))), 9)
           AS lp
  FROM sbig s
  LEFT JOIN bigc b ON s.w1 = b.w1 AND s.w2 = b.w2
  LEFT JOIN unic u ON s.w1 = u.w1),
ldocs AS (
  SELECT doc_id,
         round(CAST(SUM(CAST(lp AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*), 6)
           AS avg_lp
  FROM terms GROUP BY doc_id),
thr AS (
  SELECT avg_lp AS t FROM ldocs ORDER BY avg_lp
  LIMIT 1 OFFSET greatest(CAST(ceil({_PPLX_P} *
    (SELECT COUNT(*) FROM ldocs)) AS BIGINT), 1) - 1),
pplx AS (
  SELECT s.* FROM surv s JOIN ldocs l USING (doc_id)
  WHERE l.avg_lp >= (SELECT t FROM thr)),
-- quality cutoff (z >= 0, exact dyadic arithmetic)
qual AS (
  SELECT * FROM pplx
  WHERE ({_QBIAS!r} +
         list_sum(list_transform(
           regexp_split_to_array(lower(trim(t2)), '\\s+'), t ->
           ([{wlist}])[CAST({qh60} % 32 AS INT) + 1]))
         / greatest(len(regexp_split_to_array(lower(trim(t2)),
                                              '\\s+')), 1)) >= 0.0),
-- fuzzy decontamination vs the raw bench split (doc_id % 19 = 0)
bdocs AS (SELECT doc_id AS id, {shingles('text')} AS sh
          FROM documents WHERE doc_id % 19 = 0),
qdocs AS (SELECT doc_id AS id, {shingles('t2')} AS sh FROM qual),
bhs AS (SELECT id, list_distinct(list_transform(sh, s -> {h0})) AS hs
        FROM bdocs),
qhs AS (SELECT id, list_distinct(list_transform(sh, s -> {h0})) AS hs
        FROM qdocs),
bsigs AS (SELECT id, {_sql_minhash(16)} AS sig FROM bdocs),
qsigs AS (SELECT id, {_sql_minhash(16)} AS sig FROM qdocs),
bbands AS (SELECT id, unnest({_sql_bands(8, 2)}) AS band_sig FROM bsigs),
qbands AS (SELECT id, unnest({_sql_bands(8, 2)}) AS band_sig FROM qsigs),
dcand AS (
  SELECT DISTINCT b.id AS bench_id, q.id AS train_id
  FROM bbands b JOIN qbands q ON b.band_sig = q.band_sig),
dver AS (
  SELECT DISTINCT train_id FROM dcand
  JOIN bhs ON dcand.bench_id = bhs.id
  JOIN qhs ON dcand.train_id = qhs.id
  WHERE round(CAST(len(list_intersect(bhs.hs, qhs.hs)) AS DOUBLE)
        / len(list_distinct(list_concat(bhs.hs, qhs.hs))), 6) >= 0.5),
decon AS (
  SELECT * FROM qual
  WHERE doc_id NOT IN (SELECT train_id FROM dver)),
-- 4:2:1:1 domain mix (deterministic id-hash sampler)
w(source, wt) AS (VALUES {", ".join(f"('{d}', {w})"
                                    for d, w in sorted(_MIX.items()))}),
counts AS (
  SELECT d.source, COUNT(*) AS n, ANY_VALUE(wt) AS wt
  FROM decon d JOIN w ON d.source = w.source GROUP BY d.source),
budget AS (SELECT MIN(n / wt) AS b FROM counts),
frac AS (
  SELECT source, LEAST(b * wt / n, 1.0) AS keep_frac
  FROM counts CROSS JOIN budget),
mixed AS (
  SELECT d.* FROM decon d JOIN frac f ON d.source = f.source
  WHERE CAST(((doc_id % 2147483648) * 2654435761) % 4294967296 AS DOUBLE)
        / 4294967296.0 < f.keep_frac),
-- pack into {_PT_CAP}-token chunks in doc_id order
ptoks AS (
  SELECT doc_id, len(regexp_split_to_array(trim(t2), '\\s+')) AS n_tokens
  FROM mixed),
offs AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM ptoks),
spans2 AS (
  SELECT doc_id, n_tokens, CAST(off // {_PT_CAP} AS BIGINT) AS first_c,
         CAST((off + greatest(n_tokens, 1) - 1) // {_PT_CAP} AS BIGINT)
           AS last_c
  FROM offs),
assign AS (
  SELECT doc_id, n_tokens,
         unnest(generate_series(first_c, last_c)) AS chunk_id
  FROM spans2)
SELECT COUNT(DISTINCT chunk_id) AS n_chunks,
       COUNT(*) AS n_assignments,
       COUNT(DISTINCT doc_id) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tok_mass,
       md5(string_agg(
         md5(concat_ws(':', CAST(doc_id AS VARCHAR),
                       CAST(chunk_id AS VARCHAR))), ''
         ORDER BY md5(concat_ws(':', CAST(doc_id AS VARCHAR),
                                CAST(chunk_id AS VARCHAR))))) AS assign_hash
FROM assign
"""


def cur_domain_cap(spark: SparkSession, sf: str) -> DataFrame:
    """Per-domain document cap (operators/curation.cap_per_key): at
    most 30 docs per source survive, selected by the deterministic
    (u01_hash, id) order -- the oracle re-derives the identical
    survivor set through its single-window formulation, proving the
    skew-safe two-level top-k is value-identical."""
    d = tbl(spark, sf, "documents").select("doc_id", "source")
    kept = C.cap_per_key(d, 30, key_col="source", id_col="doc_id")
    return (kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.bit_xor("doc_id").alias("id_xor"))
        .orderBy("source"))


_DOMAIN_CAP_SQL = """
WITH r AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source ORDER BY
           CAST(((doc_id % 2147483648) * 2654435761) % 4294967296
                AS DOUBLE) / 4294967296.0,
           doc_id) AS rn
  FROM documents)
SELECT source, COUNT(*) AS n_kept, bit_xor(doc_id) AS id_xor
FROM r WHERE rn <= 30 GROUP BY source ORDER BY source
"""


def cur_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted sampling without replacement (curation.weighted_sample,
    Efraimidis-Spirakis): 60 docs sampled with probability ∝ token
    count. The oracle re-derives the ln(u01)/w keys and the identical
    survivor set (per-lang count + id_xor + token mass)."""
    from ..operators.text import token_count
    d = (tbl(spark, sf, "documents").select("doc_id", "lang", "text")
         .withColumn("w", token_count("text")))
    kept = C.weighted_sample(d, 60, weight_col="w", id_col="doc_id")
    return (kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.bit_xor("doc_id").alias("id_xor"),
        F.sum("w").cast("bigint").alias("tok_mass"))
        .orderBy("lang"))


_WEIGHTED_SAMPLE_SQL = """
WITH base AS (
  SELECT doc_id, lang,
         len(regexp_split_to_array(trim(text), '\\s+')) AS w,
         CAST(((doc_id % 2147483648) * 2654435761) % 4294967296
              AS DOUBLE) / 4294967296.0 AS u
  FROM documents),
keyed AS (
  SELECT doc_id, lang, w,
         round(ln(u) / w, 12) AS k
  FROM base WHERE w > 0 AND u > 0),
top AS (SELECT * FROM keyed ORDER BY k DESC, doc_id LIMIT 60)
SELECT lang, COUNT(*) AS n_kept, bit_xor(doc_id) AS id_xor,
       CAST(SUM(w) AS BIGINT) AS tok_mass
FROM top GROUP BY lang ORDER BY lang
"""


# --------------------------------------------------------------------------
# span-level decontamination: excise only the leaked benchmark k-grams,
# keep the clean remainder (vs cur_decontaminate's whole-doc drop)

def cur_decontaminate_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Span-level decontamination (operators/dedup.py
    excise_contaminated_spans): the benchmark slice's 5-gram hashes are
    the broadcast index; every covered token of the train side is
    excised and the CLEANED text is pinned (per-lang doc counts, char
    mass, and a cleaned-page md5 -- one flipped token anywhere flips
    the hash). The oracle re-derives gram hashes, hit positions, the
    covered-token union and the rebuilt pages."""
    from ..operators import dedup as D
    d = tbl(spark, sf, "documents").select("doc_id", "lang", "text")
    bench = d.where(F.col("doc_id") % 19 == 0)
    train = d.where(F.col("doc_id") % 19 != 0)
    out = D.excise_contaminated_spans(train, bench, k=5,
                                      out_col="clean")
    return (out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("clean")).cast("bigint").alias("sum_chars"),
        F.md5(F.array_join(F.array_sort(F.collect_list(
            F.md5("clean"))), "")).alias("text_hash"))
        .orderBy("lang"))


def _decon_spans_sql() -> str:
    from .dedup import _sql_h60
    k = 5
    return f"""
WITH docs AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents),
cidx AS (
  SELECT DISTINCT {_sql_h60(f"array_to_string(ts[i:i+{k - 1}], ' ')")}
         AS gh
  FROM docs, UNNEST(range(1, len(ts) - {k} + 2)) AS t(i)
  WHERE doc_id % 19 = 0),
sgrams AS (
  SELECT doc_id, i - 1 AS pos,
         {_sql_h60(f"array_to_string(ts[i:i+{k - 1}], ' ')")} AS gh
  FROM docs, UNNEST(range(1, len(ts) - {k} + 2)) AS t(i)
  WHERE doc_id % 19 <> 0),
hits AS (SELECT doc_id, pos FROM sgrams WHERE gh IN (SELECT gh FROM cidx)),
covered AS (
  SELECT DISTINCT doc_id, pos + d AS idx
  FROM hits, UNNEST(range(0, {k})) AS t(d)),
toks AS (
  SELECT doc_id, ts[CAST(i AS INTEGER)] AS tok, CAST(i AS INTEGER) - 1 AS idx
  FROM docs, UNNEST(range(1, len(ts) + 1)) AS t(i)
  WHERE doc_id % 19 <> 0),
kept AS (
  SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.idx) AS clean
  FROM toks t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.idx = c.idx
  WHERE c.idx IS NULL GROUP BY t.doc_id),
cleaned AS (
  SELECT d.doc_id, d.lang, COALESCE(kp.clean, '') AS clean
  FROM docs d LEFT JOIN kept kp USING (doc_id) WHERE d.doc_id % 19 <> 0)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(clean)) AS BIGINT) AS sum_chars,
       md5(string_agg(md5(clean), '' ORDER BY md5(clean))) AS text_hash
FROM cleaned GROUP BY lang ORDER BY lang
"""


# --------------------------------------------------------------------------
# per-language routing (CCNet's real protocol): one LM per language, one
# percentile threshold per language. The documents table mixes 5 languages
# with disjoint vocabularies, so a GLOBAL LM would score minority
# languages as out-of-distribution and a global 20% tail-drop would strip
# them disproportionately; the per-language mode judges every doc under
# its own language's model and drops each language's own worst 20%.

def cur_pretrain_multilang(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language tail-drop composition (operators/text.py
    bigram_lm_counts/lm_doc_logprob with group_cols, operators/
    curation.py filter_by_score_percentile with group_col): per-lang
    kept counts, decimal-exact kept-score sums, and an md5 over kept
    doc ids -- WHICH docs survive each language's own threshold."""
    d = tbl(spark, sf, "documents")
    train = d.where(F.col("doc_id") % 2 == 0)
    test = d.where(F.col("doc_id") % 2 == 1)
    bigrams, unigrams, vocab = T.bigram_lm_counts(train,
                                                  group_cols=["lang"])
    scored = T.lm_doc_logprob(test, bigrams, unigrams, vocab, k=0.5,
                              group_cols=["lang"])
    scored = scored.join(test.select("doc_id", "lang"), "doc_id")
    kept = C.filter_by_score_percentile(scored, "avg_logprob",
                                        p=_PPLX_P, keep="above",
                                        k=4096, group_col="lang")
    return (kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.col("avg_logprob").cast("decimal(18,6)")).cast("double")
        .alias("sum_lp"),
        F.md5(F.array_join(F.array_sort(F.collect_list(
            F.col("doc_id").cast("string"))), ",")).alias("id_hash"))
        .orderBy("lang"))


_MULTILANG_SQL = f"""
WITH train AS (SELECT lang, {{toks}} AS t FROM documents
               WHERE doc_id % 2 = 0),
test AS (SELECT doc_id, lang, {{toks}} AS t FROM documents
         WHERE doc_id % 2 = 1),
tbig AS (
  SELECT lang, t[i] AS w1, t[i+1] AS w2
  FROM train, UNNEST(range(1, len(t))) AS r(i)),
bigc AS (SELECT lang, w1, w2, COUNT(*) AS c12 FROM tbig
         GROUP BY lang, w1, w2),
unic AS (SELECT lang, w1, COUNT(*) AS c1
         FROM (SELECT lang, unnest(t) AS w1 FROM train)
         GROUP BY lang, w1),
v AS (SELECT lang, COUNT(*) AS vocab FROM unic GROUP BY lang),
sbig AS (
  SELECT doc_id, lang, t[i] AS w1, t[i+1] AS w2
  FROM test, UNNEST(range(1, len(t))) AS r(i)),
terms AS (
  SELECT s.doc_id, s.lang,
         round(ln((COALESCE(b.c12, 0) + 0.5)
                  / (COALESCE(u.c1, 0) + 0.5 * vv.vocab)), 9) AS lp
  FROM sbig s
  LEFT JOIN bigc b ON s.lang = b.lang AND s.w1 = b.w1 AND s.w2 = b.w2
  LEFT JOIN unic u ON s.lang = u.lang AND s.w1 = u.w1
  LEFT JOIN v vv ON s.lang = vv.lang),
docs AS (
  SELECT doc_id, lang,
         round(CAST(SUM(CAST(lp AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*), 6)
           AS avg_lp
  FROM terms GROUP BY doc_id, lang),
r AS (
  SELECT doc_id, lang, avg_lp,
         row_number() OVER (PARTITION BY lang ORDER BY avg_lp) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS cnt
  FROM docs),
thr AS (
  SELECT lang,
         MAX(CASE WHEN rn = greatest(CAST(ceil({_PPLX_P} * cnt) AS BIGINT),
                                     1)
                  THEN avg_lp END) AS t
  FROM r GROUP BY lang),
kept AS (
  SELECT d.* FROM docs d JOIN thr ON d.lang = thr.lang
  WHERE d.avg_lp >= thr.t)
SELECT lang, COUNT(*) AS n_kept,
       CAST(SUM(CAST(avg_lp AS DECIMAL(18,6))) AS DOUBLE) AS sum_lp,
       md5(string_agg(CAST(doc_id AS VARCHAR), ','
                      ORDER BY CAST(doc_id AS VARCHAR))) AS id_hash
FROM kept GROUP BY lang ORDER BY lang
""".format(toks="regexp_split_to_array(trim(text), '\\s+')")


# --------------------------------------------------------------------------
# in-engine quality-classifier training: 3 full-batch logistic-regression
# steps over the hashing-trick bucket family, labels = (lang == 'en').
# Every step's arithmetic is a Spark expression under the cross-engine
# discipline (per-term round -> decimal sum -> one double division ->
# round-12 update), so the oracle UNROLLS the identical steps as chained
# CTEs and the trained weight vector must match bit-for-bit.

_QT_STEPS = 3


def cur_quality_train(spark: SparkSession, sf: str) -> DataFrame:
    """In-engine classifier training (operators/curation.py
    train_hashed_quality): pins the full trained model -- all 32 bucket
    weights plus the bias (bucket -1) after 3 deterministic gradient
    steps. The weights drop straight into hashed_quality_score /
    pretrain_pipeline's cutoff; this closes the one 'trained offline'
    model seam the pipeline had left."""
    d = tbl(spark, sf, "documents")
    lab = d.withColumn("y", (F.col("lang") == "en").cast("int"))
    w, b = C.train_hashed_quality(lab, label_col="y", n_buckets=32,
                                  steps=_QT_STEPS, lr=0.5)
    rows = [(i, float(x)) for i, x in enumerate(w)] + [(-1, float(b))]
    return (local_df(spark, rows, "bucket bigint, weight double")
            .select("bucket", F.round("weight", 9).alias("weight"))
            .orderBy("bucket"))


def _quality_train_sql(steps: int = _QT_STEPS) -> str:
    h60 = "CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT)"
    head = f"""
WITH docs AS (
  SELECT doc_id AS id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
  FROM documents),
toks AS (SELECT id, y, len(tk) AS n, unnest(tk) AS t FROM docs),
bt AS (SELECT id, y, n, CAST({h60} % 32 AS INT) AS bucket FROM toks),
feats AS (SELECT id, y, n, bucket, COUNT(*) AS cnt
          FROM bt GROUP BY id, y, n, bucket),
nn AS (SELECT COUNT(DISTINCT id) AS nd FROM feats),
w0 AS (SELECT unnest(range(0, 32)) AS bucket, CAST(0 AS DOUBLE) AS w),
b0 AS (SELECT CAST(0 AS DOUBLE) AS bias)"""
    blocks = []
    for k in range(1, steps + 1):
        blocks.append(f"""
z{k} AS (
  SELECT f.id, f.y,
         (SELECT bias FROM b{k - 1})
         + CAST(SUM(CAST(round(w.w * (f.cnt / greatest(f.n, 1)), 9)
                         AS DECIMAL(28,9))) AS DOUBLE) AS z
  FROM feats f JOIN w{k - 1} w USING (bucket) GROUP BY f.id, f.y),
e{k} AS (SELECT id, round(1.0 / (1.0 + exp(-z)), 9) - y AS err
         FROM z{k}),
g{k} AS (
  SELECT f.bucket,
         SUM(CAST(round(e.err * (f.cnt / greatest(f.n, 1)), 12)
                  AS DECIMAL(28,12))) AS g
  FROM feats f JOIN e{k} e USING (id) GROUP BY f.bucket),
w{k} AS (
  SELECT w.bucket,
         w.w - 0.5 * round(CAST(COALESCE(g.g, 0) AS DOUBLE)
                           / (SELECT nd FROM nn), 12) AS w
  FROM w{k - 1} w LEFT JOIN g{k} g USING (bucket)),
b{k} AS (
  SELECT (SELECT bias FROM b{k - 1})
         - 0.5 * round(CAST(SUM(CAST(err AS DECIMAL(28,9))) AS DOUBLE)
                       / (SELECT nd FROM nn), 12) AS bias
  FROM e{k})"""
        )
    tail = f"""
SELECT CAST(bucket AS BIGINT) AS bucket, round(w, 9) AS weight
FROM w{steps}
UNION ALL
SELECT CAST(-1 AS BIGINT) AS bucket, round(bias, 9) AS weight
FROM b{steps}
ORDER BY bucket"""
    return head + "," + ",".join(blocks) + tail


# --------------------------------------------------------------------------
# URL canonicalization + URL dedup (operators/web.py): every doc gets a
# deterministic dirty URL -- four surface variants (case-varying host,
# explicit :443, www. + fbclid, fragment + utm reorder) that all
# canonicalize to the same target when doc_id % 25 matches; dedup keeps
# the longest doc per canonical URL (ties to the lowest id). The oracle
# re-implements the full canonicalization pipeline stage by stage.

def cur_url_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """URL-level dedup gate: pins per-lang survivor counts, the id xor
    (WHICH rows won), the distinct canonical-URL count, and an
    order-insensitive md5 over every canonical URL string."""
    from ..operators import web as Wb
    d = tbl(spark, sf, "documents")
    grp = (F.col("doc_id") % 25).cast("string")
    v = F.col("doc_id") % 4
    url = (F.when(v == 0, F.concat(
        F.lit("https://Example.COM/p/"), grp, F.lit("?b=2&a=1")))
        .when(v == 1, F.concat(
            F.lit("https://example.com:443/p/"), grp,
            F.lit("/?a=1&utm_source=news&b=2")))
        .when(v == 2, F.concat(
            F.lit("https://www.example.com/p/"), grp,
            F.lit("?a=1&b=2&fbclid=xyz")))
        .otherwise(F.concat(
            F.lit("HTTPS://EXAMPLE.com/p/"), grp,
            F.lit("?b=2&a=1#frag"))))
    docs = d.select("doc_id", "lang", "n_chars", url.alias("url"))
    kept = Wb.url_dedup(docs, score_col="n_chars", strip_www=True)
    return (kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.bit_xor("doc_id").alias("id_xor"),
        F.countDistinct("canon_url").alias("n_urls"),
        F.md5(F.array_join(F.array_sort(F.collect_list(
            F.md5("canon_url"))), "")).alias("url_hash"))
        .orderBy("lang"))


_URL_DEDUP_SQL = """
WITH urls AS (
  SELECT doc_id, lang, n_chars,
         CASE CAST(doc_id % 4 AS INT)
           WHEN 0 THEN 'https://Example.COM/p/'
                       || CAST(doc_id % 25 AS VARCHAR) || '?b=2&a=1'
           WHEN 1 THEN 'https://example.com:443/p/'
                       || CAST(doc_id % 25 AS VARCHAR)
                       || '/?a=1&utm_source=news&b=2'
           WHEN 2 THEN 'https://www.example.com/p/'
                       || CAST(doc_id % 25 AS VARCHAR)
                       || '?a=1&b=2&fbclid=xyz'
           ELSE 'HTTPS://EXAMPLE.com/p/'
                || CAST(doc_id % 25 AS VARCHAR) || '?b=2&a=1#frag'
         END AS url
  FROM documents),
s1 AS (
  SELECT *, split_part(url, '#', 1) AS nofrag FROM urls),
s2 AS (
  SELECT *, split_part(nofrag, '?', 1) AS base,
         CASE WHEN contains(nofrag, '?')
              THEN split_part(nofrag, '?', 2) ELSE '' END AS qs
  FROM s1),
s3 AS (
  SELECT *, lower(split_part(base, '://', 1)) AS scheme,
         substring(base, length(split_part(base, '://', 1)) + 4) AS rest
  FROM s2),
s4 AS (
  SELECT *, lower(split_part(rest, '/', 1)) AS hostport,
         substring(rest, length(split_part(rest, '/', 1)) + 1) AS path0
  FROM s3),
s5 AS (
  SELECT *,
         regexp_replace(
           CASE WHEN scheme = 'http'
                  THEN regexp_replace(hostport, ':80$', '')
                WHEN scheme = 'https'
                  THEN regexp_replace(hostport, ':443$', '')
                ELSE hostport END, '^www\\.', '') AS host,
         regexp_replace(path0, '/$', '') AS path,
         list_sort(list_filter(string_split(qs, '&'),
           p -> p <> ''
                AND NOT (starts_with(split_part(p, '=', 1), 'utm_')
                         OR split_part(p, '=', 1) IN
                            ('fbclid', 'gclid', 'msclkid', 'ref',
                             'igshid', 'mc_cid', 'mc_eid')))) AS params
  FROM s4),
canon AS (
  SELECT doc_id, lang, n_chars,
         scheme || '://' || host || path
         || CASE WHEN len(params) > 0
                 THEN '?' || array_to_string(params, '&')
                 ELSE '' END AS canon_url
  FROM s5),
kept AS (
  SELECT doc_id, lang, canon_url,
         row_number() OVER (PARTITION BY canon_url
                            ORDER BY n_chars DESC, doc_id) AS _rn
  FROM canon QUALIFY _rn = 1)
SELECT lang, COUNT(*) AS n_kept, bit_xor(doc_id) AS id_xor,
       COUNT(DISTINCT canon_url) AS n_urls,
       md5(string_agg(md5(canon_url), '' ORDER BY md5(canon_url)))
         AS url_hash
FROM kept GROUP BY lang ORDER BY lang
"""


def cur_winsorize(spark: SparkSession, sf: str) -> DataFrame:
    """Percentile clipping gate (operators/curation.winsorize): event
    values clipped per type at the P10/P90 sketched thresholds
    (k sized past every group, so the exact-rank regime holds). Pins
    row counts, clip counts on BOTH tails, and the decimal-exact sum
    of the clipped column."""
    e = tbl(spark, sf, "events").select("event_type", "value")
    w = C.winsorize(e, "value", p_lo=0.1, p_hi=0.9,
                    group_col="event_type", k=32768, out_col="cv")
    return (w.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("cv") > F.col("value")).cast("long"))
        .alias("n_clip_lo"),
        F.sum((F.col("cv") < F.col("value")).cast("long"))
        .alias("n_clip_hi"),
        F.sum(F.col("cv").cast("decimal(14,2)")).cast("double")
        .alias("sum_clipped"))
        .orderBy("event_type"))


_WINSORIZE_SQL = """
WITH n AS (SELECT event_type, COUNT(*) AS ng FROM events GROUP BY 1),
ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value)
           AS r
  FROM events),
thr AS (
  SELECT r.event_type,
         MAX(CASE WHEN r.r = greatest(CAST(ceil(0.1 * n.ng) AS BIGINT),
                                      1) THEN r.value END) AS lo,
         MAX(CASE WHEN r.r = greatest(CAST(ceil(0.9 * n.ng) AS BIGINT),
                                      1) THEN r.value END) AS hi
  FROM ranked r JOIN n ON r.event_type = n.event_type
  GROUP BY r.event_type),
clip AS (
  SELECT e.event_type, e.value,
         LEAST(GREATEST(e.value, t.lo), t.hi) AS cv
  FROM events e JOIN thr t USING (event_type))
SELECT event_type, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN cv > value THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clip_lo,
       CAST(SUM(CASE WHEN cv < value THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clip_hi,
       CAST(SUM(CAST(cv AS DECIMAL(14,2))) AS DOUBLE) AS sum_clipped
FROM clip GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Data-quality expectation suite (operators/expectations.expect): orders
# gains five planted violation rows (a duplicated key, a NULL custkey,
# a negative price, a bogus priority hitting set AND regex, a dangling
# customer ref); every rule must count exactly its planted dirt (plus
# any natural violations, which both engines count from the same data).

def cur_expectations(spark: SparkSession, sf: str) -> DataFrame:
    """Expectation-suite gate: (check, n_violations) for six rule
    kinds over the dirtied orders table."""
    from ..operators.expectations import expect
    o = tbl(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority",
        F.col("o_totalprice").alias("price"))
    c = tbl(spark, sf, "customer")
    first = o.orderBy("o_orderkey").limit(1)
    planted = local_df(
            spark,
        [(1000000001, None, "1-URGENT", 10.0),
         (1000000002, 1, "1-URGENT", -5.0),
         (1000000003, 1, "9-BOGUS", 10.0),
         (1000000004, 999999999, "1-URGENT", 10.0)],
        "o_orderkey bigint, o_custkey bigint, o_orderpriority string, "
        "price double")
    dirty = o.unionByName(first).unionByName(planted)
    return expect(dirty, [
        ("not_null", "o_custkey"),
        ("unique", ["o_orderkey"]),
        ("range", "price", 0.0, 1000000.0),
        ("in_set", "o_orderpriority",
         ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
          "5-LOW"]),
        ("regex", "o_orderpriority", "^[1-5]-"),
        ("ref", "o_custkey", c, "c_custkey")])


_EXPECT_SQL = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice AS price
  FROM orders),
first AS (SELECT * FROM base ORDER BY o_orderkey LIMIT 1),
dirty AS (
  SELECT * FROM base
  UNION ALL SELECT * FROM first
  UNION ALL SELECT 1000000001, NULL, '1-URGENT', 10.0
  UNION ALL SELECT 1000000002, 1, '1-URGENT', -5.0
  UNION ALL SELECT 1000000003, 1, '9-BOGUS', 10.0
  UNION ALL SELECT 1000000004, 999999999, '1-URGENT', 10.0)
SELECT * FROM (
  SELECT 'not_null(o_custkey)' AS "check",
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_violations
  FROM dirty
  UNION ALL
  SELECT 'unique(o_orderkey)',
         CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
  FROM (SELECT COUNT(*) AS n FROM dirty GROUP BY o_orderkey)
  UNION ALL
  SELECT 'range(price,0.0,1000000.0)',
         CAST(SUM(CASE WHEN price IS NOT NULL
                       AND (price < 0.0 OR price > 1000000.0)
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM dirty
  UNION ALL
  SELECT 'in_set(o_orderpriority)',
         CAST(SUM(CASE WHEN o_orderpriority IS NOT NULL
                       AND o_orderpriority NOT IN
                           ('1-URGENT', '2-HIGH', '3-MEDIUM',
                            '4-NOT SPECIFIED', '5-LOW')
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM dirty
  UNION ALL
  SELECT 'regex(o_orderpriority)',
         CAST(SUM(CASE WHEN o_orderpriority IS NOT NULL
                       AND NOT regexp_matches(o_orderpriority, '^[1-5]-')
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM dirty
  UNION ALL
  SELECT 'ref(o_custkey->c_custkey)',
         CAST(COUNT(*) AS BIGINT)
  FROM dirty d
  WHERE d.o_custkey IS NOT NULL
    AND NOT EXISTS (SELECT 1 FROM customer c
                    WHERE c.c_custkey = d.o_custkey))
ORDER BY "check"
"""


QUERIES: dict[str, QueryDef] = {
    "cur_expectations": QueryDef(cur_expectations, _EXPECT_SQL),
    "cur_winsorize": QueryDef(cur_winsorize, _WINSORIZE_SQL),
    "cur_url_dedup": QueryDef(cur_url_dedup, _URL_DEDUP_SQL),
    "cur_decontaminate_spans": QueryDef(cur_decontaminate_spans,
                                        _decon_spans_sql()),
    "cur_pretrain_multilang": QueryDef(cur_pretrain_multilang,
                                       _MULTILANG_SQL),
    "cur_quality_train": QueryDef(cur_quality_train, _quality_train_sql()),
    "cur_weighted_sample": QueryDef(cur_weighted_sample,
                                    _WEIGHTED_SAMPLE_SQL),
    "cur_domain_cap": QueryDef(cur_domain_cap, _DOMAIN_CAP_SQL),
    "cur_pretrain_e2e": QueryDef(cur_pretrain_e2e, _pretrain_sql_materialized()),
    "cur_perplexity_filter": QueryDef(cur_perplexity_filter, _PPLX_SQL),
    "cur_chunk_overlap": QueryDef(cur_chunk_overlap, _CHUNK_SQL),
    "cur_line_dedup": QueryDef(cur_line_dedup, _LINE_DEDUP_SQL),
    "cur_quality_model": QueryDef(cur_quality_model, _quality_sql()),
    "cur_pipeline_e2e": QueryDef(cur_pipeline_e2e, _pipeline_sql()),
    "cur_domain_mix_tokens": QueryDef(cur_domain_mix_tokens,
                                      _mix_tokens_sql()),
    "cur_decontaminate_fuzzy": QueryDef(cur_decontaminate_fuzzy,
                                        _decon_fuzzy_sql()),
    "cur_shuffle_shards": QueryDef(cur_shuffle_shards, _SHARDS_SQL),
    "cur_decontaminate": QueryDef(cur_decontaminate, _DECON_SQL),
    "cur_pack_chunks": QueryDef(cur_pack_chunks, _PACK_SQL),
    "cur_domain_mix": QueryDef(cur_domain_mix, _mix_sql()),
    "cur_pii_redact": QueryDef(cur_pii_redact, _PII_SQL),
}
