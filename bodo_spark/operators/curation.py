"""Training-corpus curation operators: benchmark decontamination,
sequence packing (concat-and-chunk), deterministic domain mixing, and
PII redaction.

These are the corpus-preparation steps every large-scale LLM data
pipeline runs between dedup and training (decontamination per GPT-3
appendix C / The Pile / Llama's n-gram overlap protocol; packing per
the standard concat-and-chunk sample packing; mixing per the
domain-weight recipes of Pile/RefinedWeb). The reference engine has no
dedicated module for them -- they extend its text/dedup surface
(SURVEY §2.11) the same way operators/dedup.py does -- so everything
here is designed Spark-first:

  - decontamination is ONE corpus scan: explode train n-grams, map-side
    broadcast LEFT SEMI against the (tiny) benchmark gram set -- the
    100-TB corpus is never shuffled, only the hit ids are.
  - packing needs a global running token offset; a naive
    Window.orderBy() cumsum is single-partition (a non-starter at
    scale), so `global_offsets` does the classic two-phase cumsum:
    range-partition by the order key, per-partition local cumsum, plus
    an exclusive prefix over the per-partition totals (a window over
    n_partitions rows, trivially small) broadcast-joined back.
  - domain mixing is exact + deterministic: a Knuth multiplicative hash
    of the id (not rand()) decides keep/drop, so the sample is
    reproducible across runs, engines, and retries, and the keep
    fraction per domain is computed from exact counts so the output
    hits the target mix as closely as integer ids allow.
  - PII redaction is a chain of JVM regexp_replace (RE2/Java-compatible
    patterns) -- whole-stage codegen, no Python in the path.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import dedup as _dedup
from .dedup import word_shingles

__all__ = [
    "contaminated_ids", "decontaminate", "global_offsets", "pack_chunks",
    "domain_mix_sample", "leakage_free_split", "redact_pii",
    "shuffle_shards", "u01_hash", "remove_boilerplate_lines",
    "hashed_quality_score", "chunk_with_overlap", "train_hashed_quality",
]


# --------------------------------------------------------------------------
# benchmark decontamination

def contaminated_ids(train: DataFrame, bench: DataFrame, *, k: int = 13,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Ids of training docs sharing any word ``k``-gram with ``bench``.

    The benchmark side (eval sets: MBs, not TBs) is distinct-ed and
    broadcast; the train side is scan -> explode -> broadcast LEFT SEMI
    -> distinct(ids). The corpus is never shuffled -- the only exchange
    carries the contaminated id set, which is small by construction.
    """
    # distinct=False: the semi join and the distinct below are
    # duplicate-insensitive, and array_distinct on string arrays is the
    # O(grams^2)-per-doc cost word_shingles warns about
    tg = train.select(
        F.col(id_col),
        F.explode(word_shingles(text_col, k, distinct=False)).alias("gram"))
    bg = (bench.select(F.explode(word_shingles(text_col, k, distinct=False))
                       .alias("gram"))
          .distinct())
    return (tg.join(F.broadcast(bg), "gram", "left_semi")
            .select(id_col).distinct())


def decontaminate(train: DataFrame, bench: DataFrame, *, k: int = 13,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Drop training docs that leak any benchmark ``k``-gram.

    LEFT ANTI against the contaminated id set (small -> broadcast-able
    by AQE); the full text columns ride the anti join untouched.
    """
    bad = contaminated_ids(train, bench, k=k, text_col=text_col,
                           id_col=id_col)
    return train.join(bad, id_col, "left_anti")


# --------------------------------------------------------------------------
# sequence packing (concat-and-chunk)

def global_offsets(df: DataFrame, *, order_col: str | list[str],
                   val_col: str | None, out_col: str = "offset",
                   num_partitions: int | None = None) -> DataFrame:
    """Exclusive global running sum of ``val_col`` in ``order_col`` order
    (a list means lexicographic order -- pass a unique tiebreaker last;
    ``val_col=None`` sums 1 per row, i.e. a 0-based global row number).

    Two-phase distributed cumsum: range-partition on the order key,
    local cumsum per partition (window partitioned by
    spark_partition_id -- parallel), then an exclusive prefix over the
    per-partition totals. The totals frame has one row per partition,
    so ITS single-partition window is trivially small, and it joins
    back broadcast. No driver collect; nothing single-partition ever
    sees more than num_partitions rows.
    """
    order_cols = [order_col] if isinstance(order_col, str) else order_col
    npart = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # The window branch and the totals branch both read `part`; without a
    # persist, column pruning can make their exchange subtrees canonically
    # different (whenever df carries columns beyond order+val), defeating
    # ReuseExchange -- and each repartitionByRange would re-sample range
    # boundaries independently, so the SAME row could land in different
    # _pid values across branches: silently wrong offsets. Persisting pins
    # one materialization of the partitioning for both branches (the same
    # discipline as dedup's signature frames; released by
    # dedup.unpersist_cached()).
    part = (df.repartitionByRange(npart, *order_cols)
            .withColumn("_pid", F.spark_partition_id())
            .persist(StorageLevel.MEMORY_AND_DISK))
    _dedup._PERSISTED.append(part)
    w_local = (Window.partitionBy("_pid").orderBy(*order_cols)
               .rowsBetween(Window.unboundedPreceding, -1))
    val = F.lit(1) if val_col is None else F.col(val_col)
    local = F.coalesce(F.sum(val).over(w_local), F.lit(0))
    totals = part.groupBy("_pid").agg(F.sum(val).alias("_tot"))
    w_pref = (Window.orderBy("_pid")
              .rowsBetween(Window.unboundedPreceding, -1))
    prefix = totals.select(
        "_pid", F.coalesce(F.sum("_tot").over(w_pref), F.lit(0))
        .alias("_prefix"))
    return (part.join(F.broadcast(prefix), "_pid")
            .withColumn(out_col, (local + F.col("_prefix")).cast("bigint"))
            .drop("_pid", "_prefix"))


def pack_chunks(df: DataFrame, capacity: int, *, id_col: str = "doc_id",
                tokens_col: str = "n_tokens") -> DataFrame:
    """GPT-style sample packing: concatenate all docs in ``id_col`` order
    and cut every ``capacity`` tokens. Returns one row per
    (chunk_id, doc) assignment -- a doc spanning a chunk boundary
    appears in every chunk it touches (where it would be split).

    Chunk membership is pure arithmetic on the global offset
    (first = offset div C, last = (offset+len-1) div C) + an explode of
    that id range; no shuffle beyond the one cumsum exchange.
    """
    toks = F.greatest(F.col(tokens_col), F.lit(1))  # 0-token docs occupy 1
    out = global_offsets(df, order_col=id_col, val_col=tokens_col)
    first = F.floor(F.col("offset") / capacity).cast("bigint")
    last = F.floor((F.col("offset") + toks - 1) / capacity).cast("bigint")
    return (out.withColumn("chunk_id",
                           F.explode(F.sequence(first, last)))
            .drop("offset"))


def chunk_with_overlap(df: DataFrame, *, chunk: int, stride: int,
                       id_col: str = "doc_id", text_col: str = "text",
                       out_col: str = "chunk_text") -> DataFrame:
    """RAG-style sliding-window chunker: split each doc's whitespace
    tokens into windows of ``chunk`` tokens starting every ``stride``
    tokens (stride < chunk = overlapping context windows; the retrieval
    indexing norm). Emits (id_col, chunk_no, out_col, n_tokens) -- one
    row per window, the tail window shorter when the doc doesn't divide
    evenly. Window starts run 0, stride, ... up to and INCLUDING the
    last token's index (so a 1-token tail chunk is emitted whenever
    (n_tokens-1) divides by stride); starts past the end are never
    emitted, and every doc emits at least the chunk starting at 0
    (empty text -> one empty chunk), so no document silently
    disappears.

    Purely narrow JVM work (split/sequence/slice/posexplode -- no
    shuffle at all, no Python): output rows ~ n_tokens/stride per doc,
    so the operator streams at scan speed on any corpus size. Unlike
    pack_chunks (which needs a global offset), chunk boundaries here
    are per-document, hence embarrassingly parallel."""
    if stride <= 0 or chunk <= 0:
        raise ValueError("chunk_with_overlap: chunk and stride must be >= 1")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    return (df.withColumn("_toks", toks)
            .select(id_col, F.posexplode(starts).alias("chunk_no", "_start"),
                    "_toks")
            .withColumn("_piece", F.slice(F.col("_toks"),
                                          F.col("_start") + 1, chunk))
            .select(id_col, F.col("chunk_no").cast("bigint").alias("chunk_no"),
                    F.array_join("_piece", " ").alias(out_col),
                    F.size("_piece").cast("bigint").alias("n_tokens")))


# --------------------------------------------------------------------------
# deterministic domain mixing

_KNUTH = 2654435761  # Knuth multiplicative hashing constant (2^32 * phi)
_M31 = 2147483648    # 2^31
_M32 = 4294967296    # 2^32


def u01_hash(id_col: Column | str) -> Column:
    """Deterministic uniform-ish [0,1) from an integer id.

    ((id mod 2^31) * KNUTH) mod 2^32 / 2^32 -- every step stays below
    2^63 (ANSI-overflow-safe) and is exact integer math, so any engine
    reproduces the identical double. Used instead of rand() so samples
    are stable across runs, task retries, and engines.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (((c % _M31) * F.lit(_KNUTH)) % _M32) / F.lit(float(_M32))


def domain_mix_sample(df: DataFrame, weights: dict[str, float], *,
                      domain_col: str = "source",
                      id_col: str = "doc_id",
                      size_col: str | None = None) -> DataFrame:
    """Deterministic sample hitting target domain proportions.

    Given target mix ``weights`` (relative, need not sum to 1), the
    achievable budget is ``B = min_d(mass_d / w_d)`` -- the largest
    total for which no domain runs out -- and each domain keeps
    ``B * w_d / mass_d`` of its docs, chosen by the id hash (so the
    same corpus always yields the same sample). Domains absent from
    ``weights`` are dropped. Counts are one small aggregate
    (one row per domain), broadcast back onto the corpus scan.

    ``size_col=None`` mixes by document count; naming a column (e.g. a
    token count) mixes by that mass instead -- the production recipe
    weighs domains in TOKENS, and uniform id-hash sampling inside a
    domain hits the token budget in expectation.
    """
    mass = F.count(F.lit(1)) if size_col is None \
        else F.sum(size_col).cast("double")
    from ..rowframe import local_df
    wdf = local_df(
        df.sparkSession,
        [(d, float(w)) for d, w in sorted(weights.items())],
        f"{domain_col} string, _w double")
    counts = (df.groupBy(domain_col).agg(mass.alias("_n"))
              .join(F.broadcast(wdf), domain_col))
    budget = counts.agg(F.min(F.col("_n") / F.col("_w")).alias("_budget"))
    frac = (counts.crossJoin(F.broadcast(budget))
            .select(domain_col,
                    F.least(F.col("_budget") * F.col("_w") / F.col("_n"),
                            F.lit(1.0)).alias("_keep_frac")))
    return (df.join(F.broadcast(frac), domain_col)
            .where(u01_hash(id_col) < F.col("_keep_frac"))
            .drop("_keep_frac"))


def weighted_sample(df: DataFrame, n: int, *, weight_col: str,
                    id_col: str = "doc_id") -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis 2006
    A-ES): the n rows with the largest u^(1/w) survive, where u is the
    row's deterministic u01_hash -- inclusion probability proportional
    to weight, reproducible across runs/retries/engines (the u01
    property domain_mix_sample relies on, extended to per-row weights
    -- e.g. sample training docs proportional to a quality score or
    token count). Implemented as ln(u)/w to avoid pow's cross-engine
    rounding: ln is monotone, so the top-n by ln(u)/w descending is
    EXACTLY the top-n by u^(1/w); the ratio of two exactly-representable
    doubles followed by one libm ln agrees across engines (same
    discipline as the LM scorer), with (key, id) as the total order.

    Scale: orderBy+limit compiles to TakeOrderedAndProject -- per-
    partition top-n then a driver merge of n*partitions candidates, no
    global sort, no skew (the same reason top-k queries scale).
    Non-positive or NULL weights never survive (P=0). Keys are rounded
    to 12 dp (absorbs libm ln's 1-ulp engine spread; ties break on
    id); rows hashing to u exactly 0 (ids ≡ 0 mod 2^31) sort last
    under u^(1/w) anyway and are excluded like non-positive weights."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    u = u01_hash(id_col)
    w = F.col(weight_col).cast("double")
    key = F.when((w > 0) & (u > 0), F.round(F.log(u) / w, 12))
    return (df.withColumn("_k", key)
            .where(F.col("_k").isNotNull())
            .orderBy(F.col("_k").desc(), F.col(id_col))
            .limit(n).drop("_k"))


def cap_per_key(df: DataFrame, cap: int, *, key_col: str = "source",
                id_col: str = "doc_id", salt: int = 16) -> DataFrame:
    """Keep at most ``cap`` rows per key -- the RefinedWeb/C4 'max
    documents per domain' rule (a mega-domain must not dominate the
    mix). Selection is deterministic: the ``cap`` rows with the
    smallest (u01_hash(id), id) per key survive, so output is stable
    across runs, retries, partitionings AND engines (u01_hash is the
    domain-mix sampler's Knuth hash, exactly reproducible in SQL).

    Skew design: a naive row_number window puts a mega-domain's entire
    occupancy in ONE task (the hot-key class the LSH/span operators
    are guarded against). This runs the classic two-level top-k
    instead: per (key, salt-of-id) window first -- every partition
    bounded by occupancy/salt -- then a final window over the <=
    salt*cap survivors per key. Value-identical to the single window
    by construction (the global top-cap is contained in the union of
    per-bucket top-caps)."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    from pyspark.sql import Window as W

    h = u01_hash(id_col)
    salted = df.withColumn("_h", h).withColumn(
        "_s", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt)))
    w1 = W.partitionBy(key_col, "_s").orderBy("_h", id_col)
    cand = (salted.withColumn("_rn", F.row_number().over(w1))
            .where(F.col("_rn") <= cap).drop("_rn", "_s"))
    w2 = W.partitionBy(key_col).orderBy("_h", id_col)
    return (cand.withColumn("_rn", F.row_number().over(w2))
            .where(F.col("_rn") <= cap).drop("_rn", "_h"))


def leakage_free_split(df: DataFrame, pairs: DataFrame, *,
                       id_col: str = "doc_id",
                       splits: list[tuple[str, float]] | None = None,
                       out_col: str = "split") -> DataFrame:
    """Train/val/test split that near-duplicates cannot straddle.

    Splitting by a per-document hash leaks training data into eval sets
    whenever near-dups exist (the classic benchmark-contamination-by-
    split bug); here the split key is the document's near-dup CLUSTER
    (connected components over the pair list, min-id label; singletons
    key on their own id), so an entire duplicate cluster lands in one
    split. The assignment hash is the deterministic id hash -- stable
    across runs, retries, and engines.
    """
    from .dedup import connected_components
    splits = splits or [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    comp = connected_components(pairs).withColumnRenamed("id", id_col)
    out = df.join(comp, id_col, "left")
    grp = F.coalesce(F.col("comp"), F.col(id_col))
    u = u01_hash(grp)
    total = sum(w for _, w in splits)
    expr, acc = None, 0.0
    for name, w in splits[:-1]:
        acc += w / total
        cond = u < F.lit(acc)
        expr = (F.when(cond, name) if expr is None
                else expr.when(cond, name))
    expr = (expr.otherwise(splits[-1][0]) if expr is not None
            else F.lit(splits[-1][0]))
    return out.withColumn(out_col, expr).drop("comp")


def shuffle_shards(df: DataFrame, shard_size: int, *,
                   id_col: str = "doc_id",
                   shard_col: str = "shard_id") -> DataFrame:
    """Deterministic global shuffle + fixed-size sharding for training.

    Orders the corpus by the Knuth hash of the id (an exact permutation
    for ids below 2^31 -- the odd multiplier is invertible mod 2^32 --
    and reproducible everywhere, unlike rand() or a salted sort), then
    assigns ``shard = global_row_index // shard_size`` via the
    distributed two-phase cumsum (val=1 turns it into a global
    row-number). Every shard except the last has exactly ``shard_size``
    docs; re-running yields byte-identical shard membership -- the
    property a resumable training job needs.
    """
    c = F.col(id_col)
    hkey = (((c % _M31) * F.lit(_KNUTH)) % _M32).alias("_hkey")
    out = global_offsets(df.withColumn("_hkey", hkey),
                         order_col=["_hkey", id_col], val_col=None,
                         out_col="_ridx")
    return (out.withColumn(shard_col,
                           F.floor(F.col("_ridx") / shard_size)
                           .cast("bigint"))
            .drop("_hkey", "_ridx"))


# --------------------------------------------------------------------------
# line-level boilerplate removal (RefinedWeb/CCNet-style line dedup)

def remove_boilerplate_lines(df: DataFrame, *, id_col: str = "doc_id",
                             text_col: str = "text",
                             max_doc_freq: int = 1,
                             delim: str = "\n",
                             normalize: bool = True,
                             min_chars: int = 1,
                             out_col: str | None = None) -> DataFrame:
    """Drop lines whose normalized form appears in MORE than
    ``max_doc_freq`` distinct documents -- the header/footer/nav killer
    every web-corpus pipeline runs (RefinedWeb line-dedup; CCNet
    paragraph hashing). Keeps every other line in original order;
    a doc whose every line is boilerplate comes back as ''.

    Scale shape: explode once to (id, pos, line); frequency is ONE
    shuffle keyed on an 8/16-byte line hash (never the line string --
    exact mode md5 for the oracle, fast mode the xxhash64 intrinsic);
    the surviving-lines anti-join broadcasts the bad-hash side (bounded
    by DISTINCT boilerplate lines, tiny next to the corpus); rebuild is
    one shuffle on doc id. The exploded frame feeds the frequency and
    rebuild branches -- persisted once, same discipline as the dedup
    signature frames (pruning would otherwise differentiate the
    exchanges and re-evaluate the explode per branch).

    doc_freq counts DISTINCT docs (a line repeated inside one doc is
    not boilerplate); the in-doc repeat case belongs to the Gopher
    repetition filters (operators/text.py).

    Lines whose normalized form is shorter than ``min_chars`` are
    EXEMPT from dedup (never counted, never dropped): blank separator
    lines normalize to the same '' key in virtually every document, so
    without the exemption paragraph structure would be destroyed
    corpus-wide the moment two docs contain an empty line (the standard
    RefinedWeb/CCNet short-line exemption; raise it to skip bullets or
    one-word lines too).
    """
    from ..modes import exact_mode
    out_col = out_col or text_col
    line = F.col("_line")
    norm = F.lower(F.trim(line)) if normalize else line
    key = F.md5(norm) if exact_mode() else F.xxhash64(norm)
    import re as _re
    ex = (df.select(F.col(id_col).alias("_id"),
                    F.posexplode(F.split(F.col(text_col),
                                         _re.escape(delim)))
                    .alias("_pos", "_line"))
          .withColumn("_key", key)
          .persist(StorageLevel.MEMORY_AND_DISK))
    _dedup._PERSISTED.append(ex)
    eligible = ex.where(F.length(norm) >= min_chars)
    bad = (eligible.groupBy("_key")
           .agg(F.count_distinct("_id").alias("_df"))
           .where(F.col("_df") > max_doc_freq)
           .select("_key"))
    # exempt (short/blank) lines dodge the anti join by a NULLed key --
    # SQL equi-joins never match NULL, so they always survive
    kept = (ex.withColumn("_key", F.when(F.length(norm) >= min_chars,
                                         F.col("_key")))
            .join(bad, "_key", "left_anti"))
    rebuilt = (kept.groupBy("_id")
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct(F.col("_pos"), F.col("_line")))),
                       lambda s: s.getField("_line")),
                   delim).alias("_clean")))
    new_text = F.coalesce(F.col("_clean"), F.lit(""))
    cols = [new_text.alias(out_col) if c == out_col else F.col(c)
            for c in df.columns]
    if out_col not in df.columns:
        cols.append(new_text.alias(out_col))
    return (df.join(rebuilt, df[id_col] == rebuilt["_id"], "left")
            .select(*cols))


# --------------------------------------------------------------------------
# hashing-trick quality scorer (the fastText-shaped classifier seam)

def hashed_quality_score(col: Column | str, weights: list[float],
                         bias: float = 0.0, *,
                         as_logit: bool = False) -> Column:
    """Linear quality-classifier score via the hashing trick:
    token -> bucket = hash(token) mod len(weights);
    score = sigmoid(bias + mean_t weights[bucket(t)]).

    This is the compute shape of the fastText-style quality filter
    (CCNet/Llama pipelines) run between heuristics and dedup: the model
    itself is trained offline; at corpus scale only this scoring pass
    runs, and it is pure JVM expressions -- whole-stage codegen, no
    Python, no shuffle. The weight vector inlines as an array literal
    (fine to ~10^4 buckets; a 2^20-bucket production model instead
    joins an exploded (id, bucket) frame against a broadcast weight
    table -- `hashed_quality_score_df`).

    Exact mode buckets via the md5-derived h60 (non-negative, so plain
    `%` agrees across engines and the DuckDB oracle reproduces every
    score bit-for-bit when weights are dyadic rationals -- their sums
    are exact in binary floating point regardless of fold order); fast
    mode uses the xxhash64 intrinsic with pmod."""
    from ..modes import exact_mode
    from .dedup import h60
    c = F.col(col) if isinstance(col, str) else col
    n = len(weights)
    toks = F.split(F.lower(F.trim(c)), "\\s+")
    warr = F.array(*[F.lit(float(w)) for w in weights])

    def _bucket(t: Column) -> Column:
        return (h60(t) % n if exact_mode()
                else F.pmod(F.xxhash64(t), F.lit(n)))

    wsum = F.aggregate(
        toks, F.lit(0.0),
        lambda acc, t: acc + F.element_at(warr,
                                          _bucket(t).cast("int") + 1))
    z = F.lit(float(bias)) + wsum / F.greatest(F.size(toks), F.lit(1))
    # as_logit returns z itself: with dyadic weights z is EXACT (exact
    # sum + one IEEE division), so thresholding on z never straddles a
    # cross-engine ulp the way sigmoid(z) >= cutoff can -- pipeline
    # filters compare z >= logit(cutoff)
    if as_logit:
        return z
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def hashed_quality_score_df(df: DataFrame, weights_df: DataFrame, *,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            bias: float = 0.0,
                            out_col: str = "quality") -> DataFrame:
    """Join-path twin of `hashed_quality_score` for production-sized
    weight tables (2^20 buckets won't inline as a literal): explode to
    (id, bucket), broadcast-join ``weights_df`` (columns: bucket bigint,
    weight double), mean per doc, sigmoid. One shuffle on doc id; the
    weight table broadcasts (8 MB at 2^20 doubles).

    Buckets must be produced by the same hash family as the expression
    path (h60 % n exact / pmod(xxhash64, n) fast) -- the scores are
    asserted equal across both paths in tests/test_curation_ops.py."""
    from ..modes import exact_mode
    from .dedup import h60
    n = weights_df.count()
    tok = F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                            "\\s+")).alias("t")
    ex = df.select(F.col(id_col), tok)
    bucket = (h60(F.col("t")) % n if exact_mode()
              else F.pmod(F.xxhash64(F.col("t")), F.lit(n)))
    scored = (ex.select(id_col, bucket.alias("bucket"))
              .join(F.broadcast(weights_df), "bucket", "left")
              .groupBy(id_col)
              .agg(F.avg(F.coalesce("weight", F.lit(0.0))).alias("_m")))
    sig = (F.lit(1.0)
           / (F.lit(1.0) + F.exp(-(F.lit(float(bias)) + F.col("_m")))))
    return (df.join(scored, id_col, "left")
            .withColumn(out_col, sig).drop("_m"))


def train_hashed_quality(df: DataFrame, *, label_col: str,
                         text_col: str = "text", id_col: str = "doc_id",
                         n_buckets: int = 32, steps: int = 3,
                         lr: float = 0.5,
                         as_frame: bool = False):
    """Train the hashing-trick quality classifier IN-ENGINE: full-batch
    logistic regression by gradient descent over the same bucket family
    `hashed_quality_score` scores with (exact mode h60 % n, fast mode
    pmod(xxhash64, n)), so the returned ``(weights, bias)`` drop
    straight into the scorer / pipeline cutoff. This closes the one
    model artifact the pipeline previously consumed "trained offline"
    (LM counts, PQ codebooks, IVF centroids and PCA already train
    in-engine). The fastText-recipe analogue: CCNet/Llama train a
    linear text classifier (wiki-vs-crawl labels) and keep docs by its
    score; ``label_col`` carries the 0/1 labels here.

    Model: z_i = bias + sum_b w_b * frac_ib with frac_ib = (tokens of
    doc i hashing to bucket b) / max(n_tokens_i, 1) -- EXACTLY the
    scorer's mean-of-bucket-weights feature map. Per step:
    p = sigmoid(z), gradient g_b = mean_i (p_i - y_i) * frac_ib,
    w -= lr * g (and likewise the bias against mean error).

    Scale + determinism design:
    * the (id, y, n, bucket, cnt) feature frame is built ONCE (one
      explode + one count aggregate, the corpus text is read once) and
      persisted; each step is then two broadcast joins and two
      aggregates over it -- per-step cost is O(distinct doc-bucket
      pairs), independent of text size.
    * weights are a bounded model artifact (n_buckets rows), collected
      per step like the PQ codebooks; the DRIVER only transports them
      -- every arithmetic op (dot, sigmoid, gradient, update) is a
      Spark expression under the repo's cross-engine discipline:
      per-term round then decimal sum (order-independent), one libm
      exp rounded at 9 dp, decimal-total -> ONE double division ->
      round 12 dp for the update. A DuckDB oracle therefore re-derives
      the trained weights bit-for-bit (cur_quality_train).
    * train and score must run under the SAME mode (the bucket hash
      family switches with exact_mode, like the scorer itself).
    * ``as_frame=True`` is the production-width mode (2^20-bucket
      models, the hashed_quality_score_df regime): weights NEVER leave
      the cluster -- each step derives the next weight frame by a
      broadcast join and localCheckpoints it (bounded plans, the
      pretrain-pipeline boundary discipline), and the return value is
      ``(weights_df(bucket, weight), bias_df(bias))`` ready for
      hashed_quality_score_df. Identical arithmetic expression by
      expression, so the two modes are bit-equal (tested).
    """
    from ..modes import exact_mode
    from .dedup import h60
    if steps < 1:
        raise ValueError(f"steps must be >= 1, got {steps}")
    spark = df.sparkSession
    toks = F.split(F.lower(F.trim(F.col(text_col))), "\\s+")
    tok = F.explode(toks).alias("_t")
    ex = df.select(F.col(id_col).alias("_id"),
                   F.col(label_col).cast("double").alias("_y"),
                   F.size(toks).alias("_n"), tok)
    bucket = (h60(F.col("_t")) % n_buckets if exact_mode()
              else F.pmod(F.xxhash64(F.col("_t")), F.lit(n_buckets)))
    feats = (ex.select("_id", "_y", "_n", bucket.cast("int").alias("_b"))
             .groupBy("_id", "_y", "_n", "_b")
             .agg(F.count(F.lit(1)).alias("_cnt"))
             .persist(StorageLevel.MEMORY_AND_DISK))
    _dedup._PERSISTED.append(feats)
    n_docs = feats.select("_id").distinct().count()  # bounded scalar
    frac = F.col("_cnt") / F.greatest(F.col("_n"), F.lit(1))

    def _step(wdf: DataFrame, bias_df: DataFrame | None, bias: float):
        """One gradient step: returns (edf of per-doc errors, gdf keyed
        by _b). Arithmetic identical in both modes: the weight-sum
        aggregate first, then bias + sum in a post-agg select (same
        operand order as the oracle's (SELECT bias) + CAST(SUM(...)))."""
        zterm = F.round(F.col("_w") * frac, 9).cast("decimal(28,9)")
        zsum = (feats.join(F.broadcast(wdf), "_b")
                .groupBy("_id", "_y")
                .agg(F.sum(zterm).cast("double").alias("_ws")))
        if bias_df is not None:
            zdf = (zsum.crossJoin(F.broadcast(bias_df))
                   .select("_id", "_y",
                           (F.col("_bias") + F.col("_ws")).alias("_z")))
        else:
            zdf = zsum.select(
                "_id", "_y",
                (F.lit(float(bias)) + F.col("_ws")).alias("_z"))
        p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_z"))), 9)
        edf = zdf.select("_id", (p - F.col("_y")).alias("_err"))
        gterm = F.round(F.col("_err") * frac, 12).cast("decimal(28,12)")
        gdf = (feats.join(edf, "_id")
               .groupBy("_b").agg(F.sum(gterm).alias("_g")))
        return edf, gdf

    upd = (F.col("_w") - F.lit(float(lr)) * F.round(
        F.coalesce(F.col("_g"), F.lit(0).cast("decimal(28,12)"))
        .cast("double") / F.lit(n_docs), 12))

    if as_frame:
        # weights never leave the cluster: each step's frame derives
        # from the previous via a broadcast join, localCheckpoint-ed so
        # plan depth stays one step (the pipeline boundary discipline)
        wdf = (spark.range(n_buckets)
               .select(F.col("id").cast("int").alias("_b"),
                       F.lit(0.0).alias("_w")))
        from ..rowframe import local_df
        bias_df = local_df(spark, [(0.0,)], "_bias double")
        for _ in range(steps):
            edf, gdf = _step(wdf, bias_df, 0.0)
            wdf = (wdf.join(gdf, "_b", "left")
                   .select("_b", upd.alias("_w"))
                   .localCheckpoint(eager=False))
            bias_df = (bias_df.crossJoin(edf.agg(
                F.sum(F.col("_err").cast("decimal(28,9)"))
                .cast("double").alias("_es")))
                .select((F.col("_bias") - F.lit(float(lr))
                         * F.round(F.col("_es") / F.lit(n_docs), 12))
                        .alias("_bias"))
                .localCheckpoint(eager=False))
            _dedup._PERSISTED.extend([wdf, bias_df])
        return (wdf.select(F.col("_b").alias("bucket"),
                           F.col("_w").alias("weight")),
                bias_df.select(F.col("_bias").alias("bias")))

    w = [0.0] * n_buckets
    bias = 0.0
    for _ in range(steps):
        from ..rowframe import local_df
        wdf = local_df(
            spark, [(b, float(w[b])) for b in range(n_buckets)],
            "_b int, _w double")
        edf, gdf = _step(wdf, None, bias)
        rows = (wdf.join(gdf, "_b", "left")
                .select("_b", upd.alias("_wn")).collect())
        for r in rows:
            w[r["_b"]] = float(r["_wn"])
        brow = edf.agg(
            (F.lit(float(bias)) - F.lit(float(lr)) * F.round(
                F.sum(F.col("_err").cast("decimal(28,9)")).cast("double")
                / F.lit(n_docs), 12)).alias("_bn")).collect()[0]
        bias = float(brow["_bn"])
    return w, bias


# --------------------------------------------------------------------------
# PII redaction

# RE2- and Java-regex compatible (no lookarounds), so the DuckDB oracle
# can run the identical patterns.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # at least 8 digits with at most ONE separator between consecutive
    # digits -- bounding separator repetition keeps benign numeric text
    # (year ranges '2010 - 2020', spaced ISBNs) out of the redaction,
    # unlike a raw 9+-char [\d \-] span which destroyed them
    (r"\+?\d([ \-]?\d){7,}", "<PHONE>"),
]


def redact_pii(col: Column | str) -> Column:
    """Replace emails, IPv4s and phone-ish digit runs with typed tags.

    A chain of JVM regexp_replace -- stays in whole-stage codegen.
    Order matters: emails first (their local part can contain digits),
    IPs before phones (dotted quads contain 8+ digit runs).
    """
    c = F.col(col) if isinstance(col, str) else col
    for pat, tag in PII_PATTERNS:
        c = F.regexp_replace(c, pat, tag)
    return c


# --------------------------------------------------------------------------
# sketch-percentile filtering (the CCNet tail-drop at scale)

def filter_by_score_percentile(df: DataFrame, score_col: str, *,
                               p: float, keep: str = "above",
                               k: int = 200,
                               group_col: str | None = None,
                               sketches: DataFrame | None = None,
                               sketch_col: str = "sketch") -> DataFrame:
    """Drop the worst score percentiles without an exact-percentile
    shuffle -- CCNet's actual protocol (Wenzek et al. 2020 partition
    docs by LM perplexity and drop/downsample the tail; the same shape
    serves any quality score). The threshold is the KLL-sketched P-th
    percentile: one pass accumulates ~k doubles of mergeable state per
    partition (map-side combined -- row data never reshuffles), the
    single threshold row broadcasts, and a second scan filters. An
    EXACT percentile of a 100-TB score column would instead sort or
    multi-pass the full corpus.

    ``sketches``: optionally a stored per-shard sketch frame (from
    sketches.kll_shard_sketches' parquet index) -- then the threshold
    comes from merging KB-sized states and the corpus is scanned ONCE,
    the ingest-loop composition.

    Rank semantics (pinned by the gate's DuckDB oracle): in the exact
    regime (n <= k: no compaction has occurred) the threshold is the
    value at 1-indexed rank max(1, ceil(p*n)) of the sorted scores, and
    the survivor set equals the exact-percentile filter's; beyond k the
    value is within the KLL rank envelope (~1.65%/sqrt(k/200)) but is
    RANDOMIZED per run (KLL compaction flips a coin per level), so a
    deterministic gate must size k >= n -- measured: k=200 at n=250
    already scatters across runs (tests pin both regimes).
    ``keep='above'`` keeps score >= threshold (higher-is-better
    scores); ``keep='below'`` keeps score <= threshold. Rows with NULL
    scores are dropped either way (SQL comparison semantics).

    ``group_col`` applies an INDEPENDENT threshold per group -- CCNet's
    real protocol is per-LANGUAGE percentile buckets, because one
    global threshold over heterogeneous score distributions strips
    whole minority groups. Same plan economics: the per-group sketch
    states ride ONE map-side-combined groupBy (KB per group), the
    threshold frame (one row per group) broadcasts, the corpus never
    reshuffles. A NULL group key forms its own group (null-safe join),
    thresholded independently like any other -- not dropped."""
    from .sketches import kll_merge_quantiles, kll_quantiles
    if keep not in ("above", "below"):
        raise ValueError(f"keep must be 'above' or 'below', got {keep!r}")
    if group_col is not None:
        if sketches is not None:
            raise ValueError("group_col and sketches are mutually "
                             "exclusive (store per-group sketches and "
                             "merge per group instead)")
        if not 8 <= k <= 65535:
            raise ValueError(f"KLL k must be in [8, 65535], got {k}")
        sk = F.expr(f"kll_sketch_agg_double(CAST({score_col} AS double), "
                    f"{int(k)})")
        q = F.expr("kll_sketch_get_quantile_double(_sk, "
                   f"CAST({float(p)} AS double))").cast("double")
        thr = (df.groupBy(group_col).agg(sk.alias("_sk"))
               .select(F.col(group_col).alias("_g"), q.alias("_thr")))
        cond = (F.col(score_col) >= F.col("_thr") if keep == "above"
                else F.col(score_col) <= F.col("_thr"))
        # eqNullSafe: groupBy emits a NULL-group row, so a null-safe join
        # matches EVERY input row (a plain equi join would silently drop
        # rows whose group key is NULL -- they'd never match their own
        # threshold row)
        return (df.join(F.broadcast(thr),
                        F.col(group_col).eqNullSafe(F.col("_g")))
                .where(cond).drop("_g", "_thr"))
    thr = (kll_merge_quantiles(sketches, [p], sketch_col=sketch_col)
           if sketches is not None
           else kll_quantiles(df, score_col, [p], k=k))
    thr = thr.select(F.col("value").alias("_thr"))
    cond = (F.col(score_col) >= F.col("_thr") if keep == "above"
            else F.col(score_col) <= F.col("_thr"))
    return df.crossJoin(F.broadcast(thr)).where(cond).drop("_thr")


# --------------------------------------------------------------------------
# the full pretraining pipeline, composed as one staged plan

def winsorize(df: DataFrame, value_col: str, *, p_lo: float = 0.01,
              p_hi: float = 0.99, group_col: str | None = None,
              k: int = 200, out_col: str | None = None) -> DataFrame:
    """Percentile clipping (winsorization): values below the sketched
    ``p_lo`` quantile or above ``p_hi`` are clipped TO those
    thresholds -- the outlier-robust normalization every feature/score
    pipeline runs before scaling (clip, not drop: the row count and
    every join key survive). Same economics as
    filter_by_score_percentile: ONE KLL sketch pass (~k doubles of
    mergeable state, map-side combined; BOTH quantiles read from the
    same state), broadcast threshold row(s), one clip scan -- the
    corpus never reshuffles. ``group_col`` clips per group (per-type /
    per-language distributions differ, the CCNet argument); a NULL
    group key forms its own group and is clipped by that group's
    thresholds (null-safe join -- no row is ever dropped). Exact-rank
    deterministic for n <= k (the filter_by_score_percentile
    contract); NULL values stay NULL."""
    if not 0.0 <= p_lo < p_hi <= 1.0:
        raise ValueError(f"need 0 <= p_lo < p_hi <= 1, got "
                         f"({p_lo}, {p_hi})")
    if not 8 <= k <= 65535:
        raise ValueError(f"KLL k must be in [8, 65535], got {k}")
    out_col = out_col or value_col
    v = F.col(value_col)
    sk = F.expr(f"kll_sketch_agg_double(CAST({value_col} AS double), "
                f"{int(k)})")

    def q(p):
        return F.expr("kll_sketch_get_quantile_double(_sk, "
                      f"CAST({float(p)} AS double))").cast("double")

    if group_col is not None:
        thr = (df.groupBy(group_col).agg(sk.alias("_sk"))
               .select(F.col(group_col).alias("_g"), q(p_lo).alias("_lo"),
                       q(p_hi).alias("_hi")))
        # eqNullSafe keeps the "clip, not drop" contract for NULL group
        # keys: groupBy emits a NULL-group threshold row and the
        # null-safe join matches those rows to it (a plain equi join
        # would drop them)
        j = (df.join(F.broadcast(thr),
                     F.col(group_col).eqNullSafe(F.col("_g")))
             .drop("_g"))
    else:
        thr = df.agg(sk.alias("_sk")).select(q(p_lo).alias("_lo"),
                                             q(p_hi).alias("_hi"))
        j = df.crossJoin(F.broadcast(thr))
    # guard: greatest/least SKIP nulls in Spark, so an unguarded clip
    # would turn a NULL value into the lower threshold
    clipped = F.when(v.isNotNull(),
                     F.least(F.greatest(v, F.col("_lo")), F.col("_hi")))
    return j.withColumn(out_col, clipped).drop("_lo", "_hi")


def pretrain_pipeline(df: DataFrame, *, bench: DataFrame | None = None,
                      id_col: str = "doc_id", text_col: str = "text",
                      normalize: bool = True,
                      line_max_doc_freq: int = 1,
                      span: int = 20,
                      num_perm: int = 16, bands: int = 8,
                      threshold: float = 0.5,
                      pplx_p: float = 0.2, lm_k: float = 0.5,
                      pplx_sketch_k: int = 200,
                      per_language: bool = False,
                      lang_col: str = "lang",
                      quality_weights: list[float] | str | None = None,
                      quality_bias: float = 0.0,
                      quality_cutoff: float = 0.5,
                      quality_labels: DataFrame | None = None,
                      quality_label_col: str = "y",
                      quality_train_buckets: int = 32,
                      quality_train_steps: int = 3,
                      mix_weights: dict[str, float] | None = None,
                      gopher: bool = False,
                      domain_cap: int | None = None,
                      domain_col: str = "source",
                      capacity: int = 256,
                      url_col: str | None = None,
                      url_score_col: str | None = None,
                      strip_www: bool = True,
                      checkpoint_dir: str | None = None) -> DataFrame:
    """The composed pretraining-data pipeline, each tier in its
    web-corpus order (RefinedWeb/CCNet/Llama protocols):

      [URL dedup] -> normalize -> line dedup -> span excision ->
      near-dup survivors (collapse-first) -> perplexity tail-drop ->
      quality cutoff -> fuzzy decontaminate -> domain mix -> pack

    ``url_col`` switches on the pre-content stage every web corpus
    runs FIRST (C4/RefinedWeb): canonicalize + keep one row per
    canonical URL (operators/web.url_dedup; best ``url_score_col``
    wins, else lowest id) -- the cheapest dedup axis, applied before
    any text is even parsed.

    Returns one row per (chunk_id, doc) assignment with the surviving
    cleaned text. Every stage is an existing gated operator; what this
    function adds -- and what breaks first in an integrated 100-TB run
    -- is the TIER-BOUNDARY materialization discipline:

    * Each boundary whose output feeds more than one downstream subtree
      (line dedup's rebuild, span excision's join-back, the survivor
      frame that is LM-trained on, LM-scored, quality-scored AND
      band-joined against the benchmark) is materialized ONCE: default
      `persist(MEMORY_AND_DISK)` registered in dedup._PERSISTED
      (release with dedup.unpersist_cached() after consuming the
      result), or parquet staging when ``checkpoint_dir`` is given.
      Without this, Catalyst column-prunes each consumer's subtree into
      a canonically different plan and re-executes the WHOLE upstream
      pipeline per consumer -- the recompute blows up multiplicatively
      with pipeline depth, not additively.
    * ``checkpoint_dir`` is the 100-TB mode: persisted lineage chains
      this deep make every task failure replay the full pipeline (and
      the memory footprint is the SUM of live boundaries, ~3x corpus);
      parquet staging truncates lineage so peak footprint is one
      boundary + shuffle, and each stage restarts from durable state.
      SCALE.md records the measured footprint of both modes.

    Stage parameters are the individual operators' (see their
    docstrings); ``quality_weights=None`` / ``mix_weights=None`` /
    ``bench=None`` skip those stages. ``quality_weights="train"``
    trains the classifier IN-ENGINE on the post-tail-drop survivors
    joined with ``quality_labels`` (an (id_col, quality_label_col)
    frame of 0/1 labels, e.g. curated-vs-crawl membership -- the CCNet
    protocol) via train_hashed_quality, then filters with the trained
    weights and bias; quality_bias is ignored in that mode. Training
    is eager (one bounded weight collect per step), like the other
    in-engine trainers."""
    from . import dedup as D
    from .text import bigram_lm_counts, lm_doc_logprob, normalize_text
    from .text import token_count

    spark = df.sparkSession
    if checkpoint_dir is None:
        # defaults follow the evidence (SCALE.md): parquet staging is
        # the measured-better mode at BOTH probed scales AND the only
        # durable-restart mode, so a session-level staging dir opts
        # every pipeline run into it without per-call plumbing. The
        # zero-configuration fallback stays localCheckpoint (works with
        # no writable path), with a one-time pointer at this depth.
        checkpoint_dir = spark.conf.get(
            "spark.bodo_spark.pretrain.checkpointDir", None)
        if not checkpoint_dir:
            import warnings
            warnings.warn(
                "pretrain_pipeline: using localCheckpoint tier "
                "boundaries; for large corpora set checkpoint_dir= (or "
                "conf spark.bodo_spark.pretrain.checkpointDir) -- "
                "parquet staging measured faster at every probed scale, "
                "bounds peak footprint to one boundary, and restarts "
                "from durable state (SCALE.md)", stacklevel=2)

    def _stage(frame: DataFrame, name: str) -> DataFrame:
        if checkpoint_dir:
            path = f"{checkpoint_dir.rstrip('/')}/{name}"
            frame.write.mode("overwrite").parquet(path)
            return spark.read.parquet(path)
        # localCheckpoint, not plain persist: persist alone keeps the
        # ENTIRE upstream pipeline in every downstream logical plan, and
        # at this composition depth Catalyst's plan strings grow past
        # the JVM's 1 GB string ceiling (measured: count() after the
        # pack stage died with 'UTF16 String size is 1122980456').
        # localCheckpoint stores the same MEMORY_AND_DISK blocks AND
        # truncates lineage, so each stage's plan starts from a scan of
        # the previous boundary -- the same bounded-plans discipline the
        # CC iteration uses (operators/dedup.py). Lazy: materializes on
        # the first downstream action, like persist.
        p = frame.localCheckpoint(eager=False)
        _dedup._PERSISTED.append(p)
        return p

    cur = df
    if url_col is not None:
        from .web import url_dedup
        cur = url_dedup(cur, url_col=url_col, id_col=id_col,
                        score_col=url_score_col,
                        strip_www=strip_www).drop("canon_url")
    if normalize:
        cur = cur.withColumn(text_col, normalize_text(text_col))
    # line dedup's exploded frame is persisted internally; its OUTPUT
    # feeds the span stage's two subtrees -> boundary
    cur = _stage(remove_boilerplate_lines(
        cur, id_col=id_col, text_col=text_col,
        max_doc_freq=line_max_doc_freq), "lines")
    cur = _stage(D.excise_duplicate_spans(cur, id_col, text_col,
                                          span=span), "spans")
    # survivors feed FOUR consumers: LM train counts, LM scoring,
    # quality expression, and the decontamination band join
    cur = _stage(D.near_dup_survivors(cur, id_col, text_col,
                                      num_perm=num_perm, bands=bands,
                                      threshold=threshold,
                                      collapse_exact=True), "survivors")
    # CCNet tail-drop: the LM trains on the surviving corpus itself
    # (the gate mode; production passes a held-out LM's count tables).
    # per_language=True is CCNet's real routing: one LM per language
    # (group-keyed count tables) and one percentile threshold per
    # language -- a global LM + global threshold systematically strips
    # minority languages (cur_pretrain_multilang plants and pins the
    # misfilter).
    grp = [lang_col] if per_language else None
    bigrams, unigrams, vocab = bigram_lm_counts(cur, text_col=text_col,
                                                group_cols=grp)
    scored = lm_doc_logprob(cur, bigrams, unigrams, vocab,
                            id_col=id_col, text_col=text_col, k=lm_k,
                            group_cols=grp)
    if per_language:
        # score rows don't carry the language; join it back for the
        # per-group threshold (one narrow broadcast-able frame)
        scored = scored.join(cur.select(id_col, lang_col), id_col)
    # pplx_sketch_k: the oracle gate sizes this >= corpus so the KLL
    # threshold is exact-rank deterministic (see
    # filter_by_score_percentile -- beyond k the compaction coin makes
    # the tail-drop nondeterministic, fine in production, fatal to a
    # hash-pinned gate)
    kept_ids = filter_by_score_percentile(
        scored, "avg_logprob", p=pplx_p, keep="above",
        k=pplx_sketch_k,
        group_col=lang_col if per_language else None).select(id_col)
    # inner join doubles as the <2-token guard: unscoreable docs
    # (emptied by excision) carry no score row and drop here
    cur = cur.join(kept_ids, id_col)
    if gopher:
        # rule verdicts need CLEANED text, so this runs after line
        # dedup + span excision (the RefinedWeb order); pure JVM
        # expressions, fused into the same scan as the quality cutoff
        from .text import gopher_rules
        cur = cur.where(gopher_rules(F.col(text_col))["pass_all"])
    if isinstance(quality_weights, str):
        if quality_weights != "train":
            raise ValueError(f"unknown quality_weights mode "
                             f"{quality_weights!r} (expected 'train')")
        if quality_labels is None:
            raise ValueError("quality_weights='train' needs a "
                             "quality_labels frame")
        # train on the survivors as they stand at this stage (labels
        # joined in; unlabeled docs don't contribute gradient) -- the
        # trained-weights twin of the offline-weights path below
        lab = cur.join(quality_labels.select(
            id_col, quality_label_col), id_col)
        quality_weights, quality_bias = train_hashed_quality(
            lab, label_col=quality_label_col, text_col=text_col,
            id_col=id_col, n_buckets=quality_train_buckets,
            steps=quality_train_steps)
    if quality_weights is not None:
        import math
        z = hashed_quality_score(F.col(text_col), quality_weights,
                                 bias=quality_bias, as_logit=True)
        zcut = math.log(quality_cutoff / (1.0 - quality_cutoff))
        cur = cur.where(z >= F.lit(zcut))
    if bench is not None:
        sig = D.minhash_signatures(cur, id_col, text_col)
        pairs = D.minhash_lsh_pairs_between(bench, sig,
                                            threshold=threshold)
        flagged = pairs.select(F.col("corpus_id").alias(id_col)).distinct()
        cur = cur.join(F.broadcast(flagged), id_col, "left_anti")
    cur = _stage(cur, "filtered")
    if domain_cap is not None:
        cur = cap_per_key(cur, domain_cap, key_col=domain_col,
                          id_col=id_col)
    if mix_weights is not None:
        cur = domain_mix_sample(cur, mix_weights, domain_col=domain_col,
                                id_col=id_col)
    cur = cur.withColumn("_n_tokens", token_count(text_col))
    return pack_chunks(cur, capacity, id_col=id_col,
                       tokens_col="_n_tokens")


def boilerplate_line_index(df: DataFrame, *, id_col: str = "doc_id",
                           text_col: str = "text",
                           max_doc_freq: int = 1,
                           delim: str = "\n",
                           min_chars: int = 1) -> DataFrame:
    """The stored artifact streaming line dedup probes
    (streaming/dedup.stream_drop_boilerplate_lines): one ``_key``
    column of normalized-line hashes whose corpus doc-freq exceeds
    ``max_doc_freq`` (short/blank lines exempt). Uses the SAME
    mode-switched hash family as remove_boilerplate_lines and the
    streaming probe -- building the index with one family and probing
    with the other silently matches nothing."""
    import re as _re

    from ..modes import exact_mode
    norm = F.lower(F.trim(F.col("_line")))
    key = F.md5(norm) if exact_mode() else F.xxhash64(norm).cast("string")
    ex = (df.select(F.col(id_col).alias("_id"),
                    F.explode(F.split(F.col(text_col),
                                      _re.escape(delim))).alias("_line"))
          .where(F.length(norm) >= min_chars)
          .select("_id", key.alias("_key")))
    return (ex.groupBy("_key")
            .agg(F.count_distinct("_id").alias("_df"))
            .where(F.col("_df") > max_doc_freq)
            .select("_key"))
