"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard.

Extends the reference's data-pipeline surface (reference
drop_duplicates bodo/pandas/frame.py:1873 is the exact path) with the
near-dup family every pretraining corpus needs.

Scale design (the whole point):
  - Signatures (shingles, minhash, simhash) are per-row expressions /
    narrow maps -- zero shuffle, embarrassingly parallel over any
    number of executors.
  - Candidate generation shuffles once on (band, signature) -- the LSH
    trick keeps the candidate set ~linear instead of O(n^2).
  - Verification joins only candidate pairs.
  - Hashing has two modes (bodo_spark.modes): exact mode derives every
    hash from md5 (bit-identical across engines, so the DuckDB oracle
    reproduces signatures exactly); fast mode uses xxhash64 -- a single
    vectorized JVM intrinsic, ~10x cheaper per shingle. Both are valid
    MinHash families; only the exact path is oracle-checkable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..modes import exact_mode

# Persisted intermediates (the MinHash signature frame), STRONG refs: a
# weak set would drop the handle the moment the builder returns (the
# result plan references the cached RDD only JVM-side), leaving nothing
# for the eager-release hook to act on. One small aggregated frame per
# plan build; long-lived sessions building many plans call
# unpersist_cached() to release blocks.
_PERSISTED: list[DataFrame] = []


def unpersist_cached(blocking: bool = False) -> int:
    """Eagerly unpersist intermediates cached by dedup plan builders.
    Returns the number of frames released."""
    n = 0
    while _PERSISTED:
        _PERSISTED.pop().unpersist(blocking)
        n += 1
    return n


def h60(col: Column) -> Column:
    """Deterministic 60-bit integer hash: first 15 hex chars of md5.
    (DuckDB twin: CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT).)"""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def perm_hash(col: Column, perm: int) -> Column:
    """Permutation-``perm`` hash of a shingle. Exact mode: md5-derived
    (oracle-reproducible); fast mode: seeded xxhash64 intrinsic."""
    if exact_mode():
        return h60(F.concat(F.lit(f"{perm}|"), col))
    return F.xxhash64(F.lit(perm), col)


def word_shingles(col: Column | str, k: int = 3,
                  distinct: bool = True) -> Column:
    """Word k-grams of a text column -> array<string>; short texts
    (< k words) fall back to the whole text.

    ``distinct=False`` skips array_distinct -- it is O(n^2) on string
    arrays and the set consumers (min-hash, array_intersect/union
    Jaccard, collect_set) are duplicate-insensitive anyway; only
    multiset consumers (simhash votes) need distinct=True."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.trim(c), "\\s+")
    # Build grams as a zip_with chain over k shifted slices instead of a
    # per-position transform(slice(...)): higher-order lambdas evaluate
    # interpreted (outside codegen), and slicing a fresh k-array per
    # position made the shingle build the operator's hottest stage.
    # k-1 zip_with passes over whole shifted arrays measured ~6x faster
    # at sf0.1 (0.6s vs 3.5s for the 260k-shingle corpus).
    n_grams = F.greatest(F.size(words) - (k - 1), F.lit(0))
    grams = F.slice(words, 1, n_grams)
    for j in range(1, k):
        grams = F.zip_with(grams, F.slice(words, j + 1, n_grams),
                           lambda a, b: F.concat(a, F.lit(" "), b))
    if distinct:
        grams = F.array_distinct(grams)
    return F.when(F.size(words) >= k, grams).otherwise(F.array(F.trim(c)))


def _perm_lane(i: int):
    """Single-arg lambda factory for transform(): a two-parameter
    lambda (s, i=i) would be interpreted by PySpark as the
    (element, INDEX) form and the array index would silently override
    the bound permutation."""
    return lambda s: perm_hash(s, i)


def minhash_signature(shingles: Column, num_perm: int = 16) -> Column:
    """MinHash signature: array of num_perm 60-bit minima.
    Permutation i hashes shingle s as h60(i || '|' || s)."""
    sigs = [
        F.array_min(F.transform(shingles, _perm_lane(i)))
        for i in range(num_perm)
    ]
    return F.array(*sigs)


def band_signatures(sig: Column, bands: int, rows: int) -> Column:
    """LSH banding: md5 over each band's slice of the signature."""
    return F.array(*[
        F.md5(F.concat_ws(
            "_", F.lit(str(b)),
            *[F.element_at(sig, b * rows + r + 1).cast("string")
              for r in range(rows)]))
        for b in range(bands)
    ])


def minhash_signature_cols(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_perm: int = 16,
) -> DataFrame:
    """Per-row expression twin of `minhash_signatures`: identical
    (id, m0..m{n-1}, sh) schema AND values, built as a stateless
    projection -- no explode, no groupBy, no shuffle. That makes it
    legal under Structured Streaming (each micro-batch row signs
    itself), which the aggregate formulation is not.

    Stepwise selects matter: the shingle/hash arrays are
    multiply-referenced non-cheap expressions, which CollapseProject
    declines to inline, so each array materializes once per row instead
    of once per signature lane (the 50x-recompute hazard noted on the
    batch path)."""
    base = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), k, distinct=False).alias("_sha"))
    if exact_mode():
        return base.select(
            "id",
            *[F.array_min(F.transform("_sha", _perm_lane(i)))
              .alias(f"m{i}") for i in range(num_perm)],
            F.array_distinct(F.transform(
                "_sha", lambda s: perm_hash(s, 0))).alias("sh"))
    hashed = base.select(
        "id",
        F.transform("_sha", lambda s: F.xxhash64(s)).alias("_h1"),
        F.transform("_sha",
                    lambda s: F.xxhash64(F.lit(-1), s)).alias("_h2"))

    # same Kirsch-Mitzenmacher family as the batch path: h_i = h1 + i*h2
    # (factory, not a default-arg lambda -- see _perm_lane)
    def _km_lane(i: int):
        return lambda a, b: a + F.lit(i) * b

    return hashed.select(
        "id",
        *[F.array_min(F.zip_with("_h1", "_h2", _km_lane(i)))
          .alias(f"m{i}") for i in range(num_perm)],
        F.array_distinct(F.col("_h1")).alias("sh"))


def exact_dedup(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Exact dedup = hash-groupBy dropDuplicates (reference
    drop_duplicates). One shuffle on the subset key."""
    return df.dropDuplicates(cols) if cols else df.dropDuplicates()


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_perm: int = 16,
) -> DataFrame:
    """Per-doc MinHash signature + Jaccard-verify hash set: columns
    (id, m0..m{num_perm-1}, sh). This is the INDEX artifact of the
    dedup family -- compute it once per corpus (and persist/write it);
    `minhash_lsh_pairs` derives pairs within one corpus and
    `minhash_lsh_pairs_between` dedups a new batch against a stored
    signature frame without re-hashing the corpus.

    Explode to (id, shingle) rows FIRST: each hash is then evaluated
    exactly once per (doc, shingle, perm). Building the signature as
    nested array expressions instead lets Catalyst's CollapseProject
    inline the whole tree into every downstream reference -- observed
    50x recompute blowup."""
    spark = df.sparkSession
    # hashing is CPU-bound: spread docs across all cores even when the
    # source is one small parquet file (one-partition scans otherwise
    # serialize the whole signature build)
    width = spark.sparkContext.defaultParallelism
    exploded = (df.select(F.col(id_col).alias("id"),
                          F.col(text_col).alias("t"))
                .repartition(width, F.col("id"))
                .select("id",
                        word_shingles(F.col("t"), k, distinct=False).alias("sh"))
                .select("id", F.explode("sh").alias("s")))
    if exact_mode():
        hashed = exploded.select(
            "id", "s",
            *[perm_hash(F.col("s"), i).alias(f"h{i}")
              for i in range(num_perm)])
    else:
        # Kirsch-Mitzenmacher double hashing: all num_perm permutation
        # hashes derive from TWO xxhash64 intrinsic evaluations per
        # shingle as h_i = h1 + i*h2 (mod 2^64 via long wraparound) --
        # an equally valid MinHash family at 1/8th the hash cost of
        # num_perm independent seeds. Two-step projection: CollapseProject
        # will not inline a multiply-referenced hash (not "cheap"), so h1
        # and h2 are each evaluated exactly once per shingle; h0 == h1 ==
        # xxhash64(s), which doubles as the Jaccard-verify set element.
        hashed = exploded.select(
            "id",
            F.xxhash64(F.col("s")).alias("_h1"),
            F.xxhash64(F.lit(-1), F.col("s")).alias("_h2"),
        ).select(
            "id",
            *[(F.col("_h1") + F.lit(i) * F.col("_h2")).alias(f"h{i}")
              for i in range(num_perm)])
    # signature + shingle set per doc: one shuffle on id. The set kept
    # for Jaccard verification is the h0 *hash* set, not the strings:
    # same set semantics (distinct shingles -> distinct 60/64-bit hashes,
    # collisions ~2^-60 and engine-identical), but the shuffle carries
    # 8-byte longs and the verify join intersects long arrays.
    return hashed.groupBy("id").agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(num_perm)],
        F.collect_set("h0").alias("sh"))


def _band_sig_cols(num_perm: int, bands: int) -> list:
    """Band signature expressions over signature columns m0..m{n-1}."""
    rows = num_perm // bands
    if exact_mode():
        return [
            F.md5(F.concat_ws(
                "_", F.lit(str(b)),
                *[F.col(f"m{b * rows + r}").cast("string")
                  for r in range(rows)]))
            for b in range(bands)]
    return [
        F.xxhash64(F.lit(b),
                   *[F.col(f"m{b * rows + r}") for r in range(rows)])
        for b in range(bands)]


def _cap_band_occupancy(banded: DataFrame, keys: list[str],
                        cap: int) -> DataFrame:
    """Drop band buckets holding more than ``cap`` members BEFORE the
    band self-join. A bucket of size c contributes O(c^2) candidate
    rows; on a web-scale corpus a single boilerplate mega-cluster
    (10^5..10^6 near-identical docs sharing every band signature) makes
    that the dominant -- and quadratic -- cost of the whole operator.
    The cap bounds per-bucket join work at cap^2; recall loss is
    confined to pairs INSIDE oversized buckets (by construction, members
    of a mega-cluster -- exactly the docs `collapse_exact_texts`
    should have collapsed first when they are byte-identical).

    groupBy + left_anti (not a window count): oversized buckets are few,
    so the bad-bucket side broadcasts under AQE and no sort is paid."""
    big = (banded.groupBy(*keys)
           .agg(F.count(F.lit(1)).alias("_occ"))
           .where(F.col("_occ") > cap)
           .select(*keys))
    return banded.join(big, keys, "left_anti")


def collapse_exact_texts(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Collapse byte-identical texts to one representative row (the
    min-id member): the standard pre-LSH step that removes the most
    common mega-cluster shape (identical boilerplate replicated 10^5x)
    BEFORE banding, where it would otherwise create O(c^2) candidate
    pairs inside every band bucket. One shuffle on the text fingerprint;
    rows carry (fingerprint, id) only until the surviving ids join back.

    Representative choice (min id) composes exactly with
    `dedup_survivors`' min-id-per-component rule: the survivor set of
    collapse+LSH equals the survivor set of LSH over the full corpus
    (identical texts have Jaccard 1 and always pair)."""
    # NULL texts are exempt: groupBy would put every NULL into one
    # md5(NULL) group and keep only the min id, but the uncollapsed LSH
    # pipeline never pairs null texts (null signatures -> null jaccard),
    # so collapsing them would break the survivor-set equivalence this
    # function guarantees. NULL-keyed rows dodge the semi join check by
    # never matching and are unioned back untouched.
    fp = F.md5(F.col(text_col))
    reps = (df.where(F.col(text_col).isNotNull())
            .select(F.col(id_col), fp.alias("_fp"))
            .groupBy("_fp").agg(F.min(id_col).alias(id_col))
            .select(id_col))
    return (df.where(F.col(text_col).isNull())
            .unionByName(df.where(F.col(text_col).isNotNull())
                         .join(reps, id_col, "left_semi")))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_perm: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
    max_band_occupancy: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding, verified with the
    true Jaccard over shingle sets. Returns (id_a, id_b, jaccard) with
    id_a < id_b and jaccard >= threshold.

    ``max_band_occupancy`` (default off -- exact output) drops band
    buckets larger than the cap before the self-join: the duplicate-skew
    guard for corpora with near-identical mega-clusters. Run
    `collapse_exact_texts` first when duplicates are byte-identical --
    that path loses NO recall (see SCALE.md round-9 skew probe).
    """
    sig = minhash_signatures(df, id_col, text_col, k, num_perm)
    # sig feeds three plan branches (banding explode + both verify-join
    # sides); column pruning gives each branch a different aggregate above
    # the groupBy shuffle, so ReuseExchange does NOT apply and the
    # 16-hashes-per-shingle build would run up to 3x. localCheckpoint
    # (not plain persist): same MEMORY_AND_DISK blocks, spills if large,
    # freed by ContextCleaner on plan GC -- AND it truncates lineage, so
    # the three consumers plan against a leaf RDD instead of each
    # re-analyzing the 16-hash signature subtree (the pretrain-pipeline
    # bounded-plans discipline; cache substitution happens only AFTER
    # analysis, so a persist saves execution but not Catalyst time).
    # Lazy: materializes on the first action, exactly like persist.
    sig = sig.localCheckpoint(eager=False)
    _PERSISTED.append(sig)
    band_cols = _band_sig_cols(num_perm, bands)
    # Banding carries ONLY (id, band_sig) -- never the shingle-hash set.
    # Carrying `sh` through the xbands explode and the band-keyed self-join
    # would replicate the corpus' largest column 8x through the widest
    # shuffle; instead candidates are deduped as bare id pairs first and
    # the hash sets joined back by id (two cheap narrow-ish joins on the
    # much smaller candidate set).
    banded = sig.select("id", F.explode(F.array(*band_cols)).alias("band_sig"))
    if max_band_occupancy is not None:
        banded = _cap_band_occupancy(banded, ["band_sig"],
                                     max_band_occupancy)
    a = banded.select(F.col("id").alias("id_a"), "band_sig")
    b = banded.select(F.col("id").alias("id_b"), "band_sig")
    cand = (a.join(b, "band_sig")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"]))
    sets = sig.select("id", "sh")
    cand = (cand
            .join(sets.select(F.col("id").alias("id_a"),
                              F.col("sh").alias("sh_a")), "id_a")
            .join(sets.select(F.col("id").alias("id_b"),
                              F.col("sh").alias("sh_b")), "id_b"))
    jac = (F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
           / F.size(F.array_union("sh_a", "sh_b")))
    return (cand.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def minhash_lsh_pairs_between(
    new_df: DataFrame,
    corpus_sig: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_perm: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Incremental dedup: near-dup pairs BETWEEN a new batch and an
    already-indexed corpus. Returns (new_id, corpus_id, jaccard >=
    threshold); within-batch and within-corpus pairs are NOT emitted
    (use minhash_lsh_pairs for those).

    ``corpus_sig`` is a signature frame from `minhash_signatures` --
    built with the SAME (k, num_perm) -- typically computed once and
    stored as parquet. That's the shape a 100 TB ingest pipeline
    needs: each incoming batch hashes only ITSELF (work ∝ batch), the
    corpus contributes a band-keyed join against its stored signatures,
    and the candidate set is new x corpus band collisions only -- never
    corpus x corpus. The band join's corpus side prunes to colliding
    band values; a small batch broadcast-joins under AQE.

    Plan order (adopted from the streaming twin after a 3-scale A/B):
    the batch signs itself per-row (minhash_signature_cols -- no
    groupBy), its verify set rides the band explode (cheap: batch-side
    only), the corpus sets join onto raw band collisions, and the
    Jaccard filter runs BEFORE dropDuplicates -- so the pair-dedup
    shuffle carries only true near-dups, never the full collision set.
    On replica-heavy corpora collisions >> verified pairs and the old
    dedup-candidates-first order paid for it: 10.6 -> 3.4 s at 100x,
    28.2 -> 7.6 s at 1000x, tie at sf0.1, identical pairs at all
    three."""
    from pyspark.storagelevel import StorageLevel
    # corpus_sig feeds TWO plan branches (band explode + verify join);
    # an unpersisted in-memory signature frame would recompute the full
    # corpus shingle-hash groupBy twice -- the exact blowup this function
    # exists to avoid. Parquet-reloaded frames are cheap re-scans, but
    # persist unconditionally when the caller hasn't: correctness of the
    # work bound shouldn't depend on call-site discipline.
    sl = corpus_sig.storageLevel
    if not (sl.useMemory or sl.useDisk):
        corpus_sig = corpus_sig.persist(StorageLevel.MEMORY_AND_DISK)
        _PERSISTED.append(corpus_sig)
    new_sig = minhash_signature_cols(new_df, id_col, text_col, k, num_perm)
    band_cols = _band_sig_cols(num_perm, bands)
    nb = (new_sig.select("id", "sh",
                         F.explode(F.array(*band_cols)).alias("band_sig"))
          .select(F.col("id").alias("new_id"),
                  F.col("sh").alias("sh_a"), "band_sig"))
    cb = (corpus_sig.select("id", F.explode(F.array(*band_cols))
                    .alias("band_sig"))
          .select(F.col("id").alias("corpus_id"), "band_sig"))
    sets_b = corpus_sig.select(F.col("id").alias("corpus_id"),
                               F.col("sh").alias("sh_b"))
    cand = nb.join(cb, "band_sig").join(sets_b, "corpus_id")
    jac = (F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
           / F.size(F.array_union("sh_a", "sh_b")))
    return (cand.select("new_id", "corpus_id",
                        F.round(jac, 6).alias("jaccard"))
            .where(F.col("jaccard") >= threshold)
            .dropDuplicates(["new_id", "corpus_id"]))


def _union_find_labels(rows) -> "pd.DataFrame":
    """Driver-side union-find over a SMALL collected edge list; labels
    every node with its component's MIN node id (the same fixpoint the
    distributed propagation converges to)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in rows:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    comp_min: dict = {}
    for n in parent:
        r = find(n)
        m = comp_min.get(r)
        if m is None or n < m:
            comp_min[r] = n
    nodes = sorted(parent)
    return pd.DataFrame({"id": nodes,
                         "comp": [comp_min[find(n)] for n in nodes]})


def connected_components(pairs: DataFrame, a_col: str = "id_a",
                         b_col: str = "id_b",
                         max_iter: int = 50,
                         small_graph_edges: int = 1_000_000) -> DataFrame:
    """(node, component) labels for the undirected near-dup pair graph:
    iterative min-label propagation to fixpoint.

    Small-graph fast path: verified near-dup pair sets are typically
    ORDERS smaller than the corpus (dedup's whole premise), so when a
    bounded limit-probe shows <= ``small_graph_edges`` edges (~30 MB
    collected at the 1M default) the labels come from one driver-side
    union-find instead of 3-5 shuffle rounds -- the standard production
    shape (GraphFrames does the same). The probe is a CollectLimit, so
    an over-limit graph stops early and falls through to the
    distributed loop; pass ``small_graph_edges=0`` to force the loop
    (the plan-growth tests do).

    Scale design (distributed path): each round is one groupBy-min over
    the edge list (labels hash-join onto edges, shuffle on node id);
    rounds needed = graph diameter, and near-dup clusters are shallow
    (pairs/triples -- log-diameter even for chains), so this converges
    in a handful of rounds. Labels persist each round; a count-based
    convergence check (#changed == 0) bounds the loop. The classic
    large-graph alternative (large-star/small-star) drops in with the
    same signature if corpora with deep chains show up.

    Lineage: persist bounds EXECUTION per round, but the LOGICAL plan
    still deepens every iteration -- the driver re-analyzes an
    ever-growing tree each round (quadratic total planning on deep
    graphs; at 1000-executor scale the serialized plan also bloats task
    dispatch). localCheckpoint every few rounds truncates the plan to
    the materialized blocks, keeping per-round planning O(1)
    (tests/test_queries_oracle.py::
    test_connected_components_deep_chain_bounded_plan asserts the
    bounded plan size on a chain graph)."""
    from pyspark.storagelevel import StorageLevel

    checkpoint_every = 4

    if small_graph_edges:
        sel = (pairs.select(F.col(a_col).alias("u"),
                            F.col(b_col).alias("v"))
               .persist(StorageLevel.MEMORY_AND_DISK))
        probe = sel.limit(small_graph_edges + 1).count()
        if probe <= small_graph_edges:
            # Arrow collect (toPandas), not .collect(): Row objects cost
            # ~10x the columnar footprint, which at the 1M-edge cap is
            # the difference between ~30 MB and hundreds of MB of driver
            # heap on a default-memory local driver.
            pdf = sel.toPandas()
            sel.unpersist()
            spark = pairs.sparkSession
            out_schema = T.StructType([
                T.StructField("id", sel.schema["u"].dataType),
                T.StructField("comp", sel.schema["u"].dataType)])
            if not len(pdf):
                return spark.createDataFrame([], schema=out_schema)
            rows = zip(pdf["u"].tolist(), pdf["v"].tolist())
            # pandas input: Arrow conversion path, no Python workers
            return spark.createDataFrame(_union_find_labels(rows),
                                         schema=out_schema)
        pairs = sel  # reuse the materialized edges in the loop below
        _PERSISTED.append(sel)
        a_col, b_col = "u", "v"

    edges = (pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
             .union(pairs.select(F.col(b_col).alias("u"),
                                 F.col(a_col).alias("v")))
             .distinct()
             .persist(StorageLevel.MEMORY_AND_DISK))
    labels = (edges.select("u").distinct()
              .select("u", F.col("u").alias("comp"))
              .persist(StorageLevel.MEMORY_AND_DISK))
    cached = labels  # the live persisted/checkpointed handle
    changed = 0
    for it in range(max_iter):
        # candidate label per node: min over own label and neighbors'.
        # The change flag rides the SAME persisted frame, so the
        # convergence count materializes the update in one action --
        # one join + one groupBy per round instead of two joins (r6).
        neigh = (edges.join(labels.withColumnRenamed("u", "v"), "v")
                 .groupBy("u").agg(F.min("comp").alias("ncomp")))
        upd = (labels.join(neigh, "u", "left")
               .select("u",
                       F.least("comp", F.coalesce("ncomp", "comp"))
                       .alias("newc"),
                       (F.coalesce("ncomp", F.col("comp"))
                        < F.col("comp")).cast("long").alias("chg"))
               .persist(StorageLevel.MEMORY_AND_DISK))
        changed = upd.agg(F.sum("chg")).collect()[0][0] or 0
        cached.unpersist()
        cached = upd
        labels = upd.select("u", F.col("newc").alias("comp"))
        if changed == 0:
            break
        if (it + 1) % checkpoint_every == 0:
            chk = labels.localCheckpoint(eager=True)
            cached.unpersist()
            cached = chk
            labels = chk
    if changed != 0:
        # max_iter rounds without a fixpoint: the graph's diameter
        # exceeds the round budget (min-label needs diameter rounds; a
        # deep chain needs thousands). Returning the partial labels
        # would be SILENTLY WRONG -- a 495k-node 64-chain probe returned
        # 109k components instead of 7.8k before this guard. Finish on
        # the CONTRACTED graph (one node per current label, far smaller
        # and shallower) with the O(log n) star rounds; composing the
        # meta-labels preserves min-label semantics because current
        # labels are already per-subtree minima.
        meta_edges = (edges
                      .join(labels.withColumnRenamed("comp", "cu"), "u")
                      .join(labels.select(F.col("u").alias("v"),
                                          F.col("comp").alias("cv")), "v")
                      .where(F.col("cu") != F.col("cv"))
                      .select("cu", "cv").distinct())
        meta = connected_components_star(meta_edges, "cu", "cv")
        labels = (labels
                  .join(meta.select(F.col("id").alias("comp"),
                                    F.col("comp").alias("meta_comp")),
                        "comp", "left")
                  .select("u", F.coalesce("meta_comp", "comp")
                          .alias("comp")))
        cached2 = labels.persist(StorageLevel.MEMORY_AND_DISK)
        _PERSISTED.append(cached2)
        labels = cached2
    edges.unpersist()
    # hand the LIVE cache handle to the release hook (the returned
    # projection reads through it); callers free via unpersist_cached()
    _PERSISTED.append(cached)
    return labels.withColumnRenamed("u", "id")


def connected_components_star(pairs: DataFrame, a_col: str = "id_a",
                              b_col: str = "id_b",
                              max_iter: int = 30) -> DataFrame:
    """(node, component) labels via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14 -- public algorithm): converges in O(log n) rounds on ANY
    graph shape, vs. graph-diameter rounds for min-label propagation.

    Use this over connected_components() when clusters can be deep
    chains (reply threads, citation chains): a 1M-node path costs ~20
    rounds here vs 1M rounds there. Per round: two groupBy-min + join
    shuffles on node id; edges localCheckpoint each round (bounded
    plan). Same output contract as connected_components.

    large-star: every neighbor LARGER than u links to u's minimum
    (strictly decreases large endpoints); small-star: u and its
    smaller neighbors all link to the minimum (flattens into stars).
    Fixpoint: every edge (u, root) with root = component minimum."""
    e = (pairs.select(F.col(a_col).cast("long").alias("u"),
                      F.col(b_col).cast("long").alias("v"))
         .where(F.col("u") != F.col("v")))
    nodes = (e.select("u").union(e.select(F.col("v").alias("u")))
             .distinct())

    def large_star(ed: DataFrame) -> DataFrame:
        sym = ed.union(ed.select(F.col("v").alias("u"),
                                 F.col("u").alias("v")))
        mins = (sym.groupBy("u").agg(F.min("v").alias("m"))
                .withColumn("m", F.least("m", F.col("u"))))
        return (sym.join(mins, "u")
                .where(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .where(F.col("u") != F.col("v"))
                .distinct())

    def small_star(ed: DataFrame) -> DataFrame:
        o = ed.select(F.greatest("u", "v").alias("u"),
                      F.least("u", "v").alias("v")).distinct()
        mins = o.groupBy("u").agg(F.min("v").alias("m"))
        linked = o.join(mins, "u").select(
            F.explode(F.array(
                F.struct(F.col("v").alias("a"), F.col("m").alias("b")),
                F.struct(F.col("u").alias("a"), F.col("m").alias("b"))
            )).alias("p")).select(F.col("p.a").alias("u"),
                                  F.col("p.b").alias("v"))
        return linked.where(F.col("u") != F.col("v")).distinct()

    prev_sig = None
    for _ in range(max_iter):
        e = small_star(large_star(e)).localCheckpoint(eager=True)
        # convergence: the oriented edge set is a fixpoint -- one tiny
        # aggregate over (count, checksum) instead of a full diff join.
        # bit_xor, not sum: XOR of 64-bit hashes is order-insensitive
        # and cannot overflow, so the check is safe under ANSI mode
        # (Spark 4 default) where sum(xxhash64) throws ARITHMETIC_OVERFLOW
        # almost surely beyond a handful of edges.
        sig = e.select(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h")).collect()[0]
        if prev_sig == (sig["n"], sig["h"]):
            break
        prev_sig = (sig["n"], sig["h"])
    labels = (nodes.join(e.withColumnRenamed("v", "comp"), "u", "left")
              .select("u", F.coalesce("comp", F.col("u")).alias("comp")))
    out = labels
    _PERSISTED.append(out)
    return out.withColumnRenamed("u", "id")


def dedup_survivors(df: DataFrame, pairs: DataFrame,
                    id_col: str = "doc_id") -> DataFrame:
    """Resolve near-dup PAIRS into a deduplicated corpus: group pairs
    into connected components, keep the lowest id per component, drop
    the other members. Rows never appearing in a pair survive as-is.

    Pipeline order at scale (the duplicate-skew lesson, SCALE.md r9):
    run `collapse_exact_texts` FIRST, generate pairs over the collapsed
    corpus, then resolve here -- byte-identical mega-clusters never
    reach the band join, and because both steps keep the min id the
    survivor set is IDENTICAL to LSH over the raw corpus.
    `near_dup_survivors` packages that order."""
    comp = connected_components(pairs)
    keep = comp.groupBy("comp").agg(F.min("id").alias("keep_id"))
    drop = (comp.join(keep, "comp")
            .where(F.col("id") != F.col("keep_id"))
            .select(F.col("id").alias(id_col)))
    return df.join(drop, id_col, "left_anti")


def near_dup_survivors(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", *, k: int = 3,
                       num_perm: int = 16, bands: int = 8,
                       threshold: float = 0.5,
                       collapse_exact: bool = True,
                       max_band_occupancy: int | None = None) -> DataFrame:
    """End-to-end near-dup dedup, mega-cluster-safe: collapse
    byte-identical texts to their min-id representative, MinHash+LSH
    pairs over the collapsed corpus only, connected components, keep the
    min id per component.

    Equivalence: identical texts always pair (Jaccard 1), so in the
    uncollapsed run every exact-dup group is one component (or part of
    a bigger one) whose min id survives -- the same row this pipeline
    keeps. The collapse only removes rows that were guaranteed to be
    dropped, while turning the O(c^2) intra-cluster candidate blowup
    into c rows through one fingerprint shuffle (measured on the
    planted-mega-cluster probe, SCALE.md r9). ``max_band_occupancy``
    additionally bounds NON-identical mega-clusters at a recall cost
    confined to oversized buckets; default off."""
    base = (collapse_exact_texts(df, id_col, text_col)
            if collapse_exact else df)
    pairs = minhash_lsh_pairs(base, id_col, text_col, k=k,
                              num_perm=num_perm, bands=bands,
                              threshold=threshold,
                              max_band_occupancy=max_band_occupancy)
    return dedup_survivors(base, pairs, id_col)


def simhash64(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", bits: int = 16, k: int = 3) -> DataFrame:
    """SimHash over word shingles: bit j is the sign of the sum of
    (+1/-1) votes from each shingle's hash bit j. Distributed as
    explode -> per-(doc,bit) conditional sums -> reassemble; one shuffle
    on doc id."""
    sh = (df.select(F.col(id_col).alias("id"),
                    word_shingles(F.col(text_col), k).alias("sh"))
          .select("id", F.explode("sh").alias("s"))
          .withColumn("h", h60(F.col("s")) if exact_mode()
                      else F.xxhash64(F.col("s"))))
    votes = [
        F.sum(F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1)
              .otherwise(-1)).alias(f"v{j}")
        for j in range(bits)
    ]
    agg = sh.groupBy("id").agg(*votes)
    fp = None
    for j in range(bits):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(2 ** j)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return agg.select("id", fp.cast("bigint").alias("simhash"))


def auto_simhash_bits(n: int, bands: int = 4, target_per_slice: int = 128,
                      lo: int = 16, hi: int = 60) -> int:
    """Fingerprint width so each band slice's value space keeps expected
    occupancy ~target: 2^(bits/bands) >= n / target, bits snapped UP to
    a multiple of ``bands``, clamped to [lo, hi]. The simhash twin of
    auto_block_bits -- at fixed width, slice occupancy grows linearly
    with the corpus and candidate pairs quadratically."""
    import math
    per_slice = max(1, math.ceil(math.log2(max(n, 1) / target_per_slice))
                    if n > target_per_slice else 1)
    bits = per_slice * bands
    bits = ((bits + bands - 1) // bands) * bands
    # hi defaults to 60, not 64: fingerprints assemble as 2^j literals
    # in a signed 64-bit column, so j must stay below 63; 60 also keeps
    # bits a multiple of the default 4 bands
    return max(lo, min(hi, max(bits, lo)))


def simhash_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", bits: int | str = 16, k: int = 3,
                  bands: int = 4, max_hamming: int = 3,
                  max_band_occupancy: int | None = None) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= ``max_hamming``.

    Candidate generation uses the pigeonhole principle: split the
    ``bits``-bit fingerprint into ``bands`` equal slices -- any pair
    within ``bands - 1`` bit flips matches EXACTLY on at least one
    slice, so candidates come from ``bands`` cheap equi-joins on slice
    values (never all-pairs). Verification is bit_count(xor) on the
    full fingerprint. Requires max_hamming < bands for the recall
    guarantee.

    Scale sizing (the SCALE.md blocking-width lesson): a band slice has
    ``2^(bits/bands)`` possible values, and random (non-near-dup)
    fingerprints spread uniformly over them -- so keep
    ``2^(bits/bands) >= n / 128`` or per-slice occupancy grows linearly
    and candidate pairs quadratically with the corpus. At 16/4 (the
    test default) that holds to ~2k docs; a 100 TB corpus wants
    ``bits=64, bands=4`` (65536 slice values) with ``max_hamming``
    rescaled to the wider fingerprint. Pass ``bits="auto"`` to apply
    that rule from a corpus count (auto_simhash_bits) instead of
    trusting the caller got it right -- the explicit-width form stays
    the oracle-deterministic default.

    ``max_band_occupancy``: duplicate-skew guard; see
    `minhash_lsh_pairs` (auto-sizing bounds RANDOM slice occupancy,
    not the correlated occupancy a near-identical mega-cluster
    creates)."""
    if bits == "auto":
        bits = auto_simhash_bits(df.count(), bands=bands)
    fp = simhash64(df, id_col, text_col, bits=bits, k=k)
    return hamming_fp_pairs(fp, bits=bits, bands=bands,
                            max_hamming=max_hamming,
                            max_band_occupancy=max_band_occupancy)


def hamming_fp_pairs(fp: DataFrame, *, bits: int, bands: int = 4,
                     max_hamming: int = 3,
                     max_band_occupancy: int | None = None,
                     id_col: str = "id",
                     fp_col: str = "simhash") -> DataFrame:
    """Pairs of rows whose ``bits``-bit fingerprints are within
    ``max_hamming`` -- the banding/verification half of simhash_pairs,
    decoupled from HOW the fingerprint was computed so any
    Hamming-space near-dup keying reuses it (SimHash over text,
    dHash/pHash over images: operators/multimodal.py). Pigeonhole
    candidate generation + map-side bit_count verification; see
    simhash_pairs for the sizing and skew notes. Returns
    (id_a, id_b, hamming)."""
    if max_hamming >= bands:
        raise ValueError("pigeonhole guarantee needs max_hamming < bands")
    if id_col != "id":
        fp = fp.withColumnRenamed(id_col, "id")
    if fp_col != "simhash":
        fp = fp.withColumnRenamed(fp_col, "simhash")
    width = bits // bands
    mask = (1 << width) - 1
    slices = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.shiftright(F.col("simhash"), b * width)
                 .bitwiseAND(F.lit(mask)).alias("val"))
        for b in range(bands)])
    banded = (fp.select("id", "simhash",
                        F.explode(slices).alias("s"))
              .select("id", "simhash", F.col("s.band").alias("band"),
                      F.col("s.val").alias("val")))
    if max_band_occupancy is not None:
        # same duplicate-skew guard as minhash_lsh_pairs: a mega-cluster
        # shares every slice value, so its buckets grow with the cluster
        # and candidates quadratically; auto-sizing (bits="auto") keeps
        # RANDOM occupancy bounded but cannot help correlated occupancy
        banded = _cap_band_occupancy(banded, ["band", "val"],
                                     max_band_occupancy)
    a = banded.select(F.col("id").alias("id_a"),
                      F.col("simhash").alias("fp_a"), "band", "val")
    b = banded.select(F.col("id").alias("id_b"),
                      F.col("simhash").alias("fp_b"), "band", "val")
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    # Hamming-verify BEFORE dropDuplicates: a pair surfacing from k
    # bands is k candidate rows, and at auto-sized occupancy (~128 per
    # slice) the candidate stream is ~bands*128/2 rows PER DOC -- 1.5B
    # rows at the 5M-doc probe. Verification is a map-side bit_count on
    # the joined row, so failing candidates die in-stage; only real
    # near-dups (plus band-duplicates of them) reach the dedup
    # shuffle. The pre-fix order shuffled the full candidate set
    # through dropDuplicates first and filled 50+ GB of spill at 5M
    # docs. Result-identical: hamming is a pure function of the pair.
    return (a.join(b, ["band", "val"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", ham.cast("int").alias("hamming"))
            .where(F.col("hamming") <= max_hamming)
            .dropDuplicates(["id_a", "id_b"]))


def write_signature_index(df: DataFrame, index_dir: str,
                          id_col: str = "doc_id", text_col: str = "text",
                          k: int = 3, num_perm: int = 16) -> None:
    """Materialize a corpus' MinHash signature index as parquet --
    the stored artifact `minhash_lsh_pairs_between` dedups future
    batches against. Schema: (id, m0..m{n-1}, sh) -- pinned by the
    dedup_index_roundtrip gate to survive the round-trip byte-exactly."""
    (minhash_signatures(df, id_col, text_col, k, num_perm)
     .write.mode("overwrite").parquet(index_dir))


def append_signature_index(df: DataFrame, index_dir: str,
                           id_col: str = "doc_id", text_col: str = "text",
                           k: int = 3, num_perm: int = 16,
                           compact_after: bool = False,
                           target_file_bytes: int = 128 * 1024 * 1024) -> None:
    """Ingest-loop maintenance of a stored signature index: sign ONLY
    the new batch (per-row `minhash_signature_cols` -- no groupBy, work
    strictly proportional to the batch) and parquet-append it under the
    index directory. ``compact_after`` rewrites the directory to
    target-sized files (sources.io.compact_parquet's staged-write+swap),
    countering trickle-append small-file degradation -- at one batch
    per hour a year of ingest is 8,760 files of scan overhead.

    Two-batch ingest is provably equivalent to one-shot indexing: both
    signature builders produce identical (id, m*, sh-set) values per
    doc and the index is keyed by id with disjoint batches, so the
    stored relation is row-identical (the dedup_index_append gate pins
    downstream pairs; tests pin the relation itself)."""
    sig = minhash_signature_cols(df, id_col, text_col, k, num_perm)
    sig.write.mode("append").parquet(index_dir)
    if compact_after:
        from ..sources.io import compact_parquet
        compact_parquet(df.sparkSession, index_dir, target_file_bytes)


def _positional_gram_hashes(c: Column, span: int) -> Column:
    """Positional ``span``-token gram hashes -> array<bigint>, entry i =
    hash of tokens [i, i+span) (0-based). NO short-text fallback: a doc
    under ``span`` tokens yields an empty array -- substring dedup only
    concerns spans of at least ``span`` tokens (unlike doc-level
    shingling, where short docs must still produce a signature).

    Exact mode hashes the joined gram string with h60 (the DuckDB
    oracle rebuilds it verbatim); fast mode chains xxhash64 over the
    PER-TOKEN hash array -- no L-x gram-string blowup, just span-1
    integer-hash passes, which is what you want when span=50 over a
    100-TB corpus."""
    words = F.split(F.trim(c), "\\s+")
    n = F.greatest(F.size(words) - (span - 1), F.lit(0))
    if exact_mode():
        grams = F.slice(words, 1, n)
        for j in range(1, span):
            grams = F.zip_with(grams, F.slice(words, j + 1, n),
                               lambda a, b: F.concat(a, F.lit(" "), b))
        return F.transform(grams, h60)
    th = F.transform(words, lambda w: F.xxhash64(w))
    gh = F.slice(th, 1, n)
    for j in range(1, span):
        gh = F.zip_with(gh, F.slice(th, j + 1, n),
                        lambda a, b: F.xxhash64(a, b))
    return gh


def duplicate_span_positions(df: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text",
                             span: int = 50) -> DataFrame:
    """Non-canonical occurrences of duplicated ``span``-token grams:
    (id, pos) rows where the gram starting at token ``pos`` appears at
    least twice in the corpus and this occurrence is not the first by
    (id, pos) order -- the first occurrence keeps its text, every other
    one gets excised (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better", the ExactSubstr operator; their
    suffix-array scan is replaced by positional gram hashing, the
    shuffle-friendly formulation).

    Scale: the occurrence stream carries only (gh, id, pos) -- ~20
    bytes/token. "Not the first occurrence" is computed WITHOUT a
    per-gram ordered window: the canonical occurrence per gram is
    `groupBy(gh).agg(min(struct(id, pos)))` -- a hash aggregate whose
    MAP-SIDE partial combine collapses every task's occurrences of a
    gram to one row before the exchange, so a boilerplate span repeated
    in 10^6 docs ships 10^6 pre-combined partials, never lands 10^6
    rows in one partition -- anti-joined back on the FULL (gh, id, pos)
    key, which hash-distributes a hot gram's occurrences across all
    partitions (each (id, pos) differs). The previous formulation
    (`row_number` over `Window.partitionBy(gh)`) sorted a gram's entire
    occurrence cluster in ONE task -- the same skew class the LSH band
    family is guarded against (probed flat-wall in
    tools/probe_lsh_skew.py --mega-span). Output is sparse --
    proportional to duplicated text, not corpus size."""
    from pyspark.storagelevel import StorageLevel
    occ = (df.select(
        F.col(id_col),
        F.posexplode(_positional_gram_hashes(F.col(text_col), span))
        .alias("pos", "gh"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    _PERSISTED.append(occ)
    # (id, pos) is globally unique per occurrence, so the canonical SET
    # alone identifies first occurrences -- the anti join keys on it
    # directly (name-based keys: canon derives from occ, and qualified
    # column predicates on a self-derived frame resolve ambiguously)
    canon = (occ.groupBy("gh")
             .agg(F.min(F.struct(F.col(id_col).alias("i"),
                                 F.col("pos").alias("p"))).alias("_m"))
             .select(F.col("_m.i").alias(id_col),
                     F.col("_m.p").alias("pos")))
    return (occ.select(id_col, "pos")
            .join(canon, [id_col, "pos"], "left_anti"))


def excise_positions(df: DataFrame, positions: DataFrame, *,
                     span: int, id_col: str = "doc_id",
                     text_col: str = "text",
                     out_col: str | None = None) -> DataFrame:
    """Remove every token covered by a [pos, pos+span) window for each
    (id, pos) row of ``positions`` -- the shared excision tail of
    excise_duplicate_spans (self-dedup positions) and
    excise_contaminated_spans (benchmark-hit positions).

    Plan: the sparse (id, pos) stream groups per doc (small shuffle),
    joins back to the corpus (AQE broadcasts it when sparse), and the
    excision itself is doc-local expressions: merge sorted positions
    into disjoint [s, e) intervals (one O(|P|) fold), then filter
    tokens by interval membership -- O(tokens x intervals) with
    intervals already coalesced, so contiguous spans cost one interval,
    not one test per hit. Whitespace normalizes to single spaces (the
    tokenization is the unit of excision, as in Lee et al. 2022)."""
    out_col = out_col or text_col
    plists = positions.groupBy(id_col).agg(
        F.sort_array(F.collect_list("pos")).alias("_dp"))
    joined = df.join(plists, id_col, "left")
    words = F.split(F.trim(F.col(text_col)), "\\s+")
    L = F.lit(span)
    ivs = F.aggregate(
        F.coalesce(F.col("_dp"), F.array().cast("array<int>")),
        F.array().cast("array<struct<s:int,e:int>>"),
        lambda acc, p: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1).getField("e") >= p),
            # overlap/adjacency: extend the last interval to p+span
            # (positions are sorted, so p+span >= last.e always)
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.struct(
                         F.element_at(acc, -1).getField("s").alias("s"),
                         (p + L).alias("e"))))
        ).otherwise(
            F.concat(acc, F.array(F.struct(p.alias("s"),
                                           (p + L).alias("e"))))))
    kept = F.filter(words, lambda t, i: ~F.exists(
        ivs, lambda iv: (iv.getField("s") <= i) & (i < iv.getField("e"))))
    new_text = F.array_join(kept, " ")
    cols = [new_text.alias(out_col) if c == out_col else F.col(c)
            for c in df.columns]
    if out_col not in df.columns:
        cols.append(new_text.alias(out_col))
    return joined.select(*cols)


def excise_duplicate_spans(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", span: int = 50,
                           out_col: str | None = None) -> DataFrame:
    """Substring-level exact dedup: remove every token covered by a
    non-canonical duplicated ``span``-token gram, keeping the first
    occurrence corpus-wide (Lee et al. 2022 ExactSubstr). Positions
    from duplicate_span_positions; excision via the shared
    excise_positions tail."""
    dup = duplicate_span_positions(df, id_col, text_col, span)
    return excise_positions(df, dup, span=span, id_col=id_col,
                            text_col=text_col, out_col=out_col)


def excise_contaminated_spans(train: DataFrame, bench: DataFrame, *,
                              k: int = 13, id_col: str = "doc_id",
                              text_col: str = "text",
                              out_col: str | None = None) -> DataFrame:
    """Span-level benchmark decontamination: excise ONLY the tokens
    covered by a benchmark ``k``-gram hit instead of dropping the whole
    document (curation.decontaminate) -- the higher-recall protocol for
    long documents, where one leaked question should not cost the other
    10k tokens. The doc-drop operator remains the conservative mode
    (GPT-3 appendix C drops; Lee et al.-style span excision keeps the
    clean remainder).

    Plan: the benchmark's distinct positional gram hashes
    (gram_hash_index -- 8 bytes per distinct gram, MBs for real eval
    sets) BROADCAST; the train side is one scan -> positional-gram
    posexplode -> broadcast LEFT SEMI for hit positions -> the shared
    interval-merge excision (excise_positions). The corpus is never
    shuffled on content: the only exchange carries the sparse (id, pos)
    hit stream, proportional to contamination, not corpus size. Docs
    (or bench rows) shorter than ``k`` tokens yield no grams: short
    train docs are never excised, exactly like the streaming twin
    (stream_excise_spans shares this index + hit semantics)."""
    idx = gram_hash_index(bench, id_col, text_col, span=k)
    occ = train.select(
        F.col(id_col),
        F.posexplode(_positional_gram_hashes(F.col(text_col), k))
        .alias("pos", "gh"))
    hits = (occ.join(F.broadcast(idx), "gh", "left_semi")
            .select(id_col, "pos"))
    return excise_positions(train, hits, span=k, id_col=id_col,
                            text_col=text_col, out_col=out_col)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str | None = None,
    k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard pairs, blocked by ``block_col`` to bound the
    quadratic comparison (at scale: block on a cheap key -- source,
    length band, LSH bucket -- never all-pairs).

    ``max_doc_freq``: drop "stop shingles" appearing in more than this
    many docs BEFORE the intersection join, and compute Jaccard over
    the pruned sets (sizes prune consistently, so the ratio stays a
    true Jaccard -- of the informative-shingle sets). The shingle-keyed
    join's worst case is sum(df_s^2) over shingles; on a web-scale
    corpus a single boilerplate shingle shared by 1M docs alone
    contributes 10^12 join rows, so the default-off cap is the knob
    that bounds the join independent of corpus skew. Standard
    CCNet/RefinedWeb-style practice."""
    spark = df.sparkSession
    width = spark.sparkContext.defaultParallelism
    ex = (df.select(F.col(id_col).alias("id"),
                    *([F.col(block_col).alias("blk")] if block_col else
                      [F.lit(1).alias("blk")]),
                    F.col(text_col).alias("t"))
          .repartition(width, F.col("id"))
          .select("id", "blk",
                  F.explode(word_shingles(F.col("t"), k, distinct=False))
                  .alias("s"))
          .dropDuplicates(["id", "s"]))
    if max_doc_freq is not None:
        # one extra shuffle on shingle; the join after it is bounded by
        # max_doc_freq^2 per surviving shingle. Persist the exploded
        # shingle frame first: it feeds BOTH the df count and the prune
        # join, and their exchanges differ after column pruning (s-only
        # vs id,blk,s), so ReuseExchange cannot dedupe them -- without
        # the cache the full explode subtree evaluates twice here and
        # the pruned frame three more times below (sizes/a/b). At the
        # 5M-doc probe that recompute was the whole regression: 484 s
        # -> ~120 s with the intermediates cached once each.
        ex.persist()
        _PERSISTED.append(ex)
        keep = (ex.groupBy("s")
                .agg(F.count(F.lit(1)).alias("_df"))
                .where(F.col("_df") <= max_doc_freq)
                .select("s"))
        ex = ex.join(keep, "s")
    # pruned (or raw, when uncapped) shingles feed sizes + both join
    # sides -- three plan references, same pruning problem
    ex.persist()
    _PERSISTED.append(ex)
    sizes = ex.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    # shingle-keyed join counts |A ∩ B| directly: work is proportional to
    # actually-shared shingles, never to all O(n^2) pairs x array length.
    a = ex.select(F.col("id").alias("id_a"), "blk", "s")
    b = ex.select(F.col("id").alias("id_b"), "blk", "s")
    common = (a.join(b, ["blk", "s"])
              .where(F.col("id_a") < F.col("id_b"))
              .groupBy("id_a", "id_b")
              .agg(F.count(F.lit(1)).alias("common")))
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = (F.col("common").cast("double")
           / (F.col("n_a") + F.col("n_b") - F.col("common")))
    return (common.join(sa, "id_a").join(sb, "id_b")
            .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def gram_hash_index(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", span: int = 50) -> DataFrame:
    """The corpus' distinct positional gram hashes -- the stored
    artifact streaming span excision cleans micro-batches against
    (streaming/dedup.stream_excise_spans), ~8 bytes per distinct
    span-gram. Append new batches' grams with mode('append') like the
    signature/Bloom indexes; duplicate gh rows across segments are
    harmless (the probe distincts on read)."""
    return (df.select(F.explode(
        _positional_gram_hashes(F.col(text_col), span)).alias("gh"))
        .distinct())
