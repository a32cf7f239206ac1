"""Scalar quantization (SQ8): the 4x embedding-compression tier.

Per-dimension linear quantization to ``bits``-bit integer codes
(Faiss's SQ8 / Milvus IVF_SQ8 recipe): train exact per-dim [lo, hi]
bounds in ONE aggregation pass, encode each float to
``floor((x - lo) / (hi - lo) * levels)``, and search by exact l2
against the DEQUANTIZED codes. Sits between raw vectors (4 bytes/dim)
and PQ (pq.py, m ints/vector): 1 byte/dim, near-lossless recall,
no codebook training -- the default first compression step for a
100-TB embedding corpus.

Scale design: bounds are a d-pair model artifact (collected once,
O(d) regardless of corpus size -- the codebook-table pattern); the
codes frame is the durable index (write next to the raw vectors);
the scoring pass is corpus-codes x broadcast(queries) with the score
a pure JVM array-fold expression, zero Python, zero corpus shuffle;
top-k is a per-query WindowGroupLimit. Out-of-range values in LATER
batches (drift past the trained bounds) clamp to [0, levels] --
re-train + re-encode compaction applies exactly as in pq_compact.

Distance bookkeeping mirrors pq.py: rank by the two-dot form
``dot(dq, dq) - 2 * dot(dq, q)`` (query-constant ||q||^2 dropped,
round 6 dp, ties to the lowest corpus id) -- every float term a
sequential-fold dot product the DuckDB oracle reproduces bit-for-bit.

Reference parity: the reference delegates vector search to a managed
external index (bodo/pandas/frame.py:721 S3 Vectors); here the engine
provides the compression tier itself, like pq.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .similarity import dot

__all__ = ["sq_train", "sq_encode", "sq_code_expr", "sq_topk",
           "ivf_sq_index",
           "ivf_sq_topk", "sq_append", "sq_clamp_fraction",
           "sq_reconstruction_mse", "sq_compact",
           "ivf_sq_topk_segments", "sq_store_index", "sq_stored_topk",
           "sq_stored_append", "sq_stored_compact"]


def sq_train(vectors: DataFrame, *,
             vec_col: str = "embedding") -> tuple[list, list]:
    """Exact per-dimension [lo, hi] bounds over the corpus: ONE
    posexplode + 64-key aggregation (map-side partials emit d rows per
    task, so the exchange is tiny at any corpus size), collected as a
    d-pair model artifact (the bounded-collect pattern of the IVF
    centroid/PQ codebook tables). Returns ``(los, his)`` lists of
    python floats -- deterministic, so a SQL oracle re-derives them."""
    rows = (vectors.select(F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("pos")
            .agg(F.min(F.col("x").cast("double")).alias("lo"),
                 F.max(F.col("x").cast("double")).alias("hi"))
            .collect())
    if not rows:
        raise ValueError("sq_train needs a non-empty corpus")
    # sort the d-row model driver-side: a Spark orderBy on a bounded
    # aggregate output costs a range-partitioning exchange plus its
    # sampling job per call (measured: sq_train ran 4 AQE jobs, 2 of
    # them only for the sort of <=64 rows)
    rows.sort(key=lambda r: r["pos"])
    return ([float(r["lo"]) for r in rows], [float(r["hi"]) for r in rows])


def _bound_arrays(los: list, his: list):
    lo = F.array(*[F.lit(float(v)) for v in los])
    hi = F.array(*[F.lit(float(v)) for v in his])
    return lo, hi


def sq_code_expr(vec_col, los: list, his: list, *,
                 bits: int = 8):
    """The SQ code as a COLUMN over a vector column: code_i =
    clamp(floor((x_i - lo_i) / (hi_i - lo_i) * levels), 0, levels)
    with levels = 2^bits - 1; a constant dimension (hi == lo) encodes
    0. Pure JVM transform expression (the bound arrays are two d-float
    literals), so a consumer can compute it in the SAME pass that
    assigns cells -- no second scan, no id join (ivf_sq_index /
    sq_stored_append fuse on it)."""
    if not 2 <= bits <= 16:
        raise ValueError(f"bits must be in [2, 16], got {bits}")
    levels = (1 << bits) - 1
    lo, hi = _bound_arrays(los, his)
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(
        v,
        lambda x, i: F.when(
            F.element_at(hi, i + 1) == F.element_at(lo, i + 1),
            F.lit(0)).otherwise(
            F.least(F.lit(levels), F.greatest(F.lit(0), F.floor(
                (x.cast("double") - F.element_at(lo, i + 1))
                / (F.element_at(hi, i + 1) - F.element_at(lo, i + 1))
                * levels).cast("int")))).cast("int"))


def sq_encode(vectors: DataFrame, los: list, his: list, *,
              id_col: str = "vec_id", vec_col: str = "embedding",
              bits: int = 8) -> DataFrame:
    """Encode to ``(id_col, code array<int>)`` -- the durable 1-byte/dim
    index artifact (sq_code_expr over the vector column), no shuffle."""
    code = sq_code_expr(vec_col, los, his, bits=bits)
    return vectors.select(id_col, code.alias("code"))


def sq_dequantize(code_col, los: list, his: list, *,
                  bits: int = 8):
    """Column expression reconstructing array<double> from a code
    array: dq_i = lo_i + code_i * ((hi_i - lo_i) / levels)."""
    levels = (1 << bits) - 1
    lo, hi = _bound_arrays(los, his)
    c = F.col(code_col) if isinstance(code_col, str) else code_col
    return F.transform(
        c, lambda v, i: F.element_at(lo, i + 1)
        + v.cast("double") * ((F.element_at(hi, i + 1)
                               - F.element_at(lo, i + 1))
                              / F.lit(float(levels))))


def sq_topk(codes: DataFrame, queries: DataFrame, los: list, his: list, *,
            k: int = 5, bits: int = 8, id_col: str = "vec_id",
            code_col: str = "code", q_id_col: str = "q_id",
            q_vec_col: str = "q_vec") -> DataFrame:
    """Top-k by exact l2 against the dequantized codes: returns
    ``(q_id, vec_id, adist, rn)`` with rn 1..k ascending (ties to the
    lowest corpus id); ``adist`` is the two-dot form. Plan: codes x
    broadcast(queries), score = one fold expression over the
    reconstructed array, per-query WindowGroupLimit -- the raw corpus
    is never read at search time."""
    dq = sq_dequantize(code_col, los, his, bits=bits)
    qv = queries.select(F.col(q_id_col).alias("q_id"),
                        F.col(q_vec_col).alias("_qv"))
    # dot(dq, dq) is query-independent: evaluate it ONCE per corpus row
    # before the join (the brute_force_topk norm trick) -- at q queries
    # that saves q-1 redundant d-length folds per row
    scored = (codes.withColumn("_dq", dq)
              .withColumn("_dd", dot(F.col("_dq"), F.col("_dq")))
              .crossJoin(F.broadcast(qv))
              .select(F.col("q_id"), F.col(id_col),
                      F.round(F.col("_dd")
                              - 2 * dot(F.col("_dq"), F.col("_qv")), 6)
                      .alias("adist")))
    w = W.partitionBy("q_id").orderBy("adist", id_col)
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .select("q_id", id_col, "adist",
                    F.col("rn").cast("bigint").alias("rn")))


# --------------------------------------------------------------------------
# IVF-SQ8: the Faiss IVF_SQ8 index type -- coarse cells x SQ codes. The
# same composition as ivf_pq_index (pq.py), with the SQ code column in
# place of PQ codes: cell pruning and 4x compression multiply, recall
# stays near-exact (SQ reconstruction error << inter-point distances),
# no codebook training. The right default when memory allows 1 byte/dim.

def ivf_sq_index(vectors: DataFrame, los: list, his: list, *,
                 n_cells: int = 8, centroids: list | None = None,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 coarse_dim: int = 16,
                 seed_vectors: DataFrame | None = None,
                 bits: int = 8) -> DataFrame:
    """The IVF-SQ inverted file: ``(id, cell, code)``. Cell routing is
    the shared IVF machinery (deterministic lowest-id centroid table,
    or explicit ``centroids`` via the gemm assigner); codes are
    sq_code_expr's. Same lifecycle contract as ivf_pq_index: pin
    ``seed_vectors``/``centroids`` across incremental builds so
    batches route identically.

    ONE pass over the corpus (r14): the code expression is computed on
    the SAME rows the cell assignment carries through (assign_nearest_
    cell's max_by struct keeps every input column), so the former
    ``codes.join(cells, id)`` -- a second corpus scan plus an id
    join/exchange re-associating two projections of the same rows --
    is gone. Row values are identical: the join was 1:1 on the shared
    id by construction."""
    from .similarity import (_centroid_table, _ensure_scan_width,
                             assign_nearest_cell, cell_assigner_udf)
    code = sq_code_expr(vec_col, los, his, bits=bits)
    if centroids is not None:
        # per-row gemm assignment + per-row encode: zero shuffles
        return (_ensure_scan_width(vectors).select(id_col, vec_col)
                .select(id_col,
                        cell_assigner_udf(centroids, coarse_dim)(
                            F.col(vec_col)).alias("cell"),
                        code.alias("code")))
    cents = _centroid_table(
        seed_vectors if seed_vectors is not None else vectors,
        None, n_cells, coarse_dim, id_col, vec_col)
    assigned = assign_nearest_cell(
        _ensure_scan_width(vectors).select(id_col, vec_col), cents,
        vec_col=vec_col, key_col=id_col, coarse_dim=coarse_dim)
    return assigned.select(id_col, F.col("_cell").alias("cell"),
                           code.alias("code"))


def ivf_sq_topk(index: DataFrame, queries: DataFrame, vectors: DataFrame,
                los: list, his: list, *, k: int = 5, n_probe: int = 2,
                n_cells: int = 8, centroids: list | None = None,
                id_col: str = "vec_id", vec_col: str = "embedding",
                q_id_col: str = "q_id", q_vec_col: str = "q_vec",
                coarse_dim: int = 16, bits: int = 8) -> DataFrame:
    """IVF-SQ search: each query probes its ``n_probe`` nearest cells
    (cosine on the truncated vector vs the broadcast centroid table --
    the shared IVF probe rule) and l2-scores ONLY those cells' rows
    against the dequantized codes. Returns (q_id, vec_id, adist, rn).

    Scale shape: the scored pass reads 1 byte/dim for ~n_probe/n_cells
    of the corpus, and the d-length dequantize/self-dot folds run over
    that SAME pruned fraction -- the index is semi-joined against the
    probed-cell set BEFORE the reconstruction projection (Catalyst does
    not push a join below a Project, so computing _dq first would fold
    over 100% of index rows; caught in the r11 executed-plan probe and
    pinned by test_ivf_sq_prunes_before_dequantize). Raw vectors are
    never touched at search time (``vectors`` only seeds the
    deterministic centroid table -- pass ``centroids`` and it is not
    read at all); the only corpus-sized exchange is the hash join on
    the cell id."""
    scored = _ivf_sq_scored(index, queries, vectors, los, his,
                            n_probe=n_probe, n_cells=n_cells,
                            centroids=centroids, id_col=id_col,
                            vec_col=vec_col, q_id_col=q_id_col,
                            q_vec_col=q_vec_col, coarse_dim=coarse_dim,
                            bits=bits)
    return _sq_topk_by_adist(scored, k, q_id_col, id_col)


def _sq_topk_by_adist(scored: DataFrame, k: int, q_id_col: str,
                      id_col: str) -> DataFrame:
    from pyspark.sql import Window as Wnd
    wk = Wnd.partitionBy(q_id_col).orderBy("adist", id_col)
    return (scored.withColumn("rn", F.row_number().over(wk))
            .where(F.col("rn") <= k)
            .select(q_id_col, id_col, "adist",
                    F.col("rn").cast("bigint").alias("rn")))


def _ivf_sq_scored(index: DataFrame, queries: DataFrame,
                   vectors: DataFrame, los: list, his: list, *,
                   n_probe: int, n_cells: int,
                   centroids: list | None, id_col: str, vec_col: str,
                   q_id_col: str, q_vec_col: str, coarse_dim: int,
                   bits: int) -> DataFrame:
    from pyspark.sql import Window as Wnd

    from .similarity import _centroid_table
    cents = _centroid_table(vectors, centroids, n_cells, coarse_dim,
                            id_col, vec_col)
    tv = F.slice(F.col(q_vec_col), 1, coarse_dim)
    tn = F.sqrt(dot(tv, tv))
    qscored = (queries.select(q_id_col, q_vec_col)
               .crossJoin(F.broadcast(cents))
               .withColumn("_ccos",
                           F.round(dot(tv, F.col("_cvec"))
                                   / (tn * F.col("_cn")), 9)))
    w = Wnd.partitionBy(q_id_col).orderBy(F.col("_ccos").desc(), "_cid")
    qprobe = (qscored.withColumn("_crn", F.row_number().over(w))
              .where(F.col("_crn") <= n_probe)
              .select(q_id_col, F.col("_cid").alias("cell")))
    qv = queries.select(q_id_col, F.col(q_vec_col).alias("_qv"))
    dq = sq_dequantize("code", los, his, bits=bits)
    # prune FIRST, reconstruct SECOND: the semi join bounds the O(d)
    # _dq/_dd folds to the probed cells' rows; qprobe is top-n_probe
    # per query, so its distinct cell set is tiny and broadcasts
    probed = qprobe.select("cell").distinct()
    pruned = index.join(F.broadcast(probed), "cell", "left_semi")
    cand = (pruned.withColumn("_dq", dq)
            .withColumn("_dd", dot(F.col("_dq"), F.col("_dq")))
            .join(F.broadcast(qprobe), "cell")
            .join(F.broadcast(qv), q_id_col))
    adist = F.round(F.col("_dd") - 2 * dot(F.col("_dq"), F.col("_qv")), 6)
    return cand.select(q_id_col, id_col, adist.alias("adist"))


def ivf_sq_topk_segments(segments: list, queries: DataFrame,
                         vectors: DataFrame, *, k: int = 5,
                         n_probe: int = 2, n_cells: int = 8,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         q_id_col: str = "q_id",
                         q_vec_col: str = "q_vec",
                         coarse_dim: int = 16,
                         bits: int = 8) -> DataFrame:
    """Search SPANNING index segments encoded under DIFFERENT bounds
    versions -- the mid-migration state the SQ lifecycle passes through
    (old segments on the previous [lo, hi], new batches on retrained
    bounds) -- the ivf_pq_topk_segments contract for the bounds-model
    family. ``segments`` is a list of ``(index, los, his)`` or
    ``(index, los, his, centroids)``; each segment's rows are
    dequantized under ITS OWN bounds (dequantization is bounds-bound:
    mixing generations is the correctness bug sq_compact's docstring
    warns against), the per-segment scored passes union, and one
    global per-query top-k ranks them. Cell routing stays the SHARED
    centroid source (pin ``vectors``/centroids across segments so all
    generations live in one cell space). Per-segment work is the
    probed fraction of that segment's code rows; the union is a
    no-shuffle concatenate; the only exchange is the final top-k
    window."""
    if not segments:
        raise ValueError("segments must be non-empty")
    scored = None
    for seg in segments:
        idx, los, his, *rest = seg
        cents = rest[0] if rest else None
        s = _ivf_sq_scored(idx, queries, vectors, los, his,
                           n_probe=n_probe, n_cells=n_cells,
                           centroids=cents, id_col=id_col,
                           vec_col=vec_col, q_id_col=q_id_col,
                           q_vec_col=q_vec_col, coarse_dim=coarse_dim,
                           bits=bits)
        scored = s if scored is None else scored.unionByName(s)
    return _sq_topk_by_adist(scored, k, q_id_col, id_col)


# --------------------------------------------------------------------------
# Stored serving: the bm25_store_index discipline applied to the vector
# tier. The inverted file is persisted hive-partitioned BY CELL, so a
# query batch's probed-cell set (a bounded driver value -- <= n_probe x
# n_queries ints) becomes a PartitionFilters IN list on the index scan:
# serving I/O is bound by the probed cells' directories, not the corpus
# (asserted in test_plans). The centroid table and the (lo, hi) bounds
# ride along as tiny metadata tables, so searches never touch the raw
# vectors OR recompute the model artifacts.

def sq_store_index(index: DataFrame, path: str, los: list, his: list, *,
                   n_cells: int = 8, centroids: list | None = None,
                   seed_vectors: DataFrame | None = None,
                   coarse_dim: int = 16, bits: int = 8,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   mode: str = "errorifexists") -> None:
    """Persist an IVF-SQ inverted file as the serving artifact:
    ``index/`` hive-partitioned by cell (repartitioned BY the cell
    first -- one file per cell directory, the dynamic-partition
    file-explosion fix), ``centroids/`` the (_cid, _cvec, _cn) probe
    table, ``meta/`` one row pinning (los, his, bits, coarse_dim,
    id_col). Pass the SAME centroid source as the build
    (centroids/seed_vectors -- the ivf_sq_index lifecycle contract) so
    the stored probe table routes queries exactly like the build
    routed the corpus.

    The centroid probe table and the meta one-rower are bounded driver
    values (<= n_cells rows / one row), so they are written
    driver-locally (rowframe.write_artifact_rows -- no Spark job, no
    commit protocol per artifact); only the index write is a job."""
    from .similarity import _centroid_table
    if seed_vectors is None and centroids is None:
        raise ValueError("pass centroids or seed_vectors (the stored "
                         "probe table must match the build's routing)")
    from ..rowframe import write_artifact_rows
    cents = _centroid_table(
        seed_vectors if seed_vectors is not None else index,
        centroids, n_cells, coarse_dim, id_col, vec_col)
    (index.repartition(int(n_cells), F.col("cell"))
     .write.mode(mode).partitionBy("cell").parquet(f"{path}/index"))
    write_artifact_rows(
        f"{path}/centroids", [tuple(r) for r in cents.collect()],
        cents.schema, mode=mode)
    write_artifact_rows(
        f"{path}/meta",
        [([float(v) for v in los], [float(v) for v in his],
          int(bits), int(coarse_dim), id_col)],
        "los array<double>, his array<double>, bits int, "
        "coarse_dim int, id_col string", mode=mode)


def sq_stored_append(new_vectors: DataFrame, path: str, *,
                     vec_col: str = "embedding") -> None:
    """Append a batch into the STORED cell-partitioned index under the
    stored model artifacts: encode + route ONLY the batch (reading the
    bounds and the centroid probe table back from the store -- the
    sq_append lifecycle contract, so batches route identically to the
    original build) and APPEND its rows into the touched cell
    directories (dynamic-partition append, repartitioned by cell
    first). Cost is O(batch): the existing index files are never
    opened. Out-of-range values clamp to the stored bounds by the
    sq_encode contract -- watch sq_clamp_fraction and compact.
    Single-writer: holds the store's publish lock so an append cannot
    interleave with a compaction swap (it would land in the superseded
    tree and vanish)."""
    from ..rowframe import artifact_df, read_artifact_rows
    from .merge import publish_lock
    from .similarity import _ensure_scan_width, assign_nearest_cell
    spark = new_vectors.sparkSession
    # meta/centroids are bounded store artifacts -- driver-local pyarrow
    # read, no Spark job per append (see rowframe.read_artifact_rows)
    m = read_artifact_rows(f"{path}/meta")[0][0]
    los, his = list(m["los"]), list(m["his"])
    bits, coarse_dim = int(m["bits"]), int(m["coarse_dim"])
    id_col = m["id_col"]
    cents = artifact_df(spark, f"{path}/centroids")
    # one pass: encode on the rows the assignment carries through
    # (the ivf_sq_index r14 fusion -- no second batch scan, no id join)
    assigned = assign_nearest_cell(
        _ensure_scan_width(new_vectors).select(id_col, vec_col), cents,
        vec_col=vec_col, key_col=id_col, coarse_dim=coarse_dim)
    batch = assigned.select(
        id_col, F.col("_cell").alias("cell"),
        sq_code_expr(vec_col, los, his, bits=bits).alias("code"))
    with publish_lock(path.rstrip("/"), owner="sq_stored_append"):
        (batch.repartition(F.col("cell"))
         .write.mode("append").partitionBy("cell")
         .parquet(f"{path}/index"))


def sq_stored_compact(vectors: DataFrame, path: str, *,
                      n_cells: int = 8, centroids: list | None = None,
                      coarse_dim: int = 16, bits: int = 8,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      seed_vectors: DataFrame | None = None,
                      retain_history: bool = False) -> int | None:
    """Re-train + re-encode compaction of a STORED index (sq_compact
    for the cell-partitioned layout): derive fresh bounds from the
    CURRENT raw corpus, rebuild the inverted file, and REPLACE the
    whole store -- index, centroids, bounds -- in one guarded swap
    (bounds and codes must switch together; a reader sees either the
    old store or the new one, never a mix -- the dequantization-is-
    bounds-bound contract). Needs the raw ``vectors`` (codes alone
    cannot retrain; the store keeps only the serving artifacts).

    ``retain_history``: keep the superseded store as a numbered
    generation under ``<path>/archive`` (hardlink snapshot -- metadata
    cost) so serving can roll back a bad compaction via
    store_swap.restore_store_generation; returns the generation
    number (else None)."""
    import shutil
    import uuid

    from .store_swap import guarded_store_swap
    idx, los, his = sq_compact(vectors, n_cells=n_cells,
                               centroids=centroids, id_col=id_col,
                               vec_col=vec_col, coarse_dim=coarse_dim,
                               seed_vectors=seed_vectors, bits=bits)
    norm = path.rstrip("/")
    staging = f"{norm}.__sqc_staging_{uuid.uuid4().hex[:8]}"
    try:
        sq_store_index(idx, staging, los, his, n_cells=n_cells,
                       centroids=centroids, coarse_dim=coarse_dim,
                       bits=bits, id_col=id_col, vec_col=vec_col,
                       seed_vectors=(seed_vectors
                                     if seed_vectors is not None
                                     else vectors))
    except Exception:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    return guarded_store_swap(norm, staging,
                              retain_history=retain_history)


def sq_stored_topk(spark, path: str, queries: DataFrame, *,
                   k: int = 5, n_probe: int = 2,
                   q_id_col: str = "q_id",
                   q_vec_col: str = "q_vec") -> DataFrame:
    """Serving-path IVF-SQ search over a stored index: queries probe
    their ``n_probe`` nearest cells against the stored centroid table,
    the probed-cell set (bounded driver list) prunes the index scan to
    those partition directories (static PartitionFilters), and the
    ranking is the shared dequantize-and-fold pass -- value-identical
    to ivf_sq_topk over the in-memory index (the ann_sq_stored_prune
    gate shares ann_ivf_sq_topk's oracle). Per query batch, I/O is
    bound by the probed shards, not the corpus."""
    from pyspark.sql import Window as Wnd

    from ..rowframe import artifact_df, read_artifact_rows
    # meta/centroids are bounded store artifacts -- driver-local pyarrow
    # read, no Spark job per serve (see rowframe.read_artifact_rows)
    m = read_artifact_rows(f"{path}/meta")[0][0]
    los, his = list(m["los"]), list(m["his"])
    bits, coarse_dim = int(m["bits"]), int(m["coarse_dim"])
    id_col = m["id_col"]
    cents = artifact_df(spark, f"{path}/centroids")
    tv = F.slice(F.col(q_vec_col), 1, coarse_dim)
    tn = F.sqrt(dot(tv, tv))
    qscored = (queries.select(q_id_col, q_vec_col)
               .crossJoin(F.broadcast(cents))
               .withColumn("_ccos",
                           F.round(dot(tv, F.col("_cvec"))
                                   / (tn * F.col("_cn")), 9)))
    w = Wnd.partitionBy(q_id_col).orderBy(F.col("_ccos").desc(), "_cid")
    qprobe = (qscored.withColumn("_crn", F.row_number().over(w))
              .where(F.col("_crn") <= n_probe)
              .select(q_id_col, F.col("_cid").alias("cell")))
    # qprobe is consumed twice -- the probed-cell collect below and the
    # candidate join in the final plan -- and is top-n_probe-per-query
    # small. For the bounded serving case ONE limit-collect localizes
    # it (LocalTableScan consumer, driver-local broadcast) instead of
    # paying a localCheckpoint job plus a distinct+collect job per
    # serve; an over-budget query batch falls back to the distributed
    # form (leaf-RDD consumers, no unbounded driver collect).
    from ..rowframe import localize_if_small
    qlocal, qrows = localize_if_small(qprobe)
    if qlocal is not None:
        qprobe = qlocal
        cells = sorted({r[1] for r in qrows})
    else:
        qprobe = qprobe.localCheckpoint(eager=True)
        cells = [r[0] for r in
                 qprobe.select("cell").distinct().collect()]
    # explicit footer-derived schema: no inference job per serve; the
    # probed-cell IN list stays a static PartitionFilters prune
    from pyspark.sql.types import IntegerType

    from ..rowframe import table_schema
    isch = table_schema(f"{path}/index", {"cell": IntegerType()})
    ird = spark.read if isch is None else spark.read.schema(isch)
    pruned = (ird.parquet(f"{path}/index")
              .where(F.col("cell").isin(cells)))
    qv = queries.select(q_id_col, F.col(q_vec_col).alias("_qv"))
    dq = sq_dequantize("code", los, his, bits=bits)
    cand = (pruned.withColumn("_dq", dq)
            .withColumn("_dd", dot(F.col("_dq"), F.col("_dq")))
            .join(F.broadcast(qprobe), "cell")
            .join(F.broadcast(qv), q_id_col))
    adist = F.round(F.col("_dd") - 2 * dot(F.col("_dq"), F.col("_qv")), 6)
    scored = cand.select(q_id_col, id_col, adist.alias("adist"))
    return _sq_topk_by_adist(scored, k, q_id_col, id_col)


# --------------------------------------------------------------------------
# SQ index lifecycle: append / staleness / compact -- the pq.py
# lifecycle contract (pq_append / pq_reconstruction_mse / pq_compact)
# applied to the bounds-model family. The model artifact here is the
# (los, his) pair instead of codebooks; drift shows up as LATER batches
# clamping to [0, levels] at encode time, which both signals below
# measure and sq_compact repairs by re-training bounds + re-encoding.

def sq_append(index: DataFrame, new_vectors: DataFrame,
              los: list, his: list, *, n_cells: int = 8,
              centroids: list | None = None, id_col: str = "vec_id",
              vec_col: str = "embedding", coarse_dim: int = 16,
              seed_vectors: DataFrame | None = None,
              bits: int = 8) -> DataFrame:
    """Append a batch to an IVF-SQ inverted file using the EXISTING
    stored bounds and centroid source: encode + route only the new
    rows (work strictly proportional to the batch) and union onto the
    stored index. Pin ``seed_vectors``/``centroids`` to the original
    build's so batches route identically (the pq_append contract).

    Provably one-shot-equivalent: sq_encode and cell routing are
    per-row pure functions of (vector, bounds, centroid table), so
    batch-wise construction over disjoint ids yields the identical
    (id, cell, code) relation -- the ann_sq_append gate pins a search
    over a two-batch index against the one-shot oracle. Out-of-range
    values in the new batch CLAMP (by design); watch
    sq_clamp_fraction / sq_reconstruction_mse for when that starts
    costing recall, then sq_compact."""
    batch = ivf_sq_index(new_vectors, los, his, n_cells=n_cells,
                         centroids=centroids, id_col=id_col,
                         vec_col=vec_col, coarse_dim=coarse_dim,
                         seed_vectors=seed_vectors, bits=bits)
    return index.unionByName(batch)


def sq_clamp_fraction(vectors: DataFrame, los: list, his: list, *,
                      vec_col: str = "embedding") -> DataFrame:
    """Bounds-staleness signal #1 (cheap): the fraction of (row, dim)
    values falling OUTSIDE the stored [lo, hi] -- exactly the values
    sq_encode clamps. One scan, one global aggregate; returns
    ``(n_values, n_clamped, clamp_frac)``. A fresh in-distribution
    batch clamps ~0; a drifted batch clamps a visible fraction long
    before reconstruction error dominates -- the trigger metric for
    scheduling sq_compact."""
    lo, hi = _bound_arrays(los, his)
    ex = vectors.select(F.posexplode(vec_col).alias("pos", "x"))
    xd = F.col("x").cast("double")
    oob = ((xd < F.element_at(lo, F.col("pos") + 1))
           | (xd > F.element_at(hi, F.col("pos") + 1)))
    return ex.agg(
        F.count(F.lit(1)).alias("n_values"),
        F.sum(F.when(oob, 1).otherwise(0)).cast("bigint")
        .alias("n_clamped"),
        F.round(F.sum(F.when(oob, 1).otherwise(0))
                / F.count(F.lit(1)), 6).alias("clamp_frac"))


def sq_reconstruction_mse(vectors: DataFrame, index: DataFrame,
                          los: list, his: list, *, bits: int = 8,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          code_col: str = "code",
                          sample_frac: float | None = None,
                          sample_seed: int = 0) -> DataFrame:
    """Bounds-staleness signal #2: mean squared reconstruction error
    ``mean_i ||x_i - dq(code_i)||^2`` of the indexed corpus under the
    STORED bounds -- the pq_reconstruction_mse analogue, one row
    ``(n, mse)``. Rising MSE after appends means the appended data
    drifted outside the trained bounds (codes clamp, distances
    degrade); compare against the freshly-trained MSE (sq_compact) to
    decide when re-encoding pays. Per-element error rounded to 9 dp
    and decimal-summed per vector (order-independent, so the DuckDB
    oracle reproduces every bit), then ONE double division.

    ``sample_frac``: bound the maintenance cost on a 100x corpus by
    measuring a deterministic seeded-hash sample of the rows
    (similarity.seeded_hash_sample_pred -- md5-based, so the sample is
    engine-reproducible and partitioning-independent). MSE is a mean,
    so a uniform row sample is an unbiased estimator; the
    ann_sq_staleness_sampled gate pins sample and full values exactly
    and their agreement is visible in the pinned numbers."""
    levels = (1 << bits) - 1
    lo, hi = _bound_arrays(los, his)
    if sample_frac is not None:
        from .similarity import seeded_hash_sample_pred
        vectors = vectors.where(
            seeded_hash_sample_pred(id_col, sample_frac, sample_seed))
    ex = (vectors.select(id_col, vec_col)
          .join(index.select(id_col, code_col), id_col)
          .select(id_col, vec_col,
                  F.posexplode(code_col).alias("_p", "_c")))
    loi = F.element_at(lo, F.col("_p") + 1)
    hii = F.element_at(hi, F.col("_p") + 1)
    dqi = loi + F.col("_c").cast("double") * ((hii - loi)
                                              / F.lit(float(levels)))
    xi = F.element_at(F.col(vec_col), F.col("_p") + 1).cast("double")
    term = F.round((xi - dqi) * (xi - dqi), 9)
    per_vec = (ex.groupBy(id_col)
               .agg(F.sum(term.cast("decimal(28,9)")).alias("_e")))
    return (per_vec.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("_e").cast("double") / F.count(F.lit(1)), 6)
        .alias("mse")))


def sq_compact(vectors: DataFrame, *, n_cells: int = 8,
               centroids: list | None = None, id_col: str = "vec_id",
               vec_col: str = "embedding", coarse_dim: int = 16,
               seed_vectors: DataFrame | None = None,
               bits: int = 8) -> tuple[DataFrame, list, list]:
    """Re-train + re-encode compaction: derive fresh [lo, hi] bounds
    from the CURRENT corpus (sq_train's exact aggregation) and rebuild
    the inverted file in one pass. Returns ``(index, los, his)`` --
    write all three together; searches spanning the compaction must
    switch bounds and index atomically (dequantization is
    bounds-bound, exactly the pq_compact codebook contract). By
    construction the compacted index equals a fresh one-shot build."""
    los, his = sq_train(vectors, vec_col=vec_col)
    idx = ivf_sq_index(vectors, los, his, n_cells=n_cells,
                       centroids=centroids, id_col=id_col,
                       vec_col=vec_col, coarse_dim=coarse_dim,
                       seed_vectors=seed_vectors, bits=bits)
    return idx, los, his
