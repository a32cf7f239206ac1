"""Hierarchy expansion: the WITH RECURSIVE workload (org charts, BOM
explosions, category trees) on an engine whose SQL has no recursive
CTE. ``expand_hierarchy`` resolves every node of a parent-pointer
FOREST to its root and depth by pointer doubling -- each round joins
the current ancestor map to itself, so a depth-D hierarchy resolves in
ceil(log2(D)) rounds instead of D self-joins (the recursive CTE's
cost). The connected-components discipline applies: every round's
frame is lineage-truncated (localCheckpoint) and convergence is a
bounded one-row aggregate.

Contract: edges are (child, parent) with at most ONE parent per child
(a forest -- the multi-parent DAG case is a different operator; a
cycle would never converge and is caught by ``max_iter``). Roots are
nodes never appearing as a child.

Scale: each round is one self equi join on the ancestor id (hash
join; the map has one row per node) -- at 100 TB of edges that is
log2(depth) shuffles total, each keyed on ids, no skew beyond the
root's fan-in (which the join handles as an ordinary hot build key).

Reference parity: the reference ships no recursive SQL either (its
BodoSQL/Calcite surface lacks WITH RECURSIVE); this covers the
workload the way connected_components covers graph closure, and the
gate's DuckDB oracle IS a real recursive CTE -- two different
formulations, one result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["expand_hierarchy", "expand_dag"]


def expand_hierarchy(edges: DataFrame, *, child_col: str = "child",
                     parent_col: str = "parent",
                     max_iter: int = 30) -> DataFrame:
    """Resolve ``(id, root, depth)`` for every node of the forest.
    Roots appear with root = id, depth = 0."""
    ch, pa = F.col(child_col), F.col(parent_col)
    nodes = (edges.select(ch.alias("id"))
             .unionByName(edges.select(pa.alias("id"))).distinct())
    roots = nodes.join(edges.select(ch.alias("id")), "id", "left_anti")
    cur = (edges.select(ch.alias("id"), pa.alias("anc"),
                        F.lit(1).cast("long").alias("d"))
           .unionByName(roots.select(
               "id", F.col("id").alias("anc"),
               F.lit(0).cast("long").alias("d"))))
    cur = cur.localCheckpoint(eager=True)
    root_ids = roots.select(F.col("id").alias("anc"))
    for _ in range(max_iter):
        # rows already pointing at a root are fixed points of the
        # doubling join (a root maps to itself at d=0), so ONE bounded
        # scalar tells us when everything has landed
        pending = (cur.join(F.broadcast(root_ids), "anc", "left_anti")
                   .limit(1).count())
        if pending == 0:
            return cur.select("id", F.col("anc").alias("root"),
                              F.col("d").alias("depth"))
        nxt = (cur.alias("a")
               .join(cur.select(F.col("id").alias("anc"),
                                F.col("anc").alias("_anc2"),
                                F.col("d").alias("_d2")).alias("b"),
                     "anc")
               .select(F.col("id"), F.col("_anc2").alias("anc"),
                       (F.col("d") + F.col("_d2")).alias("d")))
        prev = cur
        cur = nxt.localCheckpoint(eager=True)
        try:
            prev.unpersist()
        except Exception:
            pass
    raise RuntimeError(
        f"hierarchy did not converge in {max_iter} doubling rounds "
        f"(cycle in the edge list, or depth > 2^{max_iter})")


def expand_dag(edges: DataFrame, *, child_col: str = "child",
               parent_col: str = "parent", qty_col: str | None = None,
               max_iter: int = 30) -> DataFrame:
    """Multi-parent DAG expansion with quantity roll-up -- the BOM
    explosion (the other half of the WITH RECURSIVE workload after
    expand_hierarchy's forests): for every (node, ancestor) pair
    reachable in the DAG, the number of distinct paths and, with
    ``qty_col``, the total quantity ``sum over paths of the product of
    edge quantities along the path`` (how many of component A a
    finished product B needs, across every assembly route).

    Log-depth by STRATIFIED pointer doubling over the path semiring
    (sum aggregates, product composes). Plain doubling
    ``C' = C + C.C`` would overcount -- a length-5 path splits as
    1+4, 2+3, 3+2 and 4+1 -- so the loop carries TWO relations:
    ``E_k`` = paths of EXACTLY 2^k edges and ``C_k`` = paths of <= 2^k
    edges, both aggregated per (node, ancestor). Every path of length
    L in (2^k, 2^(k+1)] decomposes UNIQUELY as its first 2^k edges
    (one E_k row set) followed by the remaining L - 2^k <= 2^k edges
    (one C_k row set), so

        C_(k+1) = C_k  UNION  aggregate(E_k compose C_k)
        E_(k+1) = aggregate(E_k compose E_k)

    counts each path exactly once; composition multiplies path counts
    and quantity masses (distributivity makes the per-pair aggregates
    sufficient -- no path enumeration ever materializes). Terminates
    when E_k is empty (longest path reached): ceil(log2(depth)) + 1
    rounds, each TWO hash joins keyed on node ids, every round's frame
    lineage-truncated (localCheckpoint) with a bounded one-row
    convergence probe -- the expand_hierarchy discipline. A cycle
    never empties E_k; it is detected as a node reaching ITSELF in
    C_k (checked every round -- a length-c cycle self-path appears
    once 2^k >= c; checking E_k alone would miss it, since 2^k is
    never a multiple of, e.g., 3) and raised explicitly.

    Quantities ride as BIGINT (exact; the caller sizes qty/depth so
    products fit -- the gate's oracle is a real DuckDB recursive CTE
    with the same arithmetic). Parallel edges are legal and aggregate
    like any other multi-path. Returns ``(id, anc, n_paths
    [, total_qty])``.
    """
    ch, pa = F.col(child_col), F.col(parent_col)
    qt = (F.col(qty_col).cast("long") if qty_col is not None
          else F.lit(1).cast("long"))
    base = edges.select(ch.alias("id"), pa.alias("anc"),
                        F.lit(1).cast("long").alias("np"),
                        qt.alias("qt"))

    def agg(df):
        return (df.groupBy("id", "anc")
                .agg(F.sum("np").alias("np"), F.sum("qt").alias("qt")))

    def compose(left, right):
        # paths left(id -> m) then right(m -> anc): counts and masses
        # multiply (sum-of-products over the m fan distributes)
        r = right.select(F.col("id").alias("anc"),
                         F.col("anc").alias("_a2"),
                         F.col("np").alias("_np2"),
                         F.col("qt").alias("_qt2"))
        return (left.join(r, "anc")
                .select("id", F.col("_a2").alias("anc"),
                        (F.col("np") * F.col("_np2")).alias("np"),
                        (F.col("qt") * F.col("_qt2")).alias("qt")))

    cur = agg(base).localCheckpoint(eager=True)   # C_0: len <= 1
    exact = cur                                   # E_0: len == 1
    for _ in range(max_iter):
        if cur.where(F.col("id") == F.col("anc")).limit(1).count():
            raise RuntimeError("cycle detected: a node reaches itself "
                               "-- expand_dag requires a DAG")
        if not exact.limit(1).count():
            out = [F.col("id"), F.col("anc"),
                   F.col("np").alias("n_paths")]
            if qty_col is not None:
                out.append(F.col("qt").alias("total_qty"))
            return cur.select(*out)
        nxt_cur = agg(cur.unionByName(compose(exact, cur))) \
            .localCheckpoint(eager=True)
        nxt_exact = agg(compose(exact, exact)) \
            .localCheckpoint(eager=True)
        for old in (cur, exact):
            try:
                old.unpersist()
            except Exception:
                pass
        cur, exact = nxt_cur, nxt_exact
    raise RuntimeError(
        f"expand_dag did not converge in {max_iter} doubling rounds "
        f"(cycle in the edge list, or depth > 2^{max_iter})")
