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

__all__ = ["expand_hierarchy"]


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
