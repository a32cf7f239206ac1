"""Scale the driver's sf0.1 testdata K-fold for scale validation.

The driver container only ships sf{0.001,0.01,0.1}; the 100-TB design
claims in PLANS.md/COVERAGE.md are otherwise extrapolations from sf0.1.
This tool manufactures an sf1-equivalent dataset by replicating sf0.1
K=10 times with disjoint key spaces, so that per-key structure (orders
per customer, lineitems per order, events per user, near-dup clusters
per document corpus slice) is IDENTICAL to sf0.1 while every fact table
is 10x larger. A bench run against it then measures how the engine's
plans scale, not how a different data distribution behaves:

- dimension tables (region, nation) stay fixed -- exactly how TPC-H
  scales them;
- every scaling key is shifted by ``replica * (max_key + 1)`` so joins
  match only within a replica (fan-outs preserved);
- document text gets a per-replica token prefix woven into every word:
  within-replica near-dup/shingle structure is preserved exactly,
  while cross-replica shingle sets are disjoint -- without this, K
  identical corpus copies would make pairwise dedup output grow
  quadratically BY CONSTRUCTION and the linearity check meaningless;
- embeddings keep their vectors (brute-force/IVF ANN cost is corpus
  size, not value dependent); vec_ids shift.

Usage: python tools/scale_testdata.py [K] [out_dir]
Then:  SPARK_GRAFT_SF_DIR=<out_dir> python bench.py
"""

from __future__ import annotations

import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# table -> {column: stride-source table} for key shifting
SHIFTS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}

KEY_OF = {"customer": "c_custkey", "supplier": "s_suppkey",
          "part": "p_partkey", "orders": "o_orderkey",
          "events": "event_id", "events_user": "user_id",
          "documents": "doc_id", "embeddings": "vec_id"}


def scale(k: int, out: str) -> None:
    import os

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    stride: dict[str, int] = {}
    for t, key in KEY_OF.items():
        src = "events" if t == "events_user" else t
        stride[t] = con.execute(
            f"SELECT max({key}) + 1 FROM "
            f"read_parquet('{SRC}/{src}.parquet')").fetchone()[0]

    for t in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
                    f" TO '{out}/{t}.parquet' (FORMAT PARQUET)")

    for t, shifts in SHIFTS.items():
        cols = [c[0] for c in con.execute(
            f"SELECT * FROM read_parquet('{SRC}/{t}.parquet') LIMIT 0"
        ).description]
        sel = []
        for c in cols:
            if c in shifts:
                sel.append(f"{c} + r.r * {stride[shifts[c]]} AS {c}")
            elif t == "documents" and c == "text":
                # distinct shingle space per replica, same in-replica text
                sel.append("CASE WHEN r.r = 0 THEN text ELSE "
                           "regexp_replace(text, '(\\S+)', "
                           "'x' || r.r || '\\1', 'g') END AS text")
            elif t == "embeddings" and c == "embedding":
                # Per-replica orthogonal sign PATTERN over every
                # coordinate (md5-derived from (replica, i)): within-
                # replica inner products (and therefore near-dup/ANN
                # structure) are preserved EXACTLY -- the same pattern
                # multiplies both sides, signs cancel -- while
                # cross-replica patterns differ in ~half the coords, so
                # expected cross-replica cosine ~0. The earlier
                # 6-coordinate-window variant saturated at K>10 (64
                # dims hold ~10 disjoint windows; replicas sharing a
                # window were EXACT duplicates, quadratic pair growth
                # by construction). Replica 0 keeps the originals.
                sel.append(
                    "list_transform(embedding, (x, i) -> CASE "
                    "WHEN r.r > 0 AND "
                    "CAST(concat('0x', substr(md5(concat(CAST(r.r AS "
                    "VARCHAR), ':', CAST(i AS VARCHAR))), 1, 2)) AS INT) "
                    "% 2 = 1 THEN -x ELSE x END) AS embedding")
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} "
            f"FROM read_parquet('{SRC}/{t}.parquet'), range({k}) r(r)) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bodo_spark_sf1"
    scale(k, out)
