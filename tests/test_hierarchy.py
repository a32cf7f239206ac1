

# --------------------------------------------------------------------------
# expand_dag: multi-parent BOM explosion


def _dag(spark, rows):
    return spark.createDataFrame(rows, "child long, parent long, qty long")


def test_dag_diamond_paths_and_qty(spark):
    from bodo_spark.operators.hierarchy import expand_dag
    # 4 -> {2 (x2), 3 (x3)}; 2 -> 1 (x5); 3 -> 1 (x7)
    e = _dag(spark, [(4, 2, 2), (4, 3, 3), (2, 1, 5), (3, 1, 7)])
    got = {(r.id, r.anc): (r.n_paths, r.total_qty)
           for r in expand_dag(e, qty_col="qty").collect()}
    assert got == {(2, 1): (1, 5), (3, 1): (1, 7),
                   (4, 2): (1, 2), (4, 3): (1, 3),
                   (4, 1): (2, 2 * 5 + 3 * 7)}   # two routes roll up


def test_dag_chain_depths_and_parallel_edges(spark):
    from bodo_spark.operators.hierarchy import expand_dag
    # chain 5->4->3->2->1 (qty 2 each) + a PARALLEL edge 5->4 (qty 10)
    e = _dag(spark, [(5, 4, 2), (5, 4, 10), (4, 3, 2), (3, 2, 2),
                     (2, 1, 2)])
    got = {(r.id, r.anc): (r.n_paths, r.total_qty)
           for r in expand_dag(e, qty_col="qty").collect()}
    assert got[(5, 4)] == (2, 12)          # parallel edges aggregate
    assert got[(5, 1)] == (2, 12 * 8)      # both routes x 2^3
    assert got[(2, 1)] == (1, 2)
    assert len(got) == 4 + 3 + 2 + 1


def test_dag_no_qty_col_counts_paths(spark):
    from bodo_spark.operators.hierarchy import expand_dag
    e = _dag(spark, [(4, 2, 9), (4, 3, 9), (2, 1, 9), (3, 1, 9)])
    out = expand_dag(e)
    assert out.columns == ["id", "anc", "n_paths"]
    got = {(r.id, r.anc): r.n_paths for r in out.collect()}
    assert got[(4, 1)] == 2


def test_dag_cycle_raises(spark):
    import pytest
    from bodo_spark.operators.hierarchy import expand_dag
    e = _dag(spark, [(1, 2, 1), (2, 3, 1), (3, 1, 1)])
    with pytest.raises(RuntimeError, match="cycle"):
        expand_dag(e, qty_col="qty")


def test_dag_matches_duckdb_recursive(spark):
    """Random-ish DAG (parents strictly smaller) vs a REAL DuckDB
    recursive CTE enumerating every path -- the oracle formulation."""
    import duckdb
    from bodo_spark.operators.hierarchy import expand_dag
    rows = []
    for k in range(2, 120):
        rows.append((k, k // 2, k % 5 + 1))
        if k >= 3 and k // 3 >= 1:
            rows.append((k, k // 3, k % 7 + 1))
    e = _dag(spark, rows)
    got = sorted((r.id, r.anc, r.n_paths, r.total_qty)
                 for r in expand_dag(e, qty_col="qty").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE edges(child BIGINT, parent BIGINT, "
                "qty BIGINT)")
    con.executemany("INSERT INTO edges VALUES (?, ?, ?)", rows)
    want = sorted(map(tuple, con.execute("""
        WITH RECURSIVE paths AS (
          SELECT child AS d, parent AS a, qty AS qt FROM edges
          UNION ALL
          SELECT p.d, e.parent, p.qt * e.qty
          FROM paths p JOIN edges e ON p.a = e.child)
        SELECT d, a, CAST(COUNT(*) AS BIGINT),
               CAST(SUM(qt) AS BIGINT)
        FROM paths GROUP BY d, a""").fetchall()))
    assert got == want
