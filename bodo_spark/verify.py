"""Local correctness harness: run each registered query on Spark and its
DuckDB oracle side-by-side, compare row count, schema and order-insensitive
values. Mirrors (defensively) what the driver's t2 check does.
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb
import pandas as pd

from .queries import all_queries
from .queries._util import QueryDef
from .sources.tables import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon_cell(v: Any) -> Any:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        # guard against low-bit drift; queries are designed to be exact,
        # round(12 sig) catches anything that slipped
        if v == 0:
            return 0.0
        return float(f"{v:.12g}")
    if isinstance(v, (pd.Timestamp,)):
        return str(v)
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    try:
        import numpy as np
        if isinstance(v, np.generic):
            return _canon_cell(v.item())
        if isinstance(v, np.ndarray):
            return tuple(_canon_cell(x) for x in v.tolist())
    except ImportError:
        pass
    return v


def _dtype_kind(dtype) -> str:
    """Coarse dtype kind matching the driver's hash discipline: int vs float
    vs bool vs datetime vs object must agree between Spark and oracle."""
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "object"


def _kind_mismatches(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    out = []
    for c in sorted(sdf.columns):
        sk, ok = _dtype_kind(sdf[c].dtype), _dtype_kind(odf[c].dtype)
        if sk != ok:
            out.append(f"{c}: spark={sk}({sdf[c].dtype}) oracle={ok}({odf[c].dtype})")
    return out


def _canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def compare_one(name: str, qd: QueryDef, spark, con, sf_dir: str) -> dict:
    res: dict[str, Any] = {"name": name}
    # The oracle comparison requires bit-reproducible arithmetic: build the
    # plan in exact mode (library default is fast/double; see modes.py).
    prev = os.environ.get("BODO_SPARK_EXACT")
    os.environ["BODO_SPARK_EXACT"] = "1"
    try:
        sdf = qd.fn(spark, sf_dir).toPandas()
        res["spark_rows"] = len(sdf)
    except Exception as e:
        res["error"] = f"spark: {type(e).__name__}: {e}"
        return res
    finally:
        if prev is None:
            os.environ.pop("BODO_SPARK_EXACT", None)
        else:
            os.environ["BODO_SPARK_EXACT"] = prev
    if qd.oracle is None:
        res["status"] = "rows_only"
        res["ok"] = res["spark_rows"] >= 0
        return res
    try:
        odf = con.execute(qd.oracle).df()
    except Exception as e:
        res["error"] = f"oracle: {type(e).__name__}: {e}"
        return res
    res["oracle_rows"] = len(odf)
    s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
    res["schema_match"] = s_cols == o_cols
    if not res["schema_match"]:
        res["spark_cols"], res["oracle_cols"] = s_cols, o_cols
        res["ok"] = False
        return res
    kind_mismatch = _kind_mismatches(sdf, odf)
    res["dtype_match"] = not kind_mismatch
    if kind_mismatch:
        res["dtype_diffs"] = kind_mismatch
    sc, oc = _canon(sdf), _canon(odf)
    res["values_match"] = sc == oc
    res["ok"] = (res["values_match"] and res["dtype_match"]
                 and res["spark_rows"] == res["oracle_rows"])
    if not res["values_match"]:
        diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
        res["first_diffs"] = [f"spark={a} oracle={b}" for a, b in diffs]
        if len(sc) != len(oc):
            res["first_diffs"].append(f"len {len(sc)} vs {len(oc)}")
    return res


def run_all(sf_dir: str = "/root/testdata/sf0.01",
            only: list[str] | None = None, verbose: bool = True,
            driver_parity: bool = False) -> list[dict]:
    """Compare every registered query against its oracle.

    ``driver_parity=True`` simulates the DRIVER's environment for every
    query independently: before each one, the session is forced back to
    Spark 4 defaults (ansi=true, non-UTC timezone) and the query runs
    through the ``__spark_entry__._exact`` wrapper -- exactly what happens
    when the driver's verify samples that query first in a fresh session.
    Green here proves no query depends on engine confs being applied by
    anything other than the wrapper itself (the r7 `dedup_cc_star_chains`
    ANSI overflow is the defect class this guards)."""
    import json
    import time

    from .session import get_spark
    spark = get_spark()
    con = duckdb_conn(sf_dir)
    out = []
    qs = all_queries()
    if driver_parity:
        import importlib
        entry = importlib.import_module("__spark_entry__")
        qs = {name: QueryDef(entry._exact(qd.fn), qd.oracle, qd.doc)
              for name, qd in qs.items()}
    for name, qd in qs.items():
        if only and name not in only:
            continue
        if driver_parity:
            spark.conf.set("spark.sql.ansi.enabled", "true")
            spark.conf.set("spark.sql.session.timeZone",
                           "America/Los_Angeles")
        t0 = time.time()
        r = compare_one(name, qd, spark, con, sf_dir)
        r["sec"] = round(time.time() - t0, 2)
        out.append(r)
        if verbose:
            flag = "OK  " if r.get("ok") else (
                "ROWS" if r.get("status") == "rows_only" else "FAIL")
            detail = "" if r.get("ok") else json.dumps(
                {k: v for k, v in r.items() if k != "name"}, default=str)[:400]
            print(f"{flag} {r['sec']:7.2f}s {name} {detail}", flush=True)
    return out


if __name__ == "__main__":
    import json
    import sys
    argv = sys.argv[1:]
    driver_parity = "--driver-parity" in argv
    only = [a for a in argv if not a.startswith("--")] or None
    results = run_all(only=only, driver_parity=driver_parity)
    from pyspark.sql import SparkSession
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()  # don't leave the JVM holding stdout open
    n_ok = sum(1 for r in results if r.get("ok"))
    for r in results:
        flag = "OK  " if r.get("ok") else ("ROWS" if r.get("status") == "rows_only" else "FAIL")
        print(flag, r["name"],
              "" if r.get("ok") else json.dumps({k: v for k, v in r.items() if k != "name"}, default=str)[:500])
    print(f"\n{n_ok}/{len(results)} ok")
