"""Z-order clustered writes: every clustered column's per-file min/max
ranges must tighten vs an unclustered layout (the data-skipping
contract)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from bodo_spark.queries._util import tbl
from bodo_spark.sources.zorder import write_zordered

from .conftest import SF_DIR


def _avg_range_fraction(path: str, col: str) -> float:
    """Mean (file max-min)/(global max-min) over the files: 1.0 = every
    file spans the whole domain (no skipping), small = tight files."""
    spans, glo, ghi = [], None, None
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo = hi = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics:
                    st = c.statistics
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
        if lo is None:
            continue
        spans.append((lo, hi))
        glo = lo if glo is None else min(glo, lo)
        ghi = hi if ghi is None else max(ghi, hi)
    width = ghi - glo
    return sum((hi - lo) / width for lo, hi in spans) / len(spans)


def test_zorder_tightens_all_clustered_columns(spark, tmp_path_factory):
    orders = tbl(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    base = str(tmp_path_factory.mktemp("zorder"))
    naive, zpath = f"{base}/naive", f"{base}/z"
    orders.repartition(8).write.parquet(naive)
    write_zordered(orders, zpath, ["o_custkey", "o_totalprice"],
                   bits=6, n_files=8)
    # same data
    assert spark.read.parquet(zpath).count() == orders.count()
    for col in ("o_custkey", "o_totalprice"):
        z = _avg_range_fraction(zpath, col)
        n = _avg_range_fraction(naive, col)
        # hash layout gives ~1.0 on every column; z-order must tighten
        # BOTH clustered columns substantially
        assert z < 0.6 < n, (col, z, n)
