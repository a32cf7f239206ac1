"""Differential tests of the pandas-flavored frontend vs real pandas
(mirrors the reference's check_func strategy, bodo/tests/utils.py)."""

from __future__ import annotations

import pandas as pd
import pandas.testing as pdt
import pytest

from bodo_spark import frame as bd

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def pdf():
    return pd.read_parquet(f"{SF_DIR}/orders.parquet")


@pytest.fixture(scope="module")
def bdf(spark, pdf):
    return bd.read_parquet(f"{SF_DIR}/orders.parquet", spark=spark)


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _cmp(bodo_df, pandas_df, **kw):
    got = bodo_df.to_pandas() if hasattr(bodo_df, "to_pandas") else bodo_df
    pdt.assert_frame_equal(_sorted(got), _sorted(pandas_df),
                           check_dtype=False, **kw)


def test_filter_projection(bdf, pdf):
    got = bdf[bdf["o_totalprice"] > 200000.0][["o_orderkey", "o_orderstatus"]]
    exp = pdf[pdf["o_totalprice"] > 200000.0][["o_orderkey", "o_orderstatus"]]
    _cmp(got, exp)


def test_assign_arith(bdf, pdf):
    got = bdf.assign(t2=bdf["o_totalprice"] * 2 + 1)[["o_orderkey", "t2"]]
    exp = pdf.assign(t2=pdf["o_totalprice"] * 2 + 1)[["o_orderkey", "t2"]]
    _cmp(got, exp)


def test_isin_fillna_astype(bdf, pdf):
    got = bdf[bdf["o_orderstatus"].isin(["O", "F"])]
    exp = pdf[pdf["o_orderstatus"].isin(["O", "F"])]
    assert len(got) == len(exp)
    got2 = bdf.assign(k=bdf["o_custkey"].astype("string"))[["k"]]
    exp2 = pdf.assign(k=pdf["o_custkey"].astype("string"))[["k"]]
    _cmp(got2, exp2)


def test_groupby_agg(bdf, pdf):
    got = bdf.groupby("o_orderstatus").agg(
        total=("o_totalprice", "sum"), n=("o_orderkey", "count"))
    exp = (pdf.groupby("o_orderstatus", as_index=False)
           .agg(total=("o_totalprice", "sum"), n=("o_orderkey", "count")))
    _cmp(got, exp, check_exact=False, rtol=1e-9)


def test_groupby_size_nunique(bdf, pdf):
    got = bdf.groupby("o_orderpriority").size()
    exp = (pdf.groupby("o_orderpriority").size()
           .reset_index(name="size"))
    _cmp(got, exp)


def test_merge_inner_left(spark, bdf, pdf):
    cust_b = bd.read_parquet(f"{SF_DIR}/customer.parquet", spark=spark)
    cust_p = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    got = bdf.merge(cust_b, how="inner", left_on="o_custkey",
                    right_on="c_custkey")[["o_orderkey", "c_name"]]
    exp = pdf.merge(cust_p, how="inner", left_on="o_custkey",
                    right_on="c_custkey")[["o_orderkey", "c_name"]]
    _cmp(got, exp)
    got_l = bdf.merge(cust_b, how="left", left_on="o_custkey",
                      right_on="c_custkey")
    exp_l = pdf.merge(cust_p, how="left", left_on="o_custkey",
                      right_on="c_custkey")
    assert len(got_l) == len(exp_l)


def test_merge_key_name_overlaps_nonkey_column(spark):
    """left_on != right_on where the left key's NAME also exists as a
    non-key column on the right: pandas suffixes both occurrences and the
    join must use the post-rename names (regression: the condition used
    to reference the pre-rename column and fail)."""
    l = pd.DataFrame({"a": [1, 2], "x": [10, 20]})
    r = pd.DataFrame({"b": [1, 2], "a": [100, 200]})
    got = (bd.from_pandas(l, spark=spark)
           .merge(bd.from_pandas(r, spark=spark),
                  left_on="a", right_on="b"))
    exp = pd.merge(l, r, left_on="a", right_on="b")
    assert sorted(got.columns) == sorted(exp.columns.tolist())
    _cmp(got, exp)


def test_merge_semi_anti(spark, bdf):
    cust = bd.read_parquet(f"{SF_DIR}/customer.parquet", spark=spark)
    hi = cust[cust["c_acctbal"] > 5000.0]
    semi = bdf.merge(hi, how="semi", left_on="o_custkey", right_on="c_custkey")
    anti = bdf.merge(hi, how="anti", left_on="o_custkey", right_on="c_custkey")
    assert len(semi) + len(anti) == len(bdf)
    assert semi.columns == bdf.columns  # semi keeps left schema


def test_sort_values_head(bdf, pdf):
    got = (bdf.sort_values(["o_totalprice", "o_orderkey"],
                           ascending=[False, True]).head(10).to_pandas())
    exp = (pdf.sort_values(["o_totalprice", "o_orderkey"],
                           ascending=[False, True]).head(10)
           .reset_index(drop=True))
    pdt.assert_frame_equal(got, exp, check_dtype=False)


def test_drop_duplicates(bdf, pdf):
    got = bdf.drop_duplicates(["o_orderstatus", "o_orderpriority"])
    exp = pdf.drop_duplicates(["o_orderstatus", "o_orderpriority"])
    assert len(got) == len(exp)


def test_value_counts(bdf, pdf):
    got = bdf["o_orderpriority"].value_counts().to_pandas()
    exp = (pdf["o_orderpriority"].value_counts().reset_index())
    exp.columns = ["o_orderpriority", "count"]
    _cmp(got, exp)


def test_str_accessor(spark):
    part_b = bd.read_parquet(f"{SF_DIR}/part.parquet", spark=spark)
    part_p = pd.read_parquet(f"{SF_DIR}/part.parquet")
    got = part_b.assign(u=part_b["p_name"].str.upper(),
                        n=part_b["p_name"].str.len(),
                        w=part_b["p_name"].str.split(" ").str.get(0),
                        )[["u", "n", "w"]]
    exp = part_p.assign(u=part_p["p_name"].str.upper(),
                        n=part_p["p_name"].str.len(),
                        w=part_p["p_name"].str.split(" ").str.get(0),
                        )[["u", "n", "w"]]
    _cmp(got, exp)


def test_dt_accessor(bdf, pdf):
    got = bdf.assign(y=bdf["o_orderdate"].dt.year,
                     m=bdf["o_orderdate"].dt.month,
                     dw=bdf["o_orderdate"].dt.dayofweek)[["y", "m", "dw"]]
    exp = pdf.assign(y=pdf["o_orderdate"].dt.year,
                     m=pdf["o_orderdate"].dt.month,
                     dw=pdf["o_orderdate"].dt.dayofweek)[["y", "m", "dw"]]
    _cmp(got, exp)


def test_series_reductions(bdf, pdf):
    assert abs(bdf["o_totalprice"].sum() - pdf["o_totalprice"].sum()) < 1.0
    assert bdf["o_orderkey"].nunique() == pdf["o_orderkey"].nunique()
    assert bdf["o_totalprice"].max() == pdf["o_totalprice"].max()


def test_concat(spark, bdf):
    two = bd.concat([bdf.head(5), bdf.head(7)])
    assert len(two) == 12


def test_apply_pandas_udf(bdf, pdf):
    got = (bdf.head(50).apply(
        lambda r: f"{r['o_orderstatus']}:{int(r['o_custkey']) % 10}",
        return_type="string")
        .to_pandas()["apply_out"].sort_values().tolist())
    exp = (pdf.head(50).apply(
        lambda r: f"{r['o_orderstatus']}:{int(r['o_custkey']) % 10}",
        axis=1).sort_values().tolist())
    assert sorted(got) == sorted(exp)


def test_map_partitions(bdf):
    out = bdf.map_partitions(
        lambda pdf_: pdf_[["o_orderkey"]].assign(flag=1),
        "o_orderkey long, flag int")
    assert len(out) == len(bdf)


def test_groupby_apply(bdf):
    out = bdf.groupby("o_orderstatus").apply(
        lambda g: pd.DataFrame({
            "o_orderstatus": [g["o_orderstatus"].iloc[0]],
            "spread": [g["o_totalprice"].max() - g["o_totalprice"].min()]}),
        "o_orderstatus string, spread double")
    assert len(out) == 3


def test_rolling(bdf, pdf):
    got = (bdf.rolling(3, order_by="o_orderkey", allow_global=True)
           .mean("o_totalprice")
           .to_pandas().sort_values("o_orderkey").reset_index(drop=True))
    exp = pdf.sort_values("o_orderkey").reset_index(drop=True)
    exp_roll = exp["o_totalprice"].rolling(3).mean()
    pd.testing.assert_series_equal(
        got["o_totalprice_roll_mean"], exp_roll,
        check_names=False, rtol=1e-9)


def test_rolling_median_var(bdf, pdf):
    got = (bdf.rolling(4, order_by="o_orderkey", allow_global=True)
           .median("o_totalprice")
           .to_pandas().sort_values("o_orderkey").reset_index(drop=True))
    exp = pdf.sort_values("o_orderkey").reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["o_totalprice_roll_median"],
        exp["o_totalprice"].rolling(4).median(),
        check_names=False, rtol=1e-9)
    gotv = (bdf.rolling(4, order_by="o_orderkey", allow_global=True)
            .var("o_totalprice")
            .to_pandas().sort_values("o_orderkey").reset_index(drop=True))
    pd.testing.assert_series_equal(
        gotv["o_totalprice_roll_var"],
        exp["o_totalprice"].rolling(4).var(),
        check_names=False, rtol=1e-9)


def test_rolling_cov_corr(bdf, pdf):
    got = (bdf.rolling(5, order_by="o_orderkey", allow_global=True)
           .cov("o_totalprice", "o_custkey")
           .to_pandas().sort_values("o_orderkey").reset_index(drop=True))
    exp = pdf.sort_values("o_orderkey").reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["o_totalprice_o_custkey_roll_cov"],
        exp["o_totalprice"].rolling(5).cov(exp["o_custkey"].astype(float)),
        check_names=False, rtol=1e-9)
    gotc = (bdf.rolling(5, order_by="o_orderkey", allow_global=True)
            .corr("o_totalprice", "o_custkey")
            .to_pandas().sort_values("o_orderkey").reset_index(drop=True))
    pd.testing.assert_series_equal(
        gotc["o_totalprice_o_custkey_roll_corr"],
        exp["o_totalprice"].rolling(5).corr(exp["o_custkey"].astype(float)),
        check_names=False, rtol=1e-9)


def test_rolling_apply(bdf, pdf):
    import numpy as np
    got = (bdf.rolling(3, order_by="o_orderkey", allow_global=True)
           .apply("o_totalprice", lambda a: np.ptp(a))
           .to_pandas().sort_values("o_orderkey").reset_index(drop=True))
    exp = pdf.sort_values("o_orderkey").reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["o_totalprice_roll_apply"],
        exp["o_totalprice"].rolling(3).apply(lambda a: np.ptp(a), raw=True),
        check_names=False, rtol=1e-9)


def test_rolling_apply_partitioned(bdf, pdf):
    import numpy as np
    got = (bdf.rolling(2, order_by="o_orderkey",
                       partition_by="o_orderstatus")
           .apply("o_totalprice", lambda a: a.sum())
           .to_pandas().sort_values("o_orderkey").reset_index(drop=True))
    exp = pdf.sort_values("o_orderkey").reset_index(drop=True)
    exp["r"] = (exp.groupby("o_orderstatus")["o_totalprice"]
                .transform(lambda s: s.rolling(2).sum()))
    pd.testing.assert_series_equal(
        got["o_totalprice_roll_apply"], exp["r"],
        check_names=False, rtol=1e-9)


def test_rolling_requires_partition_or_optin(bdf):
    """Global rolling is a single-task plan; it must be an explicit
    opt-in, never a silent default."""
    import pytest
    with pytest.raises(ValueError, match="partition_by"):
        bdf.rolling(3, order_by="o_orderkey")


def test_asof_frame(spark):
    ev = bd.read_parquet(f"{SF_DIR}/events.parquet", spark=spark)
    # normalize ts like _util.tbl(): only ns-long files need conversion
    # (driver data has shipped both ns-long and native us timestamps)
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    sdf = ev.spark
    if isinstance(sdf.schema["ts"].dataType, T.LongType):
        sdf = sdf.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    edf = bd.BodoDataFrame(sdf)
    buys = edf[edf["event_type"] == "purchase"][["event_id", "user_id", "ts"]]
    clicks = edf[edf["event_type"] == "click"][["user_id", "ts", "value"]] \
        .drop_duplicates(["user_id", "ts"])
    j = bd.merge_asof(buys, clicks, on="ts", by="user_id")
    assert len(j) == len(buys)
    assert "value" in j.columns


def test_series_cumsum_prod_isocalendar(bdf, pdf):
    got = (bdf["o_totalprice"].cumsum(order_by="o_orderkey")
           .to_pandas())
    # cumsum ordering: compare against pandas cumsum on the sorted frame
    exp_frame = pdf.sort_values("o_orderkey").reset_index(drop=True)
    exp = exp_frame["o_totalprice"].cumsum()
    # spark window output order is nondeterministic; compare sorted values
    assert sorted(got.round(6)) == sorted(exp.round(6))
    import numpy as np
    # prod over prices overflows float range; compare on a bounded slice
    small = bdf.assign(r=bdf["o_totalprice"] % 3 + 0.5)
    psmall = pdf["o_totalprice"] % 3 + 0.5
    assert np.isclose(small["r"].prod(), psmall.prod(), rtol=1e-6)
    iso = bdf["o_orderdate"].isocalendar().to_pandas()
    exp_iso = pd.to_datetime(pdf["o_orderdate"]).dt.isocalendar()
    assert sorted(iso["week"].tolist()) == sorted(exp_iso["week"].tolist())
    assert sorted(iso["day"].tolist()) == sorted(exp_iso["day"].tolist())


def test_str_cat_rsplit(bdf, pdf):
    got = (bdf["o_orderstatus"].str.cat(bdf["o_orderpriority"], sep="~")
           .to_pandas())
    exp = pdf["o_orderstatus"].str.cat(pdf["o_orderpriority"], sep="~")
    assert sorted(got) == sorted(exp)
    r = (bdf["o_orderpriority"].str.rsplit("-", 1).to_pandas())
    expr = pdf["o_orderpriority"].str.rsplit("-", n=1)
    assert sorted(map(tuple, r)) == sorted(map(tuple, expr))


def test_groupby_transform(bdf, pdf):
    got = (bdf.groupby("o_orderstatus").transform("o_totalprice", "mean")
           .to_pandas().sort_values("o_orderkey").reset_index(drop=True))
    exp = pdf.sort_values("o_orderkey").reset_index(drop=True)
    exp["t"] = (exp.groupby("o_orderstatus")["o_totalprice"]
                .transform("mean"))
    pd.testing.assert_series_equal(
        got["o_totalprice_mean"], exp["t"], check_names=False, rtol=1e-9)


def test_freq_items_and_approx_quantile(bdf, pdf):
    fi = bdf.freq_items(["o_orderstatus"], support=0.1)
    true_frequent = set(
        pdf["o_orderstatus"].value_counts(normalize=True)
        [lambda s: s >= 0.1].index)
    assert true_frequent <= set(fi["o_orderstatus"])  # no misses
    q = bdf.approx_quantile("o_totalprice", [0.5], rel_err=0.01)[0]
    exact = pdf["o_totalprice"].quantile(0.5)
    lo, hi = pdf["o_totalprice"].quantile([0.45, 0.55])
    assert lo <= q <= hi, (q, exact)


def test_explode_nsmallest(spark, bdf, pdf):
    df = bd.from_pandas(
        pd.DataFrame({"k": [1, 2, 3], "v": [[1, 2], [], None]}),
        spark=spark)
    got = df.explode("v").to_pandas().sort_values(["k"]).reset_index(drop=True)
    exp = (pd.DataFrame({"k": [1, 2, 3], "v": [[1, 2], [], None]})
           .explode("v").reset_index(drop=True))
    assert len(got) == len(exp) == 4
    assert sorted(got["k"]) == sorted(exp["k"])
    small = bdf.nsmallest(5, "o_totalprice").to_pandas()
    exps = pdf.nsmallest(5, "o_totalprice")
    assert sorted(small["o_totalprice"]) == sorted(exps["o_totalprice"])


def test_rolling_min_periods(bdf, pdf):
    got = (bdf.rolling(4, order_by="o_orderkey", allow_global=True,
                       min_periods=2)
           .mean("o_totalprice")
           .to_pandas().sort_values("o_orderkey").reset_index(drop=True))
    exp = pdf.sort_values("o_orderkey").reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["o_totalprice_roll_mean"],
        exp["o_totalprice"].rolling(4, min_periods=2).mean(),
        check_names=False, rtol=1e-9)
    gm = (bdf.rolling(5, order_by="o_orderkey", allow_global=True,
                      min_periods=1)
          .median("o_totalprice")
          .to_pandas().sort_values("o_orderkey").reset_index(drop=True))
    pd.testing.assert_series_equal(
        gm["o_totalprice_roll_median"],
        exp["o_totalprice"].rolling(5, min_periods=1).median(),
        check_names=False, rtol=1e-9)


def test_str_accessor_breadth(spark):
    import numpy as np
    pdf_ = pd.DataFrame({"s": ["Hello World", "abc123", "123", "ABC",
                               "   ", "mIxEd"]})
    b = bd.from_pandas(pdf_, spark=spark)
    for meth, args in [("casefold", ()), ("capitalize", ()),
                       ("swapcase", ()), ("isdigit", ()), ("isalpha", ()),
                       ("isalnum", ()), ("isspace", ()), ("islower", ()),
                       ("isupper", ()), ("count", ("l",))]:
        got = getattr(b["s"].str, meth)(*args).to_pandas()
        exp = getattr(pdf_["s"].str, meth)(*args)
        assert list(got) == list(exp), (meth, list(got), list(exp))


def test_dt_accessor_breadth(bdf, pdf):
    d = pd.to_datetime(pdf["o_orderdate"])
    checks = {
        "day_name": d.dt.day_name(),
        "month_name": d.dt.month_name(),
        "days_in_month": d.dt.days_in_month,
        "is_month_start": d.dt.is_month_start,
        "is_month_end": d.dt.is_month_end,
        "week": d.dt.isocalendar().week,
    }
    for name, exp in checks.items():
        got = getattr(bdf["o_orderdate"].dt, name).to_pandas()
        assert sorted(map(str, got)) == sorted(map(str, exp)), name


def test_str_accessor_regex_and_positional(spark):
    pdf_ = pd.DataFrame({"s": ["Hello World", "abc-def-ghi", "123",
                               "no sep here", "a-b", "xyzxyz"]})
    b = bd.from_pandas(pdf_, spark=spark)
    for meth, args in [("match", ("[a-z]+",)), ("fullmatch", ("[a-z ]+",)),
                       ("rfind", ("-",)), ("isnumeric", ()),
                       ("istitle", ())]:
        got = getattr(b["s"].str, meth)(*args).to_pandas()
        exp = getattr(pdf_["s"].str, meth)(*args)
        assert list(got) == list(exp), (meth, list(got), list(exp))
    got = b["s"].str.findall("[a-z]+").to_pandas()
    exp = pdf_["s"].str.findall("[a-z]+")
    assert [list(g) for g in got] == [list(e) for e in exp]
    tbl_map = str.maketrans({"a": "A", "-": None, "1": "one"})
    got = b["s"].str.translate(tbl_map).to_pandas()
    exp = pdf_["s"].str.translate(tbl_map)
    assert list(got) == list(exp)
    got = b["s"].str.rpartition("-").to_pandas()
    exp = pdf_["s"].str.rpartition("-")
    for i in range(len(pdf_)):
        assert (got[i]["head"], got[i]["sep"], got[i]["tail"]) \
            == tuple(exp.iloc[i]), i
    got = b["s"].str.encode("utf-8").to_pandas()
    exp = pdf_["s"].str.encode("utf-8")
    assert [bytes(g) for g in got] == list(exp)


def test_dt_accessor_boundaries(spark):
    d = pd.to_datetime(pd.Series(
        ["2020-01-01 00:00:00", "2020-03-31 23:59:59.123456",
         "2021-12-31 10:30:00", "2024-02-29 12:00:00.5",
         "2023-04-01 00:00:00", "2022-06-30 07:45:30"]), format="mixed")
    pdf_ = pd.DataFrame({"t": d})
    b = bd.from_pandas(pdf_, spark=spark)
    for prop in ("is_quarter_start", "is_quarter_end", "is_year_start",
                 "is_year_end", "is_leap_year", "microsecond"):
        got = getattr(b["t"].dt, prop).to_pandas()
        exp = getattr(d.dt, prop)
        assert list(got) == list(exp), (prop, list(got), list(exp))
    for freq in ("H", "D"):
        got = pd.to_datetime(b["t"].dt.ceil(freq).to_pandas(),
                             format="mixed")
        exp = d.dt.ceil(freq.replace("H", "h").replace("D", "D"))
        assert list(got) == list(exp), ("ceil", freq)
        got = pd.to_datetime(b["t"].dt.round(freq).to_pandas(),
                             format="mixed")
        exp = d.dt.round(freq.replace("H", "h"))
        assert list(got) == list(exp), ("round", freq, list(got), list(exp))


def test_groupby_filter(bdf, pdf):
    got = (bdf.groupby("o_orderpriority")
           .filter(lambda g: g["o_totalprice"].mean() > 150000)
           .to_pandas())
    exp = (pdf.groupby("o_orderpriority")
           .filter(lambda g: g["o_totalprice"].mean() > 150000))
    assert len(got) == len(exp)
    assert set(got["o_orderpriority"]) == set(exp["o_orderpriority"])


def test_series_shift_rank(bdf, pdf):
    exp_frame = pdf.sort_values("o_orderkey").reset_index(drop=True)
    got = (bdf.assign(sh=bdf["o_totalprice"].shift(1, order_by="o_orderkey"))
           .to_pandas().sort_values("o_orderkey").reset_index(drop=True))
    exp = exp_frame["o_totalprice"].shift(1)
    assert (got["sh"].fillna(-1).round(6)
            == exp.fillna(-1).round(6)).all()
    for method in ("average", "min", "dense"):
        gotr = (bdf.assign(r=bdf["o_totalprice"].rank(method=method))
                .to_pandas().sort_values("o_orderkey")
                .reset_index(drop=True))
        expr = exp_frame["o_totalprice"].rank(method=method)
        assert (gotr["r"] == expr).all(), method


def test_module_level_merge_to_datetime(spark, bdf):
    cust = bd.read_parquet(f"{SF_DIR}/customer.parquet", spark=spark)
    j = bd.merge(bdf, cust, how="inner", left_on="o_custkey",
                 right_on="c_custkey")
    assert "c_name" in j.columns
    s = bd.from_pandas(pd.DataFrame({"d": ["2024-03-05", "1999-12-31"]}),
                       spark=spark)
    ts = bd.to_datetime(s["d"], format="%Y-%m-%d").to_pandas()
    assert str(ts[0]).startswith("2024-03-05")


def test_str_partition(spark):
    pdf_ = pd.DataFrame({"s": ["a-b-c", "nodelim", "-lead", "trail-"]})
    b = bd.from_pandas(pdf_, spark=spark)
    got = b["s"].str.partition("-").to_pandas()
    exp = pdf_["s"].str.partition("-")
    for i in range(len(pdf_)):
        assert got[i]["head"] == exp.iloc[i, 0]
        assert got[i]["sep"] == exp.iloc[i, 1]
        assert got[i]["tail"] == exp.iloc[i, 2]


def test_drop_near_duplicates(spark):
    docs = bd.read_parquet(f"{SF_DIR}/documents.parquet", spark=spark)
    surv = docs.drop_near_duplicates("doc_id", "text")
    n_docs, n_surv = len(docs), len(surv)
    assert 0 < n_surv <= n_docs
    # surviving frame keeps the full schema and contains no dropped ids
    assert surv.columns == docs.columns


def test_str_justify_affix_helpers(spark):
    pdf_ = pd.DataFrame({"s": ["ab", "hello", "x"]})
    b = bd.from_pandas(pdf_, spark=spark)
    cases = [("ljust", (7, ".")), ("rjust", (7, ".")), ("center", (8, "-")),
             ("removeprefix", ("he",)), ("removesuffix", ("lo",)),
             ("slice_replace", (1, 3, "Z"))]
    for meth, args in cases:
        got = list(getattr(b["s"].str, meth)(*args).to_pandas())
        exp = list(getattr(pdf_["s"].str, meth)(*args))
        assert got == exp, meth


def test_series_nlargest_groupby_head(bdf, pdf):
    got = sorted(bdf["o_totalprice"].nlargest(5))
    exp = sorted(pdf["o_totalprice"].nlargest(5))
    assert got == exp
    assert sorted(bdf["o_totalprice"].nsmallest(3)) == \
        sorted(pdf["o_totalprice"].nsmallest(3))
    h = (bdf.groupby("o_orderstatus").head(2, order_by="o_orderkey")
         .to_pandas())
    exp_h = (pdf.sort_values("o_orderkey").groupby("o_orderstatus")
             .head(2))
    assert sorted(h["o_orderkey"]) == sorted(exp_h["o_orderkey"])


def test_series_any_all_mode_and_matrices(spark, bdf, pdf):
    import numpy as np
    b = bd.from_pandas(pd.DataFrame({"f": [True, False, True]}),
                       spark=spark)
    assert b["f"].any() is True and b["f"].all() is False
    assert bdf["o_orderpriority"].mode() == \
        sorted(pdf["o_orderpriority"].mode())[0]
    cols = ["o_totalprice", "o_custkey", "o_orderkey"]
    got = bdf.corr_matrix(cols)
    exp = pdf[cols].corr()
    assert np.allclose(got.to_numpy(), exp.to_numpy(), rtol=1e-9)
    gotc = bdf.cov_matrix(cols)
    expc = pdf[cols].cov()
    assert np.allclose(gotc.to_numpy(), expc.to_numpy(), rtol=1e-9)


def test_shift_rank_partitioned(bdf, pdf):
    got = (bdf.assign(sh=bdf["o_totalprice"].shift(
        1, order_by="o_orderkey", partition_by="o_orderstatus"))
        .to_pandas().sort_values("o_orderkey").reset_index(drop=True))
    exp = pdf.sort_values("o_orderkey").reset_index(drop=True)
    exp["sh"] = exp.groupby("o_orderstatus")["o_totalprice"].shift(1)
    assert (got["sh"].fillna(-1).round(6)
            == exp["sh"].fillna(-1).round(6)).all()
    gotr = (bdf.assign(r=bdf["o_totalprice"].rank(
        method="min", partition_by="o_orderstatus"))
        .to_pandas().sort_values("o_orderkey").reset_index(drop=True))
    exp["r"] = (exp.groupby("o_orderstatus")["o_totalprice"]
                .rank(method="min"))
    assert (gotr["r"] == exp["r"]).all()


def test_hll_sketch_ndv(spark, bdf, pdf):
    from pyspark.sql import functions as F
    exact = pdf["o_custkey"].nunique()
    est = bdf.approx_nunique_sketch("o_custkey")
    assert abs(est - exact) / exact < 0.05, (est, exact)
    # sketches are mergeable: union of two half-sketches == whole estimate
    lo = bdf[bdf["o_custkey"] < 1000]
    hi = bdf[bdf["o_custkey"] >= 1000]
    s_lo, s_hi = lo.hll_sketch("o_custkey"), hi.hll_sketch("o_custkey")
    merged = spark.createDataFrame(
        [(bytearray(s_lo),), (bytearray(s_hi),)], "s binary").agg(
        F.hll_sketch_estimate(F.hll_union_agg("s")).alias("n")
    ).collect()[0]["n"]
    assert abs(int(merged) - exact) / exact < 0.05


def test_series_floordiv_pow_clip(bdf, pdf):
    import numpy as np
    got = (bdf.assign(fd=bdf["o_custkey"] // 7,
                      pw=bdf["o_custkey"] % 5 ** 1 * 1.0,
                      p2=(bdf["o_custkey"] % 4) ** 2,
                      cl=bdf["o_totalprice"].clip(50000.0, 300000.0))
           .to_pandas().sort_values("o_orderkey").reset_index(drop=True))
    exp = pdf.sort_values("o_orderkey").reset_index(drop=True)
    assert (got["fd"] == exp["o_custkey"] // 7).all()
    assert (got["p2"] == (exp["o_custkey"] % 4) ** 2).all()
    assert np.allclose(got["cl"],
                       exp["o_totalprice"].clip(50000.0, 300000.0))


def test_general_functions_vs_pandas(spark):
    """pd.cut/qcut/crosstab/get_dummies/to_numeric/unique/date_range
    (reference docs api_docs/pandas/general_functions/) differential
    against real pandas."""
    import numpy as np
    import pandas as pd

    import bodo_spark as bs

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({
        "x": np.round(rng.uniform(0, 100, 500), 2),
        "g": rng.choice(["a", "b", "c"], 500),
        "h": rng.choice(["u", "v"], 500),
        "s": rng.choice(["1", "2.5", "zzz", "-7"], 500),
    })
    bdf = bs.from_pandas(pdf)

    # cut with explicit edges -> integer codes
    got = bdf.assign(c=bs.cut(bdf["x"], [0, 25, 50, 75, 100],
                              labels=False)).to_pandas()["c"]
    exp = pd.cut(pdf["x"], [0, 25, 50, 75, 100], labels=False)
    assert (got.fillna(-1).astype(int).values
            == exp.fillna(-1).astype(int).values).all()

    # cut with int bins (equal width, padded lowest edge like pandas)
    got = bdf.assign(c=bs.cut(bdf["x"], 4, labels=False)).to_pandas()["c"]
    exp = pd.cut(pdf["x"], 4, labels=False)
    assert (got.astype(int).values == exp.astype(int).values).all()

    # qcut codes
    got = bdf.assign(c=bs.qcut(bdf["x"], 4, labels=False)).to_pandas()["c"]
    exp = pd.qcut(pdf["x"], 4, labels=False)
    assert (got.astype(int).values == exp.astype(int).values).all()

    # crosstab counts
    got = bs.crosstab(bdf["g"], bdf["h"]).to_pandas().set_index("g")
    exp = pd.crosstab(pdf["g"], pdf["h"])
    assert (got.loc[exp.index, exp.columns].values == exp.values).all()

    # get_dummies
    got = bs.get_dummies(bdf["g"]).to_pandas()
    exp = pd.get_dummies(pdf["g"]).astype(int)
    assert list(got.columns) == list(exp.columns)
    assert got.sum().tolist() == exp.sum().tolist()

    # to_numeric coerce
    got = bdf.assign(n=bs.to_numeric(bdf["s"], errors="coerce")) \
        .to_pandas()["n"]
    exp = pd.to_numeric(pdf["s"], errors="coerce")
    assert np.allclose(got.fillna(-9).values, exp.fillna(-9).values)

    # unique
    assert sorted(bs.unique(bdf["g"])) == sorted(pdf["g"].unique())

    # date_range: distributed spine matches pandas
    got = sorted(r["ts"] for r in
                 bs.date_range("2024-01-01", periods=50, freq="D",
                               spark=spark).spark.collect())
    exp = list(pd.date_range("2024-01-01", periods=50, freq="D"))
    assert [pd.Timestamp(t) for t in got] == exp

    # weekly anchors to Sunday like pandas 'W'
    got = sorted(r["ts"] for r in
                 bs.date_range("2024-01-03", periods=4, freq="W",
                               spark=spark).spark.collect())
    exp = list(pd.date_range("2024-01-03", periods=4, freq="W"))
    assert [pd.Timestamp(t) for t in got] == exp


def test_frame_breadth_round5(spark):
    """diff/pct_change/cumprod/duplicated/mask/insert/join/pivot/
    select_dtypes/empty + pandas-spelling aliases, differential vs
    pandas where order is defined."""
    import numpy as np
    import pandas as pd

    import bodo_spark as bs

    pdf = pd.DataFrame({
        "k": [1, 2, 3, 4, 5, 6],
        "g": ["a", "a", "b", "b", "a", "b"],
        "x": [2.0, 4.0, 8.0, 3.0, 5.0, 7.0],
    })
    bdf = bs.from_pandas(pdf)

    got = bdf.assign(
        d=bdf["x"].diff(order_by="k"),
        pc=bdf["x"].pct_change(order_by="k"),
        cp=bdf["x"].cumprod(order_by="k"),
        m=bdf["x"].mask(bdf["x"] > 4, other=-1.0),
        dup=bdf.duplicated(subset=["g"], order_by="k"),
    ).sort_values("k").to_pandas()
    p = pdf.sort_values("k")
    assert np.allclose(got["d"].fillna(-9), p["x"].diff().fillna(-9))
    assert np.allclose(got["pc"].fillna(-9), p["x"].pct_change().fillna(-9))
    assert np.allclose(got["cp"], p["x"].cumprod())
    assert np.allclose(got["m"], p["x"].mask(p["x"] > 4, -1.0))
    assert got["dup"].tolist() == p.duplicated(subset=["g"]).tolist()

    # aliases and properties
    assert bdf["x"].product() == pdf["x"].prod()
    assert not bdf.empty and bdf.ndim == 2
    assert bdf[bdf["x"] > 100].empty
    assert bdf.isnull().to_pandas().values.sum() == 0

    # insert puts the column at the position
    b2 = bs.from_pandas(pdf)
    b2.insert(1, "one", 1)
    assert b2.columns[1] == "one"

    # join (key-column form) == pandas merge
    other = bs.from_pandas(pd.DataFrame({"g": ["a", "b"], "v": [10, 20]}))
    j = bdf.join(other, on="g").sort_values("k").to_pandas()
    assert j["v"].tolist() == [10, 10, 20, 20, 10, 20]

    # pivot (no-agg first-value)
    pv = bdf.pivot(index="g", columns="k", values="x").to_pandas()
    assert pv.set_index("g").loc["a", "1"] == 2.0

    # select_dtypes
    assert set(bdf.select_dtypes("number").columns) == {"k", "x"}
    assert set(bdf.select_dtypes("string").columns) == {"g"}


def test_series_breadth_round5(spark):
    """cummax/cummin/ffill/bfill, pandas-estimator skew/kurt/sem,
    autocorr, named operators, equals/hasnans -- differential vs pandas."""
    import numpy as np
    import pandas as pd

    import bodo_spark as bs

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({
        "k": np.arange(200),
        "x": np.round(rng.normal(50, 12, 200), 2),
        "h": rng.choice([1.0, 2.0, None], 200),
    })
    bdf = bs.from_pandas(pdf)

    got = bdf.assign(
        cmx=bdf["x"].cummax(order_by="k"),
        cmn=bdf["x"].cummin(order_by="k"),
        ff=bdf["h"].ffill(order_by="k"),
        bf=bdf["h"].bfill(order_by="k"),
        named=bdf["x"].add(1).mul(2).sub(3).div(4),
    ).sort_values("k").to_pandas()
    p = pdf.sort_values("k")
    assert np.allclose(got["cmx"], p["x"].cummax())
    assert np.allclose(got["cmn"], p["x"].cummin())
    assert np.allclose(got["ff"].fillna(-9), p["h"].ffill().fillna(-9))
    assert np.allclose(got["bf"].fillna(-9), p["h"].bfill().fillna(-9))
    assert np.allclose(got["named"], ((p["x"] + 1) * 2 - 3) / 4)

    assert abs(bdf["x"].skew() - pdf["x"].skew()) < 1e-9
    assert abs(bdf["x"].kurt() - pdf["x"].kurt()) < 1e-9
    assert abs(bdf["x"].sem() - pdf["x"].sem()) < 1e-9
    assert abs(bdf["x"].autocorr(1, order_by="k")
               - pdf["x"].autocorr(1)) < 1e-9

    assert bdf["h"].hasnans and not bdf["x"].hasnans
    assert bdf["x"].equals(bdf["x"])
    assert not bdf["x"].equals(bdf["x"] + 1)
    assert sorted(bdf["h"].unique(), key=lambda v: (v is None, v)) \
        == sorted(pdf["h"].unique(), key=lambda v: (v is None or v != v, v))[:3]


def test_groupby_breadth_round5(spark):
    """groupby first/last/median/std/var/prod/shift/value_counts/
    rolling/pipe vs pandas."""
    import numpy as np
    import pandas as pd

    import bodo_spark as bs

    pdf = pd.DataFrame({
        "g": ["a", "a", "a", "b", "b", "b"],
        "k": [1, 2, 3, 1, 2, 3],
        "x": [2.0, 4.0, 6.0, 1.0, 3.0, 9.0],
    })
    bdf = bs.from_pandas(pdf)
    gb = bdf.groupby("g")

    med = gb.median(["x"]).sort_values("g").to_pandas()
    assert med["x"].tolist() == [4.0, 3.0]
    assert gb.prod(["x"]).sort_values("g").to_pandas()["x"].tolist() \
        == [48.0, 27.0]
    assert np.allclose(gb.std(["x"]).sort_values("g").to_pandas()["x"],
                       pdf.groupby("g")["x"].std().values)

    sh = gb.shift("x", 1, order_by="k").sort_values(["g", "k"]).to_pandas()
    exp = pdf.sort_values(["g", "k"]).groupby("g")["x"].shift(1)
    assert sh["x_shift"].fillna(-9).tolist() == exp.fillna(-9).tolist()

    vc = gb.value_counts("x").to_pandas()
    assert vc["count"].sum() == 6

    roll = gb.rolling(2, order_by="k").mean("x").sort_values(["g", "k"])
    got = roll.to_pandas()["x_roll_mean"]
    exp = (pdf.sort_values(["g", "k"]).groupby("g")["x"]
           .rolling(2).mean().reset_index(drop=True))
    assert np.allclose(got.fillna(-9), exp.fillna(-9))

    assert gb.pipe(lambda g: g.size()).to_pandas()["size"].sum() == 6
    assert gb.aggregate({"x": "sum"}).sort_values("g") \
        .to_pandas()["x"].tolist() == [12.0, 13.0]


def test_str_accessor_tail(spark):
    """str.extractall/join/index/rindex/isdecimal close out the
    reference str accessor list."""
    import bodo_spark as bs
    import pandas as pd

    pdf = pd.DataFrame({"s": ["a1b22c", "no9digits77", "none"]})
    b = bs.from_pandas(pdf)
    out = b.assign(ms=b["s"].str.extractall(r"[0-9]+"),
                   dec=b["s"].str.isdecimal(),
                   i1=b["s"].str.index("b"),
                   r1=b["s"].str.rindex("i"))
    out = out.assign(j=out["ms"].str.join("-")).to_pandas()
    assert out["j"].tolist() == ["1-22", "9-77", ""]
    assert out["dec"].tolist() == [False, False, False]
    assert out["i1"].tolist() == [2, -1, -1]
    assert out["r1"].tolist() == [-1, 6, -1]


def test_to_timedelta_and_range(spark):
    import pandas as pd

    import bodo_spark as bs

    pdf = pd.DataFrame({"t": pd.to_datetime(["2024-01-01", "2024-06-01"]),
                        "mins": [90, 30]})
    b = bs.from_pandas(pdf)
    out = b.assign(t2=b["t"] + bs.to_timedelta(b["mins"], unit="min")) \
        .sort_values("t").to_pandas()
    exp = (pdf["t"] + pd.to_timedelta(pdf["mins"], unit="min")).tolist()
    assert [pd.Timestamp(x) for x in out["t2"]] == exp

    tds = bs.timedelta_range(periods=3, freq="h", spark=spark) \
        .spark.collect()
    assert [r["td"].total_seconds() for r in tds] == [0.0, 3600.0, 7200.0]


def test_review_fixes_round5(spark):
    """Review fixes: cut/qcut label lists, to_numeric(errors='raise')
    actually raising under non-ANSI sessions, skew/kurt NaN on
    constant/small series, duplicated() pandas all-columns default,
    groupby.first skipping nulls, @param safe inside string literals."""
    import math

    import pandas as pd
    import pytest as _pytest

    import bodo_spark as bs

    pdf = pd.DataFrame({"k": [1, 2, 3, 4], "x": [5.0, 5.0, 5.0, 5.0],
                        "s": ["1", "zzz", "3", "4"],
                        "h": [None, 2.0, None, 4.0]})
    bdf = bs.from_pandas(pdf)

    lab = bdf.assign(c=bs.cut(bdf["k"], [0, 2, 4], labels=["lo", "hi"])) \
        .sort_values("k").to_pandas()["c"]
    assert lab.tolist() == ["lo", "lo", "hi", "hi"]

    with _pytest.raises(Exception, match="unparseable"):
        bdf.assign(n=bs.to_numeric(bdf["s"], errors="raise")) \
            .spark.collect()

    assert math.isnan(bdf["x"].skew()) and math.isnan(bdf["x"].kurt())

    # all-columns default: k is unique -> nothing duplicated
    d = bdf.assign(dup=bdf.duplicated(order_by="k")).to_pandas()
    assert not d["dup"].any()

    # groupby.first skips nulls like pandas
    g = bs.from_pandas(pd.DataFrame({"g": ["a", "a"], "v": [None, 7.0]}))
    assert g.groupby("g").first(["v"]).to_pandas()["v"].tolist() == [7.0]

    # @param never rewrites inside string literals
    from bodo_spark.sql import BodoSQLContext
    bc = BodoSQLContext({"t": pd.DataFrame({"e": ["bob@lo.example"]})},
                        spark=spark)
    r = bc.sql("SELECT COUNT(*) AS c FROM t WHERE e = 'bob@lo.example' "
               "AND length(e) > @lo", params={"lo": 3}).spark.collect()
    assert r[0]["c"] == 1


def test_dateoffset_arithmetic(spark):
    """pd.DateOffset parity: calendar month-end clamping + mixed
    day/time parts, both directions."""
    import pandas as pd

    import bodo_spark as bs

    pdf = pd.DataFrame({"t": pd.to_datetime(
        ["2024-01-31 10:00:00", "2024-02-29 23:30:00",
         "2023-12-15 00:00:00"])})
    b = bs.from_pandas(pdf)
    off = dict(months=1, days=2, hours=3)
    got = b.assign(plus=b["t"] + bs.DateOffset(**off),
                   minus=b["t"] - bs.DateOffset(**off)) \
        .sort_values("t").to_pandas()
    p = pdf.sort_values("t")
    assert [pd.Timestamp(x) for x in got["plus"]] \
        == list(p["t"] + pd.DateOffset(**off))
    assert [pd.Timestamp(x) for x in got["minus"]] \
        == list(p["t"] - pd.DateOffset(**off))


def test_jit_facade(spark):
    """@bodo_spark.jit is the identity (reference bodo/compiler.py:117
    collapses into lazy Catalyst planning): bare and parameterized
    forms both run the function unchanged."""
    import pandas as pd

    import bodo_spark as bs

    @bs.jit
    def f1(df):
        return df.groupby("g").sum(["x"])

    @bs.jit(cache=True, distributed=["df"])
    def f2(df):
        return df.groupby("g").sum(["x"])

    bdf = bs.from_pandas(pd.DataFrame({"g": ["a", "a"], "x": [1.0, 2.0]}))
    assert f1(bdf).to_pandas()["x"].tolist() == [3.0]
    assert f2(bdf).to_pandas()["x"].tolist() == [3.0]


def test_series_describe_idx(spark):
    import numpy as np
    import pandas as pd

    import bodo_spark as bs

    pdf = pd.DataFrame({"k": [10, 20, 30, 40], "x": [3.0, 1.0, 4.0, 1.5]})
    b = bs.from_pandas(pdf)
    got = b["x"].describe()
    exp = pdf["x"].describe()
    for f in ("count", "mean", "std", "min", "25%", "50%", "75%", "max"):
        assert abs(got[f] - exp[f]) < 1e-12, f
    assert b["x"].idxmax(index_col="k") == 30
    assert b["x"].idxmin(index_col="k") == 20
    assert b["x"].rename("y").name == "y"
    withna = bs.from_pandas(pd.DataFrame({"v": [1.0, None, 3.0]}))
    assert len(withna["v"].dropna()) == 2


def test_groupby_cumulatives(spark):
    import numpy as np
    import pandas as pd

    import bodo_spark as bs

    pdf = pd.DataFrame({"g": ["a", "a", "b", "b"], "k": [1, 2, 1, 2],
                        "x": [2.0, 3.0, 5.0, 7.0]})
    b = bs.from_pandas(pdf)
    gb = b.groupby("g")
    out = gb.cumprod("x", order_by="k")
    out = bs.BodoDataFrame(out.spark)
    got = out.sort_values(["g", "k"]).to_pandas()["x_cumprod"]
    exp = pdf.sort_values(["g", "k"]).groupby("g")["x"].cumprod()
    assert np.allclose(got, exp)
    got = gb.cummax("x", order_by="k").sort_values(["g", "k"]) \
        .to_pandas()["x_cummax"]
    assert np.allclose(got, pdf.sort_values(["g", "k"])
                       .groupby("g")["x"].cummax())
    got = gb.cummin("x", order_by="k").sort_values(["g", "k"]) \
        .to_pandas()["x_cummin"]
    assert np.allclose(got, pdf.sort_values(["g", "k"])
                       .groupby("g")["x"].cummin())


def test_series_rolling(spark):
    import numpy as np
    import pandas as pd

    import bodo_spark as bs

    pdf = pd.DataFrame({"k": [1, 2, 3, 4, 5], "x": [2.0, 4.0, 6.0, 8.0, 1.0]})
    b = bs.from_pandas(pdf)
    got = b["x"].rolling(3, order_by="k").mean().to_frame().to_pandas()
    exp = pdf.sort_values("k")["x"].rolling(3).mean()
    assert np.allclose(np.sort(got.iloc[:, 0].fillna(-9).values),
                       np.sort(exp.fillna(-9).values))


def test_partitioning_passthroughs(spark):
    import pandas as pd

    import bodo_spark as bs

    b = bs.from_pandas(pd.DataFrame({"g": list("ababab"), "x": range(6)}))
    r = b.repartition(4, "g")
    assert r.spark.rdd.getNumPartitions() == 4
    assert len(r) == 6
    c = r.coalesce(1)
    assert c.spark.rdd.getNumPartitions() == 1
    assert len(b.cache().unpersist()) == 6


def test_review_fixes_round6(spark):
    """Round-6 review fixes: skew/kurt exact at large |mean|/std (two-pass
    centered moments), to_numeric(downcast='integer') keeps fractional
    values as float like pandas, escaped/doubled quotes don't invert the
    SQL literal scanner."""
    import math
    import re

    import pandas as pd

    import bodo_spark as bs
    from bodo_spark.sql.context import _sub_outside_quotes

    # ids/prices-scale data: raw power sums cancel catastrophically here
    vals = [1e8 + v for v in [1.0, 2.5, 3.1, 7.9, 2.2, 9.4, 0.3]]
    pdf = pd.DataFrame({"x": vals})
    bdf = bs.from_pandas(pdf)
    assert abs(bdf["x"].skew() - pdf["x"].skew()) < 1e-6
    assert abs(bdf["x"].kurt() - pdf["x"].kurt()) < 1e-6

    # downcast='integer': fractional input stays float (pandas parity);
    # integral input downcasts to int
    frac = bs.from_pandas(pd.DataFrame({"s": ["1", "2.5", "3"]}))
    got = frac.assign(n=bs.to_numeric(frac["s"], errors="coerce",
                                      downcast="integer")).to_pandas()["n"]
    assert sorted(got.tolist()) == [1.0, 2.5, 3.0]
    whole = bs.from_pandas(pd.DataFrame({"s": ["1", "2", "3"]}))
    got2 = whole.assign(n=bs.to_numeric(whole["s"], errors="coerce",
                                        downcast="integer")).to_pandas()["n"]
    assert sorted(got2.tolist()) == [1, 2, 3]
    assert str(got2.dtype).startswith("int")

    # literal scanner: backslash-escaped and doubled quotes
    pat = re.compile(r"@p\b")
    q = r"SELECT 'it\'s @p', 'a''b @p', @p"
    out = _sub_outside_quotes(pat, "X", q)
    assert out == r"SELECT 'it\'s @p', 'a''b @p', X"

    assert math.isnan(bs.from_pandas(
        pd.DataFrame({"x": [1.0]}))["x"].skew())


def test_loc_indexer(spark):
    """df.loc lazy subset (reference frame.py:94): [:, cols], [mask],
    [mask, cols]; positional selectors raise instead of collecting."""
    import pandas as pd
    import pytest as _pytest

    import bodo_spark as bs

    pdf = pd.DataFrame({"a": [1, 2, 3, 4], "b": list("wxyz"),
                        "c": [10.0, 20.0, 30.0, 40.0]})
    bdf = bs.from_pandas(pdf)

    cols = bdf.loc[:, ["a", "c"]]
    assert cols.columns == ["a", "c"]
    masked = bdf.loc[bdf["a"] > 2].to_pandas().sort_values("a")
    assert masked["b"].tolist() == ["y", "z"]
    both = bdf.loc[bdf["a"] > 1, ("a", "b")].to_pandas().sort_values("a")
    assert both.columns.tolist() == ["a", "b"] and len(both) == 3
    one_col = bdf.loc[bdf["a"] == 2, "b"]
    assert one_col.to_frame().to_pandas().iloc[0, 0] == "x"
    with _pytest.raises(NotImplementedError, match="positional|not supported"):
        bdf.loc[0]
    with _pytest.raises(NotImplementedError):
        bdf.loc[0:2, ["a"]]


def test_dt_components_and_state(spark):
    """dt.components pandas parity (incl. negative floor semantics),
    map_partitions_with_state per-partition init, convert_dtypes
    identity."""
    import pandas as pd

    import bodo_spark as bs

    tds = ["1 days 02:03:04.500617", "-2 days", "-1 s", "0 s"]
    pdf = pd.DataFrame({"td": pd.to_timedelta(tds)})
    bdf = bs.from_pandas(pdf)
    got = bdf["td"].dt.components.to_pandas()
    exp = pdf["td"].dt.components
    for col in ("days", "hours", "minutes", "seconds",
                "milliseconds", "microseconds", "nanoseconds"):
        assert sorted(got[col].tolist()) == sorted(exp[col].tolist()), col

    d2 = bs.from_pandas(pd.DataFrame({"x": [1, 2, 3, 4]}))
    out = d2.map_partitions_with_state(
        lambda: {"mult": 10},
        lambda st, p: p.assign(y=p["x"] * st["mult"]),
        "x long, y long").to_pandas().sort_values("x")
    assert out["y"].tolist() == [10, 20, 30, 40]

    s = d2["x"]
    assert s.convert_dtypes() is s


def test_round10_frame_method_surfaces(spark):
    """The round-10 curation ops are reachable from the pandas-flavored
    frame: gopher_filter, cap_per_domain, weighted_sample,
    dataset_profile."""
    from pyspark.sql import functions as F

    from bodo_spark.frame import BodoDataFrame

    clean = ("the quick brown fox and that dog have fun with words "
             * 6)[:-1]
    rows = [(i, "s" + str(i % 2), "en", clean + f" unique{i}")
            for i in range(12)]
    rows.append((99, "s0", "en", "tiny"))
    df = BodoDataFrame(spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"))
    kept = df.gopher_filter()
    ids = {r.doc_id for r in kept._df.collect()}
    assert 99 not in ids and len(ids) == 12
    capped = df.cap_per_domain(3)._df
    per = {r.source: r.n for r in capped.groupBy("source")
           .agg(F.count("*").alias("n")).collect()}
    assert all(v <= 3 for v in per.values())
    w = df._df.withColumn("w", F.length("text"))
    samp = BodoDataFrame(w).weighted_sample(5, "w")._df
    assert samp.count() == 5
    prof = df.dataset_profile(kll_k=64)._df.collect()
    assert {r.source for r in prof} == {"s0", "s1"}
    assert all(r.n_docs >= 6 for r in prof)


def test_round11_frame_method_surfaces(spark):
    """The round-11 ops are reachable from the pandas-flavored frame:
    drop_url_duplicates, bm25_search, funnel."""
    import datetime as dt

    from bodo_spark.frame import BodoDataFrame

    urls = BodoDataFrame(spark.createDataFrame(
        [(1, "https://E.com/a?b=2&a=1"), (2, "https://e.com/a/?a=1&b=2"),
         (3, "https://e.com/b")],
        "doc_id long, url string"))
    kept = urls.drop_url_duplicates()._df
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3]

    docs = BodoDataFrame(spark.createDataFrame(
        [(0, "apple banana"), (1, "banana cherry"), (2, "cherry date")],
        "doc_id long, text string"))
    q = spark.createDataFrame([(7, "cherry")], "q_id long, q_text string")
    top = docs.bm25_search(q, k=2)._df.collect()
    assert {r.doc_id for r in top} == {1, 2} and len(top) == 2

    ev = BodoDataFrame(spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, 0, 1), 1, "view"),
         (2, dt.datetime(2024, 1, 1, 0, 0, 2), 1, "click")],
        "event_id long, ts timestamp, user_id long, event_type string"))
    st = ev.funnel(["view", "click", "purchase"])._df.collect()
    assert st[0].stage == 2


def test_round11_frame_method_surfaces_2(spark):
    """winsorize / interpolate / scd2_apply reachable from the frame."""
    from bodo_spark.frame import BodoDataFrame

    v = BodoDataFrame(spark.createDataFrame(
        [("a", float(i)) for i in range(1, 11)] + [("a", 999.0)],
        "g string, v double"))
    w = v.winsorize("v", p_lo=0.1, p_hi=0.9, group_col="g")._df
    assert max(r.v for r in w.collect()) < 999.0

    s = BodoDataFrame(spark.createDataFrame(
        [("a", 0, 0.0), ("a", 10, None), ("a", 20, 20.0)],
        "g string, pos long, v double"))
    out = s.interpolate(group_cols=["g"], order_col="pos",
                        value_col="v")._df
    assert {r.pos: r.v for r in out.collect()}[10] == 10.0

    dim = BodoDataFrame(spark.createDataFrame(
        [(1, "x", "2020-01-01", None, True)],
        "k long, seg string, eff_from string, eff_to string, "
        "is_current boolean"))
    ch = spark.createDataFrame([(1, "y")], "k long, seg string")
    got = dim.scd2_apply(ch, key=["k"], tracked=["seg"],
                         batch_ts="2024-01-01")._df.collect()
    assert len(got) == 2
