"""Differential tests for the Snowflake-dialect kernel surface
(bodo_spark/functions/snowflake.py) vs DuckDB / known values."""

from __future__ import annotations

import duckdb
import pytest

from bodo_spark.functions.snowflake import jaro_winkler


def test_jaro_winkler_known_values():
    assert abs(jaro_winkler("martha", "marhta") - 0.9611111111111111) < 1e-12
    assert abs(jaro_winkler("dwayne", "duane") - 0.84) < 1e-12
    assert abs(jaro_winkler("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12
    assert jaro_winkler("", "abc") == 0.0
    assert jaro_winkler("same", "same") == 1.0
    # boost threshold: no prefix bonus at jaro <= 0.7
    assert jaro_winkler("abcdxxxxxx", "abcdyyyyyy") == pytest.approx(0.6)


def test_jaro_winkler_matches_duckdb_random():
    import random
    rng = random.Random(42)
    alpha = "abcdef"
    con = duckdb.connect()
    for _ in range(300):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 9)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 9)))
        exp = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        assert jaro_winkler(a, b) == pytest.approx(exp, abs=1e-12), (a, b)


def test_jaro_winkler_batch_matches_scalar():
    """The vectorized batch path is differential-tested against the
    scalar reference (itself DuckDB-validated) across alphabets, length
    skew, unicode, NULLs, and the 1-char/identical edge cases."""
    import random

    import numpy as np

    from bodo_spark.functions.snowflake import jaro_winkler_batch

    rng = random.Random(123)
    pairs = []
    for alpha in ("abcdef", "αβγδεζ", "abcdefghijklmnopqrstuvwxyz"):
        for _ in range(500):
            pairs.append((
                "".join(rng.choices(alpha, k=rng.randint(0, 20))),
                "".join(rng.choices(alpha, k=rng.randint(0, 20)))))
    pairs += [("a", "a"), ("", ""), ("a", "b"), ("ab", "ba"),
              ("martha", "marhta"), (None, "x"), ("x", None),
              ("héllo", "hello"), ("same", "same"), (float("nan"), "q")]
    rng.shuffle(pairs)
    a = np.array([p[0] for p in pairs], dtype=object)
    b = np.array([p[1] for p in pairs], dtype=object)
    got = jaro_winkler_batch(a, b)
    for i, (x, y) in enumerate(pairs):
        if not isinstance(x, str) or not isinstance(y, str):
            assert np.isnan(got[i])
        else:
            assert got[i] == pytest.approx(jaro_winkler(x, y), abs=1e-12), (x, y)


def test_sql_fns_registered(spark):
    from bodo_spark.functions import register_snowflake_fns
    register_snowflake_fns(spark)
    row = spark.sql("""
        SELECT TRY_TO_BOOLEAN('YES') AS b1, TRY_TO_BOOLEAN('off') AS b2,
               TRY_TO_BOOLEAN('nope') AS b3,
               TRY_TO_DECIMAL('123') AS d1, TRY_TO_DECIMAL('x') AS d2,
               DAYOFWEEKISO(DATE'2021-01-03') AS sun,
               DAYOFWEEKISO(DATE'2021-01-04') AS mon,
               WEEKISO(DATE'2021-01-01') AS w,
               YEAROFWEEKISO(DATE'2021-01-01') AS wy,
               date_format(TIME_SLICE(TIMESTAMP'2024-03-10 06:37:21', 15,
                                      'MINUTE'), 'HH:mm:ss') AS sl,
               JAROWINKLER_SIMILARITY('martha', 'marhta') AS jw
    """).collect()[0]
    assert row.b1 is True and row.b2 is False and row.b3 is None
    assert int(row.d1) == 123 and row.d2 is None
    assert row.sun == 7 and row.mon == 1
    assert row.w == 53 and row.wy == 2020  # 2021-01-01 is ISO week 53 of 2020
    assert row.sl == "06:30:00"
    assert row.jw == 96


def test_to_boolean_raises_on_garbage(spark):
    from bodo_spark.functions import register_snowflake_fns
    register_snowflake_fns(spark)
    with pytest.raises(Exception, match="not recognized"):
        spark.sql("SELECT TO_BOOLEAN('garbage')").collect()


def test_flatten_struct_shape(spark):
    from bodo_spark.functions import flatten
    import pyspark.sql.functions as F
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, []), (3, None)], "id long, arr array<string>")
    out = flatten(df, "arr", seq_col="id").orderBy("SEQ", "INDEX").collect()
    assert [(r.SEQ, r.INDEX, r.VALUE, r.PATH) for r in out] == [
        (1, 0, "a", "[0]"), (1, 1, "b", "[1]")]
    outer = flatten(df, "arr", seq_col="id", outer=True) \
        .orderBy("SEQ", "INDEX").collect()
    assert len(outer) == 4  # empty + NULL arrays kept with NULL outputs
    assert {r.SEQ for r in outer} == {1, 2, 3}


def test_uuid5_matches_python(spark):
    """UUID5 (SHA-1 name-based, RFC 4122) must be bit-identical to
    Python's uuid.uuid5 including version/variant nibble patching."""
    import uuid
    from bodo_spark.functions import register_snowflake_fns
    register_snowflake_fns(spark)
    cases = [(str(uuid.NAMESPACE_DNS), "example.com"),
             (str(uuid.NAMESPACE_URL), "https://spark.apache.org/x?y=1"),
             (str(uuid.NAMESPACE_OID), "weird -- string\twith\nstuff")]
    rows = spark.createDataFrame(cases, "ns string, nm string") \
        .selectExpr("UUID5(ns, nm) AS u").collect()
    exp = [str(uuid.uuid5(uuid.UUID(ns), nm)) for ns, nm in cases]
    assert [r.u for r in rows] == exp


def test_strtok_to_array_and_insert(spark):
    from bodo_spark.functions import register_snowflake_fns
    register_snowflake_fns(spark)
    r = spark.sql("""
        SELECT STRTOK_TO_ARRAY('a.b-c..d', '.-') AS t,
               STRTOK_TO_ARRAY('regex [chars] (ok)', ' []()') AS t2,
               INSERT4('abcdef', 2, 3, 'XY') AS ins,
               OBJECT_CONSTRUCT2('k', CAST(NULL AS STRING),
                                 CAST(NULL AS STRING), 'v') AS oc
    """).collect()[0]
    assert r.t == ["a", "b", "c", "d"]
    assert r.t2 == ["regex", "chars", "ok"]
    assert r.ins == "aXYef"
    assert r.oc == {}  # null value and null key both dropped


def test_regexp_replace6_occurrence_splice(spark):
    """Occurrence-specific REGEXP_REPLACE (the path DuckDB cannot
    express): verified against Python re with the same semantics."""
    import re
    from bodo_spark.functions import register_snowflake_fns
    register_snowflake_fns(spark)

    def py_ref(s, p, repl, pos, occ, flags=0):
        pre, sub = s[:pos - 1], s[pos - 1:]
        if occ == 0:
            return pre + re.sub(p, repl, sub, flags=flags)
        ms = list(re.finditer(p, sub, flags))
        if occ < 0 or len(ms) < occ:
            return s
        m = ms[occ - 1]
        return pre + sub[:m.start()] + repl + sub[m.end():]

    cases = [("aXbXcXd", "X", "-", 1, 2), ("aXbXcXd", "X", "-", 3, 1),
             ("a1b22c333", "[0-9]+", "#", 1, 2),
             ("a1b22c333", "[0-9]+", "#", 1, 3),
             ("nomatch", "[0-9]+", "#", 1, 1),
             ("aXbXcXd", "X", "-", 1, 9)]
    rows = spark.createDataFrame(
        [(s, p, r, pos, occ) for s, p, r, pos, occ in cases],
        "s string, p string, r string, pos int, occ int"
    ).selectExpr("REGEXP_REPLACE6(s, p, r, pos, occ, 'c') AS out").collect()
    assert [r.out for r in rows] == [py_ref(*c) for c in cases]


def test_multiset_array_kernels(spark):
    """Phase-5 multiset semantics (reference nested_data_kernels.py
    array_except/array_intersection): each right element cancels at most
    one left occurrence, order preserved, NULL matches NULL; Spark's
    builtin array_except would collapse duplicates."""
    from bodo_spark.functions import register_snowflake_fns
    register_snowflake_fns(spark)
    r = spark.sql("""
        SELECT ARRAY_EXCEPT_SF(array('a', 'a', 'a', NULL, 'b'),
                               array('a', NULL)) AS ex,
               ARRAY_INTERSECTION_SF(array('a', 'a', NULL, 'b'),
                                     array('a', 'c', NULL, NULL)) AS inter,
               ARRAY_EXCEPT_SF(array('a'), CAST(NULL AS ARRAY<STRING>)) AS exn,
               ARRAY_REMOVE_AT(array('x', 'y', 'z'), -1) AS rm_neg,
               ARRAY_REMOVE_AT(array('x', 'y', 'z'), 7) AS rm_oob,
               ARRAY_SORT_SF(array('b', NULL, 'a'), false, true) AS srt,
               GET_IGNORE_CASE(map('Alpha', '1', 'BETA', '2'), 'beta') AS g1,
               GET_IGNORE_CASE(map('Alpha', '1'), 'gamma') AS g2
    """).collect()[0]
    assert r["ex"] == ["a", "a", "b"]
    assert r["inter"] == ["a", None]
    assert r["exn"] is None
    assert r["rm_neg"] == ["x", "y"]
    assert r["rm_oob"] == ["x", "y", "z"]
    assert r["srt"] == [None, "b", "a"]
    assert r["g1"] == "2" and r["g2"] is None


def test_daynum_family_roundtrip(spark):
    """TO_DAYS/FROM_DAYS/TO_SECONDS (reference datetime_array_kernels.py):
    MySQL's documented anchor TO_DAYS('1997-10-07') = 729669, FROM_DAYS
    inverts, TO_SECONDS = TO_DAYS*86400 at midnight (no INT32 wrap)."""
    from bodo_spark.functions import register_snowflake_fns
    register_snowflake_fns(spark)
    r = spark.sql("""
        SELECT TO_DAYS(DATE '1997-10-07') AS td,
               CAST(FROM_DAYS(729669) AS STRING) AS fd,
               TO_SECONDS(TIMESTAMP '1997-10-07 00:00:09') AS ts
    """).collect()[0]
    assert r["td"] == 729669
    assert r["fd"] == "1997-10-07"
    assert r["ts"] == 729669 * 86400 + 9


def test_phase6_kernels(spark):
    """INITCAP2 delimiter set, TYPEOF_JSON classification, ROUND_SF
    rounding modes on exact .5 ties (incl. negatives), TRY_TO_NUMBER_FMT
    null-on-garbage."""
    from bodo_spark.functions import register_snowflake_fns
    register_snowflake_fns(spark)
    r = spark.sql("""
        SELECT INITCAP2('john-doe smith_x', '-_ ') AS ic,
               TYPEOF_JSON('  [1,2]') AS t_arr,
               TYPEOF_JSON('{"a":1}') AS t_obj,
               TYPEOF_JSON('-42') AS t_int,
               TYPEOF_JSON('-4.25') AS t_dec,
               TYPEOF_JSON('6.7e2') AS t_dbl,
               TYPEOF_JSON('"x"') AS t_str,
               TYPEOF_JSON('null') AS t_null,
               ROUND_SF(2.5, 0, 'HALF_AWAY_FROM_ZERO') AS away_pos,
               ROUND_SF(-2.5, 0, 'HALF_AWAY_FROM_ZERO') AS away_neg,
               ROUND_SF(2.5, 0, 'HALF_TO_EVEN') AS even_pos,
               ROUND_SF(3.5, 0, 'HALF_TO_EVEN') AS even_odd,
               ROUND_SF(-2.5, 0, 'HALF_TO_EVEN') AS even_neg,
               TRY_TO_NUMBER_FMT('$1,234.56', 12, 2) AS ok_num,
               TRY_TO_NUMBER_FMT('garbage', 12, 2) AS bad_num
    """).collect()[0]
    assert r["ic"] == "John-Doe Smith_X"
    assert (r["t_arr"], r["t_obj"], r["t_int"], r["t_dec"], r["t_dbl"],
            r["t_str"], r["t_null"]) == (
        "ARRAY", "OBJECT", "INTEGER", "DECIMAL", "DOUBLE", "VARCHAR",
        "NULL_VALUE")
    assert (r["away_pos"], r["away_neg"]) == (3.0, -3.0)
    assert (r["even_pos"], r["even_odd"], r["even_neg"]) == (2.0, 4.0, -2.0)
    assert float(r["ok_num"]) == 1234.56 and r["bad_num"] is None


def test_timestamp_tz_from_parts(spark):
    """TIMESTAMP_TZ_FROM_PARTS (reference datetime_array_kernels.py:322):
    wall-clock parts in a named zone; 09:30 New York winter = 14:30 UTC."""
    from bodo_spark.functions import register_snowflake_fns
    register_snowflake_fns(spark)
    r = spark.sql("""
        SELECT date_format(TIMESTAMP_TZ_FROM_PARTS(
                   2024, 1, 15, 9, 30, 0, 'America/New_York'),
               'yyyy-MM-dd HH:mm:ss') AS utc_wall
    """).collect()[0]
    assert r["utc_wall"] == "2024-01-15 14:30:00"


def test_default_arity_shims(spark):
    """2/3-arg forwarding shims apply Snowflake's documented defaults
    (pos=1, occurrence=1, params='c', group=0)."""
    from bodo_spark.functions import register_snowflake_fns
    register_snowflake_fns(spark)
    r = spark.sql("""
        SELECT CHARINDEX2('b', 'abcb') AS ci,
               POSITION2('cb', 'abcb') AS po,
               REGEXP_COUNT2('aXbXc', 'X') AS rc,
               REGEXP_SUBSTR2('aXbXc', '[a-z]') AS rs,
               REGEXP_INSTR2('aXbXc', 'b') AS ri,
               REGEXP_REPLACE3('aXbXc', 'X', '-') AS rr,
               STRTOK2('p q r', ' ') AS st
    """).collect()[0]
    assert (r["ci"], r["po"], r["rc"], r["rs"], r["ri"], r["rr"],
            r["st"]) == (2, 3, 2, "a", 3, "a-b-c", "p")


def test_to_char_full_name_tokens(spark):
    """Snowflake DAY (full day name) and MMMM (full month) format
    tokens in the TO_CHAR chain."""
    from bodo_spark.functions import register_snowflake_fns
    register_snowflake_fns(spark)
    r = spark.sql("""
        SELECT TO_CHAR_TS(TIMESTAMP '2024-01-15 10:00:00',
                          'DAY, DD MMMM YYYY') AS s,
               TO_CHAR_TS(TIMESTAMP '2024-01-15 10:00:00',
                          'DY DD MON YY') AS a
    """).collect()[0]
    assert r["s"] == "Monday, 15 January 2024"
    assert r["a"] == "Mon 15 Jan 24"


def test_object_arity_extensions(spark):
    """OBJECT_CONSTRUCT arities 5-6 (null-dropping vs KEEP_NULL) and
    OBJECT_DELETE3/4, OBJECT_PICK3/4."""
    from bodo_spark.functions import register_snowflake_fns
    register_snowflake_fns(spark)
    r = spark.sql("""
        SELECT map_keys(OBJECT_CONSTRUCT6('a','1','b',NULL,'c','3','d','4',
                                          'e','5','f','6')) AS drop_null,
               map_keys(OBJECT_CONSTRUCT_KEEP_NULL5('a','1','b',NULL,'c','3',
                                                    'd','4','e','5')) AS keepn,
               map_keys(OBJECT_DELETE3(map('a','1','b','2','c','3','d','4'),
                                       'a', 'c', 'zz')) AS del3,
               map_keys(OBJECT_PICK4(map('a','1','b','2','c','3','d','4'),
                                     'a', 'd', 'zz', 'b')) AS pick4
    """).collect()[0]
    assert sorted(r["drop_null"]) == ["a", "c", "d", "e", "f"]
    assert sorted(r["keepn"]) == ["a", "b", "c", "d", "e"]
    assert sorted(r["del3"]) == ["b", "d"]
    assert sorted(r["pick4"]) == ["a", "b", "d"]


def test_to_char_numeric_masks(spark):
    """TO_CHAR_NUM display masks (reference
    snowflake_conversion_array_kernels.py TO_CHAR(number)): FM fill
    mode, grouping, $-sign placement, 0-forced digits, MI/S signs,
    overflow fill, half-away rounding, space-justified 9-masks."""
    from bodo_spark.functions import register_snowflake_fns
    register_snowflake_fns(spark)
    cases = [
        (1234.5, "999,999.99", "   1,234.50"),
        (-1234.5, "$999,999.99", "  -$1,234.50"),
        (1234.5, "FM999,999.99", "1,234.50"),
        (0.5, "FM9.99", "0.50"),
        (12345, "999", "###"),
        (7, "FM0009", "0007"),
        (-7, "99MI", " 7-"),
        (7, "99MI", " 7 "),
        (7, "FMS99", "+7"),
        (-7, "FMS99", "-7"),
        (0, "FM99", "0"),
        (0.256, "FM9.99", "0.26"),
        (1234.5, "FM99999", "1235"),
        (-0.75, "FM$9.99", "-$0.75"),
        (1234567.891, "FM9,999,999.9", "1,234,567.9"),
    ]
    sel = ", ".join(
        f"TO_CHAR_NUM(CAST({x} AS DOUBLE), '{f}') AS c{i}"
        for i, (x, f, _) in enumerate(cases))
    row = spark.sql(f"SELECT {sel}").collect()[0]
    for i, (x, f, exp) in enumerate(cases):
        assert row[f"c{i}"] == exp, (x, f, row[f"c{i}"], exp)


def test_to_number_prec_scale(spark):
    """TO_NUMBER_FMT/TRY_TO_NUMBER_FMT honor (prec, scale): scale
    rounding half-away, precision overflow -> NULL under TRY_ / error
    otherwise."""
    import pytest as _pytest

    from bodo_spark.functions import register_snowflake_fns
    register_snowflake_fns(spark)
    r = spark.sql("""
        SELECT CAST(TO_NUMBER_FMT('$1,234.567', 12, 2) AS DOUBLE) AS a,
               CAST(TO_NUMBER_FMT('-2.005', 12, 2) AS DOUBLE) AS b,
               CAST(TRY_TO_NUMBER_FMT('99.99', 4, 2) AS DOUBLE) AS fits,
               TRY_TO_NUMBER_FMT('100.00', 4, 2) AS too_wide,
               TRY_TO_NUMBER_FMT('junk', 4, 2) AS junk,
               CAST(TO_NUMBER_FMT('42', 10, NULL) AS DOUBLE) AS noscale
    """).collect()[0]
    assert r["a"] == 1234.57
    assert r["b"] == -2.01
    assert r["fits"] == 99.99
    assert r["too_wide"] is None and r["junk"] is None
    assert r["noscale"] == 42.0
    with _pytest.raises(Exception, match="not recognized"):
        spark.sql("SELECT TO_NUMBER_FMT('junk', 4, 2)").collect()
    with _pytest.raises(Exception, match="range"):
        spark.sql("SELECT TO_NUMBER_FMT('100.00', 4, 2)").collect()


def _ref_to_char_num(x: float, fmt: str) -> str:
    """Independent pure-Python reference of the TO_CHAR_NUM spec
    (functions/snowflake.py docstring) for the property test."""
    import re as _re
    from decimal import ROUND_HALF_UP, Decimal

    fm = fmt.startswith("FM")
    c1 = fmt[2:] if fm else fmt
    mi = c1.upper().endswith("MI")
    core = c1[:-2] if mi else c1
    has_s = core.upper().startswith("S")
    dollar = "$" in core
    mask = _re.sub(r"[^09.,]", "", core)
    dot = mask.find(".")
    scale = 0 if dot < 0 else len(mask) - dot - 1
    int_mask = mask if dot < 0 else mask[:dot]
    compact = int_mask.replace(",", "")

    scaled = int((Decimal(str(abs(x))) * (10 ** scale))
                 .quantize(Decimal(1), rounding=ROUND_HALF_UP))
    digits = str(scaled).zfill(scale + 1)
    intraw = digits[:-scale] if scale else digits
    frac = digits[len(digits) - scale:] if scale else ""
    if len(intraw) > len(compact):
        return "#" * len(fmt)
    first0 = compact.find("0")
    forced = 1 if first0 < 0 else len(compact) - first0
    intstr = intraw.zfill(forced)
    if "," in int_mask:
        out = []
        for i, ch in enumerate(reversed(intstr)):
            if i and i % 3 == 0:
                out.append(",")
            out.append(ch)
        intstr = "".join(reversed(out))
    neg = x < 0  # IEEE: -0.0 is not < 0, matching the SQL kernel;
    # a negative value that ROUNDS to zero still shows its sign
    sign = "" if mi else ("-" if neg else ("+" if has_s else ""))
    body = sign + ("$" if dollar else "") + intstr \
        + (("." + frac) if scale else "")
    if not fm:
        width = len(core) + (0 if (has_s or mi) else 1)
        body = body.rjust(width)
    if mi:
        body += "-" if neg else ("" if fm else " ")
    return body


def test_to_char_num_property_vs_reference(spark):
    """TO_CHAR_NUM over ~200 random (value, mask) combos vs the
    independent Python reference. Values are (units, cents) pairs and
    mask scales are 0 or 2, so every rounding decision is exact in
    both implementations (scale-1 would tie-break on unrepresentable
    doubles)."""
    import random

    from bodo_spark.functions import register_snowflake_fns
    register_snowflake_fns(spark)
    rng = random.Random(13)
    combos = []
    for _ in range(200):
        n = rng.choice([0, rng.randint(0, 9), rng.randint(0, 999),
                        rng.randint(0, 99999)])
        c = rng.choice([0, 50, rng.randint(0, 99)])
        sign = rng.choice([1, -1])
        x = sign * (n + c / 100.0)
        fm = rng.choice(["", "FM"])
        prefix = rng.choice(["", "S", "$", "S$"])
        width = rng.randint(1, 7)
        digs = "".join(rng.choice("90") for _ in range(width))
        if rng.random() < 0.4 and width > 3:
            digs = digs[:-3] + "," + digs[-3:]
        dec = rng.choice(["", ".99", ".00"])
        suffix = "" if prefix.startswith("S") else rng.choice(["", "MI"])
        fmt = f"{fm}{prefix}{digs}{dec}{suffix}"
        combos.append((x, fmt))

    # one VALUES relation + ONE kernel column: a single expression tree
    # over 200 rows (200 projected kernel columns each inline the whole
    # _NF_* helper tree and take minutes to analyze)
    vals = ", ".join(f"({i}, CAST({x!r} AS DOUBLE), '{f}')"
                     for i, (x, f) in enumerate(combos))
    rows = spark.sql(
        f"SELECT i, TO_CHAR_NUM(x, f) AS r FROM VALUES {vals} AS t(i, x, f)"
    ).collect()
    got = {r["i"]: r["r"] for r in rows}
    for i, (x, f) in enumerate(combos):
        exp = _ref_to_char_num(x, f)
        assert got[i] == exp, (x, f, got[i], exp)


def test_to_char_hex_masks(spark):
    """TO_CHAR X/x hex display masks: case, 0-forcing, '#' overflow,
    space justification, negative -> overflow fill."""
    from bodo_spark.functions import register_snowflake_fns
    register_snowflake_fns(spark)
    cases = [
        (255, "XXXX", "  FF"),
        (255, "FMXXXX", "FF"),
        (255, "FMxxxx", "ff"),
        (255, "FM0XXX", "00FF"),
        (4096, "XXX", "###"),
        (-5, "XXXX", "####"),
        (0, "FMXX", "0"),
        (48879, "FMXXXX", "BEEF"),
    ]
    sel = ", ".join(
        f"TO_CHAR_NUM(CAST({x} AS DOUBLE), '{f}') AS c{i}"
        for i, (x, f, _) in enumerate(cases))
    row = spark.sql(f"SELECT {sel}").collect()[0]
    for i, (x, f, exp) in enumerate(cases):
        assert row[f"c{i}"] == exp, (x, f, row[f"c{i}"], exp)


def test_kernel_count_documented():
    """COVERAGE.md's '<N> kernels' figure is generated from the
    registry (same discipline as the README query count)."""
    import os
    import re

    from bodo_spark.functions.snowflake import SNOWFLAKE_SQL_FNS

    n = len([k for k in SNOWFLAKE_SQL_FNS if not k.startswith("_")])
    cov = open(os.path.join(os.path.dirname(__file__), "..",
                            "COVERAGE.md")).read()
    m = re.search(r"\((\d+) kernels \+ vectorized", cov)
    assert m and int(m.group(1)) == n, (m and m.group(1), n)


def test_flatten_object_map(spark):
    """FLATTEN over an OBJECT (MapType): KEY populated, INDEX NULL,
    PATH = KEY -- Snowflake's object-flatten contract (reference
    lateral.py lateral_flatten over objects)."""
    import pyspark.sql.functions as F

    from bodo_spark.functions import flatten

    df = spark.createDataFrame(
        [(1, {"a": 10, "b": 20}), (2, {}), (3, None)],
        "id long, m map<string,int>")
    out = flatten(df, "m", seq_col="id").orderBy("SEQ", "KEY").collect()
    assert [(r.SEQ, r.KEY, r.VALUE, r.PATH, r.INDEX) for r in out] == [
        (1, "a", 10, "a", None), (1, "b", 20, "b", None)]
    outer = flatten(df, "m", seq_col="id", outer=True) \
        .orderBy("SEQ", "KEY").collect()
    assert {r.SEQ for r in outer} == {1, 2, 3}
    assert len(outer) == 4


def test_flatten_column_order_type_independent(spark):
    """Array- and map-flatten must emit the same column order
    (SEQ, passthrough..., KEY, PATH, INDEX, VALUE, THIS) -- downstream
    positional consumers must not care about the input's type."""
    from bodo_spark.functions import flatten

    arr = spark.createDataFrame([(1, ["a"])], "id long, c array<string>")
    mp = spark.createDataFrame([(1, {"k": "v"})], "id long, c map<string,string>")
    cols_arr = flatten(arr, "c", seq_col="id").columns
    cols_map = flatten(mp, "c", seq_col="id").columns
    assert cols_arr == cols_map == [
        "SEQ", "c", "KEY", "PATH", "INDEX", "VALUE", "THIS"]
