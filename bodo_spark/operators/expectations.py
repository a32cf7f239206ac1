"""Data-quality expectation suite: declarative table checks evaluated
distributed, one violation count per rule (the Great Expectations /
dbt-test compute shape, as an engine operator).

Rules (each a tuple, first element the rule name):

  ("not_null", col)                  -- NULL values
  ("unique", [cols...])              -- duplicated key tuples (each
                                        extra occurrence counts)
  ("range", col, lo, hi)             -- values outside [lo, hi]
                                        (NULLs are not violations --
                                        pair with not_null)
  ("in_set", col, [values...])       -- values outside the set
  ("regex", col, pattern)            -- non-matching values
  ("ref", col, other_df, other_col)  -- referential integrity: values
                                        with no match in other_df

Plan economics: every ROW-LEVEL rule (not_null/range/in_set/regex)
compiles to one conditional-sum column of a SINGLE aggregation pass
over the table -- adding rules adds expressions, not scans.
``unique`` adds one groupBy on its key; ``ref`` adds one left-anti
join per referenced table (broadcast when the dimension is small).
Returns ``(check, n_violations)`` -- one small row per rule, ordered
by rule id, ready to gate a pipeline (fail if any count > 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["expect"]


def _check_name(rule) -> str:
    kind = rule[0]
    if kind == "unique":
        return f"unique({','.join(rule[1])})"
    if kind == "range":
        return f"range({rule[1]},{rule[2]},{rule[3]})"
    if kind == "in_set":
        return f"in_set({rule[1]})"
    if kind == "regex":
        return f"regex({rule[1]})"
    if kind == "ref":
        return f"ref({rule[1]}->{rule[3]})"
    return f"{kind}({rule[1]})"


def expect(df: DataFrame, rules: list[tuple]) -> DataFrame:
    """Evaluate the rule list; returns (check, n_violations)."""
    if not rules:
        raise ValueError("expect needs at least one rule")
    spark = df.sparkSession
    row_exprs = []
    extra_frames = []
    for rule in rules:
        kind, name = rule[0], _check_name(rule)
        if kind == "not_null":
            cond = F.col(rule[1]).isNull()
        elif kind == "range":
            c = F.col(rule[1])
            cond = c.isNotNull() & ((c < F.lit(rule[2]))
                                    | (c > F.lit(rule[3])))
        elif kind == "in_set":
            c = F.col(rule[1])
            cond = c.isNotNull() & ~c.isin(*rule[2])
        elif kind == "regex":
            c = F.col(rule[1])
            cond = c.isNotNull() & ~c.rlike(rule[2])
        elif kind == "unique":
            key = list(rule[1])
            dup = (df.groupBy(*key)
                   .agg(F.count(F.lit(1)).alias("_n"))
                   .agg(F.coalesce(F.sum(F.col("_n") - 1),
                                   F.lit(0)).cast("bigint")
                        .alias("n_violations"))
                   .select(F.lit(name).alias("check"), "n_violations"))
            extra_frames.append(dup)
            continue
        elif kind == "ref":
            col, other, other_col = rule[1], rule[2], rule[3]
            miss = (df.select(F.col(col))
                    .where(F.col(col).isNotNull())
                    .join(other.select(F.col(other_col).alias(col))
                          .distinct(), col, "left_anti")
                    .agg(F.count(F.lit(1)).cast("bigint")
                         .alias("n_violations"))
                    .select(F.lit(name).alias("check"), "n_violations"))
            extra_frames.append(miss)
            continue
        else:
            raise ValueError(f"unknown rule kind {kind!r}")
        row_exprs.append(F.sum(cond.cast("long")).cast("bigint")
                         .alias(name))
    parts = []
    if row_exprs:
        wide = df.agg(*row_exprs)
        names = [f.name for f in wide.schema.fields]
        stacked = wide.select(F.explode(F.array(*[
            F.struct(F.lit(n).alias("check"),
                     F.col(f"`{n}`").alias("n_violations"))
            for n in names])).alias("_r")).select("_r.*")
        parts.append(stacked)
    parts.extend(extra_frames)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("check")
