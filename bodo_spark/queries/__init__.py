"""Registered benchmark/correctness queries.

Each module exposes ``QUERIES: dict[str, QueryDef]``. ``all_queries()``
merges them; ``__spark_entry__.py`` at the repo root re-exports for the
driver. Every query demonstrates operators from SURVEY.md section 2 and has
(where SQL-expressible) a DuckDB oracle with IDENTICAL output column names.
"""

from __future__ import annotations

from ._util import QueryDef  # noqa: F401


def all_queries() -> dict[str, "QueryDef"]:
    from . import (
        aggregates,
        ai_ops,
        datetimes,
        dedup,
        joins,
        multimodal,
        scalars,
        setops,
        similarity,
        snowflake,
        strings,
        text,
        tpch,
        windows,
    )

    # Round-robin interleave across families: downstream correctness harnesses
    # may evaluate only a prefix of this dict (in insertion order), so every
    # query family must contribute representatives early rather than being
    # appended as a contiguous block at the end.
    mods = (tpch, aggregates, windows, joins, setops, strings,
            datetimes, scalars, snowflake, text, dedup, similarity,
            multimodal, ai_ops)
    merged: dict[str, QueryDef] = {}
    iters = [iter(mod.QUERIES.items()) for mod in mods]
    while iters:
        remaining = []
        for it in iters:
            item = next(it, None)
            if item is None:
                continue
            name, qd = item
            if name in merged:
                raise ValueError(f"duplicate query name: {name}")
            merged[name] = qd
            remaining.append(it)
        iters = remaining
    return merged
