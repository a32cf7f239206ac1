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
        strings,
        text,
        tpch,
        windows,
    )

    merged: dict[str, QueryDef] = {}
    for mod in (tpch, aggregates, windows, joins, setops, strings,
                datetimes, scalars, text, dedup, similarity, multimodal, ai_ops):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    return merged
