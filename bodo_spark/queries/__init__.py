"""Registered benchmark/correctness queries.

Each module exposes ``QUERIES: dict[str, QueryDef]``. ``all_queries()``
merges them; ``__spark_entry__.py`` at the repo root re-exports for the
driver. Every query demonstrates operators from SURVEY.md section 2 and has
(where SQL-expressible) a DuckDB oracle with IDENTICAL output column names.
"""

from __future__ import annotations

import glob
import json
import os

from ._util import QueryDef  # noqa: F401


def _evidence_priority() -> dict[str, tuple]:
    """Sort key per query from past driver correctness artifacts.

    Downstream correctness harnesses evaluate only a prefix of the registry
    (in insertion order), so ordering is evidence-aware: queries whose
    correctness is least established lead, and the order self-rotates as new
    ``CORRECTNESS_r*.json`` artifacts land in the repo root each round.

    Priority buckets (ascending = earlier in the dict):
      0. never checked by any artifact
      1. most recent check FAILED (rows/schema/hash mismatch)
      2. most recent check green but returned 0 rows (vacuous evidence)
      3. green, ordered by the round it was last checked (stalest first)
    """
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    last: dict[str, tuple[int, dict]] = {}
    rounds: list[tuple[int, str]] = []
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        digits = "".join(ch for ch in os.path.basename(path) if ch.isdigit())
        if digits:
            rounds.append((int(digits), path))
    # Numeric round order (not filename order) so last-write-wins is truly
    # the latest round even past r99.
    for rnd, path in sorted(rounds):
        try:
            data = json.load(open(path))
        except Exception:
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if isinstance(row, dict):
                last[name] = (rnd, row)
    prio: dict[str, tuple] = {}
    for name, (rnd, row) in last.items():
        if row.get("err") == "no_oracle":
            # rows-only check: treat like a green at its round
            prio[name] = (3, rnd)
        elif row.get("rows_match") is False or row.get("schema_match") is False \
                or row.get("hash_match") is False or row.get("err"):
            prio[name] = (1, rnd)
        elif row.get("spark_rows") == 0:
            prio[name] = (2, rnd)
        else:
            prio[name] = (3, rnd)
    return prio


def all_queries() -> dict[str, "QueryDef"]:
    from . import (
        aggregates,
        ai_ops,
        curation,
        datetimes,
        dedup,
        frontend,
        io_formats,
        joins,
        merge_ops,
        multimodal,
        scalars,
        setops,
        similarity,
        sketches,
        snowflake,
        streaming_ops,
        strings,
        text,
        tpch,
        windows,
    )

    # Round-robin interleave across families as the base order: every family
    # contributes representatives early rather than being appended as a
    # contiguous block at the end.
    mods = (tpch, aggregates, windows, joins, merge_ops, setops, strings,
            datetimes, scalars, snowflake, text, curation, dedup, similarity,
            sketches, multimodal, ai_ops, streaming_ops, frontend, io_formats)
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

    # Evidence-aware rotation: least-established queries first (see
    # _evidence_priority). Ties keep the interleaved base order. With no
    # artifacts present this is a no-op (everything is bucket 0).
    prio = _evidence_priority()
    base_pos = {name: i for i, name in enumerate(merged)}
    ordered = sorted(
        merged,
        key=lambda n: (*prio.get(n, (0, 0)), base_pos[n]),
    )
    return {name: merged[name] for name in ordered}
