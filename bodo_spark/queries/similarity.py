"""similarity query battery (filled in incrementally)."""

from ._util import QueryDef

QUERIES: dict[str, QueryDef] = {}
