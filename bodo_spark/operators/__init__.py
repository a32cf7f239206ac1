"""Custom operators the reference has but Spark lacks as builtins
(SURVEY.md 2.3 as-of join; 2.11 LLM-data-pipeline operators).

Each operator is a composition of DataFrame primitives where semantics
allow (asof -> union + window), Arrow-batched pandas UDFs where not
(embedding math), so everything distributes and survives scale-up.
"""

from .asof import merge_asof  # noqa: F401
