"""Query plans — the declared operator inventory (SURVEY.md §2).

Importing this package populates the registry with every query spec.
"""

from bdt_spark.plans.registry import QuerySpec, all_queries, get_query, sql_query

# Import for registration side effects.
from bdt_spark.plans import tpch  # noqa: F401
from bdt_spark.plans import relational  # noqa: F401
from bdt_spark.plans import pipeline  # noqa: F401
from bdt_spark.plans import multimodal  # noqa: F401
from bdt_spark.plans import formats  # noqa: F401

__all__ = ["QuerySpec", "all_queries", "get_query", "sql_query"]
