"""Query registry: the engine's public query surface.

Every implemented operator/query from SURVEY.md §2 registers here as a
:class:`QuerySpec` — a Spark DataFrame builder plus (when the semantics
are SQL-expressible) the equivalent DuckDB oracle SQL. ``__spark_entry__``
exposes this registry to the correctness driver.

Conventions that make the driver's order-insensitive value-hash compare
work (see functions/numeric.py for the full rationale):

- every computed/aggregate column is aliased to the SAME name in the
  Spark builder and the oracle SQL;
- double aggregates accumulate in exact decimal, cast back to double;
- top-k queries use a total order (unique-key tiebreaker) so both
  engines select the same rows.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL over the pre-registered table views
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[Builder], Builder]:
    """Decorator: add a query builder to the registry."""

    def wrap(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle, doc=doc or fn.__doc__ or "")
        return fn

    return wrap


def all_queries() -> dict[str, QuerySpec]:
    """Import all registering modules, then return the registry."""
    # imports are deferred so `import bc_proj3_spark` stays cheap
    from bc_proj3_spark.plans import docpipeline, events, tpch  # noqa: F401
    from bc_proj3_spark.operators import dedup, similarity, textstats  # noqa: F401

    return dict(_REGISTRY)
