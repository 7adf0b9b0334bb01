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


#: Modules whose import side-effect is query registration. Kept as dotted
#: strings (not a star import) so one missing/broken optional module can
#: never take down the whole registry again (round-1 failure mode).
_REGISTERING_MODULES = (
    "bc_proj3_spark.plans.tpch",
    "bc_proj3_spark.plans.events",
    "bc_proj3_spark.plans.docpipeline",
    "bc_proj3_spark.plans.silverops",
    "bc_proj3_spark.plans.aggfuncs",
    "bc_proj3_spark.plans.sqlapi",
    "bc_proj3_spark.operators.textstats",
    "bc_proj3_spark.operators.dedup",
    "bc_proj3_spark.operators.similarity",
    "bc_proj3_spark.operators.multimodal",
    "bc_proj3_spark.streaming.incremental",
)


def all_queries(strict: bool = False) -> dict[str, QuerySpec]:
    """Import all registering modules, then return the registry.

    Imports are deferred so ``import bc_proj3_spark`` stays cheap. A
    module that fails to import is skipped (and remembered in
    :data:`import_errors`) unless ``strict=True`` — the driver should
    always see every query that *does* work.
    """
    import importlib

    for mod in _REGISTERING_MODULES:
        try:
            importlib.import_module(mod)
        except Exception as exc:  # pragma: no cover - defensive
            if strict:
                raise
            import_errors[mod] = repr(exc)
    return dict(_REGISTRY)


#: Populated by :func:`all_queries` for modules that failed to import.
import_errors: dict[str, str] = {}
