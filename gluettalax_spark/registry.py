"""Query registry — the driver-checked surface.

Every data-plane operator registers itself here with:

* ``name``    — the ``queries()`` key the driver (and judge) sees;
* ``builder`` — ``(spark, sf_dir) -> DataFrame``, idiomatic DataFrame/SQL;
* ``oracle``  — equivalent ANSI SQL for DuckDB (None ⇒ rows-only check,
  reserved for genuinely non-SQL-expressible ops).

Column names must match between builder output and oracle (the driver
sorts columns by name before value-hashing), so builders alias every
computed column and oracles use the same ``AS`` names.
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
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[Builder], Builder]:
    """Decorator: register a query builder under ``name``."""

    def wrap(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def all_queries() -> dict[str, QuerySpec]:
    # Import operator modules for their registration side effects.
    import gluettalax_spark.operators  # noqa: F401

    return dict(_REGISTRY)


def queries() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None}
