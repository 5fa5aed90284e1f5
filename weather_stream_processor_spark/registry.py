"""Query registry.

Every operator from SURVEY.md §2 ships as a :class:`QuerySpec`: a PySpark
builder ``(spark, sf_dir) -> DataFrame`` plus, where SQL-expressible, the
ANSI-SQL twin that DuckDB runs on the same parquet tables for the driver's
correctness gate (row-count + schema + order-insensitive value-hash).

Contract notes (see /root/repo/__spark_entry__.py):
- alias every computed column identically in builder and oracle;
- round floating aggregates on BOTH sides so DuckDB<->Spark summation-order
  drift cannot flip the value hash;
- top-k/limit queries must be deterministic (tie-break on an id column).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL twin; None => driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    """Decorator: register a query builder under ``name``."""

    def wrap(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags
        )
        return fn

    return wrap


def _load_all_modules() -> None:
    """Import every operator module so its ``@register`` calls run."""
    import weather_stream_processor_spark.operators  # noqa: F401  (imports submodules)


def all_queries() -> dict[str, QuerySpec]:
    _load_all_modules()
    return dict(_REGISTRY)


def get_query(name: str) -> QuerySpec:
    _load_all_modules()
    return _REGISTRY[name]
