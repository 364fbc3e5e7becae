"""Declared-query registry: the engine's correctness contract.

Every operator from SURVEY.md §2 Part B registers here as a
:class:`QuerySpec` — a Spark callable ``(spark, sf_dir) -> DataFrame``
plus (when SQL-expressible) the equivalent DuckDB oracle SQL.  The
driver contract (``__spark_entry__.py``) simply re-exports this
registry; the engine's own pytest suite differentially verifies every
entry against DuckDB before it is ever declared.

Oracle-hardening rules (SURVEY.md §7.4) every registered query follows:
  1. money sums via DECIMAL(18,2) casts, emitted as DOUBLE;
  2. other float outputs ROUND(x, 4) in both engines;
  3. every computed column aliased identically in both engines;
  4. top-k/limit queries carry a full unique tie-break;
  5. timestamps emitted as epoch-us bigints / dates / strings, never raw;
  6. no approx_*, unordered collect_list, locale-dependent fns in exact
     oracles.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => rows-only check
    doc: str = ""
    scale_notes: str = field(default="", repr=False)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, doc: str = "", scale_notes: str = ""
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a declared query (and its oracle) by name."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate declared query {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            doc=doc or (fn.__doc__ or "").strip(),
            scale_notes=scale_notes,
        )
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module so registration side effects run."""
    # Imports are inside the function to avoid import cycles
    # (operator modules import `register` from here).
    import weather_etl_spark.operators  # noqa: F401
    import weather_etl_spark.functions  # noqa: F401
    import weather_etl_spark.sources  # noqa: F401
    import weather_etl_spark.streaming  # noqa: F401

    return REGISTRY


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
