"""Central query registry — the contract surface the driver checks.

Every operator from SURVEY §2 that we implement registers here as a named
query: a ``(spark, sf_dir) -> DataFrame`` builder, plus (when the operator
is SQL-expressible) an equivalent DuckDB oracle SQL string. The driver
runs both at sf0.01 and compares row-count + schema + order-insensitive
value-hash, so:

- every computed column is aliased identically on both sides;
- every floating-point output is ``round(x, 6)`` on both sides (different
  summation orders perturb low bits; 6 decimals is far coarser than the
  ~1e-10 relative error of double accumulation at these row counts);
- every LIMIT carries a total-order ORDER BY (value, then key) so both
  engines cut the same prefix.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
):
    """Decorator: register a query builder under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Name → spec for everything registered (imports the operator modules)."""
    _load_all()
    return dict(_REGISTRY)


def queries_dict() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracles_dict() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle
    }


_loaded = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _loaded
    if _loaded:
        return
    # Imported for their registration side effects.
    from .operators import (  # noqa: F401
        relational,
        analytics,
        text,
        dedup,
        similarity,
        pixels,
        masks,
        segmentation,
        imaging_udf,
        multimodal,
        skew,
        components,
        tpch_shapes,
        llm_pipeline,
        cdc,
        timeseries,
    )
    from .plans import app_flow  # noqa: F401
    from .streaming import events as _events  # noqa: F401

    _loaded = True
