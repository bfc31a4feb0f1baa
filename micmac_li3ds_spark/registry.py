"""Query registry: the single source of truth for the driver contract.

Each operator from SURVEY.md §2 registers itself here with a name, a
callable ``(spark, sf_dir) -> DataFrame``, and (when SQL-expressible) a
DuckDB oracle SQL string. ``__spark_entry__.py`` exposes the aggregate
dicts to the driver.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: Optional[str] = None  # DuckDB SQL; None → rows-only check
    tags: tuple = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, Query] = {}

# Operator modules that self-register on import. Order mirrors the build
# milestones of SURVEY.md §7.2.
_OPERATOR_MODULES = [
    "micmac_li3ds_spark.operators.relational",
    "micmac_li3ds_spark.operators.aggregates",
    "micmac_li3ds_spark.operators.joins",
    "micmac_li3ds_spark.operators.windows",
    "micmac_li3ds_spark.operators.scalar_functions",
    "micmac_li3ds_spark.operators.setops",
    "micmac_li3ds_spark.operators.llm_text",
    "micmac_li3ds_spark.operators.llm_vector",
    "micmac_li3ds_spark.operators.etl",
    "micmac_li3ds_spark.operators.streaming_batch",
    "micmac_li3ds_spark.operators.udfs",
    "micmac_li3ds_spark.operators.scans",
    "micmac_li3ds_spark.operators.multimodal",
    "micmac_li3ds_spark.operators.analytics",
    "micmac_li3ds_spark.operators.subqueries",
    "micmac_li3ds_spark.operators.sampling",
    "micmac_li3ds_spark.operators.reshape",
]

_loaded = False


def register(name: str, oracle: Optional[str] = None, tags: tuple = ()):
    """Decorator: register a query under ``name`` with optional oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or ""
        )
        return fn

    return deco


def _ensure_loaded() -> None:
    global _loaded
    if _loaded:
        return
    _loaded = True
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: q.fn for name, q in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in _REGISTRY.items() if q.oracle is not None}


def get(name: str) -> Query:
    _ensure_loaded()
    return _REGISTRY[name]


def registry() -> dict[str, Query]:
    _ensure_loaded()
    return dict(_REGISTRY)
