"""Query registry — the engine's public API surface.

The reference exposes its query capabilities as a registry of named,
parameterized tool functions dispatched by name
(reference: tool_schemas.py:106-118, agent.py:65-92). The Spark engine
keeps the same shape: every operator from SURVEY §2 registers a named
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible) a
DuckDB oracle string. ``__spark_entry__.py`` re-exports this registry as
the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Q:
    """One registered operator: the Spark implementation and its oracle.

    ``oracle`` is ANSI SQL runnable by DuckDB over the fixture views; None
    marks a genuinely non-SQL-expressible operator (driver falls back to a
    rows-only check).
    """

    fn: QueryFn
    oracle: str | None = None


_REGISTRY: dict[str, Q] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query name {name!r}")
    _REGISTRY[name] = Q(fn, oracle)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator form: ``@query("vector_topk", oracle=...)``."""

    def deco(fn: QueryFn) -> QueryFn:
        register(name, fn, oracle)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_all_modules()
    return {name: q.fn for name, q in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all_modules()
    return {name: q.oracle for name, q in _REGISTRY.items() if q.oracle is not None}


_LOADED = False


def _load_all_modules() -> None:
    """Import every module that registers queries (import-for-effect)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        dedup,
        joins_ext,
        multimodal,
        relational,
        retrieval,
        semistructured,
        similarity,
        skew,
        textstats,
        windows,
    )
    from . import agent_api  # noqa: F401
    from .pipeline import corpus  # noqa: F401
    from .sources import sql_runner  # noqa: F401
    from .streaming import batch_twins, stream  # noqa: F401

    _LOADED = True
