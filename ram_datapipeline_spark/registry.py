"""Query registry core.

One entry per operator/capability from SURVEY.md §2 (plus the
beyond-reference training-data operators). Each entry pairs

- a **builder**: ``(SparkSession, sf_dir) -> DataFrame`` composing the
  engine's operators into a plan, and
- an **oracle**: the equivalent ANSI SQL (DuckDB dialect) over the same
  parquet tables, or ``None`` for plans whose semantics are not cleanly
  SQL-expressible (those get rows-only checks).

Determinism contract: every oracle-backed query restricts itself to
IEEE-exact / correctly-rounded arithmetic (no libm transcendentals) and
carries explicit tie-breaks on any LIMIT/rank boundary, so Spark and DuckDB
agree bit-for-bit. Column names are aliased identically on both sides (the
driver hashes values under sorted column names).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    builder: Builder
    oracle: str | None
    survey: str = ""  # SURVEY §2 operator ids this query exercises
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, survey: str = "", tags: tuple[str, ...] = ()):
    """Decorator registering a builder under ``name``."""

    def wrap(fn: Builder) -> Builder:
        REGISTRY[name] = QuerySpec(
            builder=fn, oracle=oracle, survey=survey, doc=fn.__doc__ or "", tags=tags
        )
        return fn

    return wrap


def get(name: str) -> QuerySpec:
    return REGISTRY[name]


def builders() -> dict[str, Builder]:
    return {k: v.builder for k, v in REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {k: v.oracle for k, v in REGISTRY.items() if v.oracle is not None}
