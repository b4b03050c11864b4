"""Query registry — the single source of truth for the driver contract.

Every operator the engine implements registers exactly one named query
(a Spark callable) and, when SQL-expressible, a DuckDB oracle string.
``__spark_entry__.py`` re-exports ``queries()`` / ``oracle_sql()`` from
here; the per-round driver compares both at sf0.01 by row-count + schema +
order-insensitive value hash.

Hash-match discipline (see tests/helpers.py for the mirror harness):
- alias every computed column identically on both sides;
- money arithmetic in DECIMAL (exact, order-independent), cast to DOUBLE
  only at output;
- raw double aggregates rounded on both sides;
- timestamps surfaced as DATE / epoch millis (floor), never raw ns/us.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    category: str
    doc: str = ""
    bench: bool = False  # included in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    category: str = "misc",
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, category=category,
            doc=(fn.__doc__ or "").strip(), bench=bench, tags=tags,
        )
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    import hyperloglog_pyspark_spark as pkg

    pkg.load_all_operators()
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    import hyperloglog_pyspark_spark as pkg

    pkg.load_all_operators()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
