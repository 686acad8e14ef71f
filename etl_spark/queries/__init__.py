"""Named query registry — the engine's public query surface.

Every operator family from SURVEY.md §2 (and the training-data
pipeline operators) is exposed here as a named query: a
``(spark, sf_dir) -> DataFrame`` callable plus, where the semantics are
ANSI-SQL-expressible, an equivalent oracle SQL string that DuckDB can
run on the same parquet tables. The driver (and tests/test_oracle_parity)
compare the two side by side — this is the correctness gate.

Parity discipline (why the queries look the way they do):
* every computed column is aliased identically in DataFrame code and SQL;
* monetary aggregations go through DECIMAL (exact) and are cast to
  DOUBLE only at the end, so both engines round once from the same
  exact value — bit-identical doubles;
* float math that can't be decimal (cosine, ratios) uses explicit
  left-fold / identical operation order in both engines and rounds to a
  fixed number of decimals at the end;
* no ``rand()``, no current-time, no locale anywhere.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str
    # driver=False: kept out of the external driver's fixed 50-row
    # correctness window but still oracle-checked by the local parity
    # suite (tests/test_oracle_parity.py). Used for documented
    # baselines whose scale-path successors hold the driver slots.
    driver: bool = True


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, driver: bool = True):
    """Register a named query. ``oracle`` is the DuckDB-runnable SQL
    twin (tables pre-registered as views by the driver)."""

    def deco(fn):
        REGISTRY[name] = QuerySpec(
            name, fn, oracle, (fn.__doc__ or "").strip(), driver
        )
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (registration is import-time)."""
    from etl_spark.queries import (  # noqa: F401
        relational,
        windows,
        cdc,
        textops,
        dedup_docs,
        similarity,
        multimodal,
        dimensions,
        joins_extra,
        sequences,
    )

    return REGISTRY
