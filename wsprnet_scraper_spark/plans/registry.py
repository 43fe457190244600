"""Registry wiring query builders to their DuckDB oracle SQL.

Every entry in QUERIES is a callable (spark, sf_dir) -> DataFrame.
ORACLE maps the same name to ANSI SQL DuckDB runs over the same
parquet (views: region nation customer supplier part orders lineitem
events documents embeddings). Names absent from ORACLE get the
driver's weaker rows-only check (reserved for genuinely
non-SQL-expressible ops like true streaming runs).

Cross-engine float discipline (why these queries look the way they
do):

- money sums go through DECIMAL(12,2) and cast to DOUBLE at the end:
  decimal aggregation is exact, hence order-independent, hence
  bit-identical across engines — a plain double SUM is not;
- no raw timestamp columns in outputs — epochs (unix_micros) or
  formatted strings instead, sidestepping engine-specific timestamp
  rendering;
- int-typed sums are cast explicitly (DuckDB SUM(int) is HUGEINT);
- double->int conversions use trunc semantics explicitly (DuckDB CAST
  rounds, Spark/Python truncate);
- window orderings always include a unique tiebreaker column so
  row_number is deterministic in both engines.
"""

from __future__ import annotations

from collections.abc import Callable

QUERIES: dict[str, Callable] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = "\n".join(
                line for line in oracle.strip().splitlines()
            )
        return fn

    return deco
