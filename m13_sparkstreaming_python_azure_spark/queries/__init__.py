"""Query registry: every implemented SURVEY.md §2 operator (and north-star
extension) as a (spark, sf_dir) -> DataFrame callable, with a DuckDB oracle
SQL twin where the semantics are ANSI-SQL-expressible."""

from m13_sparkstreaming_python_azure_spark.queries.registry import (
    ORACLES,
    QUERIES,
)

__all__ = ["QUERIES", "ORACLES"]
