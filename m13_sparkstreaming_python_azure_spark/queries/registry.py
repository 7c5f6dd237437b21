"""Assembled query + oracle registry consumed by __spark_entry__."""

from __future__ import annotations

from m13_sparkstreaming_python_azure_spark.queries.core import (
    CORE_ORACLES,
    CORE_QUERIES,
)
from m13_sparkstreaming_python_azure_spark.queries.llm import (
    LLM_ORACLES,
    LLM_QUERIES,
)

QUERIES = {**CORE_QUERIES, **LLM_QUERIES}
ORACLES = {**CORE_ORACLES, **LLM_ORACLES}

assert set(ORACLES) <= set(QUERIES), "oracle without a query"
