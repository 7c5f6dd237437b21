"""Assembled query + oracle registry consumed by __spark_entry__."""

from __future__ import annotations

from m13_sparkstreaming_python_azure_spark.queries.behavior import (
    BEHAVIOR_ORACLES,
    BEHAVIOR_QUERIES,
)
from m13_sparkstreaming_python_azure_spark.queries.core import (
    CORE_ORACLES,
    CORE_QUERIES,
)
from m13_sparkstreaming_python_azure_spark.queries.llm import (
    LLM_ORACLES,
    LLM_QUERIES,
)
from m13_sparkstreaming_python_azure_spark.queries.relational_ext import (
    EXT_ORACLES,
    EXT_QUERIES,
)
from m13_sparkstreaming_python_azure_spark.queries.tpch_ext import (
    TPCH_EXT_ORACLES,
    TPCH_EXT_QUERIES,
)

QUERIES = {
    **CORE_QUERIES,
    **EXT_QUERIES,
    **TPCH_EXT_QUERIES,
    **BEHAVIOR_QUERIES,
    **LLM_QUERIES,
}
ORACLES = {
    **CORE_ORACLES,
    **EXT_ORACLES,
    **TPCH_EXT_ORACLES,
    **BEHAVIOR_ORACLES,
    **LLM_ORACLES,
}

assert set(ORACLES) <= set(QUERIES), "oracle without a query"
