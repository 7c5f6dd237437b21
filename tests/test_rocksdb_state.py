"""RocksDB state store provider (SURVEY §2.9 T4 at-scale store;
VERDICT r4 #4).

The engine cites RocksDB as the store for keyed state beyond executor
heap; this exercises it for real: the two heaviest stateful gates —
GroupState sessionization and exactly-once incremental corpus dedup —
run under ``RocksDBStateStoreProvider`` with changelog checkpointing and
must produce hashes identical to their DuckDB oracles (a store swap is
not allowed to change semantics).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from m13_sparkstreaming_python_azure_spark.streaming.stateful import (
    rocksdb_state_conf,
)

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture()
def rocksdb_session(spark):
    """Flip the shared session to RocksDB for the test, restore after.

    The provider is a runtime SQL conf read at stream start, so this
    affects exactly the queries started inside the test.
    """
    prior = {}
    for k, v in rocksdb_state_conf().items():
        try:
            prior[k] = spark.conf.get(k)
        except Exception:
            prior[k] = None
        spark.conf.set(k, v)
    yield spark
    for k, v in prior.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _oracle_rows(sf_dir: str, name: str):
    from m13_sparkstreaming_python_azure_spark.catalog import TABLES
    from m13_sparkstreaming_python_azure_spark.queries import ORACLES

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    df = con.execute(ORACLES[name]).fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    import pandas as pd

    df = df.astype(object).where(pd.notna(df), None)
    return sorted(tuple(str(v) for v in r) for r in df.itertuples(index=False))


def _spark_rows(df):
    import pandas as pd

    pdf = df.toPandas().reindex(sorted(df.columns), axis=1)
    pdf = pdf.astype(object).where(pd.notna(pdf), None)
    return sorted(tuple(str(v) for v in r) for r in pdf.itertuples(index=False))


def _assert_provider_engaged(spark):
    assert "RocksDB" in spark.conf.get(_PROVIDER_KEY)


def test_streaming_sessions_on_rocksdb_matches_oracle(rocksdb_session, sf_dir):
    from m13_sparkstreaming_python_azure_spark.queries import QUERIES

    spark = rocksdb_session
    _assert_provider_engaged(spark)
    got = _spark_rows(QUERIES["streaming_sessions"](spark, sf_dir))
    want = _oracle_rows(sf_dir, "streaming_sessions")
    assert len(got) == len(want) > 0
    assert got == want


def test_streaming_incremental_dedup_on_rocksdb_matches_oracle(
    rocksdb_session, sf_dir
):
    from m13_sparkstreaming_python_azure_spark.queries import QUERIES

    spark = rocksdb_session
    _assert_provider_engaged(spark)
    got = _spark_rows(QUERIES["streaming_incremental_dedup"](spark, sf_dir))
    want = _oracle_rows(sf_dir, "streaming_incremental_dedup")
    assert len(got) == len(want) > 0
    assert got == want
