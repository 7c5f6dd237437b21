"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin (DuckDB) at a
given sf dir, compares row count, column names, and order-insensitive
values. Usage: python tools/check_correctness.py [--driver-session]
[sf_dir] [name ...] (names, if given, restrict the run to those queries)

``--driver-session`` (VERDICT r4 #2) builds a BARE session — master +
timezone only, none of our factory's parquet/NTZ/legacy confs — the shape
the driver's gate runs under. Round 4 proved a query can pass the tuned
factory session yet crash the driver (`kaplan_meier` vs TIMESTAMP_NTZ);
this mode catches that class before the driver does.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from m13_sparkstreaming_python_azure_spark.catalog import TABLES
from m13_sparkstreaming_python_azure_spark.session import get_spark


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.astype(object).where(pd.notna(df), None)
    rows = sorted(
        [tuple(str(v) for v in row) for row in df.itertuples(index=False)]
    )
    return rows


def bare_driver_session():
    """The driver-gate session shape: master + UTC timezone, nothing else.

    No ``inferTimestampNTZ``/``nanosAsLong``/parquet-legacy confs — parquet
    isAdjustedToUTC=false timestamps surface as TIMESTAMP_NTZ here, exactly
    as in CORRECTNESS_r04's kaplan_meier failure.
    """
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName("driver-session-sweep")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count() or 4)}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main(sf_dir: str = "/root/testdata/sf0.01", *names: str) -> int:
    driver_session = False
    args = [a for a in (sf_dir, *names)]
    if "--driver-session" in args:
        args.remove("--driver-session")
        driver_session = True
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = tuple(args[1:])
    # lazy corpus-dependent oracles (bpe_merges) must recompute at the
    # SAME sf this replica gates at — the driver's contract dir is the
    # default, so the env is only consulted when pointing elsewhere
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    spark = bare_driver_session() if driver_session else get_spark("check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if names:
        unknown = set(names) - set(qs)
        if unknown:
            print(f"unknown query name(s): {sorted(unknown)}")
            return 1
        qs = {n: qs[n] for n in names}
    failures = 0
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle — rows-only check)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            failures += 1
            continue
        s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
        if s_cols != o_cols:
            print(f"FAIL  {name}: columns {s_cols} != {o_cols}")
            failures += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL  {name}: rows {len(sdf)} != {len(odf)}")
            failures += 1
            continue
        s_rows, o_rows = _normalize(sdf), _normalize(odf)
        if s_rows != o_rows:
            diffs = [
                (a, b) for a, b in zip(s_rows, o_rows) if a != b
            ][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {diffs}")
            failures += 1
            continue
        print(f"OK    {name}: {len(sdf)} rows hash-equal")
    print(f"\n{len(qs) - failures}/{len(qs)} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
