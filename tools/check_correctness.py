"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin (DuckDB) at a
given sf dir, compares row count, column names, and order-insensitive
values. Usage: python tools/check_correctness.py [sf_dir] [name ...]
(names, if given, restrict the run to those queries)
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


def main(sf_dir: str = "/root/testdata/sf0.01", *names: str) -> int:
    spark = get_spark("check-correctness")
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
