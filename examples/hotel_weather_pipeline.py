"""End-to-end reference workflow on the shipped hotel-weather sample.

Reproduces the complete reference pipeline (SURVEY §0) locally:
  1. incremental replay of day-partitions into a landing dir
     (upload.py:80-106 pattern — the ADLS uploader, minus Azure);
  2. Structured Streaming file source over the landing dir
     (the OSS stand-in for Databricks Auto Loader, stream.ipynb:111-114);
  3. complete-mode streaming aggregate per (city, wthr_date)
     (stream.ipynb:117-121) materialized as a SQL-queryable memory sink;
  4. the flagship top-10-cities window query (stream.ipynb:178-187);
  5. the Arrow toPandas hand-off the notebook used for plotting
     (stream.ipynb:461-519 — plotting itself stays client-side).

Run: python examples/hotel_weather_pipeline.py [sample_dir] [n_days]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from m13_sparkstreaming_python_azure_spark.operators.aggregate import (
    weather_daily_aggregate,
)
from m13_sparkstreaming_python_azure_spark.operators.window import (
    best_day_per_city_top10,
)
from m13_sparkstreaming_python_azure_spark.session import get_spark
from m13_sparkstreaming_python_azure_spark.sources.replay import replay_partitions
from m13_sparkstreaming_python_azure_spark.streaming.pipeline import (
    StreamingAggPipeline,
)

DEFAULT_SAMPLE = "/root/reference/m13sparkstreaming/hotel-weather"


def main(sample: str = DEFAULT_SAMPLE, n_days: int | None = None) -> None:
    spark = get_spark("hotel-weather-example")
    spark.sparkContext.setLogLevel("ERROR")
    landing = tempfile.mkdtemp(prefix="incremental-hotel-weather-")

    n = 0
    for _day, _path in replay_partitions(
        spark, sample, landing, limit=int(n_days) if n_days else None
    ):
        n += 1
    print(f"replayed {n} day-partitions -> {landing}")

    schema = spark.read.parquet(landing).schema
    pipe = StreamingAggPipeline(
        spark, landing, schema, weather_daily_aggregate, query_name="result_df_query"
    )
    try:
        pipe.run_available_now()
        agg = pipe.table()
        print(f"streaming aggregate: {agg.count()} (city, day) rows")

        top10 = best_day_per_city_top10(agg)
        top10.show(truncate=False)

        pdf = top10.toPandas()  # Arrow hand-off — plug into matplotlib here
        print(pdf.head(3).to_string())
    finally:
        pipe.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
