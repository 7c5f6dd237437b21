"""Golden end-to-end parity on the reference's shipped hotel-weather sample
(SURVEY.md §5.4).

The sample at /root/reference/m13sparkstreaming/hotel-weather/ turns out to
be the SAME dataset the reference notebook ran on: our engine's aggregate +
flagship window query reproduce the notebook's captured top-10 table
(stream.ipynb:173) EXACTLY — including the HLL++ approx_count_distinct
values (Paris 444 … Memphis 5), which pins both the query semantics and the
sketch parameters (rsd 0.05 default).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.aggregate import (
    weather_daily_aggregate,
)
from m13_sparkstreaming_python_azure_spark.operators.join import geohash_join
from m13_sparkstreaming_python_azure_spark.operators.window import (
    best_day_per_city_top10,
    top1_per_group,
)
from m13_sparkstreaming_python_azure_spark.sources.replay import replay_partitions
from m13_sparkstreaming_python_azure_spark.streaming.pipeline import (
    StreamingAggPipeline,
)

SAMPLE = "/root/reference/m13sparkstreaming/hotel-weather"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLE), reason="reference sample not present"
)

# stream.ipynb:173, regenerated from the shipped sample (identical values).
# Ranks 1-8 are strict; three cities tie at peak=5 for the last two slots
# (the reference's ORDER BY is not a total order at the cut) — the captured
# output happened to show Houston & Memphis; any 2 of the tied 3 are valid.
GOLDEN_TOP8 = [
    ("Paris", "2017-09-29", 444),
    ("London", "2017-09-23", 250),
    ("Barcelona", "2016-10-28", 211),
    ("Milan", "2017-09-20", 165),
    ("Amsterdam", "2017-08-31", 85),
    ("Paddington", "2017-09-23", 19),
    ("New York", "2017-08-11", 6),
    ("San Diego", "2017-09-20", 6),
]
GOLDEN_TIED_AT_5 = {"Houston", "Memphis", "Vienna"}


@pytest.fixture(scope="module")
def sample_df(spark):
    return spark.read.parquet(SAMPLE)


def test_schema_matches_reference(sample_df):
    """Schema parity incl. the quirks SURVEY §1.2 pins: string wthr_date,
    int partition cols named year/month/day (not wthr_year/...)."""
    fields = dict(
        (f.name, f.dataType.simpleString()) for f in sample_df.schema.fields
    )
    assert fields["wthr_date"] == "string"
    assert fields["id"] == "string"
    assert fields["avg_tmpr_c"] == "double"
    assert fields["year"] == "int"
    assert fields["month"] == "int"
    assert fields["day"] == "int"
    assert sample_df.count() == 13330


def test_golden_top10_matches_notebook_capture(sample_df):
    agg = weather_daily_aggregate(sample_df)
    top = best_day_per_city_top10(agg).collect()
    assert len(top) == 10
    got8 = [(r["city"], r["wthr_date"], r["distinct_hotels"]) for r in top[:8]]
    assert got8 == GOLDEN_TOP8
    for r in top[8:]:
        assert r["city"] in GOLDEN_TIED_AT_5
        assert r["distinct_hotels"] == 5
    # spot-check a temperature stat against the capture (Paris row)
    paris = top[0]
    assert abs(paris["avg_temperature"] - 18.0439) < 1e-3
    assert paris["max_temperature"] == pytest.approx(18.3)
    assert paris["min_temperature"] == pytest.approx(17.8)


def test_streaming_batch_parity_hotel_weather(spark, sample_df, tmp_path):
    """The core invariant (SURVEY §5.3) on the REAL reference data: replayed
    file-stream aggregate == one-shot batch aggregate, exactly (HLL++
    sketches are merge-order-insensitive)."""
    target = str(tmp_path / "incremental-hotel-weather")
    for _ in replay_partitions(spark, SAMPLE, target, limit=10):
        pass
    batch = spark.read.parquet(target)
    pipe = StreamingAggPipeline(
        spark,
        target,
        batch.schema,
        lambda df: weather_daily_aggregate(df),
        query_name="hotel_weather_golden",
    )
    try:
        pipe.run_available_now()
        stream_rows = sorted(
            tuple(r) for r in pipe.table().collect()
        )
    finally:
        pipe.stop()
    batch_rows = sorted(tuple(r) for r in weather_daily_aggregate(batch).collect())
    assert stream_rows == batch_rows
    assert len(stream_rows) > 0


def test_geohash_rejoin_reproduces_sample_pairs(sample_df):
    """J1 on real geohash data: split the (pre-joined) sample into hotel and
    weather projections and re-join on the 4-char geohash; every original
    (hotel id, date) pairing must re-appear."""
    hotels = sample_df.select("id", "address", "geoHash").distinct()
    weather = sample_df.select(
        F.col("geoHash").alias("w_geoHash"),
        "wthr_date",
        "avg_tmpr_c",
        "latitude",
        "longitude",
    ).distinct()
    joined = geohash_join(
        hotels, weather, hotels_geohash="geoHash", weather_geohash="w_geoHash"
    )
    # the re-join is a superset (cell-mates pair up too); original pairs ⊆ it
    orig = sample_df.select("id", "wthr_date").distinct()
    rejoined = joined.select("id", "wthr_date").distinct()
    missing = orig.exceptAll(rejoined).count()
    assert missing == 0
    assert rejoined.count() >= orig.count()


def test_geohash_encode_reproduces_sample_column(sample_df):
    """geohash_encode(latitude, longitude, 4) must reproduce the sample's
    shipped geoHash column on every one of its 13,330 rows — i.e. our
    encoder IS the function that produced the reference's join key."""
    from m13_sparkstreaming_python_azure_spark.operators.geo import with_geohash

    enc = with_geohash(
        sample_df.select("latitude", "longitude", "geoHash"),
        out_col="gh_computed",
    )
    mismatches = enc.filter(F.col("gh_computed") != F.col("geoHash")).count()
    assert mismatches == 0


def test_geohash_known_values(spark):
    """Spot-check the encoder against publicly known geohash values."""
    from m13_sparkstreaming_python_azure_spark.operators.geo import geohash_encode

    df = spark.createDataFrame(
        [
            (48.8583, 2.2945, "u09tunq"),   # Eiffel Tower
            (40.689247, -74.044502, "dr5r7p"),  # Statue of Liberty
            (-33.856784, 151.215297, "r3gx2ux"),  # Sydney Opera House
            (0.0, 0.0, "s0000"),
        ],
        "lat double, lon double, expected string",
    )
    rows = df.withColumn(
        "gh", geohash_encode("lat", "lon", 5)
    ).collect()
    for r in rows:
        assert r["gh"] == r["expected"][:5], (r["expected"], r["gh"])
