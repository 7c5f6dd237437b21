"""Geospatial helpers for the reference's implied upstream join.

The hotel-weather input table is documented as "Weather-Hotels data joined
by 4-characters geohash" (reference m13sparkstreaming/DataDescription.md:1)
but the reference never ships the encoder — the data arrives pre-joined.
This module supplies it: ``geohash_encode`` turns (lat, lon) into the
base-32 geohash join key, making the J1 enrichment join (SURVEY §2.3)
reproducible from raw coordinates. Verified value-for-value against the
``geoHash`` column of the reference's own shipped sample (tests).

Arrow-batched numpy (one vectorized bit-interleave per batch) — geohashing
is per-row bit twiddling, the case where a pandas UDF beats both a Python
loop (100×) and an unreadable 20-level expression tree.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_BASE32 = np.frombuffer(b"0123456789bcdefghjkmnpqrstuvwxyz", dtype="S1")


def _encode_batch(lats: np.ndarray, lons: np.ndarray, precision: int) -> np.ndarray:
    """Vectorized geohash: quantize each axis to its bit budget, interleave
    (lon first, per the standard), regroup as 5-bit base-32 chars."""
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    lon_q = np.clip(
        ((lons + 180.0) / 360.0 * (1 << lon_bits)).astype(np.int64),
        0,
        (1 << lon_bits) - 1,
    )
    lat_q = np.clip(
        ((lats + 90.0) / 180.0 * (1 << lat_bits)).astype(np.int64),
        0,
        (1 << lat_bits) - 1,
    )
    val = np.zeros(len(lats), dtype=np.int64)
    for i in range(nbits):
        val <<= 1
        if i % 2 == 0:
            val |= (lon_q >> (lon_bits - 1 - i // 2)) & 1
        else:
            val |= (lat_q >> (lat_bits - 1 - i // 2)) & 1
    chars = np.empty((precision, len(lats)), dtype="S1")
    for c in range(precision):
        chars[c] = _BASE32[(val >> (5 * (precision - 1 - c))) & 31]
    return (
        np.ascontiguousarray(chars.T).view(f"S{precision}").ravel().astype(str)
    )


def geohash_encode(
    lat: Column | str, lon: Column | str, precision: int = 4
) -> Column:
    """Column expression: geohash of (lat, lon) at ``precision`` chars."""
    lat = F.col(lat) if isinstance(lat, str) else lat
    lon = F.col(lon) if isinstance(lon, str) else lon

    @F.pandas_udf(StringType())
    def _gh(lats: pd.Series, lons: pd.Series) -> pd.Series:
        if len(lats) == 0:
            return pd.Series([], dtype=object)
        return pd.Series(
            _encode_batch(
                lats.to_numpy(dtype=np.float64), lons.to_numpy(dtype=np.float64),
                precision,
            )
        )

    return _gh(lat, lon)


def with_geohash(
    df: DataFrame,
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    out_col: str = "geoHash",
    precision: int = 4,
) -> DataFrame:
    """Stamp the geohash join key — the step upstream of geohash_join that
    the reference's data had already applied."""
    return df.withColumn(out_col, geohash_encode(lat_col, lon_col, precision))
