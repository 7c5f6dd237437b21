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

Round 4 adds the distance side: ``haversine_km`` and the grid-blocked
``radius_join`` — the threshold join geohash EQUALITY cannot express
(two points 10 m apart can straddle a cell boundary). 100 TB shape:
never a cross join; both sides bucket into fixed-degree grid cells, the
probe side explodes into the bounded neighborhood a radius-R match can
occupy (worst-case metric distortion at the latitude cap; modular
longitude cells so the index wraps at the antimeridian exactly like
haversine does), candidates equi-join on cell id, and the exact
distance filter runs on candidates only. Distances snap to a 1e-6 km
grid (libm trig differs in the last ulp across engines), mirrored by
the DuckDB oracle.
"""

from __future__ import annotations

import math

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


EARTH_RADIUS_KM = 6371.0
# one degree of latitude in km (spherical model)
_KM_PER_DEG_LAT = math.pi * EARTH_RADIUS_KM / 180.0


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (spherical earth, radius 6371 km) —
    pure JVM expressions, codegen-friendly."""
    rad = F.lit(math.pi / 180.0)
    dlat = (lat2 - lat1) * rad / 2
    dlon = (lon2 - lon1) * rad / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(lat1 * rad)
        * F.cos(lat2 * rad)
        * F.sin(dlon)
        * F.sin(dlon)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def radius_join(
    left: DataFrame,
    right: DataFrame,
    left_coords: tuple[str, str],
    right_coords: tuple[str, str],
    radius_km: float,
    lat_cap_deg: float = 60.0,
    cell_deg: float = 2.0,
) -> DataFrame:
    """All (left, right) pairs within ``radius_km`` — grid-blocked, then
    exact.

    ``left_coords`` / ``right_coords`` name the (lat, lon) columns; the
    four names must be pairwise distinct (the result carries both
    sides). Latitudes must satisfy |lat| <= ``lat_cap_deg`` — near the
    poles longitude degrees degenerate and a fixed grid cover is the
    wrong index; polar slices need a re-grid pass of their own.

    The probe (left) side explodes into the neighborhood of
    ``cell_deg``-sized cells that can contain a match:
    - lat reach: radius / 111.19 km/deg;
    - lon reach: radius / (111.19 * cos(lat_cap)) — worst-case
      distortion at the cap, so the cover is conservative everywhere;
    - floor-bucket inequality adds one cell of slack each way.

    Exactness: the neighborhood is a superset of every qualifying cell
    and the haversine filter is exact — recall 1, layout-independent.
    Returns left.* x right.* + dist_km (1e-6-snapped), dist_km <
    radius."""
    lla, llo = left_coords
    rla, rlo = right_coords
    assert len({lla, llo, rla, rlo}) == 4, "coordinate columns must differ"
    lat_reach = radius_km / _KM_PER_DEG_LAT
    lon_reach = radius_km / (
        _KM_PER_DEG_LAT * math.cos(math.radians(lat_cap_deg))
    )
    dlat_cells = int(lat_reach / cell_deg) + 1
    dlon_cells = int(lon_reach / cell_deg) + 1

    # longitude cells are MODULAR (the grid wraps at the antimeridian:
    # lon +179.9 and -179.9 are ~20 km apart at the cap, not 360° —
    # haversine is periodic, the index must be too); latitude never
    # wraps under the cap
    n_lon = int(round(360.0 / cell_deg))

    def cell(lat, lon):
        return (
            F.floor(F.col(lat) / F.lit(cell_deg)).cast("long"),
            F.pmod(
                F.floor(F.col(lon) / F.lit(cell_deg)).cast("long"),
                F.lit(n_lon),
            ),
        )

    r_cy, r_cx = cell(rla, rlo)
    r = right.withColumn("__cy", r_cy).withColumn("__cx", r_cx)

    l_cy, l_cx = cell(lla, llo)
    neigh = F.explode(
        F.flatten(
            F.transform(
                F.sequence(F.lit(-dlat_cells), F.lit(dlat_cells)),
                lambda dy: F.transform(
                    F.sequence(F.lit(-dlon_cells), F.lit(dlon_cells)),
                    lambda dx: F.struct(
                        (l_cy + dy).alias("cy"),
                        F.pmod(l_cx + dx, F.lit(n_lon)).alias("cx"),
                    ),
                ),
            )
        )
    )
    lft = left.withColumn("__n", neigh)
    cand = lft.join(
        r,
        (F.col("__n.cy") == F.col("__cy"))
        & (F.col("__n.cx") == F.col("__cx")),
    )
    dist = F.floor(
        haversine_km(F.col(lla), F.col(llo), F.col(rla), F.col(rlo)) * 1e6
        + F.lit(0.5)
    ) / 1e6
    return (
        cand.withColumn("dist_km", dist)
        .filter(F.col("dist_km") < radius_km)
        .drop("__n", "__cy", "__cx")
    )
