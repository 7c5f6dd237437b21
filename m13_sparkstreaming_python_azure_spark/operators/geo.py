"""Geospatial primitives — haversine distance and a grid-blocked radius
join.

The reference's only spatial operation is geohash ENCODING for an
equi-join enrichment (stream.ipynb:173 joins hotels to weather on a
4-char geohash); this module adds the distance-threshold join that
geohash equality cannot express (two points 10 m apart can straddle a
geohash cell boundary).

100 TB shape: NEVER a cross join. Both sides bucket into fixed-degree
grid cells (the flat analogue of geohash cells); the probe side explodes
into the bounded neighborhood of cells a radius-R match could possibly
occupy (a conservative cover derived from the worst-case metric
distortion at the latitude cap), the join is a plain equi-join on cell
id, and the exact haversine filter runs only on blocked candidates.
Cell size and neighborhood are chosen from the radius: correctness never
depends on tuning, only cost does.

Determinism: sin/cos/asin differ in the last ulp across libm
implementations — distances snap to a 1e-6 km grid (the repo float
rule) before the threshold compare, which the DuckDB oracle mirrors.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
