"""Spatial radius self-join: all point pairs within R km — grid-cell
blocking + Haversine verification, never a cross join.

Generalizes the reference's GeoDistanceFilter (point-vs-reference,
filter.go:18-56) to point-vs-point at corpus scale, reusing its exact
distance formula (query/filters.py::haversine_km) and its Null-Island
exclusion rule.

Blocking: each point lands in one (lat, lng) grid cell sized so that
any two points within R km sit in the same or adjacent cells; the probe
side explodes to its 3x3 cell neighborhood and equi-joins the build
side's home cell. Pair (a, b) therefore surfaces exactly twice —
(probe=a, home=b) and (probe=b, home=a) — and the ``id_l < id_r``
canonicalization keeps exactly one, so no distinct/dedup shuffle is
needed. The join is a plain equi-join on the cell key: shuffle cost
tracks point density per cell (×9 on the probe side), never corpus²;
dense urban cells are ordinary AQE skew-split work.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from ..query.filters import haversine_km

# km per degree: latitude is ~constant; longitude shrinks by cos(lat).
_KM_PER_DEG_LAT = 110.574
_KM_PER_DEG_LNG_EQ = 111.320


def radius_pairs(
    df: DataFrame,
    id_col: str,
    lat_col: str,
    lng_col: str,
    radius_km: float,
    max_abs_lat: float = 66.0,
) -> DataFrame:
    """All unordered pairs (id_l < id_r) with Haversine distance
    <= radius_km, plus the distance. ``max_abs_lat`` bounds the data's
    latitude band and sizes the longitude cell so adjacency stays
    sufficient there (polar data needs a different blocking — document,
    don't silently mis-pair)."""
    cell_lat = radius_km / _KM_PER_DEG_LAT
    cell_lng = radius_km / (
        _KM_PER_DEG_LNG_EQ * math.cos(math.radians(max_abs_lat))
    )

    pts = df.select(
        F.col(id_col).alias("_id"),
        F.col(lat_col).alias("_lat"),
        F.col(lng_col).alias("_lng"),
    ).filter(
        F.col("_lat").isNotNull()
        & F.col("_lng").isNotNull()
        & ~((F.col("_lat") == 0.0) & (F.col("_lng") == 0.0))  # Null Island
        & (F.abs(F.col("_lat")) <= F.lit(max_abs_lat))
    )
    ci = F.floor(F.col("_lat") / F.lit(cell_lat))
    cj = F.floor(F.col("_lng") / F.lit(cell_lng))

    home = pts.select("_id", "_lat", "_lng", ci.alias("_ci"), cj.alias("_cj"))
    neighborhood = F.array(
        *[
            F.struct((ci + F.lit(di)).alias("_ci"), (cj + F.lit(dj)).alias("_cj"))
            for di in (-1, 0, 1)
            for dj in (-1, 0, 1)
        ]
    )
    probe = pts.select(
        F.col("_id").alias("_id_l"),
        F.col("_lat").alias("_lat_l"),
        F.col("_lng").alias("_lng_l"),
        F.explode(neighborhood).alias("_cell"),
    ).select("_id_l", "_lat_l", "_lng_l", "_cell._ci", "_cell._cj")

    cand = probe.join(home, ["_ci", "_cj"]).filter(F.col("_id_l") < F.col("_id"))
    dist = haversine_km(
        F.col("_lat_l"), F.col("_lng_l"), F.col("_lat"), F.col("_lng")
    )
    return cand.select(
        F.col("_id_l").alias("id_l"),
        F.col("_id").alias("id_r"),
        dist.alias("distance_km"),
    ).filter(F.col("distance_km") <= F.lit(radius_km))
