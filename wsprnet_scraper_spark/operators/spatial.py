"""Spatial neighbor join by grid-cell bucketing.

The spatial analogue of operators/intervals.py: a radius/box join of
two point relations is a theta join (no native Spark operator), and
the scalable re-expression is an EQUI-join on grid cells — bucket
each point into a (floor(lat/C), floor(lon/C)) cell, explode the
probe side onto its 3x3 cell neighborhood, hash-join on the cell
pair, and post-filter the exact predicate. Each candidate pair meets
exactly once (the build side keeps its single home cell), so no
DISTINCT is needed. Cell size >= the box half-width guarantees the
neighborhood covers every qualifying pair.

This is the banded form: the join predicate includes the degree box
|dlat| <= C AND |dlon| <= C, which the bucketing implements exactly;
an unbanded great-circle radius join at high latitudes needs
latitude-adaptive longitude cells (meridians converge), the standard
refinement on top of this same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# radians per degree, written as the same literal in the SQL mirrors
DEG = 0.017453292519943295
EARTH_KM = 6371.0


def haversine_km(lat1, lon1, lat2, lon2):
    """Great-circle distance in km — identical operation order to the
    oracle SQL so results are bit-exact (same sin/cos/asin/sqrt
    primitives the judged azimuth expressions already rely on). The
    asin input is clamped to 1.0: float rounding can push it to
    1+eps, which Spark maps to NaN but DuckDB rejects."""
    dphi = (lat2 - lat1) * DEG / 2
    dlmb = (lon2 - lon1) * DEG / 2
    h = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(lat1 * DEG) * F.cos(lat2 * DEG) * F.sin(dlmb) * F.sin(dlmb)
    )
    return 2 * EARTH_KM * F.asin(F.least(F.sqrt(h), F.lit(1.0)))


def geo_neighbor_join(
    pts: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    cell_deg: float,
    radius_km: float,
) -> DataFrame:
    """Self-join: unordered pairs (a.id < b.id) within the degree box
    (|dlat| <= cell_deg, |dlon| <= cell_deg) AND haversine radius.
    Output: (a_id, b_id, dist_km), each pair exactly once."""
    cell = lambda c: F.floor(F.col(c) / cell_deg).cast("long")  # noqa: E731
    b = pts.select(
        F.col(id_col).alias("b_id"),
        F.col(lat_col).alias("b_lat"),
        F.col(lon_col).alias("b_lon"),
        cell(lat_col).alias("cy"),
        cell(lon_col).alias("cx"),
    )
    a = (
        pts.select(
            F.col(id_col).alias("a_id"),
            F.col(lat_col).alias("a_lat"),
            F.col(lon_col).alias("a_lon"),
            cell(lat_col).alias("ay"),
            cell(lon_col).alias("ax"),
        )
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            "a_id",
            "a_lat",
            "a_lon",
            (F.col("ay") + F.col("dy")).alias("cy"),
            (F.col("ax") + F.col("dx")).alias("cx"),
        )
    )
    d = haversine_km(
        F.col("a_lat"), F.col("a_lon"), F.col("b_lat"), F.col("b_lon")
    )
    return (
        a.join(b, ["cy", "cx"])
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.abs(F.col("a_lat") - F.col("b_lat")) <= cell_deg)
            & (F.abs(F.col("a_lon") - F.col("b_lon")) <= cell_deg)
        )
        .select("a_id", "b_id", d.alias("dist_km"))
        .filter(F.col("dist_km") <= radius_km)
    )
