"""Great-circle azimuth and path-vertex math as Catalyst expressions.

Spec: /root/reference/wsprnet_azi_calc.py:92-136. All of it maps to
native `pyspark.sql.functions` trig — no Python boundary, and the
whole enrichment stays inside whole-stage codegen.

Parity notes (the traps, see SURVEY.md §7.3):

- Python's `% 360` on a negative operand is non-negative (floored
  mod) -> must be `F.pmod`, not `%`.
- numpy's degrees/radians are multiplications by precomputed
  constants; Java's Math.toRadians computes x/180*PI which can differ
  in the last ulp. We multiply by the same constants numpy uses so
  doubles match bit-for-bit where libm agrees.
- Out-of-domain acos (|x|>1) yields NaN in numpy and Spark alike and
  must *propagate*; but Spark SQL orders NaN greater than every
  double while Python comparisons with NaN are always False — the
  off-track vertex test therefore needs an explicit isnan guard to
  reproduce `nan < x == False`.
- `max([tx, rx], key=abs)` returns the *first* argument on ties ->
  `when(abs(tx) >= abs(rx), tx)` (note >=).
- The meridian special case (tx_lon == rx_lon) sets v_lon to the
  meridian but the reference then *unconditionally overwrites* it in
  the rx_azi<180 branch (wsprnet_azi_calc.py:123-126). Replicated
  faithfully: the meridian assignment of v_lon is dead code in the
  reference and is dead here too (only v_lat survives from the
  special case).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

DEG2RAD = math.pi / 180.0
RAD2DEG = 180.0 / math.pi


def radians(deg: Column) -> Column:
    """Degrees -> radians, numpy-style (multiply by the constant)."""
    return deg * F.lit(DEG2RAD)


def degrees(rad: Column) -> Column:
    """Radians -> degrees, numpy-style (multiply by the constant)."""
    return rad * F.lit(RAD2DEG)


def azimuth_rx(tx_lat: Column, tx_lon: Column, rx_lat: Column, rx_lon: Column) -> Column:
    """Initial great-circle bearing at the receiver, degrees [0, 360)."""
    phi_tx = radians(tx_lat)
    phi_rx = radians(rx_lat)
    dlam = radians(tx_lon) - radians(rx_lon)
    y = F.sin(dlam) * F.cos(phi_tx)
    x = F.cos(phi_rx) * F.sin(phi_tx) - F.sin(phi_rx) * F.cos(phi_tx) * F.cos(dlam)
    return F.pmod(degrees(F.atan2(y, x)), F.lit(360.0))


def azimuth_tx(tx_lat: Column, tx_lon: Column, rx_lat: Column, rx_lon: Column) -> Column:
    """Initial great-circle bearing at the transmitter, degrees [0, 360)."""
    phi_tx = radians(tx_lat)
    phi_rx = radians(rx_lat)
    dlam = radians(tx_lon) - radians(rx_lon)
    p = F.sin(-dlam) * F.cos(phi_rx)
    q = F.cos(phi_tx) * F.sin(phi_rx) - F.sin(phi_tx) * F.cos(phi_rx) * F.cos(-dlam)
    return F.pmod(degrees(F.atan2(p, q)), F.lit(360.0))


def _max_by_abs(a: Column, b: Column) -> Column:
    """`max([a, b], key=abs)` — ties go to the first argument."""
    return F.when(F.abs(a) >= F.abs(b), a).otherwise(b)


def vertex(
    tx_lat: Column,
    tx_lon: Column,
    rx_lat: Column,
    rx_lon: Column,
    rx_azi: Column,
) -> tuple[Column, Column]:
    """(v_lat, v_lon) of the great-circle path vertex (point nearest a pole).

    Control flow mirrors wsprnet_azi_calc.py:113-136 exactly,
    including NaN propagation from out-of-domain acos/tan and the
    off-track snap to the by-abs-max endpoint.
    """
    phi_rx = radians(rx_lat)
    meridian = tx_lon == rx_lon

    v_lat_raw = F.when(meridian, _max_by_abs(tx_lat, rx_lat)).otherwise(
        degrees(F.acos(F.sin(radians(rx_azi)) * F.cos(phi_rx)))
    )
    v_lat1 = F.when(v_lat_raw > 90.0, F.lit(180.0) - v_lat_raw).otherwise(v_lat_raw)

    # Both rx_azi branches compute the same acos term; only the sign of
    # its contribution differs. NaN (tan ratio out of domain) propagates.
    acos_term = degrees(F.acos(F.tan(phi_rx) / F.tan(radians(v_lat1))))
    v_lon_raw = F.when(
        rx_azi < 180.0, F.pmod((rx_lon + acos_term) + 360.0, F.lit(360.0))
    ).otherwise(F.pmod((rx_lon - acos_term) + 360.0, F.lit(360.0)))
    v_lon1 = F.when(v_lon_raw > 180.0, v_lon_raw - 360.0).otherwise(v_lon_raw)

    # Off-track test. Python: `nan < x` is False, so NaN v_lon is NOT
    # off-track; Spark orders NaN above all doubles, so guard isnan.
    off_track = (~F.isnan(v_lon1)) & (
        (v_lon1 < F.least(tx_lon, rx_lon)) | (v_lon1 > F.greatest(tx_lon, rx_lon))
    )
    snap_lat = _max_by_abs(tx_lat, rx_lat)
    snap_lon = F.when(F.abs(tx_lat) >= F.abs(rx_lat), tx_lon).otherwise(rx_lon)

    v_lat = F.when(off_track, snap_lat).otherwise(v_lat1)
    v_lon = F.when(off_track, snap_lon).otherwise(v_lon1)
    return v_lat, v_lon


def add_vertex_cols(
    df,
    tx_lat: str,
    tx_lon: str,
    rx_lat: str,
    rx_lon: str,
    rx_azi: str,
    v_lat: str = "_v_lat",
    v_lon: str = "_v_lon",
):
    """Staged-projection form of `vertex` — same math, linear plan size.

    `vertex` nests every intermediate inside the next `when`, so a
    single Project ends up duplicating the whole upstream tree at each
    branch (exponential in nesting depth — ~10 s of pure
    analysis/codegen time per query at any data size). Materializing
    each intermediate as a named column keeps every subtree single-use;
    CollapseProject leaves multi-use non-cheap projections alone, so
    the optimized plan stays a chain of thin Projects inside one
    whole-stage-codegen span. Identical results, same single stage.
    """
    tla, tlo = F.col(tx_lat), F.col(tx_lon)
    rla, rlo = F.col(rx_lat), F.col(rx_lon)
    azi = F.col(rx_azi)

    df = df.withColumn(
        "_v_lat_raw",
        F.when(tlo == rlo, _max_by_abs(tla, rla)).otherwise(
            degrees(F.acos(F.sin(radians(azi)) * F.cos(radians(rla))))
        ),
    )
    df = df.withColumn(
        "_v_lat1",
        F.when(F.col("_v_lat_raw") > 90.0, F.lit(180.0) - F.col("_v_lat_raw")).otherwise(
            F.col("_v_lat_raw")
        ),
    )
    df = df.withColumn(
        "_acos_term",
        degrees(F.acos(F.tan(radians(rla)) / F.tan(radians(F.col("_v_lat1"))))),
    )
    df = df.withColumn(
        "_v_lon_raw",
        F.when(
            azi < 180.0, F.pmod((rlo + F.col("_acos_term")) + 360.0, F.lit(360.0))
        ).otherwise(F.pmod((rlo - F.col("_acos_term")) + 360.0, F.lit(360.0))),
    )
    df = df.withColumn(
        "_v_lon1",
        F.when(F.col("_v_lon_raw") > 180.0, F.col("_v_lon_raw") - 360.0).otherwise(
            F.col("_v_lon_raw")
        ),
    )
    df = df.withColumn(
        "_off_track",
        (~F.isnan(F.col("_v_lon1")))
        & (
            (F.col("_v_lon1") < F.least(tlo, rlo))
            | (F.col("_v_lon1") > F.greatest(tlo, rlo))
        ),
    )
    df = df.withColumn(
        v_lat, F.when(F.col("_off_track"), _max_by_abs(tla, rla)).otherwise(F.col("_v_lat1"))
    ).withColumn(
        v_lon,
        F.when(
            F.col("_off_track"),
            F.when(F.abs(tla) >= F.abs(rla), tlo).otherwise(rlo),
        ).otherwise(F.col("_v_lon1")),
    )
    return df.drop(
        "_v_lat_raw", "_v_lat1", "_acos_term", "_v_lon_raw", "_v_lon1", "_off_track"
    )
