"""Maidenhead locator decoding as pure Catalyst Column expressions.

Semantics per /root/reference/wsprnet_azi_calc.py:77-90 (the spec):

- the locator is stripped, then decoded positionally;
- 4-char: lat = (ord(c1)-65)*10 + (ord(c3)-48) + 0.5 - 90,
          lon = (ord(c0)-65)*20 + (ord(c2)-48)*2 + 1 - 180
  (grid-square *center*);
- 6-char adds the sub-square with a case-adaptive ASCII base for the
  third pair: base 96 when the 5th char's code point is > 88 (i.e.
  lower-case subsquare letters), else 64 — replicated exactly,
  including the behavior for unusual inputs;
- operand order is kept identical to the reference so results are
  bit-identical IEEE-754 doubles (the only non-integer steps are
  + 0.5, /24, /12 and the 1/48, 1/24 half-cell offsets).

No UDF: ascii/substring/arithmetic all stay inside whole-stage
codegen. A Pandas-UDF variant lives in operators/udf_variants.py for
the native-vs-UDF benchmark.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _ord_at(loc: Column, pos: int) -> Column:
    """Code point of the 1-indexed character at `pos` (0 when absent)."""
    return F.ascii(F.substring(loc, pos, 1))


def grid_lat(locator: Column) -> Column:
    """Latitude (degrees) of a 4- or 6-char Maidenhead locator."""
    loc = F.trim(locator)
    lat4 = ((_ord_at(loc, 2) - 65) * 10 + (_ord_at(loc, 4) - 48)) + F.lit(0.5) - 90
    base = F.when(_ord_at(loc, 5) > 88, F.lit(96)).otherwise(F.lit(64))
    lat6 = (lat4 - F.lit(0.5)) + (_ord_at(loc, 6) - base) / F.lit(24.0) - F.lit(1.0 / 48)
    return F.when(F.length(loc) == 6, lat6).otherwise(lat4)


def grid_lon(locator: Column) -> Column:
    """Longitude (degrees) of a 4- or 6-char Maidenhead locator."""
    loc = F.trim(locator)
    lon4 = ((_ord_at(loc, 1) - 65) * 20 + (_ord_at(loc, 3) - 48) * 2) + F.lit(1) - 180
    base = F.when(_ord_at(loc, 5) > 88, F.lit(96)).otherwise(F.lit(64))
    lon6 = (lon4 - F.lit(1)) + (_ord_at(loc, 5) - base) / F.lit(12.0) - F.lit(1.0 / 24)
    # the 4-char longitude is pure integer arithmetic in the reference;
    # surface it as double so both branches share one type
    return F.when(F.length(loc) == 6, lon6).otherwise(lon4.cast("double"))
