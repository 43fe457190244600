"""Wire-format scalar functions.

The reference's output format is part of its data model: lat/lon
fixed to 3 decimals via C-style "%.3f", azimuths rounded to int with
Python 3's round() (banker's/half-to-even), timestamps rendered
as yyyy-MM-dd:HH:mm in UTC (/root/reference/wsprnet_azi_calc.py:172-181,
:196; wsprnet-scraper.sh:17,320).

Parity traps handled here (SURVEY.md §7.3):

- `F.round` is HALF_UP; Python round()/C printf are half-to-even.
  `rint_int` and the pre-rounding inside `fmt3` use F.rint.
- Java's String.format("%.3f") would render NaN/Infinity as
  "NaN"/"Infinity" and half-up decimal ties; C/Python print
  "nan"/"inf" and round ties to even. fmt3 guards both. Decimal
  ties at the 3rd place are *real* for Maidenhead latitudes (the
  sub-square grid steps land on dyadic values like x.0625).
- `F.format_number` inserts thousands separators — never used.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schema import WDTIME_FORMAT


def wd_time_from_epoch(epoch_seconds: Column) -> Column:
    """Unix epoch seconds -> 'yyyy-MM-dd:HH:mm' UTC string.

    Matches `datetime.fromtimestamp(tz=utc).strftime('%Y-%m-%d:%H:%M')`
    (wsprnet_azi_calc.py:196) given spark.sql.session.timeZone=UTC.
    """
    return F.from_unixtime(epoch_seconds, WDTIME_FORMAT)


def rint_int(x: Column) -> Column:
    """Python 3 `int(round(x))`: round half-to-even, then to int."""
    return F.rint(x).cast("int")


def fmt3(x: Column) -> Column:
    """C/Python '%.3f' formatting, including half-even decimal ties.

    Pre-round half-to-even at the 3rd decimal with rint (exact for the
    dyadic tie cases), then let Java's %.3f render the already-rounded
    value; NaN/inf spelled the C way.

    Contract (see tests/test_enrich_property.py): matches C/Python
    %.3f for every exact 3-decimal midpoint (dyadic odd multiples of
    1/16 — the only doubles whose exact expansion IS a midpoint, e.g.
    Maidenhead's x.0625 steps: both sides round half-even) and for all
    values whose double product x*1000 does not round EXACTLY onto
    k+0.5. The remaining family — near-midpoints like 0.0005 whose
    product collapses onto the tie but whose exact value is not one —
    is rounded half-even here and half-away by C; it cannot arise from
    the enrichment math (trig irrationals, /24 and /48 locator
    arithmetic), which the byte-exact golden fixture pins.
    """
    rounded = F.rint(x * 1000.0) / 1000.0
    return (
        F.when(F.isnan(x), F.lit("nan"))
        .when(x == F.lit(float("inf")), F.lit("inf"))
        .when(x == F.lit(float("-inf")), F.lit("-inf"))
        .otherwise(F.format_string("%.3f", rounded))
    )


def epoch_cycle(epoch_seconds: Column, cycle: int = 120) -> Column:
    """Seconds-within-WSPR-cycle (epoch mod 120), always non-negative.

    The reference uses this for trigger scheduling
    (wsprnet-scraper.sh:354-355).
    """
    return F.pmod(epoch_seconds, F.lit(cycle))
