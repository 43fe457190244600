"""Property-based parity tests for the enrichment scalar functions.

Two independent implementations exist of every piece of the math: the
native Catalyst expressions (functions/) and the Python forms (the
pandas-UDF `_decode`, the Python stdlib's rounding/formatting, the
band dict from schema.BAND_TABLE). Hypothesis drives randomized
inputs through both; the golden fixture test pins reference parity,
these pin implementation-equivalence across the input space —
including the known traps (banker's-rounding ties, negative-azimuth
pmod, 4- vs 6-char and upper/lower subsquare locators).

Spark-job discipline: each property collects a whole batch of
examples into ONE DataFrame per test (a job per example would take
minutes); max_examples kept small since each example is a 60-row
batch.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from wsprnet_scraper_spark.functions import band_from_mhz, fmt3, rint_int
from wsprnet_scraper_spark.operators.udf_variants import _decode
from wsprnet_scraper_spark.schema import BAND_TABLE, DEFAULT_BAND

FIELD = st.tuples(
    st.integers(0, 17), st.integers(0, 17), st.integers(0, 9), st.integers(0, 9)
)


@st.composite
def locator(draw) -> str:
    a, b, c, d = draw(FIELD)
    g4 = f"{chr(65 + a)}{chr(65 + b)}{c}{d}"
    if draw(st.booleans()):
        return g4
    lower = draw(st.booleans())
    base = 97 if lower else 65
    e, f = draw(st.integers(0, 23)), draw(st.integers(0, 23))
    return f"{g4}{chr(base + e)}{chr(base + f)}"


@settings(max_examples=5, deadline=None)
@given(st.lists(locator(), min_size=40, max_size=60))
def test_locator_native_equals_python(spark, locs):
    from wsprnet_scraper_spark.functions import grid_lat, grid_lon

    df = spark.createDataFrame([(g,) for g in locs], ["g"])
    rows = df.select(
        "g", grid_lat(F.col("g")).alias("lat"), grid_lon(F.col("g")).alias("lon")
    ).collect()
    for r in rows:
        plat, plon = _decode(r["g"])
        assert r["lat"] == plat, (r["g"], r["lat"], plat)
        assert r["lon"] == plon, (r["g"], r["lon"], plon)
        assert -90.0 <= r["lat"] <= 90.0
        assert -180.0 <= r["lon"] <= 180.0


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.floats(min_value=0.0, max_value=1500.0, allow_nan=False),
        min_size=40,
        max_size=60,
    )
)
def test_band_native_equals_dict(spark, freqs):
    table = dict(BAND_TABLE)
    df = spark.createDataFrame([(f,) for f in freqs], ["mhz"])
    rows = df.select("mhz", band_from_mhz(F.col("mhz")).alias("b")).collect()
    for r in rows:
        assert r["b"] == table.get(int(10 * r["mhz"]), DEFAULT_BAND)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.floats(-360, 360, allow_nan=False),
            # exact .5 ties — the F.round trap (HALF_UP vs HALF_EVEN)
            st.integers(-720, 720).map(lambda i: i / 2),
        ),
        min_size=40,
        max_size=60,
    )
)
def test_rint_matches_python_banker_rounding(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], ["x"])
    rows = df.select("x", rint_int(F.col("x")).alias("r")).collect()
    for r in rows:
        assert r["r"] == round(r["x"]), (r["x"], r["r"], round(r["x"]))


def _ambiguous_tie(x: float) -> bool:
    """True for the doubles where fmt3's contract allows divergence:
    x*1000 rounds exactly onto k+0.5 although x's exact binary value
    is not a 3-decimal midpoint (only dyadic odd multiples of 1/16
    are). See fmt3's docstring."""
    from fractions import Fraction

    prod = x * 1000.0
    if prod != int(prod) + 0.5 and prod != int(prod) - 0.5:
        return False
    return (Fraction(x) * 2000).denominator != 1  # not an exact midpoint


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.floats(-1000, 1000, allow_nan=False),
            # exact dyadic 3-decimal midpoints (odd multiples of 1/16,
            # e.g. the Maidenhead x.0625 steps): C and fmt3 both
            # round half-even
            st.integers(-16000, 16000).map(lambda i: (2 * i + 1) / 16),
        ),
        min_size=40,
        max_size=60,
    )
)
def test_fmt3_matches_python_reference_format(spark, xs):
    xs = [x for x in xs if not _ambiguous_tie(x)]
    df = spark.createDataFrame([(x,) for x in xs], ["x"])
    rows = df.select("x", fmt3(F.col("x")).alias("s")).collect()
    for r in rows:
        # the reference formats with C/Python %.3f on the value the
        # enrichment produced; fmt3 must agree on the whole contract
        # domain, exact midpoints included
        assert r["s"] == "%.3f" % r["x"], (r["x"], r["s"])


@settings(max_examples=4, deadline=None)
@given(st.lists(st.tuples(locator(), locator()), min_size=30, max_size=40))
def test_azimuth_range_and_pmod(spark, pairs):
    from wsprnet_scraper_spark.functions import azimuth_rx, azimuth_tx, grid_lat, grid_lon

    df = spark.createDataFrame(pairs, ["g_tx", "g_rx"])
    tla, tlo = grid_lat(F.col("g_tx")), grid_lon(F.col("g_tx"))
    rla, rlo = grid_lat(F.col("g_rx")), grid_lon(F.col("g_rx"))
    rows = df.select(
        azimuth_rx(tla, tlo, rla, rlo).alias("rx"),
        azimuth_tx(tla, tlo, rla, rlo).alias("tx"),
    ).collect()
    for r in rows:
        # pmod, not %: results must be non-negative even west-heading
        assert 0.0 <= r["rx"] < 360.0
        assert 0.0 <= r["tx"] < 360.0
