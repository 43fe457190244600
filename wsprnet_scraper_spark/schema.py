"""Schemas and static dimension data for the WSPR `spots` relation.

The reference's data model is a single flat 27-column relation
(16 source columns declared at /root/reference/wsprnet_azi_calc.py:23-40,
11 derived at :41-53; sink order at /root/reference/insert-spots.sql:1-2).
In flight the reference keeps every value as a string and lets Postgres
apply types at insert; here columns are typed end-to-end and a separate
wire-format projection (pipeline.to_wire) reproduces the string layer
(%.3f lat/lons, int azimuths, "-999.9" sentinels) where byte parity
matters.
"""

from __future__ import annotations

from pyspark.sql import types as T

# 16 source columns, in the reference's declaration order
# (wsprnet_azi_calc.py:23-40). The API returns 15; wd_time is derived
# from Date by the scraper stage (wsprnet-scraper.sh:313-323).
SOURCE_COLUMNS = [
    "wd_time",
    "Spotnum",
    "Date",
    "Reporter",
    "ReporterGrid",
    "dB",
    "MHz",
    "CallSign",
    "Grid",
    "Power",
    "Drift",
    "distance",
    "azimuth",
    "Band",
    "version",
    "code",
]

# 11 derived columns (wsprnet_azi_calc.py:41-53).
DERIVED_COLUMNS = [
    "wd_band",
    "wd_c2_noise",
    "wd_rms_noise",
    "wd_rx_az",
    "wd_rx_lat",
    "wd_rx_lon",
    "wd_tx_az",
    "wd_tx_lat",
    "wd_tx_lon",
    "wd_v_lat",
    "wd_v_lon",
]

# Sink column order = 27 columns as in insert-spots.sql:1-2
# (source columns followed by derived, wd_time first — the hypertable
# time key).
SINK_COLUMNS = SOURCE_COLUMNS + DERIVED_COLUMNS

# Typed schema for parsed (but not yet enriched) spots.
SPOT_SCHEMA = T.StructType(
    [
        T.StructField("wd_time", T.StringType()),  # yyyy-MM-dd:HH:mm wire format
        T.StructField("Spotnum", T.LongType()),
        T.StructField("Date", T.LongType()),  # unix epoch seconds
        T.StructField("Reporter", T.StringType()),
        T.StructField("ReporterGrid", T.StringType()),
        T.StructField("dB", T.IntegerType()),
        T.StructField("MHz", T.DoubleType()),
        T.StructField("CallSign", T.StringType()),
        T.StructField("Grid", T.StringType()),
        T.StructField("Power", T.IntegerType()),
        T.StructField("Drift", T.IntegerType()),
        T.StructField("distance", T.IntegerType()),
        T.StructField("azimuth", T.IntegerType()),
        T.StructField("Band", T.IntegerType()),
        T.StructField("version", T.StringType()),
        T.StructField("code", T.IntegerType()),
    ]
)

# Raw all-string schema for byte-parity CSV ingestion (the reference's
# in-flight representation is stringly typed; wsprnet_azi_calc.py:145
# reads dtype='str').
SPOT_SCHEMA_RAW = T.StructType(
    [T.StructField(name, T.StringType()) for name in SOURCE_COLUMNS]
)

# Typed schema of the enriched 27-column relation.
ENRICHED_SCHEMA = T.StructType(
    list(SPOT_SCHEMA.fields)
    + [
        T.StructField("wd_band", T.IntegerType()),
        T.StructField("wd_c2_noise", T.DoubleType()),
        T.StructField("wd_rms_noise", T.DoubleType()),
        T.StructField("wd_rx_az", T.IntegerType()),
        T.StructField("wd_rx_lat", T.DoubleType()),
        T.StructField("wd_rx_lon", T.DoubleType()),
        T.StructField("wd_tx_az", T.IntegerType()),
        T.StructField("wd_tx_lat", T.DoubleType()),
        T.StructField("wd_tx_lon", T.DoubleType()),
        T.StructField("wd_v_lat", T.DoubleType()),
        T.StructField("wd_v_lon", T.DoubleType()),
    ]
)

# Frequency -> band lookup (decihertz-truncated MHz -> band in meters,
# 70cm/23cm as 70/23). 18 entries + default 9999 on miss
# (wsprnet_azi_calc.py:55-75). Kept as plain data; functions/bands.py
# exposes it as a Catalyst map expression and as a broadcast-join dim.
BAND_TABLE: list[tuple[int, int]] = [
    (1, 2200),
    (4, 630),
    (18, 160),
    (35, 80),
    (52, 60),
    (53, 60),
    (70, 40),
    (101, 30),
    (140, 20),
    (181, 17),
    (210, 15),
    (249, 12),
    (281, 10),
    (502, 6),
    (700, 4),
    (1444, 2),
    (4323, 70),
    (12965, 23),
]

DEFAULT_BAND = 9999

# Null-sentinel used by the reference for noise columns with absent
# data (wsprnet_azi_calc.py:172-173, rationale wsprnet-scraper.sh:5).
NOISE_SENTINEL = -999.9

WDTIME_FORMAT = "yyyy-MM-dd:HH:mm"  # wsprnet-scraper.sh:320 (TZ=UTC)
