"""Golden differential test: the Spark enrichment pipeline must
reproduce the reference's exact output on the committed fixture.

The fixture pair (tests/golden/spots_input.json -> spots_golden.csv)
was produced by running /root/reference/wsprnet_azi_calc.py itself
(see make_golden.py); reference code is the spec. String-formatted
columns are compared byte-for-byte, typed columns numerically.
"""

from __future__ import annotations

import csv
import math
from pathlib import Path

import pytest

from wsprnet_scraper_spark import pipeline
from wsprnet_scraper_spark.schema import SINK_COLUMNS

GOLDEN_DIR = Path(__file__).parent / "golden"

# columns whose wire format must match byte-for-byte
STRING_EXACT = [
    "wd_time",
    "wd_c2_noise",
    "wd_rms_noise",
    "wd_rx_lat",
    "wd_rx_lon",
    "wd_tx_lat",
    "wd_tx_lon",
    "wd_v_lat",
    "wd_v_lon",
]
INT_EXACT = ["wd_band", "wd_rx_az", "wd_tx_az"]
PASSTHROUGH = ["Reporter", "ReporterGrid", "CallSign", "Grid", "version"]


@pytest.fixture(scope="module")
def golden() -> dict[str, dict[str, str]]:
    with (GOLDEN_DIR / "spots_golden.csv").open() as fh:
        rows = list(csv.reader(fh))
    assert rows, "golden fixture missing — run tests/golden/make_golden.py"
    return {row[1]: dict(zip(SINK_COLUMNS, row)) for row in rows}


@pytest.fixture(scope="module")
def enriched(spark):
    df = pipeline.parse_json(spark, str(GOLDEN_DIR / "spots_input.json"))
    wire = pipeline.to_wire(pipeline.enrich(pipeline.with_wd_time(df)))
    return {str(r["Spotnum"]): r.asDict() for r in wire.collect()}


def test_row_count(golden, enriched):
    assert len(enriched) == len(golden) == 400


def test_string_columns_byte_exact(golden, enriched):
    mismatches = []
    for spotnum, want in golden.items():
        got = enriched[spotnum]
        for col in STRING_EXACT + PASSTHROUGH:
            if str(got[col]) != want[col]:
                mismatches.append((spotnum, col, want[col], got[col]))
    assert not mismatches, mismatches[:20]


def test_int_columns_exact(golden, enriched):
    mismatches = []
    for spotnum, want in golden.items():
        got = enriched[spotnum]
        for col in INT_EXACT:
            if int(got[col]) != int(want[col]):
                mismatches.append((spotnum, col, want[col], got[col]))
    assert not mismatches, mismatches[:20]


def test_numeric_passthrough(golden, enriched):
    for spotnum, want in golden.items():
        got = enriched[spotnum]
        assert math.isclose(float(got["MHz"]), float(want["MHz"]))
        for col in ["dB", "Power", "Drift", "distance", "azimuth", "Band", "code"]:
            assert int(got[col]) == int(want[col]), (spotnum, col)
        assert int(got["Date"]) == int(want["Date"])
