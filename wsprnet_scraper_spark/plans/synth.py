"""Deterministic WSPR spot synthesis from the `events` test table.

The WSPR-domain fixtures (FIXTURES.md §A) are not among the driver's
parquet tables, so the enrichment-math parity queries derive a spot
batch *deterministically* from `events` with arithmetic that is
expressible identically in Spark and DuckDB SQL. Both engines compute
the same grids/frequencies/spotnums from the same rows, which makes
the whole enrichment pipeline (Maidenhead -> azimuth -> vertex ->
band -> wire format) oracle-checkable end to end.

Covered cases: 4- vs 6-char locators, upper vs lower subsquare pair,
meridian pairs (identical longitude characters and length),
identical-grid rows, band hits and misses, spotnum gaps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_events

# 18 band-center frequencies + 2 off-table (-> band 9999)
FREQS = [
    0.1375,
    0.4742,
    1.8366,
    3.5701,
    5.2872,
    5.3654,
    7.0386,
    10.1402,
    14.0971,
    18.1061,
    21.0946,
    24.9246,
    28.1261,
    50.2935,
    70.0911,
    144.4891,
    432.3001,
    1296.5001,
    0.9999,
    99.9999,
]


def synth_spots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side of the synthesizer (mirror of SYNTH_SPOTS_SQL).

    Staged exactly like the SQL mirror: `_g6`/`_r4` (and the subsquare
    case bases) materialize as named columns in intermediate
    projections, then every downstream grid expression references them
    by name. Inlining them instead duplicates the 6-concat subtree
    ~8x across the CASE arms of ReporterGrid — the plan-size trap
    documented in SCALE.md (staged projections, not expression
    towers); Catalyst keeps the stages because multi-referenced
    non-trivial aliases are not collapsed.
    """
    ev = load_events(spark, sf_dir)
    n = F.col("event_id")
    u = F.col("user_id")

    def ch(base, off):
        return F.char(F.lit(base) + off)

    staged = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(n % 5 == 0, F.lit(65)).otherwise(F.lit(97)).alias("_txbase"),
        F.when(u % 4 == 0, F.lit(65)).otherwise(F.lit(97)).alias("_rxbase"),
    ).select(
        "event_id",
        "user_id",
        "ts",
        "_txbase",
        "_rxbase",
        F.concat(
            ch(65, n % 18),
            ch(65, u % 18),
            ch(48, n % 10),
            ch(48, u % 10),
            F.char(F.col("_txbase") + (n + u) % 24),
            F.char(F.col("_txbase") + (n * 7 + 3) % 24),
        ).alias("_g6"),
        F.concat(
            ch(65, (u + 7) % 18),
            ch(65, (n + 11) % 18),
            ch(48, (u + 1) % 10),
            ch(48, (n + 2) % 10),
        ).alias("_r4"),
    )
    g6, r4 = F.col("_g6"), F.col("_r4")
    grid = F.when(n % 3 == 0, F.substring(g6, 1, 4)).otherwise(g6)

    rgrid_normal = F.when(u % 5 == 0, r4).otherwise(
        F.concat(
            r4,
            F.char(F.col("_rxbase") + (u + n * 3) % 24),
            F.char(F.col("_rxbase") + (u * 11 + 2) % 24),
        )
    )

    # meridian rows: same length and identical longitude characters
    # (positions 1, 3, 5), latitude characters varied. grid[i] == g6[i]
    # for i <= 4, and the 6-char arm only fires when grid == g6, so the
    # substrings read _g6 directly (as the SQL mirror does).
    mer4 = F.concat(
        F.substring(g6, 1, 1),
        ch(65, (u + 3) % 18),
        F.substring(g6, 3, 1),
        ch(48, (u + 5) % 10),
    )
    mer6 = F.concat(
        mer4, F.substring(g6, 5, 1), F.char(F.col("_txbase") + (u * 11 + 2) % 24)
    )
    rgrid = F.when(
        n % 13 == 0, F.when(n % 3 == 0, mer4).otherwise(mer6)
    ).otherwise(rgrid_normal)

    epoch = F.floor(F.unix_timestamp("ts") / 120) * 120

    return staged.select(
        (F.lit(1000000) + n + (n.cast("long") / 17).cast("long") * 3).alias("Spotnum"),
        epoch.cast("long").alias("Date"),
        F.concat(F.lit("R"), u).alias("Reporter"),
        rgrid.alias("ReporterGrid"),
        ((n % 51) - 30).cast("int").alias("dB"),
        F.element_at(F.array(*[F.lit(v) for v in FREQS]), (n % 20 + 1).cast("int")).alias("MHz"),
        F.concat(F.lit("C"), n).alias("CallSign"),
        grid.alias("Grid"),
        ((u * 3) % 60).cast("int").alias("Power"),
        ((n % 9) - 4).cast("int").alias("Drift"),
        ((n * 37) % 20000).cast("int").alias("distance"),
        (n % 360).cast("int").alias("azimuth"),
        (n % 30).cast("int").alias("Band"),
        F.element_at(
            F.array(F.lit("2.6.1"), F.lit("2.3.0"), F.lit(""), F.lit("1.2a")),
            (n % 4 + 1).cast("int"),
        ).alias("version"),
        (n % 3).cast("int").alias("code"),
    )


# SQL mirror (DuckDB dialect). Kept structurally parallel to
# synth_spots — every arithmetic step matches operation for operation.
SYNTH_SPOTS_SQL = """
SELECT
  1000000 + event_id + (event_id // 17) * 3 AS "Spotnum",
  CAST(floor(floor(epoch(ts)) / 120) * 120 AS BIGINT) AS "Date",
  'R' || CAST(user_id AS VARCHAR) AS "Reporter",
  CASE WHEN event_id % 13 = 0 THEN
    CASE WHEN event_id % 3 = 0
      THEN substr(g6, 1, 1) || chr(CAST(65 + (user_id + 3) % 18 AS INT)) || substr(g6, 3, 1) || chr(CAST(48 + (user_id + 5) % 10 AS INT))
      ELSE substr(g6, 1, 1) || chr(CAST(65 + (user_id + 3) % 18 AS INT)) || substr(g6, 3, 1) || chr(CAST(48 + (user_id + 5) % 10 AS INT)) || substr(g6, 5, 1) || chr(CAST(txbase + (user_id * 11 + 2) % 24 AS INT))
    END
  ELSE
    CASE WHEN user_id % 5 = 0 THEN r4 ELSE r4 || chr(CAST(rxbase + (user_id + event_id * 3) % 24 AS INT)) || chr(CAST(rxbase + (user_id * 11 + 2) % 24 AS INT)) END
  END AS "ReporterGrid",
  CAST((event_id % 51) - 30 AS INT) AS "dB",
  ([0.1375, 0.4742, 1.8366, 3.5701, 5.2872, 5.3654, 7.0386, 10.1402,
    14.0971, 18.1061, 21.0946, 24.9246, 28.1261, 50.2935, 70.0911,
    144.4891, 432.3001, 1296.5001, 0.9999, 99.9999]::DOUBLE[])[CAST(event_id % 20 + 1 AS INT)] AS "MHz",
  'C' || CAST(event_id AS VARCHAR) AS "CallSign",
  CASE WHEN event_id % 3 = 0 THEN substr(g6, 1, 4) ELSE g6 END AS "Grid",
  CAST((user_id * 3) % 60 AS INT) AS "Power",
  CAST((event_id % 9) - 4 AS INT) AS "Drift",
  CAST((event_id * 37) % 20000 AS INT) AS "distance",
  CAST(event_id % 360 AS INT) AS "azimuth",
  CAST(event_id % 30 AS INT) AS "Band",
  (['2.6.1', '2.3.0', '', '1.2a'])[CAST(event_id % 4 + 1 AS INT)] AS "version",
  CAST(event_id % 3 AS INT) AS "code"
FROM (
  SELECT *,
    chr(CAST(65 + event_id % 18 AS INT)) || chr(CAST(65 + user_id % 18 AS INT)) ||
    chr(CAST(48 + event_id % 10 AS INT)) || chr(CAST(48 + user_id % 10 AS INT)) ||
    chr(CAST(txbase + (event_id + user_id) % 24 AS INT)) ||
    chr(CAST(txbase + (event_id * 7 + 3) % 24 AS INT)) AS g6,
    chr(CAST(65 + (user_id + 7) % 18 AS INT)) || chr(CAST(65 + (event_id + 11) % 18 AS INT)) ||
    chr(CAST(48 + (user_id + 1) % 10 AS INT)) || chr(CAST(48 + (event_id + 2) % 10 AS INT)) AS r4
  FROM (
    SELECT *,
      CASE WHEN event_id % 5 = 0 THEN 65 ELSE 97 END AS txbase,
      CASE WHEN user_id % 4 = 0 THEN 65 ELSE 97 END AS rxbase
    FROM events
  )
)
"""
