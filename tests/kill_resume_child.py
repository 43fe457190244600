"""Child process for tests/test_kill_resume.py.

Three modes, one per invocation (each in a FRESH JVM so no session
state survives the kill — the driver_parity_child pattern):

  land   — synthesize spots, land them as MANY small NDJSON files,
           print the expected Spotnum statistics.
  victim — run the ingest query (maxFilesPerTrigger=1 → one landed
           file per micro-batch) with a slow mirror sink (0.4 s/batch)
           so the parent has a wide window to SIGKILL the whole
           process group MID-BATCH. The mirror runs AFTER the parquet
           sink write and BEFORE the checkpoint commit, so a kill in
           that window leaves a sunk-but-uncommitted batch — the
           exact failure the reference survives by holding its cursor
           (wsprnet-scraper.sh:341: WSPRNET_LAST_SPOTNUM advances
           only on the success path, so a crashed batch is re-fetched
           and the Spotnum PK absorbs the replay).
  resume — restart the SAME query from the SAME checkpoint, drain
           with availableNow, then print the sink's Spotnum stats.

The parent asserts: rows == distinct Spotnums (no duplicates from the
replayed batch) and the distinct set equals the landed set exactly
(no loss) — at-least-once delivery + idempotent sink = effective
exactly-once across a JVM kill.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _session(name: str):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName(name)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    entry_mod._tune(spark)
    return spark


def main() -> None:
    mode = sys.argv[1]
    work = os.environ["KR_WORK"]
    sf_dir = os.environ.get("KR_SF", "/root/testdata/sf0.001")
    landing, sink, ckpt = f"{work}/landing", f"{work}/sink", f"{work}/ckpt"

    from pyspark.sql import functions as F

    spark = _session(f"kill_resume_{mode}")

    if mode == "land":
        from wsprnet_scraper_spark.plans.synth import synth_spots

        spots = synth_spots(spark, sf_dir)
        spots.repartition(24).write.mode("overwrite").json(landing)
        stats = spots.agg(
            F.countDistinct("Spotnum").alias("n_distinct"),
            F.sum(F.col("Spotnum").cast("long")).alias("sum_ids"),
        ).first()
        print(
            "LAND "
            + json.dumps(
                {"n_distinct": stats["n_distinct"], "sum_ids": int(stats["sum_ids"])}
            ),
            flush=True,
        )
    elif mode == "victim":
        from wsprnet_scraper_spark.streaming import start_ingest

        q = start_ingest(
            spark,
            landing,
            sink,
            ckpt,
            available_now=True,
            max_files_per_trigger=1,
            mirror_fn=lambda df, bid: time.sleep(0.4),
        )
        print("VICTIM_STARTED", flush=True)
        q.awaitTermination()
        print("VICTIM_FINISHED", flush=True)
    elif mode == "resume":
        from wsprnet_scraper_spark.streaming import start_ingest

        q = start_ingest(spark, landing, sink, ckpt, available_now=True)
        q.awaitTermination()
        got = spark.read.parquet(sink).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("Spotnum").alias("n_distinct"),
            F.sum(F.col("Spotnum").cast("long")).alias("sum_ids"),
        ).first()
        print(
            "RESUME "
            + json.dumps(
                {
                    "n_rows": got["n_rows"],
                    "n_distinct": got["n_distinct"],
                    "sum_ids": int(got["sum_ids"]),
                }
            ),
            flush=True,
        )
    else:  # pragma: no cover
        raise SystemExit(f"unknown mode {mode}")

    spark.stop()


if __name__ == "__main__":
    main()
