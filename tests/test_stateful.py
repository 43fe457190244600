"""applyInPandasWithState: per-key gap state carried across micro-batches."""

from __future__ import annotations

import json


def test_track_sequences_across_batches(spark, tmp_path):
    from pyspark.sql.types import StringType, StructField, StructType

    from wsprnet_scraper_spark.streaming.stateful import track_sequences

    landing = tmp_path / "landing"
    landing.mkdir()
    schema = StructType(
        [StructField("key", StringType()), StructField("id", StringType())]
    )

    def land(name, rows):
        (landing / name).write_text(
            "\n".join(json.dumps({"key": k, "id": str(i)}) for k, i in rows) + "\n"
        )

    def run_available(tag):
        # foreachBatch (not the memory sink): it supports restarting
        # from an existing checkpoint, which is the point of the test
        collected = []

        def collect(batch_df, batch_id):
            collected.extend(r.asDict() for r in batch_df.collect())

        stream = spark.readStream.schema(schema).json(str(landing))
        q = (
            track_sequences(stream, "key", "id")
            .writeStream.foreachBatch(collect)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r["key"]: r for r in collected}

    # batch 1: A gets 1..3 contiguous; B gets 10, 14 (gap of 3)
    land("b1.json", [("A", 1), ("A", 2), ("A", 3), ("B", 10), ("B", 14)])
    out = run_available("t1")
    assert out["A"]["total_gaps"] == 0 and out["A"]["last_id"] == 3
    assert out["B"]["total_gaps"] == 1 and out["B"]["total_missing"] == 3

    # batch 2 (same checkpoint -> state carries): A jumps to 7 (gap 3),
    # B continues contiguously at 15
    land("b2.json", [("A", 7), ("B", 15)])
    out = run_available("t2")
    assert out["A"]["total_gaps"] == 1 and out["A"]["total_missing"] == 3
    assert out["A"]["last_id"] == 7
    assert out["B"]["total_gaps"] == 1 and out["B"]["last_id"] == 15
