"""CDC stream materialization: replay idempotence + batch/stream parity.

strm_cdc_apply's crash contract: if the driver dies between the
state_v{i} write and the checkpoint commit, Structured Streaming
replays batch i on restart. Because the merge reads the latest
COMMITTED state version BELOW its own batch id (disk discovery, not
driver memory), the replay re-merges the same input onto the same
prior state and rewrites the same state_v{i} — byte-for-byte the
rows a single clean run produces. This suite drives the exact
production merge (`_cdc_merge_batch`) outside a stream to pin that,
plus tombstone retention and final parity with the batch operator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wsprnet_scraper_spark.plans.interop import (
    _cdc_generations,
    _cdc_merge_batch,
    _cdc_state_versions,
    snk_cdc_apply,
)

SF = "/root/testdata/sf0.001"

_SCHEMA = "k long, status string, price decimal(14,2), seq int, op string"


def _gens(spark):
    # the landing schema the stream reads (price narrowed to 14,2)
    return [
        g.select(
            "k",
            "status",
            F.col("price").cast("decimal(14,2)").alias("price"),
            F.col("seq").cast("int").alias("seq"),
            "op",
        )
        for g in _cdc_generations(spark, SF)
    ]


def _rows(spark, path):
    return sorted(
        (r["k"], r["status"], r["price"], r["seq"], r["op"])
        for r in spark.read.parquet(path).collect()
    )


def test_replayed_batch_rewrites_identical_state(spark, tmp_path):
    work = str(tmp_path / "cdc")
    g = _gens(spark)
    _cdc_merge_batch(spark, work, g[0], 0)
    _cdc_merge_batch(spark, work, g[1], 1)
    first = _rows(spark, f"{work}/state_v1")

    # crash-replay of batch 1: state_v1 exists (written, uncommitted);
    # the merge must pick state_v0 as prior and rewrite v1 identically
    assert _cdc_state_versions(work, below=1) == [0]
    _cdc_merge_batch(spark, work, g[1], 1)
    assert _rows(spark, f"{work}/state_v1") == first


def test_tombstones_survive_in_state_until_serving(spark, tmp_path):
    work = str(tmp_path / "cdc")
    for i, g in enumerate(_gens(spark)):
        _cdc_merge_batch(spark, work, g, i)
    state = spark.read.parquet(f"{work}/state_v2")
    n_tomb = state.filter(F.col("op") == "D").count()
    assert n_tomb > 0  # deletes retained in state …
    served = state.filter(F.col("op") != "D")
    assert served.filter(F.col("op") == "D").count() == 0  # … filtered at read


def test_progressive_merge_equals_batch_operator(spark, tmp_path):
    work = str(tmp_path / "cdc")
    for i, g in enumerate(_gens(spark)):
        _cdc_merge_batch(spark, work, g, i)
    got = sorted(
        (r["o_orderkey"], r["status"], r["price"])
        for r in spark.read.parquet(f"{work}/state_v2")
        .filter(F.col("op") != "D")
        .select(
            F.col("k").alias("o_orderkey"),
            "status",
            F.col("price").cast("double").alias("price"),
        )
        .collect()
    )
    want = sorted(
        (r["o_orderkey"], r["status"], r["price"])
        for r in snk_cdc_apply(spark, SF).collect()
    )
    assert got == want
