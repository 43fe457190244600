"""transformWithStateInPandas ledger tests.

The streaming e2e runs only where google.protobuf exists (the
JVM↔Python state-server protocol needs it; absent in this container),
so the processor's accounting logic is also unit-tested directly
against a fake state handle — same split as the JDBC/Pillow gates.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from wsprnet_scraper_spark.sources import load_events
from wsprnet_scraper_spark.streaming.stateful_v2 import (
    UserLedgerProcessor,
    _protobuf_available,
    user_ledger,
)

SF = "/root/testdata/sf0.001"


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeHandle:
    def __init__(self):
        self.state = _FakeValueState()

    def getValueState(self, name, schema):
        return self.state


def test_processor_accumulates_exact_cents_across_batches():
    p = UserLedgerProcessor()
    p.init(_FakeHandle())
    # binary-exact values: quantization has no representation slack
    b1 = pd.DataFrame({"value": [1.25, 2.5, 3.0]})  # 125+250+300
    out1 = list(p.handleInputRows((7,), iter([b1]), None))[0]
    assert out1.iloc[0].to_dict() == {
        "user_id": 7,
        "n_events": 3,
        "total_cents": 675,
    }
    b2 = pd.DataFrame({"value": [0.25]})
    out2 = list(p.handleInputRows((7,), iter([b2]), None))[0]
    assert out2.iloc[0].to_dict() == {
        "user_id": 7,
        "n_events": 4,
        "total_cents": 700,
    }


def test_gate_raises_without_protobuf(spark):
    if _protobuf_available():
        pytest.skip("protobuf present — gate inactive")
    ev = load_events(spark, SF).select("user_id", "value")
    with pytest.raises(NotImplementedError, match="protobuf"):
        user_ledger(ev)


@pytest.mark.skipif(
    not _protobuf_available(), reason="google.protobuf not installed"
)
def test_ledger_streaming_e2e(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        ev = load_events(spark, SF).select("user_id", "value", "event_id")
        half_a = ev.filter(F.col("event_id") % 2 == 0)
        half_b = ev.filter(F.col("event_id") % 2 == 1)
        with tempfile.TemporaryDirectory() as d:
            src, ckpt = f"{d}/src", f"{d}/ckpt"
            os.makedirs(src)
            latest = {}

            def drain():
                schema = spark.read.parquet(src).schema
                stream = spark.readStream.schema(schema).parquet(f"{src}/*")
                q = (
                    user_ledger(stream)
                    .writeStream.foreachBatch(
                        lambda b, _i: latest.update(
                            {
                                int(r.user_id): (
                                    int(r.n_events),
                                    int(r.total_cents),
                                )
                                for r in b.collect()
                            }
                        )
                    )
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()

            def expected(pdf):
                c = pdf.assign(
                    c=(pdf["value"] * 100).round().astype("int64")
                ).groupby("user_id")
                return {
                    int(u): (int(n), int(c["c"].sum()[u]))
                    for u, n in c.size().items()
                }

            half_a.select("user_id", "value").coalesce(1).write.mode(
                "append"
            ).parquet(src)
            drain()
            assert latest == expected(
                half_a.select("user_id", "value").toPandas()
            )
            half_b.select("user_id", "value").coalesce(1).write.mode(
                "append"
            ).parquet(src)
            drain()
            assert latest == expected(
                ev.select("user_id", "value").toPandas()
            )
    finally:
        spark.conf.unset(key)


def test_ingest_observe_metrics_surface_in_progress(spark):
    """The observe() node on the ingest stream must report per-batch
    rows and the spot-id span through StreamingQueryProgress."""
    import json
    import tempfile

    from wsprnet_scraper_spark.plans.synth import synth_spots
    from wsprnet_scraper_spark.streaming.ingest import start_ingest

    spots = synth_spots(spark, SF)
    with tempfile.TemporaryDirectory() as d:
        landing, sink, ckpt = f"{d}/land", f"{d}/sink", f"{d}/ckpt"
        spots.coalesce(2).write.mode("append").json(landing)
        q = start_ingest(spark, landing, sink, ckpt, available_now=True)
        q.awaitTermination()
        n = spots.count()
        metrics = None
        for p in q.recentProgress:
            om = (p if isinstance(p, dict) else json.loads(p.json)).get(
                "observedMetrics", {}
            )
            if "ingest" in om:
                metrics = om["ingest"]
        assert metrics is not None, "no observed metrics in progress"
        assert metrics["rows"] == n
        assert metrics["min_spotnum"] <= metrics["max_spotnum"]
