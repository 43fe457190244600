"""Property tests for the deterministic sampling/hashing primitives:
the engine's md5-derived decisions must match an independent Python
reimplementation on arbitrary inputs (no Spark-side hashing quirk),
and the weighted sampler must keep exactly the rows its contract
names."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import Row
from pyspark.sql import functions as F

from wsprnet_scraper_spark.operators.dedup import weighted_sample


def _u16(ident: int) -> int:
    return int(hashlib.md5(str(ident).encode()).hexdigest()[:4], 16)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**12),
            st.integers(min_value=1, max_value=10**6),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    )
)
def test_weighted_sample_matches_reference_decision(spark, rows):
    df = spark.createDataFrame(
        [Row(doc_id=i, w=w) for i, w in rows], "doc_id long, w long"
    )
    kept = {r["doc_id"] for r in weighted_sample(df, "doc_id", "w").collect()}
    wmax = max(w for _, w in rows)
    expected = {i for i, w in rows if _u16(i) * wmax < w * 65536}
    assert kept == expected
