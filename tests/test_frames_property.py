"""Property test for operators/frames.trailing_frame_sums: on
arbitrary small inputs — including many rows per block, empty blocks,
multiple series, duplicate timestamps — the block-partitioned halo
computation must equal the plain single-window reference EXACTLY
(integer sums, bit-equal), for several frame sizes and block widths
(including widths that force halo rows to span multiple source
blocks)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from wsprnet_scraper_spark.operators.frames import trailing_frame_sums

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),            # series
        st.integers(min_value=0, max_value=400),  # time (us-scale toy)
        st.integers(min_value=-50, max_value=50),  # integer value
    ),
    min_size=1,
    max_size=60,
)


def _reference(rows, k):
    # plain single-window semantics, computed in Python
    out = {}
    by_series = {}
    for tb, (s, t, v) in enumerate(rows):
        by_series.setdefault(s, []).append((t, tb, v))
    for s, items in by_series.items():
        items.sort()
        for i, (t, tb, v) in enumerate(items):
            frame = items[max(0, i - k) : i + 1]
            rn = i + 1
            s1 = sum(vv * (max(0, i - k) + j + 1) for j, (_, _, vv) in enumerate(frame))
            s0 = sum(vv for _, _, vv in frame)
            out[(s, t, tb)] = (rn, s1, s0, len(frame))
    return out


@settings(max_examples=8, deadline=None)
@given(rows=rows_strategy, k=st.sampled_from([1, 3, 19]), block=st.sampled_from([7, 50, 1000]))
def test_halo_frames_equal_single_window(spark, rows, k, block):
    df = spark.createDataFrame(
        [Row(s=s, t=t, tb=i, v=v) for i, (s, t, v) in enumerate(rows)]
    )
    got = {
        (r.s, r.t, r.tb): (r.rn, r.s1, r.s0, r.c)
        for r in trailing_frame_sums(
            df, "s", "t", "tb", "v", k=k, block_us=block
        ).collect()
    }
    ref = _reference(rows, k)
    assert got == ref
