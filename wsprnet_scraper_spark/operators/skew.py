"""Skew-mitigation joins: explicit salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew
at runtime, but it only applies to sort-merge/shuffled-hash joins and
only after a stage materializes skewed partitions. Explicit salting
is the plan-level tool for the pathological case — a handful of keys
carrying a large share of the rows (the classic power-law join in
corpus pipelines: domain, language, near-empty-doc fingerprints).

`salted_join` replicates the SMALL side `salt` times and scatters the
BIG side's rows uniformly across the salt space, so the hot key's
rows land on `salt` reducers instead of one. Results are exactly
equal to the unsalted join (inner/left): every big-side row still
meets its one matching small-side row, in whichever salted partition
it landed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join skew-safe on `on`: big side salted uniformly, small side
    replicated across all `salt` buckets. Supports inner and left
    (the replicated side must be the lookup side).

    At 100 TB this is the difference between one straggler reducer
    holding the hot key's entire partition and `salt` reducers
    sharing it; cost is a `salt`-fold blowup of the SMALL side only.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side is replicated)")
    salt_col = "_salt"
    # deterministic scatter: hash of the whole row modulo salt; using
    # a row hash (not rand()) keeps the operator retry/replay-safe in
    # streaming foreachBatch and reproducible across runs
    big_s = big.withColumn(
        salt_col, F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    small_s = small.withColumn(
        salt_col, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return big_s.join(small_s, on=[on, salt_col], how=how).drop(salt_col)
