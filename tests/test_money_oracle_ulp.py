"""The money-sum ulp hazard, enforced mechanically (r5 finding, r7
sweep): DuckDB's direct DECIMAL -> DOUBLE cast converts the unscaled
int128 to double and THEN divides by 10^scale — double-rounded once
the scaled units exceed 2^53 — while Spark's BigDecimal.doubleValue
is correctly rounded. A DECIMAL-typed SUM in an oracle that reaches
DOUBLE must therefore take the VARCHAR hop
(CAST(CAST(SUM(...) AS VARCHAR) AS DOUBLE)): bit-identical to the
direct cast below 2^53 (both are single correctly-rounded
conversions there), correct at any magnitude above it. The hazard
was caught live at the 100x differential (Q1 sum_charge off by
exactly 1 ulp on a 60M-row lineitem, SCALE.md round-5 section).

This test scans every REGISTERED oracle's SQL for CAST(...AS DOUBLE)
spans whose body contains a SUM over something DECIMAL-typed and no
VARCHAR hop. Integer-valued sums (counts, quantized vq components,
epoch seconds) are exact in double far past any probe magnitude and
are out of scope — the detector keys on DECIMAL in the summand.

Magnitude documentation for the exempt classes:
- SUM of 0/1 CASE counts, COUNT(*): exact to 2^53 rows.
- SUM(vq[i]) quantized embeddings: |component| <= 1000 * 1000
  (floor(x*1000), |x| <= ~1e3), so |sum| < 2^53 until ~9e9 rows
  per cell — five orders past the 100x probe.
- CAST(SUM(decimal) * 100 AS BIGINT) cents folds: int128 -> int64,
  exact (no double), overflow at 9.2e16 cents.
"""

from __future__ import annotations

import re


def _cast_spans(sql: str):
    """Yield the body of every CAST(...) span in `sql`."""
    for m in re.finditer(r"CAST\s*\(", sql, re.IGNORECASE):
        depth = 0
        i = m.end() - 1
        for j in range(i, len(sql)):
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
                if depth == 0:
                    yield sql[m.end() : j]
                    break


def test_no_unhopped_decimal_sum_to_double():
    from wsprnet_scraper_spark.plans import ORACLE as ORACLES

    offenders = []
    for name, sql in ORACLES.items():
        if sql is None:
            continue
        for body in _cast_spans(sql):
            tail = body.rstrip()
            if not re.search(r"AS\s+DOUBLE\s*$", tail, re.IGNORECASE):
                continue
            inner = re.sub(r"AS\s+DOUBLE\s*$", "", tail, flags=re.IGNORECASE)
            if not re.search(r"\bSUM\s*\(", inner, re.IGNORECASE):
                continue
            if re.search(r"AS\s+VARCHAR", inner, re.IGNORECASE):
                continue  # hopped
            if "DECIMAL" not in inner.upper():
                continue  # integer-valued sum: exact, documented above
            offenders.append((name, inner[:90].replace("\n", " ")))
    assert not offenders, (
        "decimal SUM cast straight to DOUBLE in oracle SQL — apply the "
        f"VARCHAR hop (see module docstring): {offenders}"
    )
