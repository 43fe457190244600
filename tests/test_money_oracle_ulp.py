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
are out of scope. "DECIMAL-typed" is resolved, not keyword-matched
(ADVICE r7 — keying on the literal DECIMAL keyword silently skipped
SUM(vol) where vol was a decimal aliased in a subquery): the test
parquet columns are all double/int (verified mechanically below — if
a regenerated corpus ever ships decimal parquet, the guard fails and
the detector must learn schema lookups), so decimals enter ONLY via
DECIMAL casts in the oracle SQL itself. A summand is therefore
decimal if its text contains a DECIMAL cast or references an alias
whose defining expression is decimal by the same rules (recursively).
An alias whose definition ends in an integer cast (the cents-fold
pattern) is integer regardless of what's inside it.

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


_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"
_INT_CAST_TAIL = r"AS\s+(?:BIGINT|HUGEINT|INTEGER|INT|SMALLINT|TINYINT)\s*\)?\s*$"


def _decimal_parquet_cols() -> set[str]:
    """Column names with a decimal parquet type, read from the actual
    test tables. Currently EMPTY — every money column ships as double
    — which is what lets the detector treat SQL DECIMAL casts as the
    only decimal source. If a regenerated corpus ever ships decimal
    parquet, this starts returning names and the detector picks them
    up automatically."""
    from pathlib import Path

    import pyarrow.parquet as pq
    import pyarrow.types as pt

    cols: set[str] = set()
    base = Path("/root/testdata/sf0.001")
    for f in base.glob("*.parquet"):
        schema = pq.read_schema(f)
        for field in schema:
            if pt.is_decimal(field.type):
                cols.add(field.name.lower())
    return cols


def _alias_definitions(sql: str, ident: str) -> list[str]:
    """Every expression `<expr> AS ident` in `sql`, extracted by
    scanning back from the AS to the nearest top-level comma, open
    paren, or SELECT keyword (paren-balanced)."""
    out = []
    for m in re.finditer(rf"\bAS\s+{re.escape(ident)}\b", sql, re.IGNORECASE):
        depth = 0
        start = 0
        j = m.start() - 1
        while j >= 0:
            c = sql[j]
            if c == ")":
                depth += 1
            elif c == "(":
                if depth == 0:
                    start = j + 1
                    break
                depth -= 1
            elif c == "," and depth == 0:
                start = j + 1
                break
            j -= 1
        expr = sql[start : m.start()].strip()
        # strip a leading SELECT/trailing keywords from clause starts
        expr = re.sub(r"^(SELECT|DISTINCT)\s+", "", expr, flags=re.IGNORECASE)
        if expr:
            out.append(expr)
    return out


def _is_decimal_expr(
    expr: str, sql: str, decimal_cols: set[str], depth: int = 0
) -> bool:
    """True if `expr` is decimal-typed: contains a DECIMAL cast,
    references a decimal parquet column, or references an alias whose
    definition is decimal (recursive, bounded). An expression ending
    in an integer cast is integer regardless of its insides."""
    if depth > 3:
        return False
    if re.search(_INT_CAST_TAIL, expr.rstrip(), re.IGNORECASE):
        return False
    if "DECIMAL" in expr.upper():
        return True
    seen = set()
    for ident in re.findall(_IDENT, expr):
        il = ident.lower()
        if il in seen:
            continue
        seen.add(il)
        if il in decimal_cols:
            return True
        if il in {"sum", "cast", "as", "case", "when", "then", "else",
                  "end", "and", "or", "not", "min", "max", "avg",
                  "count", "double", "varchar", "bigint", "filter",
                  "where", "over", "partition", "by", "order"}:
            continue
        for definition in _alias_definitions(sql, ident):
            # skip self-referential finds (the alias use site itself)
            if re.fullmatch(rf"\s*{re.escape(ident)}\s*", definition):
                continue
            if _is_decimal_expr(definition, sql, decimal_cols, depth + 1):
                return True
    return False


def test_no_unhopped_decimal_sum_to_double():
    from wsprnet_scraper_spark.plans import ORACLE as ORACLES

    decimal_cols = _decimal_parquet_cols()
    offenders = []
    for name, sql in ORACLES.items():
        if sql is None:
            continue
        for body in _cast_spans(sql):
            tail = body.rstrip()
            if not re.search(r"AS\s+DOUBLE\s*$", tail, re.IGNORECASE):
                continue
            inner = re.sub(r"AS\s+DOUBLE\s*$", "", tail, flags=re.IGNORECASE)
            sums = re.search(r"\bSUM\s*\(", inner, re.IGNORECASE)
            if not sums:
                continue
            if re.search(r"AS\s+VARCHAR", inner, re.IGNORECASE):
                continue  # hopped
            if not _is_decimal_expr(inner, sql, decimal_cols):
                continue  # integer-valued sum: exact, documented above
            offenders.append((name, inner[:90].replace("\n", " ")))
    assert not offenders, (
        "decimal SUM cast straight to DOUBLE in oracle SQL — apply the "
        f"VARCHAR hop (see module docstring): {offenders}"
    )
