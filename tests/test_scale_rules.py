"""SQL <-> Python agreement of the corpus-derived scale rules.

Three rules are stated once in SQL and mirrored in Python so the
oracle computes its own parameters from the relation it reads:

- `_SEMDEDUP_K_SQL`  : k = max(8, n // 256)          (flat SemDeDup)
- `_LSH_PLANES_SQL`  : p = max(8, bitlen(ceil(n/64)-1)) (LSH planes)
- `_TWOLEVEL_K_SQL`  : k = max(4, floor(sqrt(n/256)))  (balanced 2lvl)

The judged gates only ever exercise the floors (n <= 2048), so this
suite is what pins the dynamic branch: DuckDB evaluating the exact
SQL text must agree with the Python mirror at every n across the
floor boundaries, power-of-two edges, and perfect squares — the
places an integer/float formulation could diverge.
"""

from __future__ import annotations

import duckdb
import pytest

from wsprnet_scraper_spark.plans.llmops import (
    _LSH_PLANES_SQL,
    _SEMDEDUP_K_SQL,
    _TWOLEVEL_K_SQL,
)

# boundary-heavy n sweep: floors, +/-1 around every power of two and
# perfect square the rules can land on, and a few large corpora
NS = sorted(
    set(
        list(range(1, 70))
        + [n + d for n in (128, 256, 512, 2048, 4096, 65536, 2**20) for d in (-1, 0, 1)]
        + [n * 64 + d for n in (256, 257, 511, 512, 1024) for d in (-1, 0, 1)]
        + [k * k * 256 + d for k in (4, 5, 8, 27, 100) for d in (-1, 0, 1)]
        + [200, 2000, 20000, 200000, 1_000_000, 25_000_000]
    )
)


def _sql_value(expr: str, n: int) -> int:
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings AS SELECT * FROM range(?) t(vec_id)", [n]
    )
    return con.execute("SELECT " + expr).fetchone()[0]


class _FakeCount:
    def __init__(self, n: int) -> None:
        self._n = n

    def count(self) -> int:
        return self._n


@pytest.mark.parametrize(
    "expr",
    [_SEMDEDUP_K_SQL, _LSH_PLANES_SQL, _TWOLEVEL_K_SQL],
    ids=["semdedup_k", "lsh_planes", "twolevel_k"],
)
def test_rule_sql_matches_python(expr):
    from wsprnet_scraper_spark.plans.llmops import (
        _lsh_planes,
        _semdedup_k,
        _twolevel_k,
    )

    mirrors = {
        _SEMDEDUP_K_SQL: lambda n: _semdedup_k(_FakeCount(n)),
        _LSH_PLANES_SQL: lambda n: _lsh_planes(_FakeCount(n)),
        _TWOLEVEL_K_SQL: lambda n: _twolevel_k(_FakeCount(n)),
    }
    py = mirrors[expr]
    for n in NS:
        got_sql = _sql_value(expr, n)
        got_py = py(n)
        assert got_sql == got_py, (n, got_sql, got_py)
        # sanity: every rule is a positive, n-monotone parameter
        assert got_py >= 1
    # monotonicity across the sweep (guards accidental off-by-one
    # reformulations that pass pointwise at the sampled n)
    seq = [py(n) for n in NS]
    assert all(a <= b for a, b in zip(seq, seq[1:]))


def test_twolevel_rule_uses_exact_float_path():
    """floor(sqrt(n/256.0)): the divisor is a power of two, so n/256.0
    is exact for every n < 2^53 and sqrt is correctly rounded — the
    perfect-square edges (k*k*256) must land ON k, not k-1."""
    import math

    for k in (4, 8, 27, 100, 1000):
        n = k * k * 256
        assert math.floor(math.sqrt(n / 256.0)) == k
        assert _sql_value(_TWOLEVEL_K_SQL, n) == max(4, k)
