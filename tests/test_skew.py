"""salted_join must equal the plain join, with the big side scattered."""

from __future__ import annotations

from pyspark.sql import functions as F

from wsprnet_scraper_spark.operators.skew import salted_join


def _skewed_frames(spark):
    # 90% of big rows share one hot key
    big = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("dim"), F.col("id")).alias("name")
    )
    return big, small


def test_salted_inner_equals_plain(spark):
    big, small = _skewed_frames(spark)
    plain = big.join(small, "k").select("k", "payload", "name")
    salted = salted_join(big, small, "k", salt=8).select("k", "payload", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_keeps_unmatched(spark):
    big, small = _skewed_frames(spark)
    small_missing_hot = small.filter(F.col("k") != 7)  # hot key unmatched
    plain = big.join(small_missing_hot, "k", "left").select("k", "payload", "name")
    salted = salted_join(big, small_missing_hot, "k", salt=8, how="left").select(
        "k", "payload", "name"
    )
    assert sorted(map(tuple, plain.collect(), )) == sorted(map(tuple, salted.collect()))


def test_salt_actually_scatters(spark):
    big, small = _skewed_frames(spark)
    salted = salted_join(big, small, "k", salt=8)
    # peek pre-drop: recompute the scatter and count distinct buckets
    scattered = big.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(8))
    ).filter(F.col("k") == 7)
    assert scattered.select("_salt").distinct().count() == 8
    assert salted.filter(F.col("k") == 7).count() == big.filter(F.col("k") == 7).count()