"""Bucketed co-located join: pre-partitioned tables join with NO
exchange on either side — the cluster pattern for repeated big-big
joins (SURVEY §2.3 scale notes; at 100 TB the bucketed layout is what
turns every lineitem⋈orders from a double shuffle into a local join).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark):
    # warehouse.dir is a static conf — bucketed tables land in the
    # session's default warehouse; dropped (purged) after the module
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    for df, key, name in [(li, "l_orderkey", "li_b"), (o, "o_orderkey", "o_b")]:
        df.write.mode("overwrite").bucketBy(8, key).sortBy(key).saveAsTable(name)
    yield spark
    for name in ("li_b", "o_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name} PURGE")


def test_bucketed_join_no_exchange(bucketed):
    spark = bucketed
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("li_b")
            .join(spark.table("o_b"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        # join inputs are bucket-co-located: the only exchange allowed
        # is the one for the final groupBy
        n_exchange = len(re.findall(r"Exchange hashpartitioning", plan))
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert n_exchange <= 1, plan
        assert j.count() > 0
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024)
        )


def test_bucketed_matches_plain(bucketed):
    spark = bucketed
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    plain = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    b = (
        spark.table("li_b")
        .join(spark.table("o_b"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, b.collect()))


def test_judged_bucketed_join_no_exchange(spark):
    """The judged query (plans/interop.join_bucketed_colocated) must
    run the no-exchange plan, not just any correct plan."""
    from wsprnet_scraper_spark.plans import QUERIES

    j = QUERIES["join_bucketed_colocated"](spark, "/root/testdata/sf0.001")
    plan = j._jdf.queryExecution().executedPlan().toString()
    n_exchange = len(re.findall(r"Exchange hashpartitioning", plan))
    assert "SortMergeJoin" in plan, plan
    # the single permitted exchange feeds the final groupBy; the join
    # inputs themselves are bucket-co-located
    assert n_exchange <= 1, plan
    assert j.count() > 0
