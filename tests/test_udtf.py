"""Python UDTF surface (SURVEY §2.10): props JSON -> (key, value) rows."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_props_udtf(spark):
    from wsprnet_scraper_spark.operators.udf_variants import make_props_udtf

    PropsExplode = make_props_udtf()
    spark.udtf.register("props_explode", PropsExplode)
    df = spark.createDataFrame(
        [('{"b": 2, "a": 1}',), ("not json",), (None,)], ["props"]
    )
    df.createOrReplaceTempView("p")
    out = spark.sql(
        "SELECT t.key, t.value FROM p, LATERAL props_explode(props) t"
    ).collect()
    assert [(r.key, r.value) for r in out] == [("a", 1), ("b", 2)]

    # and the JVM-native equivalent agrees on valid JSON
    native = (
        df.filter(F.col("props").startswith("{"))
        .select(F.explode(F.from_json("props", "map<string,int>")))
        .collect()
    )
    assert sorted((r.key, r.value) for r in native) == [("a", 1), ("b", 2)]
