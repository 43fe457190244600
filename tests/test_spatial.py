"""geo_neighbor_join ≡ the naive theta join (box + radius), with
points straddling cell boundaries to exercise the 3x3 neighborhood
explode and the emit-once-by-home-cell rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from wsprnet_scraper_spark.operators.spatial import geo_neighbor_join, haversine_km


def test_matches_naive_theta_join(spark):
    import random

    rng = random.Random(42)
    rows = []
    for i in range(150):
        # clustered: half the points land in a few 6x6-degree hot
        # zones (guaranteed near pairs, many straddling cell
        # boundaries), half scatter globally (non-matches)
        if i % 2 == 0:
            zone = i % 6
            lat = -60 + zone * 21 + rng.uniform(0.0, 6.0)
            lon = -150 + zone * 50 + rng.uniform(0.0, 6.0)
        else:
            lat = rng.uniform(-80.0, 80.0)
            lon = rng.uniform(-175.0, 175.0)
        rows.append((i, float(lat), float(lon)))
    pts = spark.createDataFrame(rows, "sid long, lat double, lon double")

    got = sorted(
        (r.a_id, r.b_id, round(r.dist_km, 9))
        for r in geo_neighbor_join(
            pts, "sid", "lat", "lon", cell_deg=3.0, radius_km=400.0
        ).collect()
    )

    a = pts.select(
        F.col("sid").alias("a_id"), F.col("lat").alias("a_lat"), F.col("lon").alias("a_lon")
    )
    b = pts.select(
        F.col("sid").alias("b_id"), F.col("lat").alias("b_lat"), F.col("lon").alias("b_lon")
    )
    d = haversine_km(F.col("a_lat"), F.col("a_lon"), F.col("b_lat"), F.col("b_lon"))
    want = sorted(
        (r.a_id, r.b_id, round(r.dist_km, 9))
        for r in a.join(
            b,
            (F.col("a_id") < F.col("b_id"))
            & (F.abs(F.col("a_lat") - F.col("b_lat")) <= 3.0)
            & (F.abs(F.col("a_lon") - F.col("b_lon")) <= 3.0),
        )
        .select("a_id", "b_id", d.alias("dist_km"))
        .filter(F.col("dist_km") <= 400.0)
        .collect()
    )
    assert got == want and len(got) > 10
    # emit-once: no duplicate pairs despite 9-cell replication
    assert len({(g[0], g[1]) for g in got}) == len(got)
