"""CSV scan semantics: arity filter (genfromtxt loose mode) and
JSON/CSV path equivalence (SURVEY §2.1 src_csv, §2.2 flt_malformed)."""

from __future__ import annotations

from wsprnet_scraper_spark import pipeline


def test_parse_csv_drops_malformed(spark, tmp_path):
    good = "2023-11-14:22:00,101,1700000000,R1,EN50wc,-10,14.0971,C1,JO62qm,37,0,100,45,20,2.6.1,1"
    short = "2023-11-14:22:00,102,1700000000,R1"  # wrong arity -> dropped
    long_ = good.replace(",101,", ",103,") + ",EXTRA"  # 17 cols -> dropped
    p = tmp_path / "stage.csv"
    p.write_text("\n".join([good, short, long_]) + "\n")
    df = pipeline.parse_csv(spark, str(p))
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["Spotnum"] == 101 and r["MHz"] == 14.0971 and r["dB"] == -10


def test_csv_and_json_paths_agree(spark, tmp_path):
    jdf = pipeline.parse_json(spark, "/root/repo/tests/golden/spots_input.json")
    # render the parsed JSON back to stage CSV and re-parse it
    wire = jdf.na.fill("").selectExpr(
        "concat_ws(',', wd_time, Spotnum, Date, Reporter, ReporterGrid, dB, "
        "MHz, CallSign, Grid, Power, Drift, distance, azimuth, Band, version, code) AS line"
    )
    p = str(tmp_path / "roundtrip")
    wire.coalesce(1).write.mode("overwrite").text(p)
    cdf = pipeline.parse_csv(spark, p)
    assert cdf.count() == jdf.count()
    j = {r["Spotnum"]: r for r in jdf.collect()}
    for r in cdf.collect():
        want = j[r["Spotnum"]]
        assert r["Grid"] == want["Grid"]
        assert r["dB"] == want["dB"]
        assert abs(r["MHz"] - want["MHz"]) < 1e-12
