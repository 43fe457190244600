"""Persistent edge store (VERDICT r8 #5): with SPARK_GRAFT_EDGE_STORE
set, the graph family's write-once edge parquet is keyed by corpus
fingerprint and survives clear_edge_cache / session handle drops — a
fresh session reopens the standing parquet instead of re-paying the
derivation join (37.9 s at the 100x probe). Default behavior
(per-application scratch, deleted on clear) is pinned too.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from wsprnet_scraper_spark.plans import graph_q


@pytest.fixture(autouse=True)
def _isolate_edge_cache():
    graph_q.clear_edge_cache()
    yield
    graph_q.clear_edge_cache()


def _raise_build():
    raise AssertionError("edge relation was rebuilt instead of reused")


def test_store_backed_edges_survive_clear_and_skip_rebuild(
    spark, tmp_path, monkeypatch
):
    monkeypatch.setenv("SPARK_GRAFT_EDGE_STORE", str(tmp_path))
    n1 = graph_q._directed_edges(spark, SF_SMOKE).count()
    stored = [d for d in tmp_path.iterdir() if d.is_dir()]
    assert len(stored) == 1 and (stored[0] / "_SUCCESS").is_file()

    # clear drops the handles but keeps the store files
    graph_q.clear_edge_cache()
    assert (stored[0] / "_SUCCESS").is_file()

    # a fresh handle must REUSE the standing parquet, never rebuild
    df = graph_q._materialized_edges(
        spark, SF_SMOKE, "full_directed", _raise_build
    )
    assert df.count() == n1


def test_default_scratch_is_deleted_on_clear(spark):
    import os

    assert not os.environ.get("SPARK_GRAFT_EDGE_STORE")
    graph_q._directed_edges(spark, SF_SMOKE).count()
    app = spark.sparkContext.applicationId
    paths = [p for _df, p, persistent in graph_q._EDGE_CACHE[app].values()]
    assert paths
    graph_q.clear_edge_cache()
    assert all(not os.path.isdir(p) for p in paths)


def test_fingerprint_tracks_corpus_changes(tmp_path):
    import shutil
    from pathlib import Path

    src = Path(SF_SMOKE)
    for t in ("orders", "lineitem"):
        p = src / f"{t}.parquet"
        if p.is_dir():
            shutil.copytree(p, tmp_path / p.name)
        else:
            shutil.copy2(p, tmp_path / p.name)
    fp1 = graph_q._corpus_fingerprint(str(tmp_path))
    assert fp1 != graph_q._corpus_fingerprint(SF_SMOKE)  # path-salted
    # touching a data file must change the fingerprint (staleness key)
    f = tmp_path / "orders.parquet"
    if f.is_dir():
        f = next(f.rglob("*.parquet"))
    import os

    st = f.stat()
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    assert graph_q._corpus_fingerprint(str(tmp_path)) != fp1
