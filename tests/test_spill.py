"""plans/spill.py path handling (no Spark session needed)."""

import os

from biblib_spark.plans import spill


def test_base_dir_takes_first_of_comma_list(monkeypatch, tmp_path):
    """SPARK_LOCAL_DIRS may be a comma list (Spark round-robins block dirs);
    the parquet spill must use ONE of them, not a literal comma path."""
    a = tmp_path / "shm"
    b = tmp_path / "disk"
    monkeypatch.setenv("SPARK_LOCAL_DIRS", f"{a},{b}")
    base = spill._base_dir()
    assert base == str(a / "spill")
    assert os.path.isdir(base)
    assert "," not in base


def test_base_dir_single_value(monkeypatch, tmp_path):
    monkeypatch.setenv("SPARK_LOCAL_DIRS", str(tmp_path))
    assert spill._base_dir() == str(tmp_path / "spill")


def test_cleanup_all_removes_registered(monkeypatch, tmp_path):
    monkeypatch.setenv("SPARK_LOCAL_DIRS", str(tmp_path))
    p = os.path.join(spill._base_dir(), "x")
    os.makedirs(p)
    spill._LIVE.add(p)
    spill.cleanup_all()
    assert not os.path.exists(p)
    assert p not in spill._LIVE


def test_sweep_drops_stale_keeps_fresh_and_live(monkeypatch, tmp_path):
    """A crashed process never runs atexit, so orphan spill dirs outlive it
    on the tmpfs local dir; the next process's first spill sweeps orphans
    older than the stale threshold but must not touch fresh dirs (possibly
    a concurrent session's) or this process's own registered spills."""
    import time

    monkeypatch.setenv("SPARK_LOCAL_DIRS", str(tmp_path))
    base = spill._base_dir()
    stale = os.path.join(base, "dedup-features-stale")
    fresh = os.path.join(base, "dedup-features-fresh")
    live_old = os.path.join(base, "dedup-features-live")
    for p in (stale, fresh, live_old):
        os.makedirs(p)
    old = time.time() - 3 * 3600
    os.utime(stale, (old, old))
    os.utime(live_old, (old, old))
    spill._LIVE.add(live_old)
    monkeypatch.setattr(spill, "_SWEPT", False)
    spill._base_dir()
    assert not os.path.exists(stale)
    assert os.path.exists(fresh)
    assert os.path.exists(live_old)
    spill._LIVE.discard(live_old)
