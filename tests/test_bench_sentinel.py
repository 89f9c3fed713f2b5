"""Contention-sentinel floor resolution (bench.py).

VERDICT r9 "what's wrong" #2 + next-step #5: floors pinned to the r8
idle archive go stale as per-round perf work lands — a sentinel
calibrated against a slower past masks slow creep. Floors now
self-calibrate from the NEWEST uncontended sf0.1 archive at stamp
time, gated on a host fingerprint (ADVICE r9: on any other machine
the pinned floors would burn 3 retries and stamp contended:true on
genuinely idle runs), with an env-override escape hatch.
"""

from __future__ import annotations

import json
import os
import time

import pytest

import bench


SENTINEL_QS = sorted(bench.SENTINEL_FLOOR_FALLBACK)
CAL_HOST = bench.SENTINEL_CALIBRATION_HOST


def _archive(tmp_path, name, *, sf=0.1, contended=False, host=None,
             queries=None, mtime=None):
    data = {
        "sf": sf,
        "contention": {"contended": contended},
        "queries": queries
        or {q: 0.1 + i * 0.01 for i, q in enumerate(SENTINEL_QS)},
    }
    if host is not None:
        data["host"] = host
    path = tmp_path / name
    path.write_text(json.dumps(data))
    if mtime is not None:
        os.utime(path, (mtime, mtime))
    return data


def test_median_of_newest_uncontended_archives_wins(tmp_path):
    """r11: floors are the per-query lower-median of the <=3 newest
    uncontended archives — one slow-but-uncontended run can no longer
    drag the floor down (masking creep), one lucky-fast run can no
    longer ratchet it up (flagging every normal run)."""
    now = time.time()
    _archive(tmp_path, "ancient.json", mtime=now - 900,
             queries={q: 0.5 for q in SENTINEL_QS})  # outside newest-3
    _archive(tmp_path, "slowish.json", mtime=now - 300,
             queries={q: 0.30 for q in SENTINEL_QS})
    _archive(tmp_path, "lucky.json", mtime=now - 100,
             queries={q: 0.10 for q in SENTINEL_QS})
    _archive(tmp_path, "new.json", mtime=now - 10,
             queries={q: 0.20 for q in SENTINEL_QS})
    floors, src = bench._sentinel_floors(CAL_HOST, str(tmp_path))
    assert src.startswith("median-of-3:[")
    assert "ancient.json" not in src
    # median of {0.30, 0.10, 0.20} = 0.20: neither the lucky 0.10 nor
    # the slow 0.30 becomes the floor
    assert floors == {q: 0.20 for q in SENTINEL_QS}


def test_contended_wrong_sf_and_incomplete_archives_skipped(tmp_path):
    now = time.time()
    _archive(tmp_path, "contended.json", contended=True, mtime=now)
    _archive(tmp_path, "sf001.json", sf=0.01, mtime=now)
    incomplete = _archive(tmp_path, "incomplete.json", mtime=now)
    # drop one sentinel query from its sweep
    incomplete["queries"].pop(SENTINEL_QS[0])
    (tmp_path / "incomplete.json").write_text(json.dumps(incomplete))
    floors, src = bench._sentinel_floors(CAL_HOST, str(tmp_path))
    assert src == "pinned-r8-fallback"
    assert floors == bench.SENTINEL_FLOOR_FALLBACK


def test_host_gate(tmp_path):
    """An archive stamped by ANOTHER host must not calibrate this one;
    legacy archives without a host field count as the calibration
    host; a foreign host with no matching archive gets NO floors (the
    sentinel then skips with a note instead of flagging contention)."""
    now = time.time()
    _archive(tmp_path, "foreign.json", host="8cpu-arm64-16GiB",
             queries={q: 0.01 for q in SENTINEL_QS}, mtime=now)
    legacy = _archive(tmp_path, "legacy.json", mtime=now - 60,
                      queries={q: 0.3 for q in SENTINEL_QS})
    floors, src = bench._sentinel_floors(CAL_HOST, str(tmp_path))
    assert src == "median-of-1:[legacy.json]"
    assert floors == {q: legacy["queries"][q] for q in SENTINEL_QS}
    floors2, src2 = bench._sentinel_floors("64cpu-x86_64-500GiB",
                                           str(tmp_path))
    assert floors2 == {} and src2 == ""
    # ...but the foreign host's own archive calibrates it
    floors3, src3 = bench._sentinel_floors("8cpu-arm64-16GiB",
                                           str(tmp_path))
    assert src3 == "median-of-1:[foreign.json]"


def test_env_override_beats_archives(tmp_path, monkeypatch):
    _archive(tmp_path, "new.json")
    override = {q: 9.9 for q in SENTINEL_QS}
    monkeypatch.setenv("SPARK_GRAFT_SENTINEL_FLOORS",
                       json.dumps(override))
    floors, src = bench._sentinel_floors("any-host-at-all", str(tmp_path))
    assert floors == override
    assert src == "env:SPARK_GRAFT_SENTINEL_FLOORS"
    monkeypatch.setenv("SPARK_GRAFT_SENTINEL_FLOORS",
                       json.dumps({"wrong_query": 1.0}))
    with pytest.raises(ValueError, match="sentinel queries"):
        bench._sentinel_floors(CAL_HOST, str(tmp_path))


def test_real_repo_archives_resolve_for_calibration_host():
    """The committed bench_archive must yield floors for the
    calibration host, sourced from an actual archive or the pinned
    fallback — never empty (which would silently skip the sentinel on
    the very host it exists for)."""
    floors, src = bench._sentinel_floors(CAL_HOST)
    assert set(floors) == set(SENTINEL_QS) and src
    assert all(v > 0 for v in floors.values())


def test_host_fingerprint_shape():
    fp = bench.host_fingerprint()
    assert "cpu-" in fp and fp.split("cpu-")[0].isdigit()


# --- streaming sentinel floor (r11, VERDICT r10 next-step #3) ----------


def _stream_archive(tmp_path, name, *, rps, contended=False,
                    stream_contended=False, host=CAL_HOST, mtime=None):
    data = {
        "sf": 0.1,
        "host": host,
        "contention": {
            "contended": contended,
            "stream": {"rows_per_sec": rps, "contended": stream_contended},
        },
        "queries": {},
    }
    path = tmp_path / name
    path.write_text(json.dumps(data))
    if mtime is not None:
        os.utime(path, (mtime, mtime))


def test_stream_floor_median_of_newest_uncontended_archives(tmp_path):
    now = time.time()
    # a single anomalously FAST run must not ratchet the floor: the
    # median of the 3 newest wins, lower-middle on even counts
    _stream_archive(tmp_path, "older.json", rps=125000.0, mtime=now - 600)
    _stream_archive(tmp_path, "lucky.json", rps=170000.0, mtime=now - 300)
    _stream_archive(tmp_path, "new.json", rps=120000.0, mtime=now - 10)
    floor, src = bench._stream_sentinel_floor(CAL_HOST, str(tmp_path))
    assert floor == 125000.0  # the lucky 170k outlier is not the floor
    assert src == "median-of-3-newest-uncontended-archives"
    # two archives: lower-middle (conservative, biases uncontended)
    os.remove(tmp_path / "older.json")
    floor, src = bench._stream_sentinel_floor(CAL_HOST, str(tmp_path))
    assert floor == 120000.0
    assert src == "median-of-2-newest-uncontended-archives"


def test_stream_floor_skips_contended_and_foreign_host(tmp_path):
    now = time.time()
    # batch-contended run: not a floor
    _stream_archive(tmp_path, "cont.json", rps=90000.0, contended=True,
                    mtime=now - 5)
    # stream-contended run: not a floor either
    _stream_archive(tmp_path, "scont.json", rps=80000.0,
                    stream_contended=True, mtime=now - 4)
    # another machine's run: not a floor for this host
    _stream_archive(tmp_path, "other.json", rps=70000.0,
                    host="8cpu-arm64-16GiB", mtime=now - 3)
    floor, src = bench._stream_sentinel_floor(CAL_HOST, str(tmp_path))
    assert floor == bench.STREAM_SENTINEL_FLOOR_FALLBACK
    assert src == "pinned-r11-fallback"
    # a foreign host resolves against its OWN uncontended archive
    floor, src = bench._stream_sentinel_floor("8cpu-arm64-16GiB",
                                              str(tmp_path))
    assert floor == 70000.0
    # and a foreign host with no archives at all gets no floor (skip)
    floor, src = bench._stream_sentinel_floor("2cpu-riscv-4GiB",
                                              str(tmp_path))
    assert floor == 0.0 and src == ""


def test_env_probe_shape():
    """The engine-version probe records every hash-sensitive engine
    and never raises (it is embedded in artifacts whose emission must
    not fail)."""
    from scripts.env_probe import probe

    p = probe()
    for key in ("python", "pyspark", "duckdb", "pyarrow", "pandas",
                "numpy"):
        assert key in p
    assert p["pyspark"], "pyspark version missing from probe"
