"""Witness-gated bench snapshot guard (bench.py emit) — no Spark needed."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _out(**kw):
    base = {
        "metric": "m",
        "value": 1,
        "queries": {},
        "sf": 0.1,
        "loadavg_at_queries_start": 1.0,
        "probe_ms_at_queries_end": 200,
        "scaling": None,
    }
    base.update(kw)
    return base


def _emit(monkeypatch, tmp_path, out, name="snap.json", force=False):
    p = tmp_path / name
    monkeypatch.setenv("SPARK_GRAFT_SNAPSHOT", str(p))
    if force:
        monkeypatch.setenv("SPARK_GRAFT_FORCE_SNAPSHOT", "1")
    else:
        monkeypatch.delenv("SPARK_GRAFT_FORCE_SNAPSHOT", raising=False)
    bench.emit(out)
    return p


def test_clean_run_snapshots(tmp_path, monkeypatch, capsys):
    p = _emit(monkeypatch, tmp_path, _out())
    assert json.loads(p.read_text())["value"] == 1
    # stdout still carries the one-line JSON driver contract
    line = capsys.readouterr().out.strip().splitlines()[0]
    assert json.loads(line)["metric"] == "m"


def test_dirty_start_loadavg_refused(tmp_path, monkeypatch):
    p = _emit(monkeypatch, tmp_path, _out(loadavg_at_queries_start=9.9))
    assert not p.exists()


def test_dirty_end_probe_refused(tmp_path, monkeypatch):
    # co-tenant arriving mid-phase: start loadavg clean, end probe slow
    p = _emit(monkeypatch, tmp_path, _out(probe_ms_at_queries_end=900))
    assert not p.exists()


def test_dirty_scaling_phase_refused(tmp_path, monkeypatch):
    # scaling gates on the contention probe, not loadavg: loadavg at a
    # phase start structurally carries the previous phase's own decaying
    # threads, so high loadavg + fast probe is CLEAN...
    ok = {"loadavg_at_phase_start": {"frontier_hi": {"loadavg": 18.2, "probe_ms": 206}}}
    p = _emit(monkeypatch, tmp_path, _out(scaling=ok), name="s_ok.json")
    assert p.exists()
    # ...while a slow probe means foreign load right now — refused
    bad = {"loadavg_at_phase_start": {"frontier_hi": {"loadavg": 2.0, "probe_ms": 900}}}
    p = _emit(monkeypatch, tmp_path, _out(scaling=bad), name="s_bad.json")
    assert not p.exists()


def test_no_silent_overwrite_and_force(tmp_path, monkeypatch):
    p = _emit(monkeypatch, tmp_path, _out())
    _emit(monkeypatch, tmp_path, _out(value=2))
    assert json.loads(p.read_text())["value"] == 1  # refused overwrite
    _emit(monkeypatch, tmp_path, _out(value=3), force=True)
    assert json.loads(p.read_text())["value"] == 3
    # force also bypasses the witness gate, but the witness travels along
    p2 = _emit(
        monkeypatch, tmp_path, _out(value=4, loadavg_at_queries_start=9.9),
        name="forced.json", force=True,
    )
    snap = json.loads(p2.read_text())
    assert snap["value"] == 4 and snap["loadavg_at_queries_start"] == 9.9

def test_pervasive_canary_pollution_refused(tmp_path, monkeypatch):
    clean = {f"q{i}": 200 for i in range(8)}
    p = _emit(monkeypatch, tmp_path, _out(probe_ms_per_query=clean), name="c1.json")
    assert p.exists()  # all canaries fast -> accepted
    polluted = dict(clean, **{f"s{i}": 900 for i in range(3)})  # 3/11 slow
    p = _emit(monkeypatch, tmp_path, _out(probe_ms_per_query=polluted), name="c2.json")
    assert not p.exists()  # >20% slow canaries -> refused
    one_burst = dict(clean, s0=900)  # 1/9 slow: isolated burst, quotable
    p = _emit(monkeypatch, tmp_path, _out(probe_ms_per_query=one_burst), name="c3.json")
    assert p.exists()


def test_low_memstream_refused(tmp_path, monkeypatch):
    """The CPU probe is blind to a co-tenant on the memory bus; a scaling
    phase whose memstream witness is below the floor must be refused even
    with a fast probe (the r3 polluted-run failure mode)."""
    bad = {
        "loadavg_at_phase_start": {
            "frontier_hi": {"loadavg": 2.0, "probe_ms": 196, "memstream_mbps": 4459}
        }
    }
    p = _emit(monkeypatch, tmp_path, _out(scaling=bad), name="m_bad.json")
    assert not p.exists()
    ok = {
        "loadavg_at_phase_start": {
            "frontier_hi": {"loadavg": 2.0, "probe_ms": 196, "memstream_mbps": 9200}
        }
    }
    p = _emit(monkeypatch, tmp_path, _out(scaling=ok), name="m_ok.json")
    assert p.exists()


def test_low_queries_memstream_refused(tmp_path, monkeypatch):
    p = _emit(
        monkeypatch, tmp_path, _out(memstream_at_queries_end=900), name="qm.json"
    )
    assert not p.exists()
    p = _emit(
        monkeypatch, tmp_path,
        _out(memstream_at_queries_start=9500, memstream_at_queries_end=9100),
        name="qm_ok.json",
    )
    assert p.exists()
