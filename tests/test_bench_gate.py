"""Quiet-box bench gate (VERDICT r11 #2): BENCH_r{N}.json must carry a
clean-box stamp, and a still-busy box must mark the emitted numbers
degraded instead of letting load masquerade as plan drift.  Pure-Python
contract tests — no SparkSession."""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

BENCH = Path(__file__).resolve().parent.parent / "bench.py"


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench_under_test", BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_quiet_gate_record_shape(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_QUIET_WAIT_MAX", "0")
    b = _load_bench()
    # re-read the env-dependent budget under the patched env
    monkeypatch.setattr(b, "_QUIET_WAIT_MAX", 0.0)
    gate = b._await_quiet_box()
    assert set(gate) == {"clean", "attempts", "waited_sec", "snapshot", "thresholds"}
    assert gate["attempts"] == 1  # zero budget -> sample once, never wait
    assert isinstance(gate["clean"], bool)
    snap = gate["snapshot"]
    assert {"loadavg_1m", "calib_spin_sec"} <= set(snap)
    assert gate["thresholds"] == {"calib_spin_sec": 0.33, "loadavg_1m": 2.0}


def test_gate_verdict_matches_thresholds(monkeypatch):
    b = _load_bench()
    monkeypatch.setattr(b, "_QUIET_WAIT_MAX", 0.0)
    for spin, load, want_clean in [
        (0.30, 1.0, True),
        (0.40, 1.0, False),  # contended CPU
        (0.30, 5.5, False),  # the exact r11 failure profile
    ]:
        monkeypatch.setattr(
            b,
            "_load_snapshot",
            lambda s=spin, la=load: {
                "loadavg_1m": la,
                "loadavg_5m": la,
                "loadavg_15m": la,
                "calib_spin_sec": s,
            },
        )
        assert b._await_quiet_box()["clean"] is want_clean, (spin, load)


def test_compact_line_carries_degraded_stamp():
    b = _load_bench()
    base = {
        "metric": "headline_suite_wall",
        "value": 1.0,
        "unit": "sec",
        "sf": 0.1,
        "queries": {"q1": 1.0},
        "baselines": {},
    }
    for degraded in (True, False):
        line = b._compact_line({**base, "degraded": degraded})
        parsed = json.loads(line)
        assert parsed["degraded"] is degraded
        assert len(line) <= 1400
