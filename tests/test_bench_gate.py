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
    # the mt spin is recorded in the FINAL snapshot even when the gate
    # never waited (ADVICE r12: polls skip it, the returned record keeps it)
    assert {"loadavg_1m", "calib_spin_sec", "calib_mt_sec"} <= set(snap)
    assert gate["thresholds"] == {
        "calib_spin_sec": 0.33,
        "loadavg_1m": 2.0,
        "calib_mt_sec": 0.9,
    }


def test_gate_verdict_matches_thresholds(monkeypatch):
    b = _load_bench()
    monkeypatch.setattr(b, "_QUIET_WAIT_MAX", 0.0)
    for spin, load, mt_val, want_clean in [
        (0.30, 1.0, 0.7, True),
        (0.40, 1.0, 0.7, False),  # contended CPU
        (0.30, 5.5, 0.7, False),  # the exact r11 failure profile
        # single-thread clean, multi-thread throughput degraded — the
        # r12 co-tenancy profile the mt threshold exists for (ADVICE r12)
        (0.30, 1.0, 1.4, False),
    ]:
        monkeypatch.setattr(
            b,
            "_load_snapshot",
            lambda mt=True, s=spin, la=load: {
                "loadavg_1m": la,
                "loadavg_5m": la,
                "loadavg_15m": la,
                "calib_spin_sec": s,
            },
        )
        monkeypatch.setattr(b, "_calibration_spin_mt", lambda m=mt_val: m)
        assert b._await_quiet_box()["clean"] is want_clean, (spin, load, mt_val)


def test_gate_polls_skip_the_mt_spin(monkeypatch):
    """ADVICE r12: the 8-process spin must never run during wait polls —
    it adds runnable load to the very loadavg_1m the gate is draining.
    Simulate a busy box for 2 polls, then a clean one; the mt spin must
    fire exactly once (on the final clean snapshot)."""
    b = _load_bench()
    monkeypatch.setattr(b, "_QUIET_WAIT_MAX", 999.0)
    monkeypatch.setattr(b, "_QUIET_POLL_SEC", 0.0)
    loads = iter([5.0, 5.0, 1.0])
    mt_calls = []

    def fake_snapshot(mt: bool = True) -> dict:
        assert mt is False, "poll ran the expensive snapshot form"
        return {
            "loadavg_1m": next(loads),
            "loadavg_5m": 1.0,
            "loadavg_15m": 1.0,
            "calib_spin_sec": 0.30,
        }

    monkeypatch.setattr(b, "_load_snapshot", fake_snapshot)
    monkeypatch.setattr(
        b, "_calibration_spin_mt", lambda: mt_calls.append(1) or 0.7
    )
    import time as _time

    monkeypatch.setattr(_time, "sleep", lambda s: None)
    gate = b._await_quiet_box()
    assert gate["clean"] is True
    assert gate["attempts"] == 3
    assert len(mt_calls) == 1
    assert gate["snapshot"]["calib_mt_sec"] == 0.7


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


def test_compact_line_surfaces_denied_tiebreaks():
    """VERDICT r12 #3: when the tie-break budget runs out, the compact
    JSON line must say how many noisy entries kept min-of-2 quality —
    and stay silent when none were denied (budget space is the common
    case and the line is size-capped)."""
    b = _load_bench()
    base = {
        "metric": "headline_suite_wall",
        "value": 1.0,
        "unit": "sec",
        "sf": 0.1,
        "queries": {"q1": 1.0},
        "baselines": {},
        "degraded": False,
    }
    with_skips = json.loads(
        b._compact_line({**base, "tiebreaks": {"run": 7, "skipped": 3}})
    )
    assert with_skips["tiebreaks_skipped"] == 3
    no_skips = json.loads(
        b._compact_line({**base, "tiebreaks": {"run": 7, "skipped": 0}})
    )
    assert "tiebreaks_skipped" not in no_skips
