"""bench.py driver-protocol tests (VERDICT r4 weak #1).

Round 4's driver bench timed out with zero output because the JSON line
printed only after every ladder + train attempt. These tests pin the fixed
protocol with SIMULATED children (no TPU, no model): a hung subprocess must
not lose the inference line, and the whole driver must respect the deadline.
"""

from __future__ import annotations

import json
import sys
import time

import pytest

import bench

pytestmark = pytest.mark.slow  # real sleeping subprocesses (~1 min total)

_OK_LINE = (
    '{"metric": "maskrcnn_r50_fpn_inference_images_per_sec_per_chip",'
    ' "value": 100.0, "unit": "img/s", "vs_baseline": 4.3}'
)
_TRAIN_LINE = (
    '{"metric": "maskrcnn_r50_fpn_train_images_per_sec_per_chip",'
    ' "value": 50.0, "unit": "img/s", "vs_baseline": 6.5}'
)


def _hang_cmd(*_):
    return [sys.executable, "-c", "import time; time.sleep(600)"]


def _ok_cmd(line):
    return [sys.executable, "-c", f"print({line!r})"]


def _fast_protocol(monkeypatch, deadline=60.0, attempt=15.0):
    monkeypatch.setattr(bench, "DEADLINE_SECONDS", deadline)
    monkeypatch.setattr(bench, "ATTEMPT_TIMEOUT", attempt)
    monkeypatch.setattr(bench, "RECOVERY_SECONDS", 0.1)
    monkeypatch.setattr(bench, "_MIN_ATTEMPT", 1.0)


def _json_lines(capsys):
    return [
        json.loads(ln)
        for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("{")
    ]


def test_hung_first_attempt_still_yields_inference_line(monkeypatch, capsys):
    """A hung batch-32 child falls through the ladder; the inference line
    still prints (flushed) and the train keys ride a second line."""
    calls = []

    def infer_cmd(bs):
        calls.append(bs)
        return _hang_cmd() if len(calls) == 1 else _ok_cmd(_OK_LINE)

    monkeypatch.setattr(bench, "_infer_cmd", infer_cmd)
    monkeypatch.setattr(bench, "_train_cmd", lambda bs: _ok_cmd(_TRAIN_LINE))
    _fast_protocol(monkeypatch)

    t0 = time.monotonic()
    bench.main()
    wall = time.monotonic() - t0

    lines = _json_lines(capsys)
    assert len(lines) == 2
    assert lines[0]["value"] == 100.0
    assert "train_images_per_sec_per_chip" not in lines[0]
    assert lines[1]["train_images_per_sec_per_chip"] == 50.0
    assert lines[1]["value"] == 100.0  # last line carries the primary metric
    assert wall < 45.0  # hung child was reaped at the attempt timeout
    assert calls == [32, 16]


def test_hung_train_child_keeps_inference_line(monkeypatch, capsys):
    """Both train attempts hang: the inference-only line must survive and
    the driver must finish within the deadline."""
    monkeypatch.setattr(bench, "_infer_cmd", lambda bs: _ok_cmd(_OK_LINE))
    monkeypatch.setattr(bench, "_train_cmd", lambda bs: _hang_cmd())
    _fast_protocol(monkeypatch, deadline=40.0, attempt=15.0)

    t0 = time.monotonic()
    bench.main()
    wall = time.monotonic() - t0

    lines = _json_lines(capsys)
    assert len(lines) == 1
    assert lines[0]["value"] == 100.0
    assert "train_images_per_sec_per_chip" not in lines[0]
    assert wall < bench.DEADLINE_SECONDS + 3.0


def test_child_that_prints_then_hangs_still_counts(monkeypatch, capsys):
    """A child that measured + printed its JSON line and THEN hung (wedged
    TPU runtime at teardown) must still deliver the measurement via the
    TimeoutExpired exception's captured stdout."""
    print_then_hang = [
        sys.executable, "-c",
        f"import time; print({_OK_LINE!r}, flush=True); time.sleep(600)",
    ]
    monkeypatch.setattr(bench, "_infer_cmd", lambda bs: print_then_hang)
    monkeypatch.setattr(bench, "_train_cmd", lambda bs: _hang_cmd())
    _fast_protocol(monkeypatch, deadline=40.0, attempt=15.0)

    bench.main()

    lines = _json_lines(capsys)
    assert len(lines) >= 1
    assert lines[0]["value"] == 100.0  # measurement recovered from e.stdout


def test_deadline_caps_ladder(monkeypatch, capsys):
    """Every child hangs: the driver gives up at the deadline with a
    SystemExit instead of running the full ~8000 s worst case."""
    monkeypatch.setattr(bench, "_infer_cmd", lambda bs: _hang_cmd())
    monkeypatch.setattr(bench, "_train_cmd", lambda bs: _hang_cmd())
    _fast_protocol(monkeypatch, deadline=5.0, attempt=2.0)

    t0 = time.monotonic()
    try:
        bench.main()
        raised = False
    except SystemExit:
        raised = True
    wall = time.monotonic() - t0

    assert raised
    assert wall < 10.0
    assert _json_lines(capsys) == []
