"""Unit contracts for bench.py's failure plumbing (round-5 hardening):
stdout must always end in ONE parseable JSON line — measurement or
structured error — and a failed child gets exactly one fresh-process
retry. The BENCH_r04 artifact recorded a raw traceback because none of
this existed; these tests pin the plumbing without touching a device
(subprocess.run is monkeypatched)."""
import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # noqa: E402

pytestmark = pytest.mark.fast


def test_active_metric_selection(monkeypatch):
    monkeypatch.delenv("BENCH_TRAIN", raising=False)
    monkeypatch.delenv("BENCH_MODE", raising=False)
    assert bench._active_metric()[0] == "e2e_pipeline_frames_per_sec_256px"
    monkeypatch.setenv("BENCH_MODE", "generator")
    assert bench._active_metric()[0] == (
        "generator_forward_frames_per_sec_256px")
    monkeypatch.setenv("BENCH_TRAIN", "1")
    assert bench._active_metric()[0] == "module2_train_steps_per_sec_256px"


def test_error_payload_is_json_with_context(monkeypatch):
    monkeypatch.setenv("BENCH_TRAIN", "1")
    out = json.loads(bench._error_payload("boom"))
    assert out["value"] is None
    assert out["error"] == "boom"
    assert out["metric"] == "module2_train_steps_per_sec_256px"
    assert out["last_measured"]["value"] > 0


class _FakeProc:
    def __init__(self, rc, stdout):
        self.returncode = rc
        self.stdout = stdout
        self.stderr = ""


def _run_main_with_children(monkeypatch, capsys, children):
    calls = []

    def fake_run(argv, **kw):
        calls.append((argv, kw))
        return children[min(len(calls) - 1, len(children) - 1)]

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.delenv("BENCH_INNER", raising=False)
    monkeypatch.delenv("BENCH_NO_RETRY", raising=False)
    monkeypatch.setenv("BENCH_SKIP_PROBE", "1")
    rc = 0
    try:
        bench.main()
    except SystemExit as e:
        rc = e.code
    return rc, calls, capsys.readouterr().out


def test_success_forwards_child_stdout(monkeypatch, capsys):
    good = json.dumps({"metric": "m", "value": 1.0})
    rc, calls, out = _run_main_with_children(
        monkeypatch, capsys, [_FakeProc(0, good + "\n")])
    assert rc == 0 and len(calls) == 1
    assert json.loads(out.strip().splitlines()[-1])["value"] == 1.0
    # child carries the inner marker and skips the (already-run) probe
    env = calls[0][1]["env"]
    assert env["BENCH_INNER"] == "1" and env["BENCH_SKIP_PROBE"] == "1"


def test_failure_retries_once_then_forwards_error(monkeypatch, capsys):
    err = bench._error_payload("injected")
    rc, calls, out = _run_main_with_children(
        monkeypatch, capsys, [_FakeProc(4, err + "\n")])
    assert len(calls) == 2, "exactly one retry in a fresh process"
    assert rc == 4
    lines = [ln for ln in out.strip().splitlines() if ln.startswith("{")]
    assert len(lines) == 1, "exactly ONE JSON line reaches stdout"
    assert json.loads(lines[0])["error"] == "injected"


def test_retry_recovers(monkeypatch, capsys):
    good = json.dumps({"metric": "m", "value": 2.0})
    rc, calls, out = _run_main_with_children(
        monkeypatch, capsys,
        [_FakeProc(4, "garbage"), _FakeProc(0, good + "\n")])
    assert rc == 0 and len(calls) == 2
    assert json.loads(out.strip().splitlines()[-1])["value"] == 2.0


def test_no_retry_env(monkeypatch, capsys):
    monkeypatch.setenv("BENCH_NO_RETRY", "1")
    err = bench._error_payload("x")
    calls = []

    def fake_run(argv, **kw):
        calls.append(argv)
        return _FakeProc(3, err + "\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setenv("BENCH_SKIP_PROBE", "1")
    monkeypatch.delenv("BENCH_INNER", raising=False)
    with pytest.raises(SystemExit):
        bench.main()
    assert len(calls) == 1


def test_child_killed_without_output_synthesizes_error(monkeypatch,
                                                       capsys):
    """A child killed outside python (segfault/OOM) emits nothing;
    the parent must still end stdout with a structured JSON line."""
    rc, calls, out = _run_main_with_children(
        monkeypatch, capsys, [_FakeProc(-9, "")])
    assert len(calls) == 2 and rc == -9
    lines = [ln for ln in out.strip().splitlines() if ln.startswith("{")]
    assert len(lines) == 1
    payload = json.loads(lines[0])
    assert payload["value"] is None and "killed" in payload["error"]
