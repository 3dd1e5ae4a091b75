"""Unit tests for bench.py's resilience orchestration (round-3 postmortem:
the driver bench crashed rc=1 on a transient TPU FailedPrecondition and the
round shipped with no verified perf number — BENCH_r03.json).

These run without JAX/TPU: subprocess.run is monkeypatched to simulate child
rows succeeding, failing, recovering under the fallback env, and timing out.
What must hold: the final JSON line ALWAYS prints with whatever rows
succeeded, failures land in an ``errors`` field, fallback-env recoveries are
tagged ``degraded``, and the exit code is 0 iff the primary (beam3) row
produced a value.
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench


class _Proc:
    def __init__(self, returncode=0, stdout="", stderr=""):
        self.returncode = returncode
        self.stdout = stdout
        self.stderr = stderr


def _row_json(row, value=100.0, n_devices=1):
    return json.dumps({"row": row, "n_devices": n_devices, "value": value})


def _args(smoke=False, trace=None):
    return argparse.Namespace(smoke=smoke, trace=trace)


def _run(monkeypatch, capsys, fake_run):
    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)  # no heal waits in tests
    rc = bench.orchestrate(_args())
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


def test_all_rows_succeed(monkeypatch, capsys):
    calls = []

    def fake_run(cmd, **kw):
        row = cmd[cmd.index("--row") + 1]
        calls.append(row)
        return _Proc(stdout="warmup noise\n" + _row_json(row, value=42.0))

    rc, report = _run(monkeypatch, capsys, fake_run)
    assert rc == 0
    assert report["value"] == 42.0 and report["unit"] == "lines/sec"
    assert report["vs_baseline"] == round(42.0 / bench.PER_CHIP_TARGET, 4)
    assert "errors" not in report and "degraded" not in report
    # the 'real' row only runs when the in-repo checkpoint exists
    expect = [r for r in bench.ROWS
              if r != "real" or (bench.REAL_CKPT / "state").exists()]
    assert calls == expect  # one attempt each, no retries
    if "real" not in expect:
        assert "checkpoint" in report["skipped"]["real"]


def test_real_row_runs_when_checkpoint_present(monkeypatch, capsys, tmp_path):
    (tmp_path / "ck" / "state").mkdir(parents=True)
    monkeypatch.setattr(bench, "REAL_CKPT", tmp_path / "ck")
    calls = []

    def fake_run(cmd, **kw):
        row = cmd[cmd.index("--row") + 1]
        calls.append(row)
        return _Proc(stdout=_row_json(row, value=9000.0))

    rc, report = _run(monkeypatch, capsys, fake_run)
    assert rc == 0
    assert "real" in calls and report["real_beam3_lines_per_sec"] == 9000.0
    assert "skipped" not in report


def test_primary_recovers_under_fallback_env(monkeypatch, capsys):
    seen_envs = []

    def fake_run(cmd, env=None, **kw):
        row = cmd[cmd.index("--row") + 1]
        if row == "beam3":
            seen_envs.append(env)
            if env.get("KHMER_OCR_NO_COMPILE_CACHE") != "1":
                return _Proc(returncode=1, stderr="jax.errors.JaxRuntimeError: "
                                                  "FAILED_PRECONDITION: TPU backend error")
        return _Proc(stdout=_row_json(row))

    rc, report = _run(monkeypatch, capsys, fake_run)
    assert rc == 0
    assert report["value"] == 100.0
    # recovery is visible: the row is tagged with the env that made it pass
    assert report["degraded"]["beam3"] == ["KHMER_OCR_NO_COMPILE_CACHE"]
    assert "errors" not in report  # the error was superseded by the retry
    assert len(seen_envs) == 2


def test_primary_fails_all_attempts(monkeypatch, capsys):
    attempts = []

    def fake_run(cmd, env=None, **kw):
        row = cmd[cmd.index("--row") + 1]
        if row == "beam3":
            attempts.append(sorted(k for k in ("KHMER_OCR_NO_COMPILE_CACHE",
                                               "KHMER_OCR_FUSED_DECODE") if k in env))
            return _Proc(returncode=1, stderr="boom\nFAILED_PRECONDITION")
        return _Proc(stdout=_row_json(row, value=7.0))

    rc, report = _run(monkeypatch, capsys, fake_run)
    assert rc == 1  # primary never produced a value
    # ...but the JSON still printed, with every other row's result intact
    assert report["value"] is None and report["vs_baseline"] is None
    assert report["greedy_lines_per_sec"] == 7.0
    assert report["train_lines_per_sec"] == 7.0
    assert "FAILED_PRECONDITION" in report["errors"]["beam3"]
    # the three-attempt ladder: default, cache-bust, cache-bust + fused off
    assert attempts == [[], ["KHMER_OCR_NO_COMPILE_CACHE"],
                        ["KHMER_OCR_FUSED_DECODE", "KHMER_OCR_NO_COMPILE_CACHE"]]


def test_timeout_is_an_error_not_a_crash(monkeypatch, capsys):
    def fake_run(cmd, **kw):
        row = cmd[cmd.index("--row") + 1]
        if row == "train":
            raise subprocess.TimeoutExpired(cmd=cmd, timeout=kw.get("timeout", 0))
        return _Proc(stdout=_row_json(row))

    rc, report = _run(monkeypatch, capsys, fake_run)
    assert rc == 0  # primary succeeded; a secondary row's timeout doesn't fail the bench
    assert "train_lines_per_sec" not in report
    assert "timeout" in report["errors"]["train"]


def test_parse_last_json_skips_noise():
    text = "log line\n{broken json\n" + json.dumps({"row": "x", "value": 1}) + "\ntrailer"
    assert bench._parse_last_json(text) == {"row": "x", "value": 1}
    assert bench._parse_last_json("no json here") is None
