"""bench.py's device-availability gate: a dead relay must produce a
parseable JSON error line, never a hang (the driver records bench output
verbatim; an in-process hung dispatch cannot be cancelled)."""

import importlib.util
import json
import sys
from pathlib import Path


def _load_bench():
    path = Path(__file__).resolve().parent.parent / "bench.py"
    spec = importlib.util.spec_from_file_location("bench_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_unreachable_device_prints_error_json(monkeypatch, capsys):
    bench = _load_bench()
    monkeypatch.setenv("LGTPU_BENCH_WAIT_S", "0")
    monkeypatch.setattr(bench, "_device_reachable", lambda *a, **k: False)
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(line)
    assert payload["value"] is None
    assert payload["unit"] == "ms"
    assert "unreachable" in payload["extra"]["error"]


def test_reachable_device_skips_gate(monkeypatch):
    bench = _load_bench()
    monkeypatch.setenv("LGTPU_BENCH_WAIT_S", "0")
    calls = []
    monkeypatch.setattr(
        bench, "_device_reachable", lambda *a, **k: calls.append(1) or True
    )
    assert bench._await_device() is True
    assert len(calls) == 1
