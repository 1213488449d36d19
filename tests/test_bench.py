"""Driver-window resilience of bench.py (VERDICT r3 #1).

Round 3's driver record was `rc=124, parsed:null` because bench.py could
not finish inside the driver window. The fix contract (bench.py docstring):
the fast legs run first, the production leg runs LAST under an explicit
wall-clock budget and is skipped with a reason when the budget can't cover
it, and the ONE JSON line is emitted exactly once — on the normal path, on
SIGTERM/SIGINT, and on tunnel failure. These tests pin that contract on CPU
without touching a TPU: the heavy measurement legs are monkeypatched or
replaced by stub executables; only the orchestration logic runs.
"""

import importlib.util
import json
import os
import signal
import subprocess
import sys
import time

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH_PY = os.path.join(ROOT, "bench.py")


@pytest.fixture
def bench():
    """A FRESH bench module per test: RESULT/_EMITTED/_CHILD/_T0 are module
    globals, so sharing one import across tests would leak state."""
    spec = importlib.util.spec_from_file_location("_bench_under_test",
                                                  BENCH_PY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_exe(tmp_path, body: str) -> str:
    p = tmp_path / "fake_exe.sh"
    p.write_text("#!/bin/sh\n" + body + "\n")
    p.chmod(0o755)
    return str(p)


def test_emit_prints_exactly_once(bench, capsys):
    bench.RESULT.update({"metric": "interactions_per_sec", "value": 1.0})
    bench.emit()
    bench.emit()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    assert json.loads(out[0])["value"] == 1.0


def test_production_skipped_when_budget_exhausted(bench):
    bench.BUDGET_S = 0.0  # remaining_s() < 0 < PRODUCTION_MIN_S
    result = {}
    bench.measure_production(result)
    assert "production_skipped" in result
    assert "budget" in result["production_skipped"]
    assert "production_ips" not in result


def test_production_timeout_kills_child(bench, tmp_path, monkeypatch):
    monkeypatch.setattr(sys, "executable", _fake_exe(tmp_path, "sleep 60"))
    bench.PRODUCTION_MIN_S = 1.0
    bench._T0 = time.monotonic()
    bench.BUDGET_S = 33.0  # budget = 33 - 30 = ~3 s
    result = {}
    st = time.monotonic()
    bench.measure_production(result)
    assert time.monotonic() - st < 30  # killed at the ~3 s budget, not 60
    assert result["production_error"].startswith("timeout")
    assert bench._CHILD is None or bench._CHILD.poll() is not None


def test_production_nonzero_rc_is_recorded(bench, tmp_path, monkeypatch):
    monkeypatch.setattr(sys, "executable",
                        _fake_exe(tmp_path, "echo boom >&2; exit 7"))
    bench.PRODUCTION_MIN_S = 1.0
    result = {}
    bench.measure_production(result)
    assert result["production_error"].startswith("rc=7")
    assert "boom" in result["production_error"]


def test_production_success_parses_perf_ab_record(bench, tmp_path,
                                                  monkeypatch):
    rec = {"ips": 42.0, "step_ms": 1.0, "e2e_ips": 40.0,
           "e2e_vs_device": 0.95}
    monkeypatch.setattr(sys, "executable", _fake_exe(
        tmp_path, f"echo '{json.dumps(rec)}' > /tmp/bench_production.jsonl"))
    bench.PRODUCTION_MIN_S = 1.0
    result = {}
    bench.measure_production(result)
    assert result["production_ips"] == 42.0
    assert result["production_step_ms"] == 1.0
    assert result["production_table_rows"] == bench.PRODUCTION_ROWS
    assert result["production_e2e_ips"] == 40.0
    assert result["production_e2e_vs_device"] == 0.95


def test_production_serving_fields_parsed(bench, tmp_path, monkeypatch):
    rec = {"ips": 42.0, "step_ms": 1.0, "e2e_ips": 40.0,
           "e2e_vs_device": 0.95, "serving_ips": 123.0,
           "serving_step_ms": 8.0}
    monkeypatch.setattr(sys, "executable", _fake_exe(
        tmp_path, f"echo '{json.dumps(rec)}' > /tmp/bench_production.jsonl"))
    bench.PRODUCTION_MIN_S = 1.0
    result = {}
    bench.measure_production(result)
    assert result["serving_ips"] == 123.0
    assert result["serving_step_ms"] == 8.0


def test_production_timeout_salvages_intermediate_record(bench, tmp_path,
                                                         monkeypatch):
    """--serving writes the train-mode record before its extra compile; a
    budget kill must still surface those fields (bench.py salvage path)."""
    rec = {"ips": 42.0, "step_ms": 1.0, "e2e_ips": 40.0,
           "e2e_vs_device": 0.95}
    monkeypatch.setattr(sys, "executable", _fake_exe(
        tmp_path,
        f"echo '{json.dumps(rec)}' > /tmp/bench_production.jsonl; sleep 60"))
    bench.PRODUCTION_MIN_S = 1.0
    bench._T0 = time.monotonic()
    bench.BUDGET_S = 33.0  # budget = 33 - 30 = ~3 s
    result = {}
    bench.measure_production(result)
    assert result["production_error"].startswith("timeout")
    assert result["production_ips"] == 42.0
    assert result["production_e2e_ips"] == 40.0
    assert result["production_partial"] == "salvaged pre-kill record"
    assert "serving_ips" not in result


@pytest.fixture
def _restore_signals():
    old_term = signal.getsignal(signal.SIGTERM)
    old_int = signal.getsignal(signal.SIGINT)
    yield
    signal.signal(signal.SIGTERM, old_term)
    signal.signal(signal.SIGINT, old_int)


def test_main_orders_fast_legs_first_and_skips_production(
        bench, capsys, monkeypatch, _restore_signals):
    calls = []
    monkeypatch.setattr(bench, "probe_tpu", lambda: True)
    monkeypatch.setattr(
        bench, "measure",
        lambda result, safe=False: (calls.append("measure"),
                                    result.__setitem__("value", 3.0)))
    monkeypatch.setattr(
        bench, "measure_production",
        lambda result: calls.append("production"))
    monkeypatch.setenv("SEGMM_BENCH_SKIP_PRODUCTION", "1")
    bench.main()
    assert calls == ["measure"]
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["value"] == 3.0
    assert rec["metric"] == "interactions_per_sec"


def test_main_falls_back_to_safe_config(bench, capsys, monkeypatch,
                                        _restore_signals):
    def measure(result, safe=False):
        if not safe:
            raise RuntimeError("RESOURCE_EXHAUSTED")
        result["value"] = 2.0

    monkeypatch.setattr(bench, "probe_tpu", lambda: True)
    monkeypatch.setattr(bench, "measure", measure)
    monkeypatch.setenv("SEGMM_BENCH_SKIP_PRODUCTION", "1")
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["value"] == 2.0
    assert "fallback" in rec


def test_main_emits_record_even_when_both_configs_fail(
        bench, capsys, monkeypatch, _restore_signals):
    """An exception escaping even the safe-fallback measure() must still
    leave the one parseable line (emit() runs from a finally)."""
    def measure(result, safe=False):
        raise RuntimeError("RESOURCE_EXHAUSTED")

    monkeypatch.setattr(bench, "probe_tpu", lambda: True)
    monkeypatch.setattr(bench, "measure", measure)
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip())
    assert "RESOURCE_EXHAUSTED" in rec["error"]
    assert "fallback" in rec
    assert rec["value"] == 0.0


def test_main_emits_error_record_when_tunnel_never_answers(
        bench, capsys, monkeypatch, _restore_signals):
    monkeypatch.setattr(bench, "probe_tpu", lambda: False)
    monkeypatch.setenv("JAX_PLATFORMS", "axon")

    def boom(*a, **k):
        raise AssertionError("measure must not run without a tunnel")

    monkeypatch.setattr(bench, "measure", boom)
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip())
    assert "tunnel unavailable" in rec["error"]
    assert rec["value"] == 0.0  # parseable record even on failure


def test_sigterm_emits_json_and_exits_zero(tmp_path):
    """A killed bench still leaves its one JSON line on stdout (the exact
    round-3 failure mode: the driver SIGTERMs at the window edge)."""
    child = tmp_path / "child.py"
    child.write_text(f"""
import importlib.util, signal, sys, time
spec = importlib.util.spec_from_file_location("bench", {BENCH_PY!r})
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)
bench.RESULT.update({{"metric": "interactions_per_sec", "value": 7.5}})
signal.signal(signal.SIGTERM, bench._on_signal)
sys.stderr.write("ready\\n"); sys.stderr.flush()
time.sleep(120)
""")
    p = subprocess.Popen([sys.executable, str(child)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
    try:
        assert p.stderr.readline().strip() == "ready"
        p.send_signal(signal.SIGTERM)
        out, _ = p.communicate(timeout=60)
    finally:
        if p.poll() is None:
            p.kill()
    assert p.returncode == 0
    rec = json.loads(out.strip())
    assert rec["value"] == 7.5
    assert rec["interrupted"] == "SIGTERM"
