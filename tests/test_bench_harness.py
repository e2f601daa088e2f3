"""bench.py hardening tests: the driver's one JSON line must survive a
tunnel outage (fast UNAVAILABLE raise), a wedged backend (init hang), and a
mid-run hang — each attributably (error + phase), never silently.

Round-3 post-mortem: BENCH_r03.json recorded 0.0 because the single-attempt
fatal path had no retry and no watchdog.  These tests pin the supervisor's
retry loop, the CPU fallback labelling, and the watchdog partial-emit."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")
sys.path.insert(0, REPO)

import bench  # noqa: E402


def _run_bench(extra_env, timeout=120):
    env = dict(os.environ)
    env.update(extra_env)
    p = subprocess.run([sys.executable, BENCH], env=env, capture_output=True,
                       text=True, timeout=timeout)
    lines = [l for l in p.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got: {p.stdout!r}"
    return json.loads(lines[0])


def test_supervisor_retries_init_failure_then_succeeds():
    """First attempt fails at init (simulated outage) -> supervisor retries
    -> second attempt succeeds; the emitted JSON is the success, with the
    attempt count recorded."""
    js = _run_bench({"IP_BENCH_SELFTEST": "fail_once",
                     "IP_BENCH_RETRY_DELAY_S": "0.01"})
    assert js["value"] == 1.0
    assert js["attempts"] == 2
    assert js["backend"] == "axon"
    assert js["decode_mpix_s"] == 123.0
    assert "error" not in js


def test_supervisor_single_attempt_when_healthy():
    js = _run_bench({"IP_BENCH_SELFTEST": "ok"})
    assert js["value"] == 1.0
    assert js["attempts"] == 1


def test_supervisor_exhausted_is_attributable():
    """Every attempt fails at init and the retry budget is zero: the final
    JSON must still appear, with value 0.0, an error, and a phase."""
    js = _run_bench({
        "IP_BENCH_SELFTEST": "fail",
        "IP_BENCH_INIT_BUDGET_S": "0",
        "IP_BENCH_CPU_FALLBACK": "0",
    })
    assert js["value"] == 0.0
    assert "simulated init failure" in js["error"]
    assert js["phase"] == "init"


def test_supervise_injected_retry_loop():
    """Unit-level: the retry loop backs off on RC_INIT_FAILED and stops
    retrying on success, without spawning real children."""
    calls = []

    def fake_child(env, timeout):
        calls.append(env["IP_BENCH_BACKEND"])
        if len(calls) < 3:
            return bench.RC_INIT_FAILED, {
                "metric": "intensity_e2e_throughput", "value": 0.0,
                "error": "UNAVAILABLE", "phase": "init"}
        return 0, {"metric": "intensity_e2e_throughput", "value": 42.0,
                   "unit": "Mpix/s", "vs_baseline": 52.5}

    os.environ["IP_BENCH_INIT_BUDGET_S"] = "9999"
    os.environ["IP_BENCH_RETRY_DELAY_S"] = "0.01"
    try:
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = bench._supervise(run_child=fake_child)
    finally:
        del os.environ["IP_BENCH_INIT_BUDGET_S"]
        del os.environ["IP_BENCH_RETRY_DELAY_S"]
    assert rc == 0
    assert calls == ["axon", "axon", "axon"]
    js = json.loads(buf.getvalue())
    assert js["value"] == 42.0 and js["attempts"] == 3


def test_supervise_cpu_fallback_labelled():
    """Axon never comes up inside the init budget -> the CPU child's number
    is emitted, labelled cpu_fallback, with the axon error attached."""
    def fake_child(env, timeout):
        if env["IP_BENCH_BACKEND"] == "axon":
            return bench.RC_INIT_FAILED, {"value": 0.0,
                                          "error": "UNAVAILABLE: tunnel down",
                                          "phase": "init"}
        return 0, {"metric": "intensity_e2e_throughput", "value": 7.5,
                   "unit": "Mpix/s", "vs_baseline": 9.4}

    os.environ["IP_BENCH_INIT_BUDGET_S"] = "0"
    try:
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            bench._supervise(run_child=fake_child)
    finally:
        del os.environ["IP_BENCH_INIT_BUDGET_S"]
    js = json.loads(buf.getvalue())
    assert js["value"] == 7.5
    assert js["backend"] == "cpu_fallback"
    assert "tunnel down" in js["error"]


def test_watchdog_emits_partials_on_hang():
    """The watchdog thread fires past the deadline, emits via the injected
    callback (which sees partial RESULTS), and calls the injected exit."""
    import threading
    import time as _t

    emitted = []
    exited = []
    wd = bench.Watchdog(emit=lambda: emitted.append(True),
                        exit_fn=lambda rc: exited.append(rc), tick_s=0.02)
    wd.arm(0.05, rc=3)
    deadline = _t.monotonic() + 5
    while not exited and _t.monotonic() < deadline:
        _t.sleep(0.02)
    wd.done()
    assert emitted == [True]
    assert exited == [3]


def test_watchdog_disarm_prevents_fire():
    import time as _t

    exited = []
    wd = bench.Watchdog(emit=lambda: None,
                        exit_fn=lambda rc: exited.append(rc), tick_s=0.02)
    wd.arm(0.05, rc=3)
    wd.disarm()
    _t.sleep(0.2)
    wd.done()
    assert exited == []


def test_json_line_contract_fields():
    """The failure-path JSON carries every field the driver records."""
    line = bench._json_line(0.0, error="x", phase="init")
    js = json.loads(line)
    for k in ("metric", "value", "unit", "vs_baseline", "rois_per_s",
              "device_mpix_s", "decode_mpix_s", "fret_e2e_mpix_s",
              "host_load", "error", "phase"):
        assert k in js
    assert js["metric"] == "intensity_e2e_throughput"
