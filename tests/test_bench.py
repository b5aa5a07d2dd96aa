"""bench.py resilience: the driver's capture window is one shot, so the tool
must emit exactly ONE parseable JSON line with rc=0 even when the TPU relay
is down (BENCH_r02/r03 both died to a transient outage at capture time)."""

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_structured_json_on_backend_outage():
    """With an impossibly-short probe timeout the backend probe always fails
    (even a healthy relay needs >1 s to init), forcing the fallback path:
    rc=0, one JSON line, value null, error recorded, forced-CPU smoke ok."""
    env = dict(os.environ)
    env["MMTPU_BENCH_INIT_TRIES"] = "1"
    env["MMTPU_BENCH_INIT_TIMEOUT_S"] = "1"
    env["MMTPU_BENCH_INIT_BACKOFF_S"] = "0"
    env.pop("XLA_FLAGS", None)  # no virtual-device split in the subprocess
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py")],
        env=env, cwd=_REPO, capture_output=True, text=True, timeout=560,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got: {lines}"
    rec = json.loads(lines[0])
    assert rec["value"] is None
    assert rec["backend"] == "cpu"
    assert "error" in rec and "unavailable" in rec["error"].lower()
    assert rec["cpu_smoke_ok"] is True
    # the driver's schema essentials are present even in the failure record
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    # the outage record carries the newest builder self-capture, clearly
    # labeled as NOT a driver capture — IF any exist in docs/selfcaptures/
    # (don't hard-couple this resilience test to checked-in data artifacts,
    # advisor r4)
    sc = rec.get("last_builder_selfcapture")
    if sc is not None:
        assert "NOT a driver capture" in sc["note"]
        assert sc["record"]["value"] > 0


def _tiny_bench_env():
    env = dict(os.environ)
    env.update({
        "MMTPU_BENCH_FORCE": "1", "MMTPU_BENCH_FORCE_CPU": "1",
        "MMTPU_BENCH_EPOCHS": "2", "MMTPU_BENCH_CHAIN": "2",
        "MMTPU_BENCH_SWEEP": "0", "MMTPU_BENCH_SERVE": "0",
    })
    env.pop("XLA_FLAGS", None)
    return env


def test_bench_refreshes_record_incrementally():
    """A full (tiny, forced-CPU) run emits the record MULTIPLE times — once
    after the headline, once per section, once at exit — so truncation at
    any point leaves a parseable line; the LAST line is the most complete
    (VERDICT r4 weak #1)."""
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py")],
        env=_tiny_bench_env(), cwd=_REPO, capture_output=True, text=True,
        timeout=560,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) >= 2, f"expected incremental emits, got: {lines}"
    recs = [json.loads(ln) for ln in lines]
    assert recs[-1]["value"] is not None and recs[-1]["value"] > 0
    # every earlier snapshot is a subset-or-equal of the final record's keys
    for r in recs[:-1]:
        assert set(r) <= set(recs[-1])


def test_bench_sigterm_emits_partial_record():
    """An external SIGTERM mid-run still yields rc=0 and a JSON line carrying
    the partial record (the driver-window kill class that produced zero
    output in rounds 2-4)."""
    import signal
    import time

    proc = subprocess.Popen(
        [sys.executable, os.path.join(_REPO, "bench.py")],
        env=_tiny_bench_env(), cwd=_REPO,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    time.sleep(8)  # mid-compile/run on the forced-CPU tiny workload
    proc.send_signal(signal.SIGTERM)
    try:
        out, _ = proc.communicate(timeout=120)
    except subprocess.TimeoutExpired:
        proc.kill()
        raise
    lines = [ln for ln in out.strip().splitlines() if ln.strip()]
    assert proc.returncode == 0
    assert lines, "SIGTERM must still emit a JSON line"
    rec = json.loads(lines[-1])
    assert rec["metric"].startswith("utterances/sec")
    # either the handler fired mid-run (partial, error notes the signal) or
    # the run happened to finish first (value present) — both are JSON lines
    assert ("error" in rec) or (rec.get("value") is not None)
