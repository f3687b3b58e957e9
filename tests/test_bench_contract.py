"""Driver-contract tests for ``bench.py``'s outage path.

Round 4 lost its entire perf record when a single-shot device probe hit a
transient tunnel outage and the bench exited with rc=3 and nothing on
stdout (BENCH_r04.json: parsed=null).  The contract (CLAUDE.md) is ONE
JSON line on stdout, ALWAYS.  These tests exercise the hardened path
without touching the tunnel:

* the probe retry ladder really retries and reports the failure kind;
* ``main()`` on an unreachable device prints exactly one parseable JSON
  line with an explicit ``error`` field and exits 0 (the
  "kill-the-tunnel dry test" — the probe is stubbed out in a subprocess
  so no real TPU client is created or starved).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_probe_ladder_retries_and_reports(monkeypatch):
    import bench

    calls = []
    real_run = subprocess.run

    def counting_run(cmd, **kw):
        calls.append(cmd)
        return real_run(["/bin/false"], **{k: v for k, v in kw.items()
                                           if k != "timeout"} | {"timeout": 5})

    # _probe_device does `import subprocess` locally; patching the module
    # attribute covers it
    monkeypatch.setattr(subprocess, "run", counting_run)
    failure = bench._probe_device(attempts=3, timeout_s=5.0, backoff_s=0.0)
    assert failure == "CalledProcessError"
    assert len(calls) == 3  # the ladder exhausted all attempts


def test_main_unreachable_prints_one_structured_json_line():
    # Run the REAL main() with only the probe stubbed to fail, in a
    # subprocess so stdout capture and process state match the driver's
    # view exactly.
    code = (
        "import bench\n"
        "bench._release_device = lambda: None\n"
        "bench._probe_device = lambda *a, **k: 'TimeoutExpired'\n"
        "bench.main()\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, timeout=300,
        capture_output=True, text=True,
        env=dict(os.environ, DUNE_TCVN_BENCH_PROBE_ATTEMPTS="2",
                 DUNE_TCVN_BENCH_PROBE_TIMEOUT="5",
                 DUNE_TCVN_BENCH_PROBE_BACKOFF="0"),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, proc.stdout
    record = json.loads(lines[0])
    assert record["error"] == "device_unreachable"
    assert record["value"] is None
    assert record["metric"] == "inference_events_per_second"
    assert "probe ladder exhausted" in record["error_detail"]
