"""The driver's multi-chip gate: ``__graft_entry__.dryrun_multichip(n)``.

Round 1 failed this gate because the entry asserted on the ambient device
count instead of provisioning a virtual CPU mesh itself (MULTICHIP_r01.json
ok=false). Now it self-provisions; this test runs it exactly as the driver
does — a plain function call, no env preconditions beyond what conftest sets.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft


def test_dryrun_multichip_8_in_process():
    # conftest already initialized the CPU backend with 8 virtual devices, so
    # this exercises the "backend already up, enough devices" path end-to-end
    # (full sharded train step on a 4x2 data x model mesh).
    graft.dryrun_multichip(8)


def test_provision_devices_reports_current_capacity():
    assert graft._provision_devices(8) is True
    assert graft._provision_devices(10_000) is False


def _load_bench():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_under_test", str(Path(__file__).resolve().parents[1] / "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_supervisor_retries_hang_then_relays_json(monkeypatch, capsys):
    """The driver runs `python bench.py` unattended at round end: a hung
    remote-compile tunnel must not hang the round. The supervisor kills the
    child at the deadline (subprocess.run's own by-pid kill), retries, and
    relays ONLY the final JSON line to stdout."""
    import subprocess
    import types

    bench = _load_bench()
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    calls = []

    def fake_run(cmd, stdout=None, stderr=None, timeout=None):
        calls.append(list(cmd))
        if len(calls) == 1:  # first attempt hangs -> TimeoutExpired kills child
            raise subprocess.TimeoutExpired(cmd, timeout)
        return types.SimpleNamespace(
            returncode=0,
            stdout=b'some warning noise\n{"metric": "m", "value": 1.0}\n',
            stderr=b"",
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._run_supervised(max_attempts=3, attempt_timeout_s=5) == 0
    assert len(calls) == 2 and calls[0][-1] == "--measure"
    assert capsys.readouterr().out.strip() == '{"metric": "m", "value": 1.0}'


def test_bench_supervisor_exhausts_attempts_on_tunnel_faults(monkeypatch, capsys):
    import subprocess
    import types

    bench = _load_bench()
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    calls = []

    def fake_run(cmd, stdout=None, stderr=None, timeout=None):
        calls.append(1)
        return types.SimpleNamespace(
            returncode=1, stdout=b"", stderr=b"DEADLINE_EXCEEDED talking to tunnel\n"
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._run_supervised(max_attempts=2, attempt_timeout_s=5) == 1
    assert len(calls) == 2  # tunnel-signature failures use the retry budget
    # terminal failure still emits ONE self-describing sentinel JSON line
    # (value=0, detail.error) so the driver's record explains itself
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    sentinel = json.loads(out[0])
    assert sentinel["value"] == 0 and "unreachable" in sentinel["detail"]["error"]
    assert sentinel["metric"].endswith("(int8-calibrated, 256px uint8 in)")


def test_bench_supervisor_fails_fast_on_deterministic_errors(monkeypatch, capsys):
    """A bug in the measurement child (no tunnel-fault signature) must not
    burn ~an hour of retries on an unattended driver run."""
    import subprocess
    import types

    bench = _load_bench()
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    calls = []

    def fake_run(cmd, stdout=None, stderr=None, timeout=None):
        calls.append(1)
        return types.SimpleNamespace(
            returncode=1, stdout=b"", stderr=b"TypeError: bad bench code\n"
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._run_supervised(max_attempts=3, attempt_timeout_s=5) == 1
    assert len(calls) == 1
    sentinel = json.loads(capsys.readouterr().out.strip())
    assert sentinel["value"] == 0 and "deterministic" in sentinel["detail"]["error"]


def test_median_ips_rejects_superluminal_chains(monkeypatch):
    """Chain admission: a measurement chain implying throughput above the
    speed-of-light cap (BENCH_r03 admitted a 99,244 imgs/s sample — 2.75x
    the documented ceiling) is rejected and re-measured, never averaged in;
    if EVERY chain exceeds physics the fallback is the minimum seen."""
    bench = _load_bench()

    # scripted per-call slope times (batch/ips): one superluminal hiccup
    # among normal chains -> rejected, a 4th chain admitted instead
    batch = 512.0
    seq = iter([batch / 33000, batch / 99244, batch / 34000, batch / 33500])
    monkeypatch.setattr(bench, "_slope_time", lambda run, n1, n2: next(seq))
    med, runs, rejected = bench._median_ips(
        lambda n: None, batch, repeats=3, sol_cap=bench.SOL_INT8_IPS * bench.SOL_HEADROOM
    )
    assert rejected == [99244.0]
    assert len(runs) == 3 and all(r <= bench.SOL_INT8_IPS * bench.SOL_HEADROOM for r in runs)
    assert med == 33500.0  # median of the three admitted chains

    # systematically broken clock: all chains superluminal -> min fallback
    seq2 = iter([batch / v for v in (99000, 88000, 77000, 66000, 55000, 44000, 41000)])
    monkeypatch.setattr(bench, "_slope_time", lambda run, n1, n2: next(seq2))
    med2, runs2, rejected2 = bench._median_ips(
        lambda n: None, batch, repeats=3, sol_cap=bench.SOL_INT8_IPS * bench.SOL_HEADROOM
    )
    assert len(rejected2) == 7
    assert med2 == min(rejected2)

    # no cap (legacy behavior): everything admitted
    seq3 = iter([batch / v for v in (33000, 99244, 34000)])
    monkeypatch.setattr(bench, "_slope_time", lambda run, n1, n2: next(seq3))
    med3, runs3, rejected3 = bench._median_ips(lambda n: None, batch, repeats=3)
    assert rejected3 == [] and len(runs3) == 3
