"""Elastic-recovery supervisor tests (clip_mixer_tpu.launch.supervise and
scripts/supervise.py).

SURVEY §5 failure recovery: the reference has NO elasticity — a crashed job
stays down until a human relaunches it and Accelerate resumes from the
checkpoint (reference training/training.py:106-131). The supervisor closes
that loop with a progress-aware restart budget; these tests pin the policy
(restart on crash, budget on no-progress loops, never restart deterministic
non-finite aborts or operator stops) and drill the real train.py path with
fault injection (--crash-after-steps).
"""

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from clip_mixer_tpu.launch import (  # noqa: E402
    EXIT_NONFINITE,
    latest_checkpoint_step,
    supervise,
)

REPO = Path(__file__).resolve().parents[1]


def test_latest_checkpoint_step(tmp_path):
    assert latest_checkpoint_step(tmp_path / "missing") is None
    ck = tmp_path / "checkpoints"
    ck.mkdir()
    assert latest_checkpoint_step(ck) is None
    (ck / "2").mkdir()
    (ck / "10").mkdir()
    (ck / "4.orbax-checkpoint-tmp-123").mkdir()  # in-flight save: not finalized
    (ck / "99").write_text("a file, not a step dir")
    assert latest_checkpoint_step(ck) == 10


def _stub_cmd(tmp_path, body: str):
    """A child script that appends one line to starts.txt per launch, then
    runs ``body`` (which decides the exit code)."""
    script = tmp_path / "child.py"
    script.write_text(
        "import sys\n"
        "from pathlib import Path\n"
        f"starts = Path({str(tmp_path)!r}) / 'starts.txt'\n"
        "starts.open('a').write('x\\n')\n"
        "n_starts = len(starts.read_text().splitlines())\n"
        + body
    )
    return [sys.executable, str(script)]


def _n_starts(tmp_path):
    f = tmp_path / "starts.txt"
    return len(f.read_text().splitlines()) if f.exists() else 0


def test_success_first_try(tmp_path):
    cmd = _stub_cmd(tmp_path, "sys.exit(0)\n")
    assert supervise(cmd, str(tmp_path / "ck"), max_restarts=3, backoff=0) == 0
    assert _n_starts(tmp_path) == 1


def test_crash_loop_exhausts_budget(tmp_path):
    """No checkpoint progress: max_restarts bounds the relaunches."""
    cmd = _stub_cmd(tmp_path, "sys.exit(7)\n")
    rc = supervise(cmd, str(tmp_path / "ck"), max_restarts=2, backoff=0)
    assert rc == 7
    assert _n_starts(tmp_path) == 3  # initial launch + 2 restarts


def test_nonfinite_abort_is_permanent(tmp_path):
    """The deterministic divergence exit code must never be restarted."""
    cmd = _stub_cmd(tmp_path, f"sys.exit({EXIT_NONFINITE})\n")
    rc = supervise(cmd, str(tmp_path / "ck"), max_restarts=5, backoff=0)
    assert rc == EXIT_NONFINITE
    assert _n_starts(tmp_path) == 1


def test_progress_resets_budget(tmp_path):
    """A run that keeps reaching new checkpoints restarts past max_restarts."""
    ck = tmp_path / "ck"
    ck.mkdir()
    cmd = _stub_cmd(
        tmp_path,
        f"Path({str(ck)!r}, str(n_starts)).mkdir()\n"  # new checkpoint each launch
        "sys.exit(0 if n_starts >= 4 else 1)\n",
    )
    assert supervise(cmd, str(ck), max_restarts=1, backoff=0) == 0
    assert _n_starts(tmp_path) == 4  # 3 progressing crashes + success > budget 1


def test_stop_signal_forwarded_not_restarted(tmp_path):
    """SIGTERM to the supervisor: forwarded to the child, no relaunch."""
    child = tmp_path / "child.py"
    child.write_text(
        "import time\n"
        "from pathlib import Path\n"
        f"starts = Path({str(tmp_path)!r}) / 'starts.txt'\n"
        "starts.open('a').write('x\\n')\n"
        f"(Path({str(tmp_path)!r}) / 'up').touch()\n"
        "time.sleep(120)\n"
    )
    driver = tmp_path / "driver.py"
    driver.write_text(
        "import sys\n"
        f"sys.path.insert(0, {str(REPO)!r})\n"
        "from clip_mixer_tpu.launch import supervise\n"
        f"rc = supervise([sys.executable, {str(child)!r}], {str(tmp_path / 'ck')!r}, "
        "max_restarts=5, backoff=0)\n"
        "print('SUPERVISE_RC', rc, flush=True)\n"
    )
    proc = subprocess.Popen(
        [sys.executable, str(driver)], stdout=subprocess.PIPE, text=True
    )
    try:
        deadline = time.monotonic() + 60
        while not (tmp_path / "up").exists():
            assert time.monotonic() < deadline, "child never started"
            assert proc.poll() is None, "driver died early"
            time.sleep(0.1)
        os.kill(proc.pid, signal.SIGTERM)
        out, _ = proc.communicate(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert f"SUPERVISE_RC {-signal.SIGTERM}" in out
    assert _n_starts(tmp_path) == 1  # the stop won over elasticity


def test_supervised_training_drill(tmp_path, monkeypatch):
    """End-to-end recovery drill on the REAL train.py: fault injection
    crashes the run every 3 steps; the supervisor restarts it from the
    latest checkpoint each time (progress resets the budget) until the run
    completes and exports."""
    monkeypatch.chdir(tmp_path)
    import supervise as supervise_cli

    rc = supervise_cli.main([
        "--max-restarts", "1", "--backoff", "0", "--",
        "--preset", "mixer-debug", "--synthetic", "--platform", "cpu",
        "--global-batch-size", "8", "--steps-per-epoch", "6", "--epochs", "1",
        "--checkpoint-every", "2", "--crash-after-steps", "3",
        "--no-validators", "--run-name", "drill",
    ])
    assert rc == 0
    # crash@3 -> resume@2 -> crash@5 -> resume@4 -> finish 6: three launches,
    # each one past a NEW checkpoint, on a budget of one no-progress restart.
    assert latest_checkpoint_step("outputs/drill/checkpoints") == 6
    assert (tmp_path / "outputs" / "drill" / "export").is_dir()


def test_stop_signal_between_children_not_restarted(tmp_path):
    """A stop that lands during the backoff sleep (no live child) must stop
    the loop, not be swallowed while a fresh child is launched that never
    receives the forwarded signal."""
    child = tmp_path / "child.py"
    child.write_text(
        "from pathlib import Path\n"
        f"starts = Path({str(tmp_path)!r}) / 'starts.txt'\n"
        "starts.open('a').write('x\\n')\n"
        "import sys; sys.exit(1)\n"  # fast crash -> supervisor enters backoff
    )
    driver = tmp_path / "driver.py"
    driver.write_text(
        "import sys\n"
        f"sys.path.insert(0, {str(REPO)!r})\n"
        "from clip_mixer_tpu.launch import supervise\n"
        f"rc = supervise([sys.executable, {str(child)!r}], {str(tmp_path / 'ck')!r}, "
        "max_restarts=5, backoff=30)\n"  # 30s sleep: the signal lands inside it
        "print('SUPERVISE_RC', rc, flush=True)\n"
    )
    proc = subprocess.Popen(
        [sys.executable, str(driver)], stdout=subprocess.PIPE, text=True
    )
    try:
        deadline = time.monotonic() + 60
        while _n_starts(tmp_path) < 1:
            assert time.monotonic() < deadline, "child never started"
            assert proc.poll() is None, "driver died early"
            time.sleep(0.1)
        time.sleep(1.0)  # let the child exit and the supervisor reach sleep()
        os.kill(proc.pid, signal.SIGTERM)
        out, _ = proc.communicate(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert f"SUPERVISE_RC {128 + signal.SIGTERM}" in out
    assert _n_starts(tmp_path) == 1  # no relaunch after the stop


def test_tree_rss_bytes_counts_self():
    from clip_mixer_tpu.launch import _tree_rss_bytes

    rss = _tree_rss_bytes(os.getpid())
    assert rss > 10 * 2**20  # any live python interpreter
    assert _tree_rss_bytes(2**22 + 12345) == 0  # vanished pid reads as 0


def test_rss_hygiene_restart_not_run_complete(tmp_path):
    """RSS hygiene (leaky-transport defense, e.g. the axon tunnel's
    per-transfer host retention): a child over the RSS budget is SIGTERMed,
    its graceful 'preemption save' (rc=0!) must NOT read as run-complete —
    the supervisor relaunches, and the relaunch that resumes from the saved
    checkpoint finishes the run."""
    ck = tmp_path / "ck"
    ck.mkdir()
    cmd = _stub_cmd(
        tmp_path,
        "import signal, time\n"
        f"from pathlib import Path as _P\n"
        "if n_starts > 1:\n"
        "    sys.exit(0)  # resumed from the hygiene checkpoint: complete\n"
        "def _save(sig, frame):\n"
        f"    (_P({str(ck)!r}) / '7').mkdir(exist_ok=True)\n"
        "    sys.exit(0)  # graceful preemption exit, like train.py\n"
        "signal.signal(signal.SIGTERM, _save)\n"
        "ballast = bytearray(300 * 2**20)  # the 'leak'\n"
        "time.sleep(120)\n",
    )
    rc = supervise(
        cmd, str(ck), max_restarts=2, backoff=0,
        max_child_rss_gb=0.15, rss_grace=30.0,
    )
    assert rc == 0
    assert _n_starts(tmp_path) == 2  # hygiene relaunch happened
    assert latest_checkpoint_step(ck) == 7  # the SIGTERM save ran


def test_rss_hygiene_no_progress_exhausts_budget(tmp_path):
    """Hygiene kills whose graceful exits never advance a checkpoint must
    consume the no-progress budget and surface a NONZERO rc (the children
    exited 0 — returning 0 after giving up would read as success)."""
    cmd = _stub_cmd(
        tmp_path,
        "import signal, time\n"
        "signal.signal(signal.SIGTERM, lambda s, f: sys.exit(0))\n"
        "ballast = bytearray(300 * 2**20)\n"
        "time.sleep(120)\n",
    )
    rc = supervise(
        cmd, str(tmp_path / "ck"), max_restarts=1, backoff=0,
        max_child_rss_gb=0.15, rss_grace=30.0,
    )
    assert rc != 0
    assert _n_starts(tmp_path) == 2  # initial + 1 restart, then gave up


def test_derive_run_name():
    """Both argparse spellings resolve (last occurrence wins); a dangling
    '--run-name' is a clean error, not an IndexError."""
    import supervise as supervise_cli

    d = supervise_cli.derive_run_name
    assert d([]) == "run"
    assert d(["--run-name", "prod1"]) == "prod1"
    assert d(["--run-name=prod1"]) == "prod1"
    assert d(["--run-name", "a", "--run-name=b"]) == "b"
    assert d(["--preset", "mixer-b32", "--run-name"]) is None


def test_dress_rehearsal_distillation(tmp_path):
    """dress_rehearsal's metric distillation + leg merging: read_metrics
    groups the jsonl (tolerating a crash-truncated tail line), thin()
    keeps endpoints, and write_result(leg=...) accumulates both rehearsal
    legs into one TRAIN_DRESS.json without clobbering."""
    import json

    import dress_rehearsal as dr

    run = tmp_path / "run" / "runs"
    run.mkdir(parents=True)
    lines = [json.dumps({"step": s, "name": "Loss", "value": 10.0 - s})
             for s in range(1, 8)]
    # the REAL trainer scalar names (evals/validators.py RetrievalValidator,
    # trainer throughput) — distill() must pick these up, capitalisation
    # included
    lines.append(json.dumps(
        {"step": 5, "name": "Retrieval I->T R@1", "value": 1.5}))
    lines.append(json.dumps(
        {"step": 4, "name": "Throughput (imgs/s)", "value": 123.0}))
    lines.append('{"step": 8, "name": "Lo')  # crash-truncated tail
    (run / "metrics.jsonl").write_text("\n".join(lines))
    series = dr.read_metrics(tmp_path / "run")
    assert series["Loss"][0] == (1, 9.0) and series["Loss"][-1] == (7, 3.0)

    (tmp_path / "run" / "checkpoints" / "4").mkdir(parents=True)
    res = dr.distill(series, wall=12.0, returncode=0, crash_after_steps=5,
                     ckpt_steps=dr.checkpoint_steps(tmp_path / "run"))
    assert res["retrieval"] == {"Retrieval I->T R@1": [(5, 1.5)]}
    assert res["steps_completed"] == 7 and res["restarts"] == 1
    assert res["imgs_per_sec_median_steady"] == 123.0
    assert res["checkpoint_steps"] == [4]

    pts = [(i, float(i)) for i in range(200)]
    thinned = dr.thin(pts, keep=60)
    assert len(thinned) <= 62 and thinned[0] == pts[0] and thinned[-1] == pts[-1]

    out = tmp_path / "TRAIN_DRESS.json"
    dr.write_result(out, {"steps_completed": 12}, leg="batch32k")
    dr.write_result(out, {"steps_completed": 516}, leg="steps500")
    doc = json.loads(out.read_text())
    assert doc["legs"]["batch32k"]["steps_completed"] == 12
    assert doc["legs"]["steps500"]["steps_completed"] == 516
