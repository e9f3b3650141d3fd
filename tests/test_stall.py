"""Hang detection: supervise --stall-timeout + the Trainer heartbeat.

A hung-but-alive child is the one failure `supervise`'s plain wait() can
never see (observed live: a stalled remote-TPU tunnel left train.py
futex-waiting forever mid-dress-rehearsal). The Trainer touches a
per-process heartbeat file every step (the max_inflight_steps dispatch
throttle guarantees a wedged backend stops the beats within that many
steps); the supervisor kills the child when the file goes stale and the
exit flows into the existing progress-aware restart budget.

The reference has no counterpart — a hung AzureML job stayed hung
(/root/reference/training/training.py:106-131 resumes only after a human
notices and relaunches).
"""

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))

from clip_mixer_tpu.launch import supervise  # noqa: E402

# Child that beats N times (0.2s apart), then either exits 0 or hangs.
_CHILD = r"""
import os, sys, time
hb, n, hang = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
for _ in range(n):
    open(hb, "a").close()
    os.utime(hb, None)
    time.sleep(0.2)
if hang:
    time.sleep(600)
"""


def _child_cmd(hb_path, beats, hang):
    # -S: skip site import — this host's sitecustomize imports jax into
    # EVERY python process (~5-20s under load), which would eat the whole
    # stall budget before the stdlib-only child gets to beat once.
    return [sys.executable, "-S", "-c", _CHILD, str(hb_path), str(beats), str(int(hang))]


def test_stall_kill_and_budget(tmp_path):
    """A child that stops beating is killed (SIGTERM escalation) and the
    no-progress budget eventually gives up — a crash-loop of hangs cannot
    restart forever."""
    hb = tmp_path / "heartbeat-0"
    logs = []
    rc = supervise(
        _child_cmd(hb, beats=2, hang=True),
        ckpt_dir=str(tmp_path / "ckpts"),  # never populated: no progress
        max_restarts=1,
        backoff=0.05,
        log=logs.append,
        stall_timeout=4.0,
        heartbeat_path=str(hb),
        stall_grace=0.5,
    )
    assert rc != 0
    stall_lines = [m for m in logs if "killing the stalled child" in m]
    # killed once per incarnation: the first + the single budgeted restart
    assert len(stall_lines) == 2
    assert any("giving up" in m for m in logs)


def test_beating_child_not_killed(tmp_path):
    """Heartbeats within the budget are liveness: the watchdog never fires
    and a clean exit 0 passes straight through."""
    hb = tmp_path / "heartbeat-0"
    logs = []
    rc = supervise(
        _child_cmd(hb, beats=8, hang=False),  # ~1.6s of 0.2s-spaced beats
        ckpt_dir=str(tmp_path / "ckpts"),
        max_restarts=0,
        log=logs.append,
        stall_timeout=4.0,  # >> the 0.2s beat gap even under a loaded host
        heartbeat_path=str(hb),
        stall_grace=0.5,
    )
    assert rc == 0
    assert not any("stalled" in m for m in logs)


def test_stale_preexisting_heartbeat_not_instant_kill(tmp_path):
    """A heartbeat file left by the PREVIOUS incarnation is older than any
    stall budget — the clock must start at launch, not at the stale mtime."""
    hb = tmp_path / "heartbeat-0"
    hb.touch()
    old = time.time() - 3600
    os.utime(hb, (old, old))
    logs = []
    rc = supervise(
        _child_cmd(hb, beats=8, hang=False),
        ckpt_dir=str(tmp_path / "ckpts"),
        max_restarts=0,
        log=logs.append,
        stall_timeout=4.0,
        heartbeat_path=str(hb),
        stall_grace=0.5,
    )
    assert rc == 0
    assert not any("stalled" in m for m in logs)


def test_hang_drill_end_to_end(tmp_path, monkeypatch):
    """Full recovery drill through the real CLIs: train.py --hang-after-steps
    wedges after N steps (alive, silent, no heartbeats, right after the
    step-4 cadence save), scripts/supervise.py --stall-timeout kills it, the
    relaunch resumes from that checkpoint, and the run COMPLETES — the hang
    analogue of the --crash-after-steps drill above in test_supervise."""
    monkeypatch.chdir(tmp_path)
    import supervise as supervise_cli

    run = "stall_drill"
    rc = supervise_cli.main([
        "--max-restarts", "2", "--backoff", "0",
        # stall budget > worst-case CPU startup (restore + compile under a
        # loaded suite host); one stall firing costs this much wall time
        "--stall-timeout", "75", "--stall-grace", "5",
        "--",
        "--preset", "mixer-debug", "--synthetic", "--platform", "cpu",
        "--global-batch-size", "8", "--steps-per-epoch", "6", "--epochs", "1",
        "--checkpoint-every", "2", "--no-validators",
        "--hang-after-steps", "4", "--run-name", run, "--verbose",
    ])
    assert rc == 0
    # the relaunch resumed from the step-4 checkpoint, not from scratch
    ckpts = sorted(
        int(p.name) for p in (tmp_path / "outputs" / run / "checkpoints").iterdir()
        if p.name.isdigit()
    )
    assert 4 in ckpts and max(ckpts) == 6
    assert (tmp_path / "outputs" / run / "export").is_dir()
    # the heartbeat file the watchdog watched is the one the Trainer wrote
    assert (tmp_path / "outputs" / run / "heartbeat-0").exists()
    # metrics survive the kill: losses for all 6 steps, each exactly once
    metrics = tmp_path / "outputs" / run / "runs" / "metrics.jsonl"
    recs = [json.loads(l) for l in metrics.read_text().splitlines()]
    steps = [r["step"] for r in recs if r["name"] == "Loss"]
    assert sorted(steps) == sorted(set(steps))
    assert max(steps) == 6
