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

def test_glob_heartbeat_multiworker(tmp_path):
    """Pod-shaped runs: the child beats heartbeat-<process_index> for a
    NON-ZERO index (jax.distributed auto-detected it; no --process-id in the
    train args) while the supervisor watches the heartbeat-* glob. Newest
    mtime across the family counts, so the healthy worker is never killed —
    the failure the advisor flagged was every non-zero worker being
    SIGKILLed on a stall clock that ran from launch."""
    hb = tmp_path / "heartbeat-3"
    logs = []
    rc = supervise(
        _child_cmd(hb, beats=8, hang=False),
        ckpt_dir=str(tmp_path / "ckpts"),
        max_restarts=0,
        log=logs.append,
        stall_timeout=4.0,
        heartbeat_path=str(tmp_path / "heartbeat-*"),
        stall_grace=0.5,
    )
    assert rc == 0
    assert not any("stalled" in m for m in logs)


def test_glob_heartbeat_stalled_still_killed(tmp_path):
    """The glob path must not defeat detection: a child that stops beating
    is still killed when no file in the family advances."""
    hb = tmp_path / "heartbeat-2"
    logs = []
    rc = supervise(
        _child_cmd(hb, beats=2, hang=True),
        ckpt_dir=str(tmp_path / "ckpts"),
        max_restarts=0,
        backoff=0.05,
        log=logs.append,
        stall_timeout=4.0,
        heartbeat_path=str(tmp_path / "heartbeat-*"),
        stall_grace=0.5,
    )
    assert rc != 0
    assert any("killing the stalled child" in m for m in logs)


def test_stall_timeout_zero_disables(tmp_path):
    """0/negative disables the watchdog (dress_rehearsal's documented
    convention) — a literal 0s budget used to kill every incarnation at the
    first poll, before its first beat."""
    hb = tmp_path / "heartbeat-0"
    logs = []
    rc = supervise(
        _child_cmd(hb, beats=3, hang=False),
        ckpt_dir=str(tmp_path / "ckpts"),
        max_restarts=0,
        log=logs.append,
        stall_timeout=0.0,
        heartbeat_path=str(hb),
        stall_grace=0.5,
    )
    assert rc == 0
    assert not any("stalled" in m for m in logs)


def test_supervise_cli_heartbeat_derivation(monkeypatch, tmp_path):
    """CLI derivation: explicit --process-id pins the exact file; absent
    --process-id falls back to the heartbeat-* glob (real pods)."""
    import supervise as supervise_cli

    captured = {}

    def fake_supervise(cmd, ckpt_dir, **kw):
        captured.update(kw)
        return 0

    monkeypatch.setattr(supervise_cli, "supervise", fake_supervise)
    base = ["--stall-timeout", "60", "--",
            "--preset", "mixer-debug", "--run-name", "podrun"]

    supervise_cli.main(base + ["--process-id", "1"])
    assert captured["heartbeat_path"] == str(
        Path("outputs") / "podrun" / "heartbeat-1")

    captured.clear()
    supervise_cli.main(base)
    assert captured["heartbeat_path"] == str(
        Path("outputs") / "podrun" / "heartbeat-*")

    captured.clear()
    supervise_cli.main(["--stall-timeout", "0", "--",
                        "--preset", "mixer-debug", "--run-name", "podrun"])
    assert "heartbeat_path" not in captured  # 0 disables at the CLI too


def test_beat_fallback_advances_mtime(tmp_path, monkeypatch):
    """trainer._beat's fallback must ADVANCE mtime when os.utime fails on an
    existing file (EPERM / read-only remount): a bare open('a') would leave
    beats frozen while training is healthy and the watchdog would kill it."""
    from clip_mixer_tpu.train.trainer import Trainer

    hb = tmp_path / "heartbeat-0"
    hb.write_text("x")
    old = time.time() - 3600
    os.utime(hb, (old, old))

    t = Trainer.__new__(Trainer)  # no full init: _beat only needs these
    t._heartbeat_path = str(hb)
    t._beat_degraded = False
    t.run_dir = str(tmp_path)

    real_utime = os.utime

    def deny_utime(path, *a, **kw):
        if str(path) == str(hb):
            raise PermissionError("injected EPERM")
        return real_utime(path, *a, **kw)

    monkeypatch.setattr(os, "utime", deny_utime)
    t._beat()
    assert os.path.getmtime(hb) > old + 1800  # mtime advanced via the write
    assert t._beat_degraded
