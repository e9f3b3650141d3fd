"""Cluster launch helper — the reference's launchJob.py equivalent, TPU-native.

The reference submits AzureML jobs with PyTorchDistribution + `accelerate
launch --multi_gpu --num_machines 2 --num_processes 8 ...`
(launchJob.py:88-96,122-142). The TPU-native counterpart targets Cloud TPU
VMs/pods: every host of a TPU pod slice runs the SAME command, and
`jax.distributed.initialize()` auto-discovers peers from the TPU metadata —
there is no master-address plumbing to generate.

This module provides named presets (mirroring launchJob.py:46-96's
dict-and-overwrite blocks) and renders the gcloud commands that create the
slice and fan the training command onto every worker.
"""

from __future__ import annotations

import dataclasses
import shlex
from typing import Dict, Optional


@dataclasses.dataclass
class LaunchPreset:
    name: str
    accelerator: str  # e.g. "v5litepod-8", "v5p-16"
    train_args: str  # args passed to train.py
    runtime_version: str = "tpu-ubuntu2204-base"
    zone: str = "us-central1-a"


# Presets mirror the reference's experiment matrix (mixer vs transformer twin
# at global batch 32768; launchJob.py:13-22,68-96).
PRESETS: Dict[str, LaunchPreset] = {
    "mixer-b32-pod8": LaunchPreset(
        name="clip-mixer-b32",
        accelerator="v5litepod-8",
        train_args="--preset mixer-b32 --global-batch-size 32768 --epochs 32 --run-name mixer_b32",
    ),
    "transformer-b32-pod8": LaunchPreset(
        name="clip-transformer-b32",
        accelerator="v5litepod-8",
        train_args="--preset transformer-b32 --global-batch-size 32768 --epochs 32 --run-name transformer_b32",
    ),
    "mixer-b32-smoke": LaunchPreset(
        name="clip-mixer-smoke",
        accelerator="v5litepod-4",
        train_args="--preset mixer-b32 --synthetic --steps-per-epoch 20 --epochs 1 --run-name smoke",
    ),
}


def render_commands(preset: LaunchPreset, project: str, data_glob: Optional[str] = None) -> str:
    """gcloud command sequence: create the slice, upload the code, install,
    run on all workers (the reference's AzureML job upload + accelerate
    launch, launchJob.py:88-142)."""
    train_args = preset.train_args
    if data_glob:
        # quote for the REMOTE shell; the whole remote command is then quoted
        # once below for the local shell (nested shlex.quote inside an
        # already-quoted string would cancel the outer quotes and let the
        # worker shell expand the glob).
        train_args += f" --data {shlex.quote(data_glob)}"
    common = f"--project {project} --zone {preset.zone}"
    create = (
        f"gcloud compute tpus tpu-vm create {preset.name} {common} "
        f"--accelerator-type {preset.accelerator} --version {preset.runtime_version}"
    )
    # Upload this checkout to every worker (fresh VMs have no code; the
    # reference's AzureML submission snapshotted the source tree).
    upload = (
        f"gcloud compute tpus tpu-vm scp --recurse . {preset.name}:clip-mixer-tpu "
        f"{common} --worker=all"
    )
    setup = (
        f"gcloud compute tpus tpu-vm ssh {preset.name} {common} "
        f"--worker=all --command {shlex.quote('pip install -e clip-mixer-tpu/')}"
    )
    # Same command on every worker; jax.distributed.initialize() discovers the
    # slice topology (the NCCL/MASTER_ADDR plumbing of launchJob.py:134-138
    # has no TPU equivalent to configure).
    remote_run = f"cd clip-mixer-tpu && python train.py {train_args}"
    run = (
        f"gcloud compute tpus tpu-vm ssh {preset.name} {common} "
        f"--worker=all --command {shlex.quote(remote_run)}"
    )
    return "\n".join((create, upload, setup, run))


def rehearse_local(
    n_processes: int = 2,
    train_args: str = (
        "--preset mixer-debug --synthetic --global-batch-size 8 "
        "--steps-per-epoch 2 --epochs 1 --checkpoint-every 2 "
        "--no-validators --run-name rehearsal"
    ),
    cwd: Optional[str] = None,
    timeout: float = 600.0,
) -> list:
    """Pod-slice launch rehearsal: run the EXACT per-worker train.py command
    a pod launch fans out (render_commands' run line), as ``n_processes``
    local CPU processes with a real jax.distributed coordinator.

    Exercises the full multi-process path end to end — CLI, rendezvous,
    per-host data sharding, the sharded train step's cross-process
    collectives, and the multihost orbax checkpoint — with no TPUs. Returns
    the per-process stdouts; raises on any nonzero exit.
    """
    import os
    import socket
    import subprocess
    import sys
    from pathlib import Path

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    train_py = str(Path(__file__).resolve().parents[1] / "train.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one CPU device per process, like one chip per host
    procs = [
        subprocess.Popen(
            [
                sys.executable, train_py, *shlex.split(train_args),
                "--platform", "cpu",
                "--coordinator", f"127.0.0.1:{port}",
                "--num-processes", str(n_processes),
                "--process-id", str(i),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=cwd,
            text=True,
        )
        for i in range(n_processes)
    ]
    # Drain every worker's stdout CONCURRENTLY: reaping sequentially with
    # piped stdout deadlocks once any later worker fills its 64KB pipe
    # buffer mid-collective (it blocks writing, the first worker blocks in
    # the rendezvous, communicate() times out). Kill the whole fleet if
    # anything times out so no coordinated orphans hold the port.
    from concurrent.futures import ThreadPoolExecutor

    try:
        with ThreadPoolExecutor(n_processes) as ex:
            futures = [ex.submit(lambda p=p: p.communicate(timeout=timeout)) for p in procs]
            outs = [f.result()[0] for f in futures]
    except Exception:
        for p in procs:
            if p.poll() is None:
                p.kill()
        raise
    failed = None
    for p, out in zip(procs, outs):
        if p.returncode != 0 and failed is None:
            failed = (p.returncode, out)
    if failed is not None:
        raise RuntimeError(f"rehearsal worker rc={failed[0]}:\n{failed[1][-3000:]}")
    return outs


# Exit code train.py uses for the deterministic non-finite-loss abort
# (Trainer._flush_metrics raises FloatingPointError BEFORE the boundary
# checkpoint). The supervisor must NOT restart it: resume is bitwise
# deterministic, so a restarted run recomputes the exact same NaN — a
# restart loop that can never progress.
EXIT_NONFINITE = 13


def latest_checkpoint_step(ckpt_dir: str) -> Optional[int]:
    """Newest finalized orbax checkpoint id under ``ckpt_dir``, or None.

    Pure filesystem scan (orbax finalizes a step by renaming to a bare
    integer directory; in-flight tmp dirs carry suffixes) — deliberately
    imports no jax/orbax so the supervisor can never hang on a wedged
    accelerator backend. Remote (gs://) run dirs return None: supervision
    then falls back to the plain restart budget with no progress resets.
    """
    import os

    try:
        entries = os.listdir(ckpt_dir)
    except OSError:
        return None
    steps = [int(e) for e in entries if e.isdigit() and os.path.isdir(os.path.join(ckpt_dir, e))]
    return max(steps) if steps else None


def _tree_rss_bytes(root_pid: int) -> int:
    """Total RSS (bytes) of ``root_pid`` and every descendant, by one walk
    of /proc (ppid chains). Decode worker processes count toward their
    trainer's budget. Vanished pids read as 0 — the caller re-polls."""
    import os

    page = os.sysconf("SC_PAGESIZE")
    children: dict = {}
    rss: dict = {}
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/stat", "rb") as f:
                stat = f.read().decode("ascii", "replace")
        except OSError:
            continue
        # fields after the parenthesised comm (which may contain spaces)
        rest = stat.rsplit(")", 1)[-1].split()
        if len(rest) < 22:
            continue
        pid = int(entry)
        children.setdefault(int(rest[1]), []).append(pid)  # ppid -> pids
        rss[pid] = int(rest[21]) * page  # stat field 24 = rss pages
    total = 0
    stack = [root_pid]
    seen = set()
    while stack:
        pid = stack.pop()
        if pid in seen:
            continue
        seen.add(pid)
        total += rss.get(pid, 0)
        stack.extend(children.get(pid, []))
    return total


def _kill_child(proc, grace, log):
    """SIGTERM (the Trainer's preemption save runs), then SIGKILL the whole
    process group after ``grace`` seconds. Returns the exit code."""
    import os
    import signal as _signal
    import subprocess

    proc.terminate()
    try:
        return proc.wait(timeout=grace)
    except subprocess.TimeoutExpired:
        pass
    try:
        if os.getpgid(proc.pid) != os.getpgid(0):
            os.killpg(proc.pid, _signal.SIGKILL)
        else:
            proc.kill()
    except OSError:
        proc.kill()
    return proc.wait()


def _wait_watching_stall(proc, stall_timeout, heartbeat_path, grace, log,
                         max_rss_bytes=None, rss_grace=600.0):
    """Wait for the child; kill it when its heartbeat goes stale for
    ``stall_timeout`` seconds OR its process tree's RSS exceeds
    ``max_rss_bytes``. Returns ``(rc, hygiene)`` — hygiene=True means the
    RSS watchdog initiated the kill (the run is NOT complete even if the
    child exited 0 from its graceful preemption save).

    Stall: a hung-but-alive child is the failure mode a plain ``wait()``
    can never see: the process blocks forever inside a wedged
    accelerator/tunnel RPC, making no progress and never exiting (observed
    live: a stalled remote-TPU tunnel left train.py futex-waiting
    indefinitely mid-dress-rehearsal). The Trainer touches
    ``heartbeat_path`` every step (trainer._beat; the max_inflight_steps
    dispatch throttle guarantees a dead backend stops the beats within
    that many steps), so a stale mtime IS a stall. Escalation: SIGTERM
    first (an input-stalled child can still write its preemption
    checkpoint), then after ``grace`` seconds SIGKILL — to the child's
    whole process group when it leads one (decode workers die with it).
    ``heartbeat_path`` may be a glob (e.g. ``outputs/run/heartbeat-*``):
    the newest mtime across matches counts. Multi-worker pods need this —
    the Trainer names its file heartbeat-<jax.process_index()>, which the
    supervisor cannot predict when jax.distributed auto-detects the index
    (no --process-id in the train args).

    RSS hygiene (``max_rss_bytes``): some accelerator transports leak host
    memory proportional to bytes transferred (the axon remote-TPU client
    retains ~95% of every device_put payload — measured: a 510-step
    dress-rehearsal leg at 308MB/step leaks ~150GB and host-OOMs around
    step 450, docs/OPERATIONS.md). A leak is not a crash: the fix is a
    PLANNED restart while memory still allows a graceful exit — SIGTERM,
    the Trainer's preemption checkpoint runs (``rss_grace`` must cover a
    full device_get + checkpoint write through a slow tunnel), resume
    loses nothing. The supervisor restarts these regardless of exit code.
    """
    import glob as _glob
    import os
    import subprocess
    import time

    is_glob = heartbeat_path is not None and any(c in heartbeat_path for c in "*?[")
    launched = time.time()
    poll = max(0.1, min(5.0, (stall_timeout or 20.0) / 4))
    while True:
        try:
            return proc.wait(timeout=poll), False
        except subprocess.TimeoutExpired:
            pass
        if max_rss_bytes is not None:
            rss = _tree_rss_bytes(proc.pid)
            if rss > max_rss_bytes:
                log(
                    f"supervise: child RSS {rss / 2**30:.1f}GiB over the "
                    f"{max_rss_bytes / 2**30:.1f}GiB hygiene budget; "
                    "SIGTERM for a graceful preemption checkpoint + restart"
                )
                return _kill_child(proc, rss_grace, log), True
        if stall_timeout is None or heartbeat_path is None:
            continue
        paths = _glob.glob(heartbeat_path) if is_glob else [heartbeat_path]
        last = launched
        for hb in paths:
            try:
                last = max(last, os.path.getmtime(hb))
            except OSError:
                pass
        # max(): a stale heartbeat left by the PREVIOUS incarnation must not
        # trigger an instant kill — the clock never starts before launch.
        stale = time.time() - max(last, launched)
        if stale <= stall_timeout:
            continue
        log(
            f"supervise: no heartbeat for {stale:.0f}s (budget "
            f"{stall_timeout:.0f}s, {heartbeat_path}); killing the stalled child"
        )
        return _kill_child(proc, grace, log), False


def supervise(
    cmd: list,
    ckpt_dir: str,
    max_restarts: int = 3,
    backoff: float = 5.0,
    backoff_cap: float = 300.0,
    sleep=None,
    log=print,
    stall_timeout: Optional[float] = None,
    heartbeat_path: Optional[str] = None,
    stall_grace: float = 30.0,
    max_child_rss_gb: Optional[float] = None,
    rss_grace: float = 600.0,
) -> int:
    """Elastic recovery: run ``cmd`` (a train.py invocation), restarting it
    after transient failures. Returns the final exit code.

    The reference has no elasticity — a crashed job stays down until a human
    relaunches it and Accelerate resumes from the checkpoint
    (training/training.py:106-131). Here the relaunch is automatic, with a
    **progress-aware budget**: ``max_restarts`` bounds *consecutive restarts
    without progress*. Whenever a launch advances the newest checkpoint in
    ``ckpt_dir`` the counter resets — a long run that keeps moving through
    occasional crashes restarts indefinitely, while a crash-loop that cannot
    reach its next checkpoint exhausts the budget and surfaces the failure.

    Policy:
    * exit 0 — run complete; return 0.
    * exit EXIT_NONFINITE — permanent (deterministic divergence; see above);
      returned without restart.
    * SIGTERM/SIGINT received by the supervisor — forwarded to the child (the
      Trainer's preemption save runs) and NOT restarted: an operator stop or
      a host preemption must win over elasticity. This holds at ANY moment:
      a signal that lands between children (during the backoff sleep, or in
      the Popen window before the child handle is published) stops the loop
      before/right after the next launch instead of being swallowed. The
      child runs in its own session (``start_new_session=True``) so an
      interactive Ctrl-C reaches it exactly once — via the forward — rather
      than twice (kernel process-group delivery + forward), which would trip
      the Trainer's second-SIGINT hard-abort and skip the preemption save.
      Tradeoff: a SIGKILLed supervisor (OOM killer) leaves the detached
      child running — kill the child's process group or rely on the next
      supervisor's startup if that matters operationally.
    * any other nonzero — restart after exponential backoff
      (``backoff * 2^k`` capped at ``backoff_cap``) while the budget holds.
    * hung-but-alive child (``stall_timeout`` + ``heartbeat_path`` set):
      when the Trainer's per-step heartbeat file goes stale for
      ``stall_timeout`` seconds the child is killed (SIGTERM, then SIGKILL
      after ``stall_grace``) and the exit flows into the same
      progress-aware budget — completing the failure matrix (crash,
      non-finite, preemption, corrupt data, hang). Set ``stall_timeout``
      LARGER than worst-case startup (restore + first compile + cache
      fill) and than a validation pass; the Trainer beats at loop entry
      and after validation, but launch-to-first-beat is covered only by
      the launch clock.
    * RSS hygiene restart (``max_child_rss_gb`` set): when the child
      process tree's RSS exceeds the budget it is SIGTERMed — a PLANNED
      preemption, not a failure: the Trainer's graceful checkpoint runs
      (``rss_grace`` seconds allowed), and the child is restarted EVEN ON
      rc=0 (a preempted child exits 0 after its save; only a non-hygiene
      exit 0 means the run is complete). Defends against transports that
      leak host memory proportional to bytes transferred (the axon
      remote-TPU tunnel — measured ~95% of every device_put payload
      retained; docs/OPERATIONS.md) by bounding each incarnation's
      transfer volume instead of host-OOMing mid-save.

    Multi-host: run one supervisor per worker (same command everywhere). A
    single worker's crash stalls the collectives until the jax.distributed
    heartbeat tears the peers down; every supervisor then restarts its local
    worker and the rendezvous re-forms from the last checkpoint.
    """
    import signal
    import subprocess
    import threading

    if stall_timeout is not None and stall_timeout <= 0:
        # 0/negative disables the watchdog (dress_rehearsal's documented
        # convention); a literal 0s budget would kill every incarnation at
        # the first poll, before its first beat.
        stall_timeout = None
    failures_without_progress = 0
    attempt = 0
    stop_event = threading.Event()
    # "handoff": the handler already forwarded the signal to the CURRENT
    # child — the loop-side catch-up send must then stay quiet, or the child
    # receives the stop twice (tripping the Trainer's second-SIGINT
    # hard-abort). Signal handlers run on the main thread between the loop's
    # own bytecodes, so plain flags are race-free here.
    state = {"proc": None, "sig": None, "handoff": False}

    def _forward(signum, frame):
        state["sig"] = signum
        stop_event.set()  # wake the backoff wait immediately (PEP 475 would
        # otherwise resume a plain time.sleep for its remaining duration)
        p = state["proc"]
        if p is not None and p.poll() is None:
            state["handoff"] = True
            p.send_signal(signum)

    prev_handlers = {}
    installed = threading.current_thread() is threading.main_thread()
    if installed:
        for sig in (signal.SIGTERM, signal.SIGINT):
            prev_handlers[sig] = signal.signal(sig, _forward)
    if sleep is None:
        # Interruptible: returns early when _forward fires mid-backoff.
        sleep = stop_event.wait
    try:
        while True:
            if state["sig"] is not None:
                # Signal landed between children (backoff sleep / pre-launch):
                # there is no child to forward to — stop instead of silently
                # launching a run the operator just tried to kill.
                log("supervise: stop signal received between launches; not restarting")
                return 128 + int(state["sig"])
            start_step = latest_checkpoint_step(ckpt_dir)
            attempt += 1
            # New session (only when we own signal delivery): the kernel must
            # not ALSO deliver a terminal Ctrl-C to the child directly —
            # _forward is then the single delivery path. Without handlers
            # (non-main-thread caller) the child stays in our process group
            # so kernel group-delivery keeps working.
            state["handoff"] = False
            proc = subprocess.Popen(cmd, start_new_session=installed)
            state["proc"] = proc
            if state["sig"] is not None and not state["handoff"] and proc.poll() is None:
                # Close the Popen->publish race: a signal that arrived before
                # state["proc"] was visible found proc=None in _forward (a
                # later signal that DID find it set handoff — don't re-send).
                proc.send_signal(state["sig"])
            max_rss_bytes = (
                max_child_rss_gb * 2**30 if max_child_rss_gb else None
            )
            if (stall_timeout is not None and heartbeat_path is not None) or (
                max_rss_bytes is not None
            ):
                rc, hygiene = _wait_watching_stall(
                    proc, stall_timeout, heartbeat_path, stall_grace, log,
                    max_rss_bytes=max_rss_bytes, rss_grace=rss_grace,
                )
            else:
                rc, hygiene = proc.wait(), False
            state["proc"] = None
            if rc == 0 and not hygiene:
                log(f"supervise: run complete after {attempt} launch(es)")
                return 0
            if state["sig"] is not None:
                log(f"supervise: stop signal received; not restarting (child rc={rc})")
                return rc
            if rc == EXIT_NONFINITE:
                log("supervise: non-finite-loss abort is deterministic; not restarting")
                return rc
            end_step = latest_checkpoint_step(ckpt_dir)
            progressed = end_step is not None and (start_step is None or end_step > start_step)
            if progressed:
                failures_without_progress = 0
            else:
                failures_without_progress += 1
            if failures_without_progress > max_restarts:
                log(
                    f"supervise: {failures_without_progress} consecutive failures with no "
                    f"checkpoint progress (budget {max_restarts}); giving up with rc={rc}"
                )
                # A hygiene-killed child exits 0 from its preemption save;
                # returning 0 after giving up would read as success. 75 =
                # sysexits EX_TEMPFAIL.
                return rc if rc != 0 else 75
            delay = min(backoff * 2 ** max(0, failures_without_progress - 1), backoff_cap)
            kind = "hygiene-restarting" if hygiene else "restarting"
            log(
                f"supervise: child rc={rc} (checkpoint {start_step}->{end_step}, "
                f"progressed={progressed}); {kind} in {delay:.0f}s "
                f"[{failures_without_progress}/{max_restarts} budget used]"
            )
            sleep(delay)
    finally:
        for sig, h in prev_handlers.items():
            signal.signal(sig, h)


def main():
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", choices=sorted(PRESETS.keys()))
    p.add_argument("--project")
    p.add_argument("--data", default=None)
    p.add_argument("--execute", action="store_true", help="run the commands instead of printing")
    p.add_argument("--rehearse", type=int, default=None, metavar="N",
                   help="instead of gcloud: rehearse an N-process launch locally on CPU")
    args = p.parse_args()
    if args.rehearse:
        outs = rehearse_local(args.rehearse)
        print(f"rehearsal ok: {args.rehearse} processes")
        print(outs[0][-500:])
        return
    if not (args.preset and args.project):
        p.error("--preset and --project are required (or use --rehearse N)")
    cmds = render_commands(PRESETS[args.preset], args.project, args.data)
    print(cmds)
    if args.execute:
        import subprocess

        for cmd in cmds.splitlines():
            subprocess.run(cmd, shell=True, check=True)


if __name__ == "__main__":
    main()
