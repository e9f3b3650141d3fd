"""Elastic-recovery supervisor: keep a training run alive across crashes.

    python scripts/supervise.py [--max-restarts 3] [--backoff 5] -- \\
        --preset mixer-b32 --data '/data/shards/*.tar' --run-name run1

Everything after ``--`` is a train.py command line; the supervisor launches
it and relaunches it after transient failures (host OOM-kill, tunnel blips,
data hiccups — anything with a nonzero exit). Resume comes from the
Trainer's own orbax checkpoints (kill-and-resume is bitwise deterministic,
tests/test_trainer_resume.py), so a restart costs at most
``--checkpoint-every`` steps of recomputation.

The restart budget is progress-aware (see clip_mixer_tpu.launch.supervise):
``--max-restarts`` bounds *consecutive restarts without a new checkpoint* —
a run that keeps advancing restarts forever, a crash-loop does not. Two
failures are never restarted: the deterministic non-finite-loss abort
(train.py exits launch.EXIT_NONFINITE) and an operator SIGTERM/SIGINT
(forwarded to the child so its preemption save runs).

On a pod slice, run one supervisor per worker (same flags everywhere) —
when any worker dies, the jax.distributed heartbeat tears down its peers
and every supervisor relaunches its local worker together.

Drill it without waiting for a real failure:

    python scripts/supervise.py -- --preset mixer-debug --synthetic \\
        --platform cpu --steps-per-epoch 8 --epochs 1 \\
        --checkpoint-every 2 --crash-after-steps 5 --no-validators

The reference has no supervisor — a crashed AzureML job stayed down until
someone relaunched it and Accelerate resumed (training/training.py:106-131).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clip_mixer_tpu.launch import supervise  # noqa: E402


def derive_flag_value(train_args, flag, default):
    """The value ``flag`` resolves to in a train.py command line, mirroring
    argparse's accepted spellings ('--flag VALUE' and '--flag=VALUE', last
    occurrence wins). Returns None for a missing value (caller errors out) —
    a silent mis-parse here would watch the wrong checkpoint/heartbeat path
    and defeat the progress-aware restart budget / stall watchdog."""
    value = default
    for i, a in enumerate(train_args):
        if a == flag:
            if i + 1 >= len(train_args):
                return None
            value = train_args[i + 1]
        elif a.startswith(flag + "="):
            value = a.split("=", 1)[1]
    return value


def derive_run_name(train_args):
    return derive_flag_value(train_args, "--run-name", "run")


def main(argv=None):
    argv = sys.argv[1:] if argv is None else list(argv)
    if "--" in argv:
        split = argv.index("--")
        sup_args, train_args = argv[:split], argv[split + 1:]
    else:
        sup_args, train_args = argv, []

    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    p.add_argument("--max-restarts", type=int, default=3,
                   help="consecutive restarts allowed WITHOUT checkpoint progress")
    p.add_argument("--backoff", type=float, default=5.0,
                   help="base restart delay, doubled per no-progress failure")
    p.add_argument("--ckpt-dir", default=None,
                   help="checkpoint dir watched for progress (default: derived "
                        "from the train args' --run-name: outputs/<run>/checkpoints)")
    p.add_argument("--stall-timeout", type=float, default=None, metavar="SEC",
                   help="hang detection: kill + restart the child when the "
                        "Trainer's per-step heartbeat file goes stale this long "
                        "(set it LARGER than startup: restore + first compile + "
                        "cache fill — and than a validation pass). Default off; "
                        "0 or negative also disables.")
    p.add_argument("--stall-grace", type=float, default=30.0, metavar="SEC",
                   help="seconds between the stall SIGTERM and the SIGKILL")
    p.add_argument("--max-child-rss-gb", type=float, default=None, metavar="GB",
                   help="RSS hygiene restart: when the child process tree "
                        "exceeds this resident-set budget, SIGTERM it (the "
                        "Trainer writes its graceful preemption checkpoint) "
                        "and relaunch — a planned restart, taken even on "
                        "rc=0. Use on transports that leak host memory per "
                        "byte transferred (the axon remote-TPU tunnel "
                        "retains ~95% of every device_put payload — "
                        "docs/OPERATIONS.md). 0 or negative disables.")
    p.add_argument("--rss-grace", type=float, default=600.0, metavar="SEC",
                   help="seconds the hygiene SIGTERM waits before SIGKILL — "
                        "must cover a full preemption save (device_get of "
                        "the whole state + checkpoint write) through a slow "
                        "tunnel")
    p.add_argument("--heartbeat", default=None,
                   help="heartbeat file watched by --stall-timeout (default: "
                        "derived from --run-name + --process-id in the train "
                        "args: outputs/<run>/heartbeat-<process_index>; when "
                        "--process-id is absent — e.g. real pods where "
                        "jax.distributed auto-detects the index — the glob "
                        "outputs/<run>/heartbeat-* is watched, newest mtime "
                        "wins)")
    args = p.parse_args(sup_args)
    if not train_args:
        p.error("pass the train.py arguments after '--'")

    ckpt_dir = args.ckpt_dir
    if ckpt_dir is None:
        run_name = derive_run_name(train_args)
        if run_name is None:
            p.error("--run-name in the train args is missing its value")
        ckpt_dir = str(Path("outputs") / run_name / "checkpoints")

    stall_kwargs = {}
    if args.stall_timeout is not None and args.stall_timeout > 0:
        heartbeat = args.heartbeat
        if heartbeat is None:
            run_name = derive_run_name(train_args)
            if run_name is None:
                p.error("--run-name in the train args is missing its value")
            has_pid = any(
                a == "--process-id" or a.startswith("--process-id=")
                for a in train_args
            )
            if has_pid:
                process_id = derive_flag_value(train_args, "--process-id", "0")
                if process_id is None:
                    p.error("--process-id in the train args is missing its value")
                heartbeat = str(Path("outputs") / run_name / f"heartbeat-{process_id}")
            else:
                # No --process-id (real pods: jax.distributed auto-detects
                # the index, so the Trainer's heartbeat-<process_index>
                # suffix is unknowable here). Watch the whole family —
                # launch.supervise treats a glob as newest-mtime-wins — so
                # non-zero workers aren't judged by a heartbeat-0 file they
                # never touch.
                heartbeat = str(Path("outputs") / run_name / "heartbeat-*")
        if "://" in heartbeat:
            p.error("--stall-timeout needs a LOCAL run dir (the heartbeat "
                    "file mtime is read off the local filesystem)")
        stall_kwargs = dict(
            stall_timeout=args.stall_timeout,
            heartbeat_path=heartbeat,
            stall_grace=args.stall_grace,
        )

    if args.max_child_rss_gb is not None and args.max_child_rss_gb > 0:
        stall_kwargs.update(
            max_child_rss_gb=args.max_child_rss_gb, rss_grace=args.rss_grace
        )

    train_py = str(Path(__file__).resolve().parents[1] / "train.py")
    cmd = [sys.executable, train_py, *train_args]
    return supervise(cmd, ckpt_dir, max_restarts=args.max_restarts,
                     backoff=args.backoff, **stall_kwargs)


if __name__ == "__main__":
    sys.exit(main())
