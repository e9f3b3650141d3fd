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
