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
    """gcloud command sequence: create the slice, install, run on all workers."""
    train_args = preset.train_args
    if data_glob:
        train_args += f" --data {shlex.quote(data_glob)}"
    create = (
        f"gcloud compute tpus tpu-vm create {preset.name} "
        f"--project {project} --zone {preset.zone} "
        f"--accelerator-type {preset.accelerator} --version {preset.runtime_version}"
    )
    setup = (
        f"gcloud compute tpus tpu-vm ssh {preset.name} --project {project} --zone {preset.zone} "
        f"--worker=all --command 'pip install -e clip-mixer-tpu/'"
    )
    # Same command on every worker; jax.distributed.initialize() discovers the
    # slice topology (the NCCL/MASTER_ADDR plumbing of launchJob.py:134-138
    # has no TPU equivalent to configure).
    run = (
        f"gcloud compute tpus tpu-vm ssh {preset.name} --project {project} --zone {preset.zone} "
        f"--worker=all --command 'cd clip-mixer-tpu && python train.py {train_args}'"
    )
    return "\n".join((create, setup, run))


def main():
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", required=True, choices=sorted(PRESETS.keys()))
    p.add_argument("--project", required=True)
    p.add_argument("--data", default=None)
    p.add_argument("--execute", action="store_true", help="run the commands instead of printing")
    args = p.parse_args()
    cmds = render_commands(PRESETS[args.preset], args.project, args.data)
    print(cmds)
    if args.execute:
        import subprocess

        for cmd in cmds.splitlines():
            subprocess.run(cmd, shell=True, check=True)


if __name__ == "__main__":
    main()
