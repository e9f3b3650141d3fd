"""Full-fidelity dress rehearsal of the reference's production training run.

The reference's headline run: Mixer-B/32, global batch 32,768, fp16, 8xA100,
LAION-COCO webdataset shards, checkpoint+validate every 400 steps, crash
resume from checkpoints (/root/reference/training/training.py:56-62,197-205).
This script reproduces that composition on ONE v5e chip against the locally
generated natural-ish shard set (scripts/make_dress_dataset.py):

  * the real train.py CLI under the elastic supervisor (scripts/supervise.py),
  * global batch 32,768 via exact GradCache accumulation (--accum-steps),
  * decode-once RAM/disk cache (--cache-data) — one core cannot JPEG-decode
    2k imgs/s; the cache is the tf.data .cache() answer,
  * RetrievalValidator on a held-out shard (--val-data),
  * checkpoint cadence 400, and a mid-run hard crash (--crash-after-steps)
    that the supervisor must recover from checkpoints,

then distills outputs/<run>/metrics.jsonl into TRAIN_DRESS.json: loss curve,
retrieval-metric series, steady-state imgs/s at the 32k batch, restart count,
and the resume boundary.

Usage:
  python scripts/dress_rehearsal.py --steps 510 --accum 16 \
      --data '/root/data/dress/0000[0-8].tar' --val-data /root/data/dress/00009.tar
"""

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def read_metrics(run_dir: Path):
    series = {}
    path = run_dir / "runs" / "metrics.jsonl"
    if not path.exists():
        return series
    for line in path.read_text().splitlines():
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue  # truncated tail line from a crash
        series.setdefault(rec["name"], []).append((rec["step"], rec["value"]))
    return series


def thin(points, keep=60):
    if len(points) <= keep:
        return points
    stride = -(-len(points) // keep)  # ceil: never exceed ~keep points
    out = points[::stride]
    if out[-1] != points[-1]:
        out.append(points[-1])
    return out


def checkpoint_steps(run_dir: Path):
    """Step ids of the checkpoints the run left behind (orbax step-named
    dirs) — the resume-boundary evidence: a crash at step C with latest
    checkpoint K means the supervisor restarted from K and re-ran (C-K]."""
    d = Path(run_dir) / "checkpoints"
    if not d.exists():
        return []
    return sorted(int(p.name) for p in d.iterdir() if p.name.isdigit())


def distill(series, wall, returncode, crash_after_steps=0, ckpt_steps=()):
    """Reduce a run's metric series to the committed TRAIN_DRESS record."""
    losses = series.get("Loss", [])
    ips = series.get("Throughput (imgs/s)", [])
    # trainer scalar names: "Retrieval I->T R@1" etc (evals/validators.py)
    retrieval = {k: thin(v, 30) for k, v in series.items()
                 if k.lower().startswith("retrieval")}
    steady = sorted(v for _, v in ips[len(ips) // 2:]) if ips else []
    return {
        "supervisor_exit": returncode,
        "wall_seconds": round(wall, 1),
        "steps_completed": losses[-1][0] if losses else 0,
        "loss_first": losses[0][1] if losses else None,
        "loss_last": losses[-1][1] if losses else None,
        "loss_curve": thin(losses, 80),
        "imgs_per_sec_median_steady": steady[len(steady) // 2] if steady else None,
        "imgs_per_sec_series": thin(ips, 40),
        "retrieval": retrieval,
        "checkpoint_steps": list(ckpt_steps),
        # with --crash-after-steps each launch dies after exactly N local
        # steps, so completed_steps // N is the number of crash->resume cycles
        "restarts": ((losses[-1][0] if losses else 0) // crash_after_steps
                     if crash_after_steps else 0),
    }


def write_result(out_path, result, leg=None):
    """Write the distilled run record; with ``leg``, merge under legs[leg]
    so the two rehearsal legs accumulate into one TRAIN_DRESS.json."""
    out_path = Path(out_path)
    if leg:
        doc = {}
        if out_path.exists():
            try:
                doc = json.loads(out_path.read_text())
            except json.JSONDecodeError:
                doc = {}
        doc.setdefault("legs", {})[leg] = result
        out_path.write_text(json.dumps(doc, indent=2))
    else:
        out_path.write_text(json.dumps(result, indent=2))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", default="/root/data/dress/0000[0-8].tar")
    p.add_argument("--val-data", default="/root/data/dress_val/00000.tar")
    p.add_argument("--cache-dir", default="/root/data/cache")
    p.add_argument("--steps", type=int, default=510)
    p.add_argument("--global-batch", type=int, default=32768)  # training.py:56
    p.add_argument("--accum", type=int, default=16)
    p.add_argument("--checkpoint-every", type=int, default=400)  # training.py:197
    p.add_argument("--validate-every", type=int, default=100)
    p.add_argument("--crash-after-steps", type=int, default=450,
                   help="hard-crash each launch after N local steps (0 = off); "
                        "the supervisor resumes from the last checkpoint. Must "
                        "exceed --checkpoint-every: a crash BEFORE the first "
                        "checkpoint resumes from step 0 and re-crashes at the "
                        "same point — no progress, and the supervisor's "
                        "no-progress budget correctly aborts the run")
    p.add_argument("--run-name", default="dress")
    p.add_argument("--out", default="TRAIN_DRESS.json")
    p.add_argument("--max-restarts", type=int, default=8)
    p.add_argument("--stall-timeout", type=float, default=1800.0,
                   help="supervise hang detection (a live tunnel stall left "
                        "the first rehearsal attempt futex-waiting forever); "
                        "must exceed startup (cache fill + compile) and a "
                        "validation pass. 0 disables.")
    p.add_argument("--max-child-rss-gb", type=float, default=95.0,
                   help="supervise RSS hygiene budget: the axon tunnel "
                        "retains ~95%% of every device_put payload host-side "
                        "(measured: 294MB kept per 308MB batch — a 510-step "
                        "leg at global batch 2048 leaks ~150GB and "
                        "host-OOMs ~step 450, before its own fault "
                        "injection). Keep per-incarnation transfer volume "
                        "(batch x crash-after-steps) UNDER this budget so "
                        "the planned crash fires first; the hygiene restart "
                        "is the backstop, preemption-saving instead of "
                        "OOMing. 0 disables.")
    p.add_argument("--leg", default=None, metavar="NAME",
                   help="record the result under legs[NAME] in --out, merging "
                        "with existing legs — the rehearsal is run as two legs "
                        "(the reference's 32k global batch for composition "
                        "fidelity; a ≥500-step leg at a batch the remote-TPU "
                        "tunnel can feed) because one chip's host link cannot "
                        "ship 6.4GB/step of uint8 500 times in a session")
    p.add_argument("--n-samples", type=int, default=90000,
                   help="train samples in --data (sets steps/epoch)")
    args = p.parse_args()

    run_dir = REPO / "outputs" / args.run_name
    # epochs is derived from the requested step count; the cache serves
    # floor(n_samples / batch) full batches per epoch
    import math

    steps_per_epoch = max(1, args.n_samples // args.global_batch)
    epochs = math.ceil(args.steps / steps_per_epoch)

    train_args = [
        "--preset", "mixer-b32",
        "--data", args.data,
        "--cache-data", args.cache_dir,
        "--global-batch-size", str(args.global_batch),
        "--accum-steps", str(args.accum),
        "--epochs", str(epochs),
        "--checkpoint-every", str(args.checkpoint_every),
        "--validate-every", str(args.validate_every),
        "--no-validators",  # offline HF validators skip anyway; retrieval rides --val-data
        "--val-data", args.val_data,
        "--val-samples", "2048",
        "--run-name", args.run_name,
        "--verbose",
    ]
    if args.crash_after_steps:
        train_args += ["--crash-after-steps", str(args.crash_after_steps)]

    sup_args = ["--max-restarts", str(args.max_restarts)]
    if args.stall_timeout:
        sup_args += ["--stall-timeout", str(args.stall_timeout)]
    if args.max_child_rss_gb and args.max_child_rss_gb > 0:
        sup_args += ["--max-child-rss-gb", str(args.max_child_rss_gb)]
    cmd = [sys.executable, str(REPO / "scripts" / "supervise.py"),
           *sup_args, "--"] + train_args
    print("[dress] launching:", " ".join(cmd), flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO)
    wall = time.time() - t0

    result = distill(read_metrics(run_dir), wall, proc.returncode,
                     crash_after_steps=args.crash_after_steps,
                     ckpt_steps=checkpoint_steps(run_dir))
    result["config"] = {
        "preset": "mixer-b32",
        "global_batch_size": args.global_batch,
        "accum_steps": args.accum,
        "steps_requested": args.steps,
        "checkpoint_every": args.checkpoint_every,
        "validate_every": args.validate_every,
        "crash_after_steps": args.crash_after_steps,
        "data": args.data,
        "val_data": args.val_data,
    }
    losses = result["loss_curve"]
    write_result(REPO / args.out, result, args.leg)
    print(json.dumps({k: result[k] for k in (
        "steps_completed", "loss_first", "loss_last",
        "imgs_per_sec_median_steady", "wall_seconds", "supervisor_exit")}))
    return 0 if proc.returncode == 0 and losses else 1


if __name__ == "__main__":
    sys.exit(main())
