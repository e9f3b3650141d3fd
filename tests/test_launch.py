"""Launch layer gates.

The reference's launch layer was AzureML job submission + accelerate-launch
command strings (launchJob.py:46-96,122-142) — never testable offline. Ours
renders gcloud pod-slice commands (string-level gate) and can REHEARSE a
pod launch locally: the exact per-worker train.py command, run as N real
coordinated CPU processes through the full CLI -> jax.distributed ->
sharded-step -> multihost-checkpoint path.
"""

from clip_mixer_tpu.launch import PRESETS, rehearse_local, render_commands


def test_render_commands_structure():
    cmds = render_commands(PRESETS["mixer-b32-pod8"], project="my-proj", data_glob="gs://b/shards/*.tar")
    lines = cmds.splitlines()
    assert len(lines) == 4
    create, upload, setup, run = lines
    assert "tpu-vm create clip-mixer-b32" in create
    assert "--accelerator-type v5litepod-8" in create
    # fresh VMs have no code: the checkout is scp'd to every worker first
    assert "scp --recurse ." in upload and "--worker=all" in upload
    assert "--worker=all" in setup and "--worker=all" in run
    assert "python train.py --preset mixer-b32" in run
    assert "--global-batch-size 32768" in run


def test_render_commands_quoting_survives_both_shells():
    """The run line passes through TWO shells (local -> gcloud --command ->
    remote bash). shlex-split it as the local shell would and check the glob
    arrives as ONE quoted argument of the remote command — nested quoting
    once cancelled the outer quotes and let the worker shell expand the
    glob."""
    import shlex

    cmds = render_commands(PRESETS["mixer-b32-pod8"], project="p", data_glob="gs://b/sh ards/*.tar")
    run = cmds.splitlines()[-1]
    argv = shlex.split(run)  # local shell view: must be ONE gcloud invocation
    assert argv[0] == "gcloud"
    remote = argv[argv.index("--command") + 1]
    assert remote.startswith("cd clip-mixer-tpu")
    # remote shell view: --data gets the glob verbatim, space and all
    remote_argv = shlex.split(remote.split("&&", 1)[1])
    assert remote_argv[remote_argv.index("--data") + 1] == "gs://b/sh ards/*.tar"


def test_render_all_presets_distinct():
    rendered = {name: render_commands(p, "proj") for name, p in PRESETS.items()}
    assert len(set(rendered.values())) == len(rendered)
    for text in rendered.values():
        assert "gcloud compute tpus tpu-vm" in text


def test_rehearse_local_two_process(tmp_path):
    """2-process local rehearsal of the pod launch: train.py end to end
    (CLI, explicit rendezvous, per-host synthetic shards, cross-process
    train step, multihost orbax checkpoint). --freeze-serving rides along:
    the completion export is a COLLECTIVE save followed by a rank-0-gated
    freeze — exactly the ordering class that can deadlock a pod, so it must
    be exercised across real process boundaries."""
    outs = rehearse_local(
        n_processes=2,
        train_args=(
            "--preset mixer-debug --synthetic --global-batch-size 8 "
            "--steps-per-epoch 2 --epochs 1 --checkpoint-every 2 "
            "--no-validators --run-name rehearsal --freeze-serving --verbose"
        ),
        cwd=str(tmp_path),
        timeout=420.0,
    )
    assert len(outs) == 2
    # process 0 printed the distributed bootstrap and trained
    joined = "\n".join(outs)
    assert "process 0/2" in joined and "process 1/2" in joined
    # the multihost checkpoint exists
    ckpt_dir = tmp_path / "outputs" / "rehearsal" / "checkpoints"
    assert ckpt_dir.exists() and any(ckpt_dir.iterdir())
    # the completion export carries the rank-0-frozen serving programs
    manifest = tmp_path / "outputs" / "rehearsal" / "export" / "servable" / "manifest.json"
    assert manifest.exists()


def test_preflight_go_and_no_go(tmp_path, capsys):
    """scripts/preflight.py: all host checks pass in this env (the device
    subprocess is pointed at the CPU platform via --platform), a good shard
    glob passes, and a bad glob flips the report to NO-GO with exit count 1."""
    import importlib.util
    from pathlib import Path as _Path

    import numpy as np

    from clip_mixer_tpu.data.pipeline import write_tar_shards

    spec = importlib.util.spec_from_file_location(
        "preflight", str(_Path(__file__).resolve().parents[1] / "scripts" / "preflight.py")
    )
    pf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pf)

    rng = np.random.default_rng(0)
    samples = [(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8), "cap")]
    write_tar_shards(iter(samples), str(tmp_path / "sh"), samples_per_shard=1)

    pf._RESULTS.clear()
    rc = pf.main(["--data", str(tmp_path / "sh" / "*.tar"),
                  "--preset", "mixer-debug", "--device-timeout", "120",
                  "--platform", "cpu"])
    out = capsys.readouterr().out
    assert rc == 0 and "GO: 0 failed" in out

    pf._RESULTS.clear()
    rc = pf.main(["--data", str(tmp_path / "nothing" / "*.tar"),
                  "--device-timeout", "120", "--platform", "cpu"])
    out = capsys.readouterr().out
    assert rc == 1 and "NO-GO" in out and "no shards match" in out
