"""Real multi-process validation of the multi-host hooks (SURVEY §5).

Launches tools/multihost_smoke.py as TWO separate processes (2 virtual CPU
devices each → a 4-device global mesh spanning processes), joined through
``jax.distributed.initialize`` with Gloo collectives — the CPU stand-in
for a multi-host TPU pod (DCN between hosts). Checks that

* both processes complete one global batch-sharded DP train step,
* they agree on the (replicated) global loss, and
* that loss matches a single-process run over the same global batch —
  i.e. the cross-process gradient all-reduce and sync-BN statistics
  compute the same math as local execution.
"""

import os
import re
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def smoke_losses(repo_root):
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "tools/multihost_smoke.py",
             "--coordinator", f"localhost:{port}",
             "--num_processes", "2", "--process_id", str(pid),
             "--platform", "cpu"],
            cwd=repo_root, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    losses = []
    for out in outs:
        m = re.search(r"MULTIHOST_OK procs=(\d+) devices=(\d+) loss=([\d.eE+-]+)", out)
        assert m, f"no MULTIHOST_OK line in:\n{out[-3000:]}"
        assert m.group(1) == "2" and m.group(2) == "4"
        losses.append(float(m.group(3)))
    return losses


def test_two_process_step_agrees_across_processes(smoke_losses):
    assert smoke_losses[0] == pytest.approx(smoke_losses[1], rel=1e-6)


def test_train_cli_multihost(repo_root, toy_dataset, tmp_path):
    """The actual train CLI across 2 processes: `multihost:` config key →
    global 4-device mesh, per-process local-shard feeding, process-0-only
    checkpoint writes (BASELINE configs[3] scaled down to CPU)."""
    import yaml

    from .conftest import SUITE_XLA_CACHE, absolutize_run_config

    base = yaml.safe_load(open(os.path.join(repo_root, "config/train_config.yaml")))
    absolutize_run_config(base, repo_root)  # CLI runs from a scratch cwd
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["YOLOV3_TPU_PLATFORM"] = "cpu"
    # share the suite's persistent compile cache with the spawned CLIs —
    # this test pays two full-model CPU compiles per run otherwise
    env["YOLOV3_TPU_COMPILE_CACHE"] = SUITE_XLA_CACHE

    def run_both(epochs):
        port = _free_port()
        procs = []
        for pid in range(2):
            # per-PROCESS checkpoint paths model a pod WITHOUT a shared
            # filesystem: only process 0 (the writer) ever has a state
            # file, so resume must be decided and sourced from process 0
            cfg = dict(base, image_size=96, epochs=epochs, batch_size=4,
                       training_mode="fit", resume=True,
                       output_checkpoints_path=str(tmp_path / f"mh{pid}.tf"),
                       multihost={"coordinator_address": f"localhost:{port}",
                                  "num_processes": 2, "process_id": pid})
            cfg_path = tmp_path / f"cfg{pid}.yaml"
            cfg_path.write_text(yaml.safe_dump(cfg))
            procs.append(subprocess.Popen(
                [sys.executable, os.path.join(repo_root, "train.py"),
                 "--config", str(cfg_path)],
                cwd=str(tmp_path), env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
        outs = [p.communicate(timeout=900)[0] for p in procs]
        for p, out in zip(procs, outs):
            assert p.returncode == 0, f"train process failed:\n{out[-4000:]}"
        return outs

    outs = run_both(epochs=1)
    assert "multihost: process 0/2, 2 local / 4 global devices" in outs[0]
    assert "multihost: process 1/2, 2 local / 4 global devices" in outs[1]
    for out in outs:
        assert "data-parallel over 4 devices" in out
    # process 0 wrote the checkpoint + full train state; process 1 didn't
    assert os.path.exists(tmp_path / "mh0.tf.npz")
    assert os.path.exists(tmp_path / "mh0.tf.train_state.npz")
    assert not os.path.exists(tmp_path / "mh1.tf.npz")

    # resume: only process 0 has the state file — the decision and the
    # restored state must be broadcast so both processes start at epoch 2
    # with identical parameters (divergence would corrupt the all-reduce
    # or hang one process in a collective)
    outs = run_both(epochs=2)
    for out in outs:
        assert "resumed full train state" in out and "at epoch 2" in out


def _epoch_series(out):
    """Parse the trainer's per-epoch loss lines into {metric: {epoch: val}}."""
    series = {"train_loss": {}, "val_loss": {}}
    for metric in series:
        for m in re.finditer(rf"epoch (\d+): {metric} ([\d.eE+-]+)", out):
            series[metric][int(m.group(1))] = float(m.group(2))
    return series


def test_two_process_loss_trajectory_matches_single_process(
        repo_root, toy_dataset, tmp_path):
    """VERDICT r3 item 8: multi-epoch realism, not just one-step equality.

    Runs the train CLI with the convergence recipe's config keys (fit mode,
    cosine LR + warmup, seeded shuffle) for 3 epochs as TWO Gloo-joined
    processes and as ONE process, and asserts the per-epoch train/val loss
    trajectories match. Every process iterates the same deterministic
    dataset and feeds its local_batch_slice, so the global math must match
    single-process execution up to all-reduce summation order — across
    LR-schedule steps, BN-statistics updates, and optimizer state
    evolution, not just the first step.

    The control is a SINGLE process over the same 4 virtual devices, so
    both runs compile the identical 4-way GSPMD partitioning and only the
    collective transport differs (Gloo across processes vs in-process).
    Exact equality is unattainable here and the tolerance says why: early
    YOLO training is chaotic (first-epoch losses ~100, LR warmup), so ANY
    per-step rounding difference compounds across optimizer steps.
    Measured drift by control: bf16 + different partitioning 2.2-10%;
    fp32 + different partitioning 0.7%; fp32 + SAME partitioning, Gloo
    transport only (this test) 0.4-3% — Gloo's summation order differs
    from the in-process all-reduce. A real sharding bug (unsynced grads,
    double-counted shards) diverges by orders of magnitude instead;
    one-step bitwise-level equality (1e-4) is pinned separately by
    test_two_process_step_matches_single_process."""
    import yaml

    from .conftest import SUITE_XLA_CACHE, absolutize_run_config

    base = yaml.safe_load(open(os.path.join(repo_root, "config/train_config.yaml")))
    absolutize_run_config(base, repo_root)
    base.update(image_size=96, epochs=3, batch_size=4, training_mode="fit",
                resume=False, seed=7, shuffle=True, mixed_precision=False,
                lr_schedule={"type": "cosine", "warmup_epochs": 1,
                             "min_lr_fraction": 0.05},
                weights_save_peroid=10 ** 9)
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["YOLOV3_TPU_PLATFORM"] = "cpu"
    env["YOLOV3_TPU_COMPILE_CACHE"] = SUITE_XLA_CACHE

    def launch(cfg, name):
        cfg_path = tmp_path / f"{name}.yaml"
        cfg_path.write_text(yaml.safe_dump(cfg))
        return subprocess.Popen(
            [sys.executable, os.path.join(repo_root, "train.py"),
             "--config", str(cfg_path)],
            cwd=str(tmp_path), env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)

    port = _free_port()
    procs = [launch(dict(base,
                         output_checkpoints_path=str(tmp_path / f"t{pid}.tf"),
                         multihost={"coordinator_address": f"localhost:{port}",
                                    "num_processes": 2, "process_id": pid}),
                    f"mh{pid}") for pid in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"train process failed:\n{out[-4000:]}"

    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    single = launch(dict(base, output_checkpoints_path=str(tmp_path / "sp.tf")),
                    "single")
    sp_out = single.communicate(timeout=900)[0]
    assert single.returncode == 0, f"single-process failed:\n{sp_out[-4000:]}"

    mh, sp = _epoch_series(outs[0]), _epoch_series(sp_out)
    for metric in ("train_loss", "val_loss"):
        assert sorted(mh[metric]) == [1, 2, 3], (metric, mh[metric])
        assert sorted(sp[metric]) == [1, 2, 3], (metric, sp[metric])
        for epoch in (1, 2, 3):
            # chaos-amplified transport rounding: measured ≤3% (docstring);
            # a genuine divergence is orders of magnitude
            assert mh[metric][epoch] == pytest.approx(
                sp[metric][epoch], rel=5e-2), (metric, epoch, mh, sp)
        # and the trajectory actually trains: strictly decreasing
        assert mh[metric][1] > mh[metric][2] > mh[metric][3], mh
    # both processes report the identical (replicated) trajectory
    assert _epoch_series(outs[1])["train_loss"] == mh["train_loss"]


def test_two_process_step_matches_single_process(smoke_losses, repo_root):
    from yolov3_tpu.models import init_model, parse_model_config
    from yolov3_tpu.models.network import head_grid_sizes
    from yolov3_tpu.parallel.train_step import (
        init_train_state,
        make_adam,
        make_train_step,
    )

    spec = parse_model_config(
        os.path.join(repo_root, "config/models/yolov3_tiny/model.yaml"), nclasses=3)
    params, state = init_model(jax.random.PRNGKey(0), spec)
    grid_sizes = head_grid_sizes(spec, 96)
    anchors = np.array(
        [[0.1, 0.1], [0.2, 0.2], [0.3, 0.3],
         [0.4, 0.4], [0.5, 0.5], [0.6, 0.6]], np.float32).reshape(2, 3, 2)
    batch = 4  # matches the smoke: 2 procs × 2 devices × 1 img/device
    optimizer = make_adam(1e-3)
    step = make_train_step(spec, anchors, grid_sizes, batch_size=batch,
                           optimizer=optimizer)
    ts = init_train_state(params, state, optimizer)
    rng = np.random.RandomState(0)
    images = rng.rand(batch, 96, 96, 3).astype(np.float32)
    labels = np.zeros((batch, 5, 6), np.float32)
    labels[:, 0] = [0.2, 0.2, 0.5, 0.5, 1, 1]
    _, metrics = step(ts, images, labels)
    ref = float(metrics["total_loss"])
    # cross-process all-reduce reorders fp32 sums → tolerance, not equality
    assert smoke_losses[0] == pytest.approx(ref, rel=1e-4)
