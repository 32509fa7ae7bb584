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
