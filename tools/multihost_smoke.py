"""Multi-host data-parallel smoke: one global DP train step across processes.

The reference is single-process with no distributed backend (SURVEY §2:
no tf.distribute anywhere). Multi-host here is TPU-native: each host
process joins the runtime via ``initialize_multihost`` (gRPC control
plane; collectives ride ICI within a host and DCN across hosts — Gloo on
CPU), builds ONE global mesh over every host's devices, feeds its own
slice of the global batch (``local_batch_slice``), and runs the same
batch-sharded train step the single-host path uses — XLA inserts the
gradient all-reduce, and BatchNorm statistics reduce over the *global*
batch (sync-BN) because they live inside the same jit.

On a real TPU pod, run on every host with no arguments (auto-detect):

    python tools/multihost_smoke.py

To demo/validate without a pod, run N local CPU processes — this is
exactly what tests/test_multihost.py does:

    XLA_FLAGS=--xla_force_host_platform_device_count=2 \
      python tools/multihost_smoke.py --coordinator localhost:9876 \
        --num_processes 2 --process_id 0 --platform cpu   # and 1

Each process prints ``MULTIHOST_OK procs=<n> devices=<d> loss=<float>``;
the loss is the global batch loss and must be identical on every process
(and equal to a single-process run over the same global batch).
"""

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (omit on TPU pods: auto)")
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--process_id", type=int, default=None)
    ap.add_argument("--platform", default=None,
                    help="force a JAX platform (e.g. cpu) before init")
    ap.add_argument("--image_size", type=int, default=96)
    ap.add_argument("--per_device_batch", type=int, default=1)
    args = ap.parse_args()

    import jax

    if args.platform:
        # must happen before any backend use; the site hook may have
        # pre-imported jax with a different default platform
        jax.config.update("jax_platforms", args.platform)

    from yolov3_tpu.parallel.mesh import (
        batch_sharding,
        initialize_multihost,
        local_batch_slice,
        make_mesh,
        replicated_sharding,
    )

    initialize_multihost(args.coordinator, args.num_processes, args.process_id)

    import numpy as np

    from yolov3_tpu.models import init_model, parse_model_config
    from yolov3_tpu.models.network import head_grid_sizes
    from yolov3_tpu.parallel.train_step import (
        init_train_state,
        make_adam,
        make_train_step,
    )

    mesh = make_mesh()  # ONE global mesh over all hosts' devices
    ndev = jax.device_count()
    batch = args.per_device_batch * ndev

    spec = parse_model_config(
        os.path.join(_REPO, "config/models/yolov3_tiny/model.yaml"), nclasses=3)
    # identical seed on every process → replicated params need no broadcast
    params, state = init_model(jax.random.PRNGKey(0), spec)
    grid_sizes = head_grid_sizes(spec, args.image_size)
    anchors = np.array(
        [[0.1, 0.1], [0.2, 0.2], [0.3, 0.3],
         [0.4, 0.4], [0.5, 0.5], [0.6, 0.6]], np.float32).reshape(2, 3, 2)

    optimizer = make_adam(1e-3)
    step = make_train_step(spec, anchors, grid_sizes, batch_size=batch,
                           optimizer=optimizer, mesh=mesh)
    ts = init_train_state(params, state, optimizer)
    ts = jax.device_put(ts, replicated_sharding(mesh))

    # every process generates the same deterministic GLOBAL batch, then
    # contributes only its slice — the production pattern is each host
    # loading only its shard of the dataset (apps/train_app.py)
    rng = np.random.RandomState(0)
    images = rng.rand(batch, args.image_size, args.image_size, 3).astype(np.float32)
    labels = np.zeros((batch, 5, 6), np.float32)
    labels[:, 0] = [0.2, 0.2, 0.5, 0.5, 1, 1]

    sl = local_batch_slice(batch)
    data = batch_sharding(mesh)
    g_images = jax.make_array_from_process_local_data(data, images[sl])
    g_labels = jax.make_array_from_process_local_data(data, labels[sl])

    ts, metrics = step(ts, g_images, g_labels)
    loss = float(metrics["total_loss"])
    assert np.isfinite(loss), f"non-finite loss {loss}"
    print(f"MULTIHOST_OK procs={jax.process_count()} devices={ndev} "
          f"loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
