"""Device mesh + sharding helpers.

The reference is single-device (SURVEY §2: no tf.distribute anywhere);
multi-chip scaling here is first-class and TPU-native: a 1-D ``Mesh`` over
all local devices with batch-sharded data parallelism. Params/optimizer
state are replicated; XLA compiles the gradient all-reduce onto ICI.
Training-mode BatchNorm reduces batch statistics over the *global* batch
(sync-BN) because the mean/var reductions happen inside the same jit.

The axis layout is intentionally N-D-ready: ``make_mesh`` accepts an
``axes`` dict so a (data, model) mesh can be layered in without touching
call sites.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_multihost(coordinator_address=None, num_processes=None, process_id=None):
    """Join a multi-host JAX runtime (DCN between hosts, ICI within).

    Call once per process before any other JAX use. With no arguments, JAX
    auto-detects the TPU pod environment. After initialization,
    ``jax.devices()`` spans all hosts and ``make_mesh()`` builds the global
    mesh — the batch-sharded train step then runs unchanged, with each host
    feeding its local shard (use ``local_batch_slice`` to find it).
    """
    import jax

    kwargs = {}
    if coordinator_address:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def local_batch_slice(global_batch: int):
    """This process's slice of the global batch under 1-D data sharding."""
    import jax

    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


def make_mesh(devices=None, axes: dict | None = None) -> Mesh:
    """Build a mesh. Default: all devices on the 'data' axis."""
    if devices is None:
        devices = jax.devices()
    if axes is None:
        axes = {DATA_AXIS: len(devices)}
    names = tuple(axes)
    shape = tuple(axes.values())
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh axes {axes} need {np.prod(shape)} devices, got {len(devices)}")
    return Mesh(np.asarray(devices).reshape(shape), names)


def make_data_parallel_mesh(batch_size: int) -> Mesh | None:
    """Mesh over all devices for batch-sharded serving/evaluation, or None
    on a single device. Raises when ``batch_size`` is not divisible by the
    device count (XLA cannot shard the batch axis evenly)."""
    import jax

    if jax.device_count() <= 1:
        return None
    if batch_size % jax.device_count():
        raise ValueError(
            f"data_parallel needs batch_size ({batch_size}) divisible "
            f"by device count ({jax.device_count()})")
    return make_mesh()


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
