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

Spatial partitioning (SP): the second mesh axis this model family *does*
have. A CNN has no sequence/expert/tensor axes worth sharding, but its
activations have a large spatial extent — sharding the image-height dim
over a ``spatial`` mesh axis makes XLA's SPMD partitioner split every
conv spatially and insert halo exchanges (collective-permutes of the
kernel-overlap rows) over ICI automatically. This is the classic
TPU-native way to put multiple chips on ONE image: it scales
single-image latency and enables resolutions whose activations exceed
one chip's HBM, where data parallelism can't help (B=1 has nothing to
shard). Use a (data × spatial) mesh: batch shards over ``data``, image
rows over ``spatial``; params/optimizer state replicate over both.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


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


def make_mesh(devices=None, axes: dict | None = None, spatial: int = 1) -> Mesh:
    """Build a mesh. Default: all devices on the 'data' axis.

    ``spatial`` > 1 builds a 2-D (data × spatial) mesh: the device count
    must be divisible by ``spatial``; the data axis gets the rest.
    """
    if devices is None:
        devices = jax.devices()
    if axes is None:
        spatial = int(spatial)
        if spatial < 1 or len(devices) % spatial:
            raise ValueError(
                f"spatial_partitioning ({spatial}) must divide the device "
                f"count ({len(devices)})")
        axes = {DATA_AXIS: len(devices) // spatial}
        if spatial > 1:
            axes[SPATIAL_AXIS] = spatial
    names = tuple(axes)
    shape = tuple(axes.values())
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh axes {axes} need {np.prod(shape)} devices, got {len(devices)}")
    return Mesh(np.asarray(devices).reshape(shape), names)


def make_data_parallel_mesh(batch_size: int, spatial: int = 1) -> Mesh | None:
    """Mesh over all devices for sharded serving/evaluation, or None on a
    single device. The batch must divide evenly over the data axis (XLA
    cannot shard the batch axis unevenly); with ``spatial`` > 1 the data
    axis is ``device_count // spatial`` — e.g. 8 chips, ``spatial: 8``,
    batch 1 is the pure-SP single-image latency configuration."""
    import jax

    if jax.device_count() <= 1:
        if int(spatial) > 1:
            raise ValueError("spatial_partitioning needs more than one device")
        return None
    data_size = jax.device_count() // int(spatial) if int(spatial) >= 1 else 0
    if int(spatial) < 1 or jax.device_count() % int(spatial):
        raise ValueError(
            f"spatial_partitioning ({spatial}) must divide the device "
            f"count ({jax.device_count()})")
    if batch_size % data_size:
        raise ValueError(
            f"data-sharded serving needs batch_size ({batch_size}) divisible "
            f"by the data-axis size ({data_size} = {jax.device_count()} "
            f"devices / spatial {spatial})")
    return make_mesh(spatial=spatial)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for an NHWC image batch: batch over 'data' and, when the
    mesh has a spatial axis, image height over 'spatial' (GSPMD then
    partitions every conv spatially, inserting the halo exchanges)."""
    if SPATIAL_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
