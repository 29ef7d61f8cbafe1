"""Device mesh bootstrap.

The reference is single-GPU (``src/utils/io_utils.py:279-304`` get_device,
``config/model_config.yaml:118-121``); this module is the first-class
TPU-native replacement: a named `jax.sharding.Mesh` with ``data`` (and
optional ``frame``/``model``) axes, over which train/eval steps are jitted
with explicit shardings. Collectives (gradient psum, metric sums) are
inserted by XLA from the sharding annotations and ride ICI within a slice.
"""

from __future__ import annotations

import math
import os
from contextlib import contextmanager
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FRAME_AXIS = "frame"
MODEL_AXIS = "model"


def maybe_initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-process bootstrap (``jax.distributed.initialize``).

    The SURVEY §2.10 plan's missing piece in round 1: brings up the JAX
    coordination service so ``jax.devices()`` spans all processes and
    ``jax.process_index()/process_count()`` drive the HostLoader's
    per-process stripes. Parameters come from the arguments or from the
    environment (``DFV_COORDINATOR``, ``DFV_NUM_PROCESSES``,
    ``DFV_PROCESS_ID``; on TPU pods JAX can also auto-detect all three).
    No-op (returns False) when neither arguments nor env are present, so
    single-process runs are unaffected.
    """
    coordinator = coordinator or os.environ.get("DFV_COORDINATOR")
    if num_processes is None and os.environ.get("DFV_NUM_PROCESSES"):
        num_processes = int(os.environ["DFV_NUM_PROCESSES"])
    if process_id is None and os.environ.get("DFV_PROCESS_ID"):
        process_id = int(os.environ["DFV_PROCESS_ID"])
    if coordinator is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_mesh(
    axis_names: Sequence[str] = (DATA_AXIS,),
    axis_sizes: Optional[Sequence[int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over all (or given) devices.

    With no ``axis_sizes`` the full device count goes to the first axis and
    remaining axes get size 1. Axis sizes may contain one ``-1`` wildcard.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = [n] + [1] * (len(axis_names) - 1)
    axis_sizes = list(axis_sizes)
    if -1 in axis_sizes:
        known = math.prod(s for s in axis_sizes if s != -1)
        axis_sizes[axis_sizes.index(-1)] = n // known
    if math.prod(axis_sizes) != n:
        raise ValueError(f"mesh sizes {axis_sizes} != device count {n}")
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, tuple(axis_names))


def data_parallel_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()[:num_devices] if num_devices else jax.devices()
    return make_mesh((DATA_AXIS,), (len(devices),), devices)


def batch_sharding(mesh: Mesh, batch_axes: Tuple[Optional[str], ...] = (DATA_AXIS,)) -> NamedSharding:
    """Sharding that splits the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(*batch_axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Place a host pytree of arrays onto the mesh, batch dim sharded.

    Pads nothing: callers are responsible for batch % mesh size == 0
    (drop_last=True on the train loader guarantees it, as in the reference
    dataloader ``dataset.py:218-225``).
    """
    sharding = NamedSharding(mesh, P(axis))

    def _put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))))

    del sharding
    return jax.tree_util.tree_map(_put, batch)


@contextmanager
def force_cpu_devices(n: int = 8):
    """Testing helper: documents the env contract for virtual CPU meshes.

    Must run before JAX backend init; tests/conftest.py sets
    ``XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu``.
    """
    prev = os.environ.get("XLA_FLAGS")
    os.environ["XLA_FLAGS"] = (prev or "") + f" --xla_force_host_platform_device_count={n}"
    try:
        yield
    finally:
        if prev is None:
            os.environ.pop("XLA_FLAGS", None)
        else:
            os.environ["XLA_FLAGS"] = prev
