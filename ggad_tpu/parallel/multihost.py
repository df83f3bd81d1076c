"""Multi-host (multi-process) execution support.

Single-host meshes (``parallel.mesh.make_mesh``) cover one TPU slice's
chips; scaling past a host means one JAX process per host, connected via
``jax.distributed``. This module wraps the three pieces every multi-host
run needs:

  * :func:`initialize` — ``jax.distributed.initialize`` with env
    autodetection (on Cloud TPU the coordinator/process count resolve
    automatically; elsewhere pass them explicitly);
  * :func:`make_hybrid_mesh` — a device mesh whose outer axis spans
    hosts over DCN and whose inner axis rides ICI, via
    ``mesh_utils.create_hybrid_device_mesh``. For the halo path this
    puts the smallest boundary exchanges across the slow links: shard
    graph partitions so intra-community traffic stays on ICI;
  * :func:`host_local_batch` — assemble a globally-sharded batch array
    from per-host id draws (each host samples its own slice of the DP
    batch axis) via ``jax.make_array_from_process_local_data``.

Everything degrades gracefully to one process (the only configuration
testable in this environment); the collectives themselves are the same
XLA ops the single-host tests pin. Reference counterpart: none — the
reference is a single 24-core-CPU process (``README.md:21``).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """``jax.distributed.initialize`` unless already connected or
    single-process. Safe to call unconditionally at program start.

    NB the already-connected check must NOT touch the backend:
    ``jax.process_count()`` initializes XLA, after which distributed
    init is rejected (caught by the real two-process test,
    ``tests/test_multihost.py``)."""
    if jax.distributed.is_initialized():
        return  # already connected
    if coordinator_address is None and num_processes is None:
        # Cloud TPU autodetection; a plain single-process run stays one
        try:
            jax.distributed.initialize()
        except Exception:
            pass
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_hybrid_mesh(ici_axis: str = "nodes", dcn_axis: str = "hosts",
                     per_host_parallelism: Optional[int] = None) -> Mesh:
    """Mesh [hosts, chips-per-host]: outer axis over DCN, inner over ICI.

    Single-process: degenerates to a [1, n_devices] mesh so code written
    against ('hosts', ici_axis) runs unchanged.
    """
    n_proc = jax.process_count()
    n_dev = len(jax.devices())
    if n_proc == 1:
        devices = np.asarray(jax.devices()).reshape(1, n_dev)
        return Mesh(devices, axis_names=(dcn_axis, ici_axis))
    from jax.experimental import mesh_utils

    per_host = per_host_parallelism or (n_dev // n_proc)
    try:
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(per_host,),
            dcn_mesh_shape=(n_proc,),
            devices=jax.devices())
    except ValueError:
        # Devices without a slice_index attribute (e.g. multi-process
        # CPU, the two-process test harness) can't be slice-grouped by
        # mesh_utils; group by process instead — same DCN-outer/ICI-
        # inner topology intent.
        devs = sorted(jax.devices(),
                      key=lambda d: (d.process_index, d.id))
        devices = np.asarray(devs)
    return Mesh(devices.reshape(n_proc, per_host),
                axis_names=(dcn_axis, ici_axis))


def host_local_batch(mesh: Mesh, local_ids: np.ndarray,
                     axis: str = "batch") -> jax.Array:
    """Assemble a globally batch-sharded id array from THIS host's draw.

    ``local_ids``: [per_host_batch, ...] — each process passes its own
    slice; the result is a global array of shape
    [process_count · per_host_batch, ...] sharded over ``axis``.
    Single-process: equivalent to a device_put with P(axis).
    """
    sharding = NamedSharding(mesh, P(axis))
    global_shape = (local_ids.shape[0] * jax.process_count(),
                    *local_ids.shape[1:])
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_ids), global_shape)
