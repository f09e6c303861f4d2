"""Device-mesh data parallelism.

TPU-native replacement for the reference's DDP/NCCL layer (main.py:82-93,
SURVEY §2.5): a 1-D `jax.sharding.Mesh` over the 'data' axis; batches are
sharded along their leading axis, parameters/optimizer state are replicated,
and `jit` compiles the gradient all-reduce into XLA collectives riding ICI.
Multi-host extends the same mesh over all processes via
`jax.distributed.initialize()` (no NODE_RANK/LOCAL_RANK plumbing needed).

The per-threshold metric state (utils/metrics.py) is likewise a fixed-size
vector summed across devices, replacing torchmetrics' gathered lists.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data mesh over the first `num_devices` devices (all by default).

    Raises if fewer devices exist than requested — a multi-chip dry run must
    never silently degrade to a smaller (vacuous) mesh.
    """
    devices = jax.devices()
    if num_devices is not None:
        if len(devices) < num_devices:
            raise ValueError(
                f"make_mesh: requested {num_devices} devices but only "
                f"{len(devices)} available ({jax.default_backend()} backend); "
                "for a virtual CPU mesh set XLA_FLAGS="
                "--xla_force_host_platform_device_count before backend init"
            )
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-axis sharding for batches."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Full replication (params, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Device-put a numpy batch with its leading axis split across the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def shard_map_nocheck(fn, mesh: Mesh, in_specs, out_specs):
    """shard_map with the replication checker skipped: the checker cannot
    see through Pallas custom calls, which is precisely why these paths use
    shard_map instead of jit-shardings (no GSPMD partitioning rule for the
    custom calls). Handles the flag rename ('check_vma' in jax>=0.6,
    'check_rep' before) and the jax.experimental fallback import."""
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    kwargs = dict(mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    try:
        return shard_map(fn, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover
        return shard_map(fn, check_rep=False, **kwargs)


def shard_map_batch(fn, mesh: Mesh, n_replicated: int, n_batched: int,
                    axis_name: str = "data"):
    """shard_map `fn(repl..., batched...)` over the mesh's data axis: the
    first `n_replicated` args are replicated, the next `n_batched` are split
    on their leading axis, and the output is batch-sharded.

    For embarrassingly-batch-parallel computations (the scan trackers) this
    is equivalent to jit-with-shardings but runs the body PER DEVICE — which
    is what lets Pallas kernels execute on a multi-chip mesh.
    """
    in_specs = (P(),) * n_replicated + (P(axis_name),) * n_batched
    return shard_map_nocheck(fn, mesh, in_specs, P(axis_name))
