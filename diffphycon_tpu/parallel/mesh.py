"""Device mesh and sharding utilities.

The reference's distributed backend is HF Accelerate -> torch.distributed ->
NCCL, data-parallel only (/root/reference/train/default_config.yaml,
diffusion_1d_burgers.py:870-924). The TPU-native equivalent: one
``jax.sharding.Mesh`` over all devices with the batch dimension sharded on a
``data`` axis; gradient all-reduce falls out of sharded autodiff as XLA
``psum`` collectives over ICI — no hand-written communication.

The mesh is built with axes ('data', 'model'); model-parallel sharding of the
(small) U-Nets is not needed for parity but the axis is plumbed through so
activation-heavy 3D workloads can shard spatial dims later.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh over available devices: ('data', 'model')."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"{n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch with the leading axis sharded over 'data'."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params/opt state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)
