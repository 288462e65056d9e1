"""Device mesh construction and sharding helpers.

The reference has no distributed execution at all (SURVEY.md section 2c); this
module is the TPU-native parallel substrate the rebuild adds:

- axis ``data``: shards the voxel/coordinate batch dimension — the INR analog
  of sequence parallelism. Coordinates are independent, so data parallelism
  needs only a gradient psum, which ``jit`` inserts automatically from
  sharding annotations.
- axis ``case``: maps independent per-patient/per-slice fits onto chips
  (cohort parallelism; BASELINE.json config 5).

Collectives ride ICI when the mesh is built from the default device order.
"""
from __future__ import annotations

import numpy as np
from typing import Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    case: int = 1, data: int | None = None, devices: Sequence | None = None
) -> Mesh:
    """Build a (case, data) mesh over the available devices.

    ``data=None`` uses all remaining devices on the data axis.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if data is None:
        if n % case:
            raise ValueError(f"{n} devices not divisible by case={case}")
        data = n // case
    if case * data > n:
        raise ValueError(f"mesh {case}x{data} exceeds {n} devices")
    arr = np.asarray(devs[: case * data]).reshape(case, data)
    return Mesh(arr, axis_names=("case", "data"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/voxel) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def case_data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 by case and axis 1 by data (stacked per-patient batches)."""
    return NamedSharding(mesh, P("case", "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x: jax.Array, mesh: Mesh) -> jax.Array:
    """Place an array with its leading axis sharded over ``data``."""
    return jax.device_put(x, data_sharding(mesh))


def pad_to_multiple(x, multiple: int, axis: int = 0):
    """Pad axis length up to a multiple (sharded axes must divide evenly).

    Returns (padded, original_length).
    """
    import jax.numpy as jnp

    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad), n
