"""Multi-host (multi-process) execution: jax.distributed wiring, process-local
data sharding, and sharded checkpoint save/restore.

The reference is strictly single-GPU (SURVEY.md §2c); this module is the
DCN-facing half of the TPU-native parallel substrate (SURVEY.md §5): within a
slice, collectives ride ICI via the (case, data) mesh (parallel/mesh.py);
across slices/hosts, jax.distributed + the runtime's DCN transport carry the
same collectives. Nothing else in the framework changes: a Mesh built from
``jax.devices()`` after :func:`initialize` spans every process, and the jitted
fit programs are already written against named shardings.

Launch recipe (one command per host/process)::

    MRI_SR_COORDINATOR=host0:9871 MRI_SR_NUM_PROCESSES=4 \
    MRI_SR_PROCESS_ID=$SLURM_PROCID python cli/cohort_run.py --distributed ...

or with explicit args: ``init_distributed(coordinator_address=...,
num_processes=..., process_id=...)``. On TPU pods the three values resolve
automatically from the runtime's metadata — call ``init_distributed()`` with
no args and no env. A 2-process CPU simulation of this path is exercised in
tests/test_distributed.py.
"""
from __future__ import annotations

import os
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False

ENV_COORD = "MRI_SR_COORDINATOR"
ENV_NPROC = "MRI_SR_NUM_PROCESSES"
ENV_PID = "MRI_SR_PROCESS_ID"


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: Sequence[int] | None = None,
    auto: bool = False,
) -> bool:
    """Initialize jax.distributed (idempotent). Args fall back to the
    ``MRI_SR_*`` env vars; with ``auto=True`` and neither set, fall through
    to the runtime's automatic cluster detection (TPU pod metadata / SLURM)
    via a no-arg ``jax.distributed.initialize()`` — pass auto=True when the
    user explicitly asked for multi-process (e.g. ``--distributed``).
    Returns True when running multi-process."""
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    coordinator_address = coordinator_address or os.environ.get(ENV_COORD)
    if num_processes is None and os.environ.get(ENV_NPROC):
        num_processes = int(os.environ[ENV_NPROC])
    if process_id is None and os.environ.get(ENV_PID):
        process_id = int(os.environ[ENV_PID])
    if coordinator_address is None and num_processes is None:
        if not auto:
            # single-process runs need no distributed runtime at all
            return False
        # explicit multi-process request with no explicit wiring: let the
        # runtime auto-detect (TPU pod metadata / SLURM). Outside a managed
        # cluster this raises — surface that as single-process with a note
        # rather than crashing the run.
        try:
            jax.distributed.initialize()
        except Exception as e:  # no cluster metadata available
            print(f"init_distributed: auto-detect failed ({e}); "
                  "running single-process")
            return False
        _initialized = True
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    return jax.process_count() > 1


def process_info() -> tuple[int, int]:
    """(process_id, process_count)."""
    return jax.process_index(), jax.process_count()


def global_mesh(case: int = 1, data: int | None = None) -> Mesh:
    """A (case, data) mesh over ALL devices across every process. Device
    order follows jax.devices(), which groups by process — so the ``data``
    (fastest-varying) axis stays intra-host/ICI and ``case`` crosses hosts
    over DCN, matching the communication intensity of each axis (gradient
    psum every step on ``data``; nothing on ``case``)."""
    from mri_super_resolution_tpu.parallel.mesh import make_mesh

    return make_mesh(case=case, data=data, devices=jax.devices())


def host_local_slice(n: int) -> slice:
    """The [start, stop) slice of a length-``n`` leading axis this process
    should load from disk (cases/voxels split contiguously per process)."""
    pid, pcount = process_info()
    per = -(-n // pcount)
    return slice(pid * per, min(n, (pid + 1) * per))


def make_global_batch(local: np.ndarray, mesh: Mesh,
                      spec: P = P("data"),
                      global_rows: int | None = None) -> jax.Array:
    """Assemble a GLOBAL jax.Array from per-process host shards.

    Each process passes only ITS slice of the batch (e.g. the cases selected
    by :func:`host_local_slice`); the result behaves like the full array
    under ``jit`` with the given sharding, with no cross-host host-side
    gather. Single-process: equivalent to device_put with the sharding.

    ``global_rows`` is REQUIRED whenever the leading axis does not divide
    evenly across processes: jax infers the global shape by assuming uniform
    per-process shards, so ragged host_local_slice shards (e.g. 7 cases on 2
    processes -> 4 + 3 rows) would otherwise make the processes disagree on
    the global shape. Pass the full pre-slice length."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(np.asarray(local), sharding)
    local = np.asarray(local)
    global_shape = None
    if global_rows is not None:
        global_shape = (int(global_rows),) + tuple(local.shape[1:])
    return jax.make_array_from_process_local_data(
        sharding, local, global_shape=global_shape)


# ---------------------------------------------------------------------------
# sharded checkpointing
# ---------------------------------------------------------------------------


def save_sharded(path: str, tree: Any) -> None:
    """Save a pytree that may contain multi-host sharded jax.Arrays. Every
    process must call this (orbax coordinates the per-shard writes; on one
    process it degrades to a plain save)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def restore_sharded(path: str, template: Any) -> Any:
    """Restore a checkpoint directly into the shardings of ``template``
    (a pytree of jax.Arrays or jax.ShapeDtypeStruct(..., sharding=...)).
    Each process reads only the byte ranges its shards need."""
    import orbax.checkpoint as ocp

    def as_abstract(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return x

    abstract = jax.tree_util.tree_map(as_abstract, template)
    return ocp.StandardCheckpointer().restore(os.path.abspath(path), abstract)
