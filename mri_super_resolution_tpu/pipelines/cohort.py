"""Cohort runner: every patient fitted in parallel across the device mesh.

BASELINE.json config 5 ("cohort run: all 10 patients, vmapped slice batches +
pmap across chips"). The reference has no such capability — each patient ran
as a separate SLURM job (run.sh). Here the per-case SIREN fits are vmapped
into one program whose case axis is sharded across chips (ICI), with the
voxel axis optionally sharded too (parallel/sharded_fit.make_cohort_fit).

Per-case work mirrors master.py's per-direction slice fit: Normalize(0.5,0.5)
pixels of the cancer slice ROI mean, Siren(2 -> hidden x layers), Adam.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mri_super_resolution_tpu.core.coords import mgrid
from mri_super_resolution_tpu.core.normalize import to_tensor_normalize
from mri_super_resolution_tpu.data import Case
from mri_super_resolution_tpu.models import Siren
from mri_super_resolution_tpu.parallel import make_mesh, make_cohort_fit, stack_params
from mri_super_resolution_tpu.fit.optim import cached_adam, restart_adam


@dataclasses.dataclass
class CohortResult:
    recons: np.ndarray  # (C, H, W) fitted mean-slice reconstructions
    losses: np.ndarray  # (C, steps)
    voxels_per_sec: float
    mesh_shape: dict


def run_cohort(
    cases: Sequence[Case],
    num_steps: int = 1000,
    hidden_features: int = 64,
    hidden_layers: int = 6,
    learning_rate: float = 3e-4,
    roi: tuple[int, int] = (40, 100),
    case_axis: int | None = None,
    seed: int = 0,
    inr_restart_every: int = 0,
) -> CohortResult:
    """Fit each case's cancer-slice ROI mean image, all cases in parallel."""
    r0, r1 = roi
    H = r1 - r0
    targets = []
    for case in cases:
        img = case.dwi[r0:r1, r0:r1, case.cancer_slice, :].mean(-1)
        targets.append(to_tensor_normalize(img).reshape(-1, 1))
    C = len(targets)
    targets = jnp.asarray(np.stack(targets).astype(np.float32))

    n_dev = len(jax.devices())
    if case_axis is None:
        # widest case axis that divides both devices and cases
        case_axis = 1
        for c in range(min(C, n_dev), 0, -1):
            if n_dev % c == 0 and C % c == 0:
                case_axis = c
                break
    mesh = make_mesh(case=case_axis)

    coords = mgrid((H, H))
    coords_stack = jnp.broadcast_to(coords, (C,) + coords.shape)
    model = Siren(
        hidden_features=hidden_features, hidden_layers=hidden_layers, out_features=1
    )
    keys = jax.random.split(jax.random.key(seed), C)
    params_stack = stack_params([model.init(k, coords[:4]) for k in keys])

    tx = (restart_adam(learning_rate, inr_restart_every)
          if inr_restart_every else cached_adam(learning_rate))
    fit = make_cohort_fit(model.apply, tx, mesh, num_steps)

    # compile (excluded from throughput)
    warm = fit(jax.tree.map(jnp.copy, params_stack), coords_stack, targets)
    jax.device_get(warm.losses[:, -1])

    t0 = time.perf_counter()
    res = fit(params_stack, coords_stack, targets)
    jax.device_get(res.losses[:, -1])
    dt = time.perf_counter() - t0

    @jax.jit
    def recon_all(params_stack):
        return jax.vmap(lambda p: model.apply(p, coords))(params_stack)

    recons = np.asarray(recon_all(res.params)).reshape(C, H, H)
    voxels = C * coords.shape[0] * num_steps
    return CohortResult(
        recons=recons,
        losses=np.asarray(res.losses),
        voxels_per_sec=voxels / dt,
        mesh_shape=dict(mesh.shape),
    )
