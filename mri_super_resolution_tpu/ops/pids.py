"""PIDS: physics-induced defect/suspect voxel detection.

Reference: ``detect_PIDS_slice`` (implicit-neural-representations/
PIA.py:286-327) — per-voxel Python loops flagging:
- PIDS_ADC1: polyfit ADC (over b at TE index 0) > 3 (motion-induced signal
  loss at high b);
- PIDS_ADC2: ADC < 0 (voxel below the noise floor);
- PIDS_TE_decay: signal non-decreasing between consecutive TEs, per b;
- PIDS_b_decay: signal non-decreasing between consecutive b-values, per TE.

Vectorised: the ADC is the closed-form regression slope, the decay rules are
sign checks on axis-shifted differences. One jitted op over the whole slice.

Note the reference's monotonicity check casts the shifted copy to int
(``astype(int)`` at PIA.py:305/313) before differencing — so a decay smaller
than 1 intensity unit can still flag (fractional part survives). Replicated.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mri_super_resolution_tpu.core.adc import adc_polyfit

Array = jax.Array


@jax.jit
def detect_pids_slice(b: Array, S: Array):
    """Inputs: b (4,) diffusion values; S (H, W, B, T) hybrid slice.

    Returns (PIDS_ADC1 [H,W], PIDS_ADC2 [H,W], PIDS_b_decay [H,W,T,3],
    PIDS_TE_decay [H,W,B,3]) as float 0/1 maps, matching the reference's
    shapes and index convention (entry ``local`` flags position local+1
    vs its truncated predecessor).
    """
    te0 = S[..., 0]  # (H, W, B)
    # unclamped slope (the reference compares the raw polyfit slope)
    adc = adc_polyfit(b, te0, min_adc=-jnp.inf, max_adc=jnp.inf)
    pids_adc1 = (adc > 3.0).astype(jnp.float32)
    pids_adc2 = (adc < 0.0).astype(jnp.float32)

    def decay_flags(x: Array) -> Array:
        """x (..., L): flag[i] = x[i+1] - int(x[i]) >= 0 for i in 0..2."""
        prev_int = jnp.trunc(x[..., :3])
        return (x[..., 1:4] - prev_int >= 0).astype(jnp.float32)

    # TE decay per (H, W, B): along last axis
    pids_te = decay_flags(S)  # (H, W, B, 3)
    # b decay per (H, W, TE): along the B axis
    pids_b = decay_flags(jnp.swapaxes(S, -1, -2))  # (H, W, T, 3)
    return pids_adc1, pids_adc2, pids_b, pids_te


def pids_weight_map(b: Array, S: Array, clean_weight: float = 1.0, defect_weight: float = 0.0):
    """Aggregate PIDS flags into a per-voxel loss weight (used as the PIDS
    mask in PIA.loss_function, PIA.py:150-153): voxels violating the ADC
    physics get ``defect_weight``."""
    a1, a2, _, _ = detect_pids_slice(b, S)
    bad = (a1 + a2) > 0
    return jnp.where(bad, defect_weight, clean_weight)
