"""ADC (apparent diffusion coefficient) calculators, fully vectorised.

Reference equivalents:
- ``adc_log_ratio`` — ``calc_adc`` (implicit-neural-representations/master.py:50-52
  with mag*mag scaling; INR_ERD.py:98-100 with mag scaling).
- ``adc_polyfit``   — ``calculate_ADC`` (SRDWI.py:118-130) and ``ADC_slice``
  (PIA.py:157-169): per-voxel 1st-order polyfit of log-signal over b/1000,
  negated slope, clamped. The reference loops voxel-by-voxel with np.polyfit;
  here it is a closed-form least-squares slope evaluated for the whole volume
  in one fused XLA expression.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

EPS = 1e-7


def adc_log_ratio(dwi: Array, b0: Array, b: float, mag: float = 1000.0) -> Array:
    """Two-point ADC: ``-log(dwi/(b0+eps) + eps)/b * mag``.

    master.py uses ``mag=1000*1000``; INR_ERD.py uses ``mag=1000``; the MISR
    driver uses ``mag=1000000`` (multi-image-super-resolution/master.py:55-56).
    Pass the desired magnitude explicitly.
    """
    return -jnp.log(dwi / (b0 + EPS) + EPS) / b * mag


def adc_polyfit(
    bvalues: Array,
    signal: Array,
    min_adc: float = -10.0,
    max_adc: float = 3.0,
    axis: int = -1,
) -> Array:
    """Least-squares ADC over the b-value axis, clamped to [min_adc, max_adc].

    ``signal`` has b-values along ``axis``; any leading spatial shape.
    Equivalent to ``-polyfit(b/1000, log(signal+eps), 1)[0]`` per voxel
    (SRDWI.py:118-130), computed as the closed-form simple-regression slope:
    slope = cov(x, y) / var(x) with x = b/1000.

    PIA.py:157-169 uses ``min_adc=0``; SRDWI.py uses ``min_adc=-10``.
    """
    x = jnp.asarray(bvalues, dtype=jnp.float32).reshape(-1) / 1000.0
    y = jnp.log(jnp.moveaxis(signal, axis, -1) + EPS)
    xm = x.mean()
    xc = x - xm
    denom = jnp.sum(xc * xc)
    slope = jnp.sum(y * xc, axis=-1) / denom
    return jnp.clip(-slope, min_adc, max_adc)
