"""Normalisation utilities used across both pipelines.

Reference equivalents:
- ``per_bte_max_normalize`` — per-(b, TE) max division (superresDWI.py:52-55).
- ``to_tensor_normalize``   — torchvision ``ToTensor + Normalize(0.5, 0.5)``
  applied to float PIL images in ``ImageFitting_set`` (nn_mri.py:182-203).
  For float32 inputs torchvision's ToTensor does *not* divide by 255, so the
  transform is just ``(x - 0.5) / 0.5`` — replicated here.
- ``rayleigh_noise_std``    — Rayleigh-corrected noise sigma from a noise ROI
  (INR_ERD.py:178-181): ``std(roi) / sqrt(2 - pi/2)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def to_tensor_normalize(img: Array) -> Array:
    """``Normalize(mean=0.5, std=0.5)`` on an already-float image."""
    return (img - 0.5) / 0.5


def from_tensor_normalize(img: Array) -> Array:
    """Inverse of :func:`to_tensor_normalize`."""
    return img * 0.5 + 0.5


def per_bte_max_normalize(hybrid: Array) -> tuple[Array, Array]:
    """Normalise a hybrid (b, TE, ...) stack by its per-(b, TE) max.

    ``hybrid`` has shape (B, TE, ...); returns (normalised, maxes[B, TE]).
    """
    axes = tuple(range(2, hybrid.ndim))
    maxes = hybrid.max(axis=axes)
    return hybrid / maxes[(...,) + (None,) * (hybrid.ndim - 2)], maxes


def max_normalize(img: Array) -> Array:
    """Divide by the global max (used on SSIM inputs, superresDWI.py:181-184)."""
    return img / img.max()


def rayleigh_noise_std(noise_roi: Array) -> Array:
    """Rayleigh-corrected background noise sigma (INR_ERD.py:178-181)."""
    return jnp.std(noise_roi) / np.sqrt(2.0 - np.pi / 2.0)
