"""Coordinate/intensity dataset construction (device-resident).

Reference equivalents:
- ``ImageFittingSet`` — ``ImageFitting_set`` in both its forms:
  * N-D raw-float form (SRDWI.py:20-39): pixels ``(N, prod(shape), 1)``,
    coords ``(N, prod(shape), d)``.
  * 2-D PIL form (nn_mri.py:182-203): additionally applies
    ``Normalize(0.5, 0.5)`` to the pixel values and keeps the unnormalised
    originals + their mean.

Instead of per-image Python loops building torch tensors, images are stacked
once and flattened with a single reshape; the coordinate grid is shared (it is
identical across acquisitions) rather than replicated N times in memory.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mri_super_resolution_tpu.core import coords as coords_lib
from mri_super_resolution_tpu.core.normalize import to_tensor_normalize

Array = jax.Array


@dataclasses.dataclass
class ImageFittingSet:
    """Stacked acquisitions as (coords, pixels) pairs for INR fitting.

    Attributes
    ----------
    pixels : (N, P, 1) intensities (optionally Normalize(0.5,0.5)-transformed)
    coords : (P, d) shared coordinate grid in [-1, 1]^d
    shape  : the spatial shape each image was flattened from
    orig   : (N, *shape) raw images (2-D normalised mode only)
    mean   : mean over acquisitions of the raw images
    """

    pixels: Array
    coords: Array
    shape: tuple[int, ...]
    orig: Array | None = None
    mean: Array | None = None

    def __len__(self) -> int:
        return int(self.pixels.shape[0])

    @classmethod
    def from_images(
        cls, images: Sequence[np.ndarray] | np.ndarray, normalize: bool = False
    ) -> "ImageFittingSet":
        """Build from a list/stack of equally-shaped images.

        ``normalize=True`` replicates the 2-D PIL pathway's
        ``Normalize(0.5, 0.5)`` pixel transform.
        """
        stack = jnp.asarray(np.stack([np.asarray(im, dtype=np.float32) for im in images]))
        n = stack.shape[0]
        shape = tuple(int(s) for s in stack.shape[1:])
        raw = stack
        if normalize:
            stack = to_tensor_normalize(stack)
        pixels = stack.reshape(n, -1, 1)
        grid = coords_lib.mgrid(shape)
        return cls(
            pixels=pixels,
            coords=grid,
            shape=shape,
            orig=raw if normalize else None,
            mean=raw.mean(axis=0),
        )

    def coords_for_all(self) -> Array:
        """(N, P, d) broadcasted view for APIs that want per-image coords."""
        n = self.pixels.shape[0]
        return jnp.broadcast_to(self.coords, (n,) + self.coords.shape)


def flatten_weights(weights: Sequence[np.ndarray]) -> Array:
    """Acceptance-weight stack -> (N, P, 1), the ``_accept_weights`` tensor of
    master.py:120-125."""
    w = jnp.asarray(np.stack([np.asarray(x, dtype=np.float32) for x in weights]))
    return w.reshape(w.shape[0], -1, 1)
