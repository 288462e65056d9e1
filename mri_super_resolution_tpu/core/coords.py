"""Coordinate grids and Fourier-feature encodings.

TPU-native equivalents of the reference coordinate utilities:
- ``mgrid``     — reference ``get_mgrid(shape)`` (implicit-neural-representations/
  SRDWI.py:12-18) and ``get_mgrid(sidelen, dim)`` (nn_mri.py:87-94).
- ``fourier_encode`` — reference ``input_mapping(x, B)`` (SRDWI.py:111-116).
- ``fourier_matrix`` — B ~ N(0, 1) * scale construction (superresDWI.py:105-106).

All functions are pure and jittable; grids are built with broadcasting rather
than materialised meshgrids where possible.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def mgrid(shape: Sequence[int], dtype=jnp.float32) -> Array:
    """Flattened coordinate grid over ``[-1, 1]^d`` for a tensor of ``shape``.

    Matches torch ``linspace(-1, 1, n)`` + ``meshgrid`` (indexing='ij') +
    reshape(-1, d) semantics of the reference ``get_mgrid``.

    Returns an array of shape ``(prod(shape), len(shape))``.

    Built host-side (numpy) and transferred once: an eager jnp meshgrid
    compiles a handful of shape-specialised executables per NOVEL grid shape,
    which on tunnelled-compile environments costs seconds per new volume
    shape in a cohort (results/round3_e2e) — for what is a deterministic
    constant. Callers are all outside jit (grep-audited); inside a trace a
    host-built grid would bake in as a constant, so keep it that way.
    """
    axes = [np.linspace(-1.0, 1.0, int(n)) for n in shape]
    grids = np.meshgrid(*axes, indexing="ij")
    out = np.stack(grids, axis=-1).reshape(-1, len(shape))
    return jnp.asarray(out.astype(np.dtype(dtype)))


def mgrid_square(sidelen: int, dim: int = 2, dtype=jnp.float32) -> Array:
    """2-D/N-D square grid, the ``get_mgrid(sidelen, dim)`` variant."""
    return mgrid((sidelen,) * dim, dtype=dtype)


def fourier_matrix(
    key: jax.Array, mapping_size: int, dim: int, scale: float = 0.5,
    dtype=jnp.float32,
) -> Array:
    """Random Gaussian Fourier-feature matrix ``B ~ N(0, 1) * scale``.

    Shape ``(mapping_size, dim)``; the reference draws with numpy
    (superresDWI.py:105-106) — here we use the JAX PRNG.
    """
    return (jax.random.normal(key, (mapping_size, dim), dtype=dtype) * scale)


def fourier_encode(x: Array, B: Array | None) -> Array:
    """Fourier-feature mapping ``gamma(x) = [sin(2*pi*x@B^T), cos(2*pi*x@B^T)]``.

    ``B is None`` passes coordinates through unchanged, mirroring the
    reference's ``input_mapping`` contract.

    The projection runs at ``precision='highest'`` (true f32 on the MXU):
    sin/cos amplify the bf16 default-matmul rounding enough to stall SIREN
    convergence below the reference's 2e-5 loss targets.
    """
    if B is None:
        return x
    proj = jnp.matmul(2.0 * jnp.pi * x, B.T, precision="highest")
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


@functools.partial(jax.jit, static_argnames=("shape",))
def mgrid_jit(shape: tuple[int, ...]) -> Array:
    """Jitted ``mgrid`` for repeated dense-grid inference calls."""
    return mgrid(shape)


def chunked_coords(shape: Sequence[int], chunk: int) -> list[np.ndarray]:
    """Host-side chunking of a dense grid for memory-bounded inference.

    Dense upsample grids (e.g. the coronal 100^3 grid of superresDWI.py:217-221)
    can exceed device memory once Fourier-encoded; iterate over row-chunks.
    """
    full = np.asarray(mgrid(shape))
    return [full[i : i + chunk] for i in range(0, full.shape[0], chunk)]
