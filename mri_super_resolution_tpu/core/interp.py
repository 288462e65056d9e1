"""Interpolation baselines: spline rescale and z-axis cubic interpolation.

Reference equivalents:
- ``rescale``       — skimage ``rescale(img, scale, anti_aliasing=...)`` used as
  the interpolation baseline everywhere (superresDWI.py:169-191, master.py:180).
  Implemented with ``jax.image.resize`` plus an optional Gaussian anti-alias
  prefilter matching skimage's sigma convention.
- ``resize_along_axis`` — ``resize_array`` (SRDWI.py:132-141): cubic-spline
  resampling along the slice axis for coronal comparisons. Implemented as an
  exact not-a-knot cubic spline (scipy ``interp1d(kind='cubic')`` semantics)
  via a dense solve — slice counts are tiny (~28-128), so a tridiagonal
  special-case is unnecessary.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _gaussian_blur2d(img: Array, sigma: float) -> Array:
    """Separable Gaussian blur with reflect padding (scipy ndimage 'mirror')."""
    radius = int(4.0 * sigma + 0.5)
    if radius < 1:
        return img
    k = _gaussian_kernel1d(sigma, radius)

    def blur1d(row):
        padded = jnp.pad(row, radius, mode="reflect")
        return jnp.convolve(padded, k, mode="valid")

    img = jax.vmap(blur1d, in_axes=0, out_axes=0)(img)
    img = jax.vmap(blur1d, in_axes=1, out_axes=1)(img)
    return img


@functools.partial(jax.jit, static_argnames=("scale", "anti_aliasing", "order"))
def rescale(img: Array, scale: int, anti_aliasing: bool = False, order: int = 1) -> Array:
    """Upscale a 2-D image by an integer factor (skimage ``rescale`` analog).

    ``order=1`` -> bilinear (skimage default), ``order=3`` -> cubic.
    ``anti_aliasing`` applies a Gaussian prefilter with skimage's sigma
    ``max(0, (1 - 1/scale) / 2)`` per axis — a no-op for upscaling factors >= 1
    in skimage's formula when downscale_factor < 1, kept for API parity.
    """
    h, w = img.shape
    if anti_aliasing and scale < 1:
        sigma = max(0.0, (1.0 / scale - 1.0) / 2.0)
        img = _gaussian_blur2d(img, sigma)
    method = {0: "nearest", 1: "linear", 3: "cubic"}[order]
    return jax.image.resize(img, (int(h * scale), int(w * scale)), method=method)


def _cubic_spline_coeffs(n: int) -> jnp.ndarray:
    """Dense not-a-knot cubic-spline second-derivative system for n uniform knots.

    Returns the (n, n) matrix A such that A @ m = rhs(y) where m are the
    second derivatives. Uniform spacing h=1 assumed (positions are uniform in
    the reference's ``np.linspace(0, 1, n)`` parameterisation — spacing cancels).
    """
    A = jnp.zeros((n, n))
    # interior rows: m[i-1] + 4 m[i] + m[i+1] = 6 (y[i-1] - 2 y[i] + y[i+1])
    for i in range(1, n - 1):
        A = A.at[i, i - 1].set(1.0).at[i, i].set(4.0).at[i, i + 1].set(1.0)
    # not-a-knot: third derivative continuous at second and penultimate knots
    A = A.at[0, 0].set(1.0).at[0, 1].set(-2.0).at[0, 2].set(1.0)
    A = A.at[n - 1, n - 3].set(1.0).at[n - 1, n - 2].set(-2.0).at[n - 1, n - 1].set(1.0)
    return A


@functools.partial(jax.jit, static_argnames=("new_size", "axis"))
def resize_along_axis(arr: Array, new_size: int = 128, axis: int = 2) -> Array:
    """Cubic-spline resample along one axis (reference ``resize_array``).

    Evaluates a not-a-knot cubic spline through the existing samples at
    ``new_size`` uniformly spaced positions spanning the same [0, 1] range.
    """
    arr = jnp.moveaxis(arr, axis, -1)
    n = arr.shape[-1]
    flat = arr.reshape(-1, n)

    A = _cubic_spline_coeffs(n)
    d2 = flat[:, :-2] - 2.0 * flat[:, 1:-1] + flat[:, 2:]
    rhs = jnp.zeros_like(flat)
    rhs = rhs.at[:, 1:-1].set(6.0 * d2)
    m = jnp.linalg.solve(A, rhs.T).T  # second derivatives at knots

    # evaluation positions in knot index space
    t = jnp.linspace(0.0, float(n - 1), new_size)
    i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n - 2)
    u = t - i0.astype(t.dtype)

    y0 = flat[:, i0]
    y1 = flat[:, i0 + 1]
    m0 = m[:, i0]
    m1 = m[:, i0 + 1]
    # uniform-spacing Hermite form with second derivatives (h = 1)
    vals = (
        y0 * (1 - u)
        + y1 * u
        + ((1 - u) ** 3 - (1 - u)) * m0 / 6.0
        + (u**3 - u) * m1 / 6.0
    )
    return jnp.moveaxis(vals.reshape(arr.shape[:-1] + (new_size,)), -1, axis)
