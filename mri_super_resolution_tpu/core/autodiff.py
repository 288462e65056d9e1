"""Differential operators on INR outputs w.r.t. input coordinates.

Reference equivalents: ``gradient`` / ``divergence`` / ``laplace``
(implicit-neural-representations/nn_mri.py:208-225), implemented there with
``torch.autograd.grad`` create_graph chains. In JAX these are direct forward-
mode compositions — jacfwd is the natural mode for the (N, d) -> (N, 1)
per-point INR maps, and everything stays jittable.

All operators take a scalar-output function ``f(coords) -> (..., 1)`` or
``(...,)`` evaluated pointwise and return per-point quantities.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array


def _scalarize(f: Callable) -> Callable:
    def g(x: Array) -> Array:
        out = f(x[None])  # single point through the network
        return jnp.squeeze(out)

    return g


def gradient(f: Callable, coords: Array) -> Array:
    """Per-point gradient of a scalar field: (N, d) -> (N, d)."""
    g = jax.grad(_scalarize(f))
    return jax.vmap(g)(coords)


def divergence(vf: Callable, coords: Array) -> Array:
    """Per-point divergence of a vector field (N, d) -> (N,)."""

    def single(x):
        jac = jax.jacfwd(lambda y: jnp.reshape(vf(y[None]), (-1,)))(x)
        return jnp.trace(jac)

    return jax.vmap(single)(coords)


def laplace(f: Callable, coords: Array) -> Array:
    """Per-point Laplacian of a scalar field: trace of the Hessian, (N,)."""

    def single(x):
        hess = jax.hessian(_scalarize(f))(x)
        return jnp.trace(hess)

    return jax.vmap(single)(coords)
