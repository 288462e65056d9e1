"""Vmapped bounded nonlinear least squares for the 3-compartment model.

Reference: ``hybrid_fit`` (implicit-neural-representations/PIA.py:240-283) —
per-voxel scipy ``curve_fit`` (trust-region 'trf', bounds, p0, fallback to p0
on failure) of

    S(b, TE) = 1000 * [ V_ep exp(-b/1000 D_ep) exp(-TE/T2_ep)
                      + V_st exp(-b/1000 D_st) exp(-TE/T2_st)
                      + (1-V_ep-V_st) exp(-b/1000 D_lu) exp(-TE/T2_lu) ]

over the 16-point (b, TE) grid, run in a Python loop over ~1e4-1e5 voxels
(CPU hot loop). Here: a projected Levenberg-Marquardt iteration with box
bounds, fixed iteration count, vmapped over all voxels — one XLA program.
Divergent voxels fall back to p0 (matching the reference's RuntimeError
fallback, PIA.py:276-277).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

BVALS = (0.0, 150.0, 1000.0, 1500.0)
TES = (0.0, 13.0, 93.0, 143.0)

# parameter vector: (D_ep, D_st, D_lu, T2_ep, T2_st, T2_lu, V_ep, V_st)
P0 = np.asarray([0.55, 1.3, 2.8, 50.0, 70.0, 750.0, 0.3, 0.4], np.float32)
LO = np.asarray([0.3, 0.7, 2.7, 20.0, 40.0, 500.0, 0.0, 0.0], np.float32)
HI = np.asarray([0.7, 1.7, 3.0, 70.0, 100.0, 1000.0, 1.0, 1.0], np.float32)


def model_signal(theta: Array, b: Array, te: Array) -> Array:
    """Three-compartment signal over flattened (b, TE) grid
    (``three_compartment_fit``, PIA.py:227-238)."""
    D_ep, D_st, D_lu, T2_ep, T2_st, T2_lu, V_ep, V_st = (
        theta[0], theta[1], theta[2], theta[3], theta[4], theta[5], theta[6], theta[7]
    )
    s = (
        V_ep * jnp.exp(-b / 1000.0 * D_ep) * jnp.exp(-te / T2_ep)
        + V_st * jnp.exp(-b / 1000.0 * D_st) * jnp.exp(-te / T2_st)
        + (1.0 - V_ep - V_st) * jnp.exp(-b / 1000.0 * D_lu) * jnp.exp(-te / T2_lu)
    )
    return 1000.0 * s


def _lm_single(y: Array, b: Array, te: Array, iters: int, ftol: float) -> Array:
    """Projected Levenberg-Marquardt for one voxel with a convergence mask.

    Uses ``lax.while_loop`` so that under ``vmap`` the whole batch stops as
    soon as every lane is converged (JAX's batched while_loop freezes done
    lanes automatically) — the early-exit the fixed-40-iteration fori_loop
    lacked. A lane is converged when an accepted step improves the cost by a
    relative factor below ``ftol`` (scipy ``curve_fit`` semantics) or when the
    damping factor saturates with the step still rejected (stuck).
    """
    p0 = jnp.asarray(P0)
    lo = jnp.asarray(LO)
    hi = jnp.asarray(HI)

    def residual(theta):
        return model_signal(theta, b, te) - y

    def cost(theta):
        r = residual(theta)
        return jnp.sum(r * r)

    def cond(carry):
        i, _, _, _, done = carry
        return (i < iters) & ~done

    def body(carry):
        i, theta, lam, c, done = carry
        J = jax.jacfwd(residual)(theta)  # (16, 8)
        r = residual(theta)
        JtJ = J.T @ J
        g = J.T @ r
        A = JtJ + lam * jnp.eye(8, dtype=theta.dtype) * jnp.maximum(jnp.diag(JtJ), 1e-6)
        delta = jnp.linalg.solve(A, g)
        cand = jnp.clip(theta - delta, lo, hi)
        c_new = cost(cand)
        accept = c_new < c
        rel_improve = (c - c_new) / jnp.maximum(c, 1e-30)
        converged = (accept & (rel_improve < ftol)) | (~accept & (lam >= 1e8))
        theta = jnp.where(accept, cand, theta)
        c = jnp.where(accept, c_new, c)
        lam = jnp.clip(jnp.where(accept, lam * 0.33, lam * 4.0), 1e-8, 1e8)
        return i + 1, theta, lam, c, done | converged

    _, theta, _, c_final, _ = jax.lax.while_loop(
        cond, body, (0, p0, jnp.asarray(1e-2), cost(p0), jnp.asarray(False))
    )
    # fallback to p0 on NaN/divergence (reference's except RuntimeError path)
    bad = ~jnp.isfinite(c_final) | (c_final > cost(p0))
    return jnp.where(bad, p0, theta)


@functools.partial(jax.jit, static_argnames=("iters", "ftol"))
def hybrid_fit(
    signals: Array,  # (N, 16) voxel signals over the (b, TE) grid, b outer
    bvals=BVALS,
    tes=TES,
    iters: int = 40,
    ftol: float = 1e-10,
) -> tuple[Array, Array, Array]:
    """Fit every voxel; returns (D [N,3], T2 [N,3], v [N,3]) with
    v[:, 2] = 1 - V_ep - V_st (PIA.py:278-283)."""
    te_grid, b_grid = jnp.meshgrid(jnp.asarray(tes), jnp.asarray(bvals))
    b = b_grid.reshape(-1)
    te = te_grid.reshape(-1)
    theta = jax.vmap(lambda y: _lm_single(y, b, te, iters, ftol))(signals)
    D = theta[:, 0:3]
    T2 = theta[:, 3:6]
    v = jnp.stack(
        [theta[:, 6], theta[:, 7], 1.0 - theta[:, 6] - theta[:, 7]], axis=-1
    )
    return D, T2, v
