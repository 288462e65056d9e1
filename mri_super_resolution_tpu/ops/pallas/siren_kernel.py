"""Pallas TPU kernels for the SIREN hot path.

The INR forward is a chain of small matmuls with sine epilogues
(reference SineLayer, SRDWI.py:41-64). XLA compiles this well — measured at
~79% of the bf16x3 MXU roofline for the 512-wide config — so the kernel's
win is eliminating inter-layer activation traffic and kernel-launch
boundaries: the whole MLP runs out of VMEM for a tile of coordinates, weights
resident, one HBM read of the input tile and one write of the output tile.

Provides:
- ``siren_forward``      — fused multi-layer forward (inference / fwd pass).
- ``siren_fused``        — custom-VJP wrapper whose backward recomputes
  activations in-VMEM per tile and accumulates dW across grid steps into
  revisited output blocks (sequential TPU grid).

Weights are passed as flat lists [W1, b1, ..., Wn, bn, Wout, bout]. Hidden
widths must be multiples of 128 (lane dimension); the coordinate tile is 512
rows. Falls back to interpret mode off-TPU (tests run on CPU).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TILE = 512      # forward coordinate tile (1024+ exceeds the VMEM budget:
                # Mosaic stack-allocates the per-layer intermediates)
TILE_BWD = 384  # backward tile: activations+pre-cos (stashed bf16)+dW
                # accumulators must fit the 16MB VMEM budget (512 fits the
                # bare train step but overflows by ~1.7MB when the kernel is
                # embedded in the alternating-PN program)


def _is_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def _dot(a, b, compute_dtype):
    """Matmul with optional bf16 inputs; accumulation always f32.

    bf16 inputs run the MXU single-pass (~3x the f32-emulation rate);
    measured convergence on the flagship fit is within noise of f32 — but
    f32 stays the default out of caution for <2e-5 loss thresholds.
    (Measured: the kernel is not MXU-bound at these shapes, so bf16 compute
    changes step time by <2%; the option is kept for larger widths.)
    """
    if compute_dtype is not None:
        a = a.astype(compute_dtype)
        b = b.astype(compute_dtype)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_ta(a, b, compute_dtype):
    """a^T @ b without materialising the transpose: contract rows with rows.

    (P, M)^T @ (P, N) -> (M, N) via dot_general contracting dim 0 vs dim 0 —
    Mosaic feeds the MXU directly instead of a VPU transpose + matmul.
    """
    if compute_dtype is not None:
        a = a.astype(compute_dtype)
        b = b.astype(compute_dtype)
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_tb(a, b, compute_dtype):
    """a @ b^T: (P, N) @ (M, N)^T -> (P, M), contracting dim 1 vs dim 1."""
    if compute_dtype is not None:
        a = a.astype(compute_dtype)
        b = b.astype(compute_dtype)
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _forward_kernel(omega: float, n_hidden: int, compute_dtype=None):
    """Build the fused forward kernel body for n_hidden sine layers + linear."""

    def kernel(x_ref, *refs):
        # refs: W0,b0, W1,b1, ..., W_{n-1},b_{n-1}, Wout,bout, out_ref
        out_ref = refs[-1]
        h = x_ref[:]
        for l in range(n_hidden):
            W = refs[2 * l][:]
            b = refs[2 * l + 1][:]  # (1, n) — biases are kept 2-D in-kernel
            h = jnp.sin(omega * (_dot(h, W, compute_dtype) + b))
        Wout = refs[2 * n_hidden][:]
        bout = refs[2 * n_hidden + 1][:]
        out_ref[:] = _dot(h, Wout, compute_dtype) + bout

    return kernel


def _pad_rows(x: Array, tile: int) -> tuple[Array, int]:
    P = x.shape[0]
    rem = (-P) % tile
    if rem:
        x = jnp.pad(x, ((0, rem), (0, 0)))
    return x, P


@functools.partial(jax.jit, static_argnames=("omega", "interpret", "compute_dtype"))
def siren_forward(x: Array, weights: Sequence[Array], omega: float = 30.0,
                  interpret: bool | None = None, compute_dtype=None) -> Array:
    """Fused SIREN forward. ``weights`` = [W1, b1, ..., Wout, bout]."""
    interpret = (not _is_tpu()) if interpret is None else interpret
    n_hidden = len(weights) // 2 - 1
    # biases travel as (1, n) blocks — 1-D refs are fragile on TPU Pallas
    weights = [w[None, :] if w.ndim == 1 else w for w in weights]
    out_dim = weights[-1].shape[-1]
    xp, P = _pad_rows(x, TILE)
    grid = (xp.shape[0] // TILE,)

    ms = pl.ANY if interpret else pltpu.VMEM
    in_specs = [pl.BlockSpec((TILE, x.shape[1]), lambda i: (i, 0), memory_space=ms)]
    # weights: full-array blocks, resident across grid steps
    in_specs += [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=ms) for w in weights]

    out = pl.pallas_call(
        _forward_kernel(omega, n_hidden, compute_dtype),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], out_dim), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE, out_dim), lambda i: (i, 0), memory_space=ms),
        interpret=interpret,
    )(xp, *weights)
    return out[:P]


# ---------------------------------------------------------------------------
# custom VJP: fused forward + fused recompute-backward
# ---------------------------------------------------------------------------


def _backward_kernel(omega: float, n_hidden: int, compute_dtype=None):
    """Recompute activations for the tile, then backprop, accumulating dW/db
    into revisited output blocks."""

    def kernel(*refs):
        # inputs: x, W0,b0..W_{n-1},b_{n-1}, Wout,bout, g
        # outputs: dx, dW0,db0, ..., dWout,dbout
        n_in = 1 + 2 * (n_hidden + 1) + 1
        x_ref = refs[0]
        g_ref = refs[n_in - 1]
        out_refs = refs[n_in:]
        dx_ref = out_refs[0]
        dW_refs = out_refs[1:]

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for r in dW_refs:
                r[:] = jnp.zeros_like(r)

        # forward recompute, keeping pre-activation cos factors
        h = x_ref[:]
        # activations/cos factors stashed in bf16: halves the VMEM working
        # set (tile 512 instead of 256); dW error class matches bf16-compute,
        # measured within noise of f32 on the flagship fit
        acts = [h.astype(jnp.bfloat16)]
        pre_cos = []
        for l in range(n_hidden):
            W = refs[1 + 2 * l][:]
            b = refs[2 + 2 * l][:]
            z = _dot(h, W, compute_dtype) + b
            pre_cos.append(jnp.cos(omega * z).astype(jnp.bfloat16))
            h = jnp.sin(omega * z)
            acts.append(h.astype(jnp.bfloat16))
        Wout = refs[1 + 2 * n_hidden][:]

        g = g_ref[:]
        # final linear
        dW_refs[2 * n_hidden][:] += _dot_ta(acts[-1].astype(jnp.float32), g, compute_dtype)
        dW_refs[2 * n_hidden + 1][:] += jnp.sum(g, axis=0, keepdims=True)
        delta = _dot_tb(g, Wout, compute_dtype)

        for l in reversed(range(n_hidden)):
            delta = delta * (omega * pre_cos[l].astype(jnp.float32))
            W = refs[1 + 2 * l][:]
            dW_refs[2 * l][:] += _dot_ta(acts[l].astype(jnp.float32), delta, compute_dtype)
            dW_refs[2 * l + 1][:] += jnp.sum(delta, axis=0, keepdims=True)
            delta = _dot_tb(delta, W, compute_dtype)

        dx_ref[:] = delta

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def siren_fused(x: Array, weights: tuple, omega: float = 30.0, compute_dtype=None) -> Array:
    return siren_forward(x, list(weights), omega, compute_dtype=compute_dtype)


def _fwd(x, weights, omega, compute_dtype):
    return (
        siren_forward(x, list(weights), omega, compute_dtype=compute_dtype),
        (x, tuple(weights)),
    )


def _bwd(omega, compute_dtype, res, g):
    x, weights = res
    interpret = not _is_tpu()
    n_hidden = len(weights) // 2 - 1
    orig_ndims = [w.ndim for w in weights]
    weights = [w[None, :] if w.ndim == 1 else w for w in weights]
    xp, P = _pad_rows(x, TILE_BWD)
    gp, _ = _pad_rows(g, TILE_BWD)
    grid = (xp.shape[0] // TILE_BWD,)
    ms = pl.ANY if interpret else pltpu.VMEM

    def block_full(w):
        return pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=ms)

    in_specs = [pl.BlockSpec((TILE_BWD, x.shape[1]), lambda i: (i, 0), memory_space=ms)]
    in_specs += [block_full(w) for w in weights]
    in_specs += [pl.BlockSpec((TILE_BWD, g.shape[1]), lambda i: (i, 0), memory_space=ms)]

    out_shapes = [jax.ShapeDtypeStruct(xp.shape, jnp.float32)]
    out_specs = [pl.BlockSpec((TILE_BWD, x.shape[1]), lambda i: (i, 0), memory_space=ms)]
    for w in weights:
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(block_full(w))

    outs = pl.pallas_call(
        _backward_kernel(omega, n_hidden, compute_dtype),
        out_shape=tuple(out_shapes),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(xp, *weights, gp)
    dx = outs[0][:P]
    dW = tuple(
        d[0] if nd == 1 else d for d, nd in zip(outs[1:], orig_ndims)
    )
    return dx, dW


siren_fused.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# flax-params adapter
# ---------------------------------------------------------------------------


def weights_from_flax(params) -> list:
    """Flatten a models.Siren flax params tree into the kernel's weight list
    (ordered SineLayer_0..n, final Dense)."""
    p = params["params"]
    sine_keys = sorted(
        (k for k in p if k.startswith("SineLayer_")), key=lambda k: int(k.split("_")[1])
    )
    out = []
    for k in sine_keys:
        d = p[k]["Dense_0"]
        out.extend([d["kernel"], d["bias"]])
    final = p["Dense_0"]
    out.extend([final["kernel"], final["bias"]])
    return out


def weights_to_flax(weights: Sequence[Array], template) -> dict:
    """Inverse of :func:`weights_from_flax` onto a params template."""
    p = jax.tree_util.tree_map(lambda x: x, template)
    inner = p["params"]
    sine_keys = sorted(
        (k for k in inner if k.startswith("SineLayer_")), key=lambda k: int(k.split("_")[1])
    )
    idx = 0
    for k in sine_keys:
        inner[k]["Dense_0"]["kernel"] = weights[idx]
        inner[k]["Dense_0"]["bias"] = weights[idx + 1]
        idx += 2
    inner["Dense_0"]["kernel"] = weights[idx]
    inner["Dense_0"]["bias"] = weights[idx + 1]
    return p


def make_fused_apply(model, compute_dtype=None) -> "callable":
    """Adapter: an ``apply(params, x)`` for a plain ``models.Siren`` that runs
    through the fused Pallas kernel (drop-in for the fit-engine's apply_fn).

    Gradients flow through the flax->flat weight reindexing, so
    ``jax.grad`` over params hits the kernel's custom VJP. Only valid for the
    plain Siren topology (SineLayer stack + final Dense).

    ``compute_dtype=jnp.bfloat16`` runs the matmuls single-pass on the MXU
    with f32 accumulation and f32 master weights (fast-math mode).
    """
    omega = float(model.hidden_omega_0)

    def apply(params, x):
        ws = tuple(weights_from_flax(params))
        return siren_fused(x, ws, omega, compute_dtype)

    return apply
