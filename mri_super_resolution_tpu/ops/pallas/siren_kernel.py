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
- ``siren_loss_grads``   — the full train-step gradient in ONE kernel pass:
  forward + masked MSE + backward, returning (loss, dweights) with no
  separate forward call, no XLA loss round-trip, and no dx compute/write
  (coordinates are constants in the fit loops). This is the fit-engine fast
  path: ~3 forward-equivalents of compute per step vs 4 for
  forward-kernel + value_and_grad-over-``siren_fused``.

Measured on the v5e chip (flagship FF-SIREN 512x3, 70k coords full-batch):
round-1 fwd+bwd kernels 10.4 ms/step -> one-pass kernel 6.4 ms -> one-pass +
fast sincos 2.6 ms (26.6M voxels/s/chip). The builtin jnp.sin/jnp.cos pair
was >half the step: each pays its own range reduction + long polynomial on
the VPU. ``_fast_sincos`` shares one Cody-Waite reduction and uses
short polynomials (max err ~1e-6 over |z|<=100); convergence parity vs
XLA autodiff measured at rounding level over 600 steps.

Per-layer activations are configurable via ``acts`` tuples ("sine", "relu",
"none") so the same kernels serve plain Siren (sine..sine, none) and the
SirenERD trunk (sine..sine, relu, relu).

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


def _default_acts(n_layers: int) -> tuple:
    """Plain-Siren activation pattern: sine on every layer but the last."""
    return ("sine",) * (n_layers - 1) + ("none",)


# Least-squares-on-Chebyshev-nodes coefficients for sin/cos on [-pi, pi]
# (power basis). Degrees are chosen per consumer: sin (max err 9.6e-8) feeds
# the forward VALUE, so it sits at f32-matmul-noise accuracy; cos (max err
# 4.1e-5) only ever becomes the bf16-stashed backward factor, whose
# quantization step (~3.9e-3 relative) is 100x coarser — so the shorter
# polynomial is free. Measured: dropping 1 sin + 2 cos FMAs is worth ~2% of
# the flagship fused step (results/round3_flagship/trig_ab.json).
_SIN_C = (9.9999959990162e-01, -1.6666552631103e-01, 8.3324029611500e-03,
          -1.9808632625000e-04, 2.6997138300000e-06, -2.0362210000000e-08)
_COS_C = (9.9995901886792e-01, -4.9979060076228e-01, 4.1494737249360e-02,
          -1.3390575581300e-03, 1.8781276700000e-05)
# 7-coeff cos (max err 1.1e-8) for consumers where cos is a forward VALUE
# (the WIRE Gabor real part), not a bf16-stashed factor.
_COS_C_HI = (9.9999998902293e-01, -4.9999989100171e-01, 4.1666489209710e-02,
             -1.3887803564300e-03, 2.4769882870000e-05, -2.7079024000000e-07,
             1.7245100000000e-09)
_INV_2PI = 0.15915494309189535
_PI2_HI = 6.28125  # Cody-Waite split of 2*pi (hi exact in f32)
_PI2_LO = 0.0019353071795864769


_LOG2E = 1.4426950408889634
_LN2_HI = 0.693145751953125  # Cody-Waite split of ln 2 (hi exact in f32)
_LN2_LO = 1.4286068203094172e-06
# exp(r) Taylor on [-ln2/2, ln2/2]; deg-6 remainder r^7/7! < 1.3e-7
_EXP_C = (1.0, 1.0, 0.5, 1.0 / 6, 1.0 / 24, 1.0 / 120, 1.0 / 720)


def _fast_exp(u):
    """exp(u) as 2^k * exp(r): ldexp via exponent-bit construction + short
    Taylor polynomial. Builtin jnp.exp pays a generic libdevice-style
    expansion on the VPU; this is ~10 ops. |rel err| < ~2e-7. k clamps to
    the normal-f32 exponent range, so u < -87 underflows to ~0 and u > 88
    saturates at ~2^127 instead of inf — the Gabor window (wire_kernel) is
    bounded well inside that."""
    k = jnp.round(u * _LOG2E)
    r = (u - k * _LN2_HI) - k * _LN2_LO
    p = _EXP_C[6]
    for c in _EXP_C[5::-1]:
        p = p * r + c
    ki = jnp.clip(k, -126.0, 127.0).astype(jnp.int32)
    two_k = jax.lax.bitcast_convert_type((ki + 127) << 23, jnp.float32)
    return p * two_k


def _fast_sincos(z, need_cos: bool = True, precise_cos: bool = False):
    """sin(z) (and cos(z)) via ONE shared range reduction + short polynomials.

    The TPU VPU has no sincos: builtin jnp.sin and jnp.cos each pay their own
    range reduction + polynomial (~20 VPU ops apiece), and the SIREN backward
    needs both of the pair. This shared-reduction version costs ~14 ops for
    the pair. Cody-Waite two-step reduction keeps |sin err| < ~6e-7 and
    |cos err| < ~4e-5 for |z| <~ 1e3 (SIREN pre-activations are
    |omega*z| <~ 1e2; see the degree rationale at _SIN_C/_COS_C).
    """
    k = jnp.round(z * _INV_2PI)
    r = (z - k * _PI2_HI) - k * _PI2_LO  # r in [-pi, pi]
    r2 = r * r
    s = _SIN_C[-1]
    for c in _SIN_C[-2::-1]:
        s = s * r2 + c
    s = s * r
    if not need_cos:
        return s, None
    cs = _COS_C_HI if precise_cos else _COS_C
    c_ = cs[-1]
    for c in cs[-2::-1]:
        c_ = c_ * r2 + c
    return s, c_


def _apply_act(z, act: str, omega: float, fast: bool = False):
    if act == "sine":
        if fast:
            return _fast_sincos(omega * z, need_cos=False)[0]
        return jnp.sin(omega * z)
    if act == "relu":
        return jnp.maximum(z, 0.0)
    if act == "none":
        return z
    raise ValueError(f"unknown activation {act!r}")


def _act_and_factor(z, act: str, omega: float, fast: bool):
    """(act(z), d act/dz factor) with the factor stashed bf16.

    For sine the pair shares one range reduction when ``fast`` — the builtin
    jnp.sin + jnp.cos pair pays two."""
    if act == "sine":
        if fast:
            s, c = _fast_sincos(omega * z)
        else:
            s, c = jnp.sin(omega * z), jnp.cos(omega * z)
        return s, c.astype(jnp.bfloat16)  # multiplied by omega later
    if act == "relu":
        return jnp.maximum(z, 0.0), (z > 0.0).astype(jnp.bfloat16)
    return z, None


def _act_factor(z, act: str, omega: float):
    """d act(z) / dz, stashed bf16 (see backward kernel notes)."""
    return _act_and_factor(z, act, omega, fast=False)[1]


def _forward_kernel(omega: float, acts: tuple, compute_dtype=None,
                    fast: bool = False):
    """Build the fused forward kernel body for the given activation pattern."""
    n_layers = len(acts)

    def kernel(x_ref, *refs):
        # refs: W0,b0, W1,b1, ..., W_{n-1},b_{n-1}, out_ref
        out_ref = refs[-1]
        h = x_ref[:]
        for l in range(n_layers):
            W = refs[2 * l][:]
            b = refs[2 * l + 1][:]  # (1, n) — biases are kept 2-D in-kernel
            h = _apply_act(_dot(h, W, compute_dtype) + b, acts[l], omega, fast)
        out_ref[:] = h

    return kernel


def _pad_rows(x: Array, tile: int) -> tuple[Array, int]:
    P = x.shape[0]
    rem = (-P) % tile
    if rem:
        x = jnp.pad(x, ((0, rem), (0, 0)))
    return x, P


@functools.partial(
    jax.jit,
    static_argnames=("omega", "interpret", "compute_dtype", "acts", "fast_sincos"),
)
def siren_forward(x: Array, weights: Sequence[Array], omega: float = 30.0,
                  interpret: bool | None = None, compute_dtype=None,
                  acts: tuple | None = None, fast_sincos: bool = False) -> Array:
    """Fused MLP forward. ``weights`` = [W1, b1, ..., Wout, bout];
    ``acts`` = per-layer activations (default: plain-Siren pattern)."""
    interpret = (not _is_tpu()) if interpret is None else interpret
    acts = _default_acts(len(weights) // 2) if acts is None else acts
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
        _forward_kernel(omega, acts, compute_dtype, fast_sincos),
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


def _recompute_forward(x, refs, acts, omega, compute_dtype, fast: bool = False):
    """Forward recompute for one tile (``x`` is the already-loaded value),
    stashing per-layer inputs and activation-derivative factors.

    Inputs/factors are stashed in bf16: halves the VMEM working set (tile 512
    instead of 256); dW error class matches bf16-compute, measured within
    noise of f32 on the flagship fit. With ``compute_dtype=bf16`` the stash
    cast doubles as the matmul operand, so the downcast is the ONLY extra
    elementwise pass per layer (no second cast inside the dot).
    Returns (h, layer_inputs, factors).
    """
    h = x
    inputs = []
    factors = []
    for l, act in enumerate(acts):
        h_s = h.astype(jnp.bfloat16)
        inputs.append(h_s)
        W = refs[2 * l][:]
        b = refs[2 * l + 1][:]
        z = _dot(h_s if compute_dtype is not None else h, W, compute_dtype) + b
        h, factor = _act_and_factor(z, act, omega, fast)
        factors.append(factor)
    return h, inputs, factors


def _backprop_weights(refs, dW_refs, delta, inputs, factors, acts, omega,
                      compute_dtype, need_dx: bool):
    """Shared backward chain: accumulate dW/db per layer; optionally return dx.

    With ``compute_dtype=bf16`` the bf16 activation stash feeds the MXU
    directly (single-pass matmul, f32 accumulation) and delta is downcast
    once per layer, shared between the dW and the delta-chain matmuls — no
    f32 upcasts of (tile, width) stashes."""
    for l in reversed(range(len(acts))):
        if acts[l] == "sine":
            delta = delta * (omega * factors[l].astype(jnp.float32))
        elif acts[l] == "relu":
            delta = delta * factors[l].astype(jnp.float32)
        if compute_dtype is not None:
            d_lp = delta.astype(compute_dtype)
            dW_refs[2 * l][:] += _dot_ta(inputs[l], d_lp, None)
            dW_refs[2 * l + 1][:] += jnp.sum(delta, axis=0, keepdims=True)
            if l > 0 or need_dx:
                delta = _dot_tb(d_lp, refs[2 * l][:], compute_dtype)
        else:
            dW_refs[2 * l][:] += _dot_ta(inputs[l].astype(jnp.float32), delta, None)
            dW_refs[2 * l + 1][:] += jnp.sum(delta, axis=0, keepdims=True)
            if l > 0 or need_dx:
                delta = _dot_tb(delta, refs[2 * l][:], None)
    return delta


def _backward_kernel(omega: float, acts: tuple, compute_dtype=None,
                     fast: bool = False):
    """Recompute activations for the tile, then backprop, accumulating dW/db
    into revisited output blocks."""
    n_layers = len(acts)

    def kernel(*refs):
        # inputs: x, W0,b0..W_{n-1},b_{n-1}, g
        # outputs: dx, dW0,db0, ..., dW_{n-1},db_{n-1}
        n_in = 1 + 2 * n_layers + 1
        x_ref = refs[0]
        g_ref = refs[n_in - 1]
        out_refs = refs[n_in:]
        dx_ref = out_refs[0]
        dW_refs = out_refs[1:]
        w_refs = refs[1:n_in - 1]

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for r in dW_refs:
                r[:] = jnp.zeros_like(r)

        _, inputs, factors = _recompute_forward(
            x_ref[:], w_refs, acts, omega, compute_dtype, fast
        )
        dx_ref[:] = _backprop_weights(
            w_refs, dW_refs, g_ref[:], inputs, factors, acts, omega,
            compute_dtype, need_dx=True,
        )

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def siren_fused(x: Array, weights: tuple, omega: float = 30.0,
                compute_dtype=None, acts: tuple | None = None,
                fast_sincos: bool = False) -> Array:
    return siren_forward(x, list(weights), omega, compute_dtype=compute_dtype,
                         acts=acts, fast_sincos=fast_sincos)


def _fwd(x, weights, omega, compute_dtype, acts, fast_sincos):
    return (
        siren_forward(x, list(weights), omega, compute_dtype=compute_dtype,
                      acts=acts, fast_sincos=fast_sincos),
        (x, tuple(weights)),
    )


def _bwd(omega, compute_dtype, acts, fast_sincos, res, g):
    x, weights = res
    interpret = not _is_tpu()
    acts = _default_acts(len(weights) // 2) if acts is None else acts
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
        _backward_kernel(omega, acts, compute_dtype, fast_sincos),
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
# one-pass fused train-step gradient: forward + masked MSE + backward
# ---------------------------------------------------------------------------


def _loss_grad_kernel(omega: float, acts: tuple, compute_dtype, inv_n: float,
                      n_rows: int, tile: int, fast: bool = False,
                      with_out_absmax: bool = False,
                      with_weights: bool = False, row_split: int = 1):
    """Forward + MSE residual + backward in one tile visit.

    Padded rows are masked out of the residual, so they contribute nothing to
    the loss or the weight gradients. The scalar loss accumulates in a (1, 1)
    block revisited across grid steps; dW/db accumulate likewise.

    ``with_out_absmax`` adds a (1, 1) output accumulating max(|out|) over the
    REAL rows — the collapse-restart signal of the ERD two-phase loop
    (INR_ERD.py:211-217 checks output.max() == 0) without a separate forward.

    ``with_weights`` adds a per-row sample-weight input: loss becomes the
    acceptance-weighted MSE of master.py:143-145 — mean of w*(y-t)^2 over the
    TOTAL element count (fit/losses.weighted_mse semantics), gradient
    2*w*(y-t)/N.

    ``row_split`` processes the tile as that many independent row sub-blocks
    (static unroll). The sub-blocks' instruction chains are independent until
    the dW accumulation, giving the VLIW scheduler independent MXU and VPU
    work to bundle — sub-block A's sine/cos polynomials can hide behind
    sub-block B's matmuls, which a single serial chain cannot.
    """
    n_layers = len(acts)
    assert tile % row_split == 0
    sub = tile // row_split

    def kernel(*refs):
        # inputs: x, W0,b0..W_{n-1},b_{n-1}, target[, sample_weights]
        # outputs: loss(1,1)[, out_absmax(1,1)], dW0,db0, ..., dW_{n-1},db_{n-1}
        n_in = 1 + 2 * n_layers + 1 + (1 if with_weights else 0)
        x_ref = refs[0]
        t_ref = refs[2 + 2 * n_layers - 1]
        sw_ref = refs[n_in - 1] if with_weights else None
        w_refs = refs[1:1 + 2 * n_layers]
        out_refs = refs[n_in:]
        loss_ref = out_refs[0]
        if with_out_absmax:
            absmax_ref = out_refs[1]
            dW_refs = out_refs[2:]
        else:
            dW_refs = out_refs[1:]

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            loss_ref[:] = jnp.zeros_like(loss_ref)
            if with_out_absmax:
                absmax_ref[:] = jnp.zeros_like(absmax_ref)
            for r in dW_refs:
                r[:] = jnp.zeros_like(r)

        loss_acc = None
        absmax_acc = None
        for s in range(row_split):
            sl = slice(s * sub, (s + 1) * sub) if row_split > 1 else slice(None)
            out, inputs, factors = _recompute_forward(
                x_ref[sl, :], w_refs, acts, omega, compute_dtype, fast
            )
            rows = (jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
                    + i * tile + s * sub)
            r = jnp.where(rows < n_rows, out - t_ref[sl, :], 0.0)
            if with_weights:
                wr = sw_ref[sl, :] * r
            else:
                wr = r
            part = jnp.sum(wr * r).reshape(1, 1)
            loss_acc = part if loss_acc is None else loss_acc + part
            if with_out_absmax:
                pm = jnp.max(
                    jnp.where(rows < n_rows, jnp.abs(out), 0.0)
                ).reshape(1, 1)
                absmax_acc = pm if absmax_acc is None else jnp.maximum(
                    absmax_acc, pm)
            _backprop_weights(
                w_refs, dW_refs, (2.0 * inv_n) * wr, inputs, factors, acts,
                omega, compute_dtype, need_dx=False,
            )
        # (1, 1)-shaped store: Mosaic rejects scalar stores to VMEM
        loss_ref[:] = loss_ref[:] + loss_acc * inv_n
        if with_out_absmax:
            absmax_ref[:] = jnp.maximum(absmax_ref[:], absmax_acc)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("omega", "compute_dtype", "acts", "interpret", "tile",
                     "fast_sincos", "n_rows", "with_out_absmax", "row_split"),
)
def siren_loss_grads(
    x: Array,
    weights: tuple,
    target: Array,
    omega: float = 30.0,
    compute_dtype=None,
    acts: tuple | None = None,
    interpret: bool | None = None,
    tile: int = TILE_BWD,
    fast_sincos: bool = False,
    n_rows: int | None = None,
    with_out_absmax: bool = False,
    sample_weights: Array | None = None,
    row_split: int = 1,
):
    """One-pass ``(mse_loss, dweights)`` for a full-batch train step.

    Equivalent to ``jax.value_and_grad(lambda w: mse(forward(x, w), target))``
    but in a single Pallas kernel: no separate forward pass, no dx, no HBM
    round-trip of the network output. ``sample_weights`` (P, 1) switches the
    loss to the acceptance-weighted MSE (losses.weighted_mse semantics).

    ``n_rows`` marks the count of REAL rows when ``x``/``target`` arrive
    already padded to a tile multiple (rows >= n_rows are masked out of the
    loss and gradients). Pre-padding once outside a scanned fit loop matters:
    XLA does not hoist the loop-invariant pad of a 72 MB coordinate array out
    of the scan body, which costs ~155 us/step on the flagship volume
    (measured via profile; see make_fused_value_and_grad(pad_rows_to)).
    """
    interpret = (not _is_tpu()) if interpret is None else interpret
    acts = _default_acts(len(weights) // 2) if acts is None else acts
    orig_ndims = [w.ndim for w in weights]
    weights = [w[None, :] if w.ndim == 1 else w for w in weights]
    P = x.shape[0] if n_rows is None else n_rows
    inv_n = 1.0 / (P * target.shape[-1])
    xp, _ = _pad_rows(x, tile)
    tp, _ = _pad_rows(target, tile)
    grid = (xp.shape[0] // tile,)
    ms = pl.ANY if interpret else pltpu.VMEM

    def block_full(w):
        return pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=ms)

    in_specs = [pl.BlockSpec((tile, x.shape[1]), lambda i: (i, 0), memory_space=ms)]
    in_specs += [block_full(w) for w in weights]
    in_specs += [pl.BlockSpec((tile, target.shape[1]), lambda i: (i, 0), memory_space=ms)]
    operands = [xp, *weights, tp]
    if sample_weights is not None:
        swp, _ = _pad_rows(sample_weights, tile)
        in_specs += [
            pl.BlockSpec((tile, sample_weights.shape[1]), lambda i: (i, 0),
                         memory_space=ms)
        ]
        operands.append(swp)

    n_scalar_outs = 2 if with_out_absmax else 1
    out_shapes = [jax.ShapeDtypeStruct((1, 1), jnp.float32)] * n_scalar_outs
    out_specs = [pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=ms)] * n_scalar_outs
    for w in weights:
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(block_full(w))

    outs = pl.pallas_call(
        _loss_grad_kernel(float(omega), acts, compute_dtype, inv_n, P, tile,
                          fast_sincos, with_out_absmax,
                          with_weights=sample_weights is not None,
                          row_split=row_split),
        out_shape=tuple(out_shapes),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(*operands)
    loss = outs[0][0, 0]
    dW = tuple(
        d[0] if nd == 1 else d
        for d, nd in zip(outs[n_scalar_outs:], orig_ndims)
    )
    if with_out_absmax:
        return loss, outs[1][0, 0], dW
    return loss, dW


# ---------------------------------------------------------------------------
# flax-params adapter
# ---------------------------------------------------------------------------


def _trunk_dense_keys(p) -> list:
    """Ordered trunk layer keys: SineLayer_0..n then Dense_0[, Dense_1]."""
    sine_keys = sorted(
        (k for k in p if k.startswith("SineLayer_")), key=lambda k: int(k.split("_")[1])
    )
    dense_keys = sorted(
        (k for k in p if k.startswith("Dense_")), key=lambda k: int(k.split("_")[1])
    )
    return sine_keys + dense_keys


def weights_from_flax(params) -> list:
    """Flatten a Siren/SirenERD flax params tree into the kernel's weight
    list (trunk only — the SirenERD perturb branch stays in XLA)."""
    p = params["params"]
    out = []
    for k in _trunk_dense_keys(p):
        d = p[k]["Dense_0"] if k.startswith("SineLayer_") else p[k]
        out.extend([d["kernel"], d["bias"]])
    return out


def weights_to_flax(weights: Sequence[Array], template, fill_zeros: bool = False) -> dict:
    """Inverse of :func:`weights_from_flax` onto a params template.

    ``fill_zeros`` zeroes every non-trunk leaf (e.g. the SirenERD perturb
    branch) — required when the result is a *gradient* pytree."""
    if fill_zeros:
        p = jax.tree_util.tree_map(jnp.zeros_like, template)
    else:
        p = jax.tree_util.tree_map(lambda x: x, template)
    inner = p["params"]
    idx = 0
    for k in _trunk_dense_keys(inner):
        d = inner[k]["Dense_0"] if k.startswith("SineLayer_") else inner[k]
        d["kernel"] = weights[idx]
        d["bias"] = weights[idx + 1]
        idx += 2
    return p


def acts_for_model(model) -> tuple:
    """Per-layer activation pattern of a model's trunk."""
    from mri_super_resolution_tpu.models.siren import Siren, SirenERD, SirenToy

    n_sine = 1 + model.hidden_layers
    if isinstance(model, SirenERD):
        # trunk Linear+ReLU then final Linear+ReLU (INR_ERD.py:28-67)
        return ("sine",) * n_sine + ("relu", "relu")
    if isinstance(model, (Siren, SirenToy)):
        return ("sine",) * n_sine + ("none",)
    raise TypeError(f"no kernel activation pattern for {type(model).__name__}")


def _perturb_delta(params, coords, sample, eps):
    """SirenERD perturbation branch in XLA (tiny matmuls; INR_ERD.py:46-57)."""
    p = params["params"]["perturb"]
    acq = jnp.full(coords.shape[:-1] + (1,), sample, coords.dtype)
    h = jnp.concatenate([coords, acq], axis=-1)
    h = jnp.tanh(h @ p["Dense_0"]["kernel"] + p["Dense_0"]["bias"])
    h = h @ p["Dense_1"]["kernel"] + p["Dense_1"]["bias"]
    return eps * jnp.tanh(h)


@functools.lru_cache(maxsize=None)
def make_fused_apply(model, compute_dtype=None, fast_sincos: bool = True) -> "callable":
    """Adapter: an ``apply(params, x)`` for ``models.Siren`` /
    ``models.SirenERD`` that runs the trunk through the fused Pallas kernel
    (drop-in for the fit-engine's apply_fn).

    Gradients flow through the flax->flat weight reindexing, so ``jax.grad``
    over params hits the kernel's custom VJP. For SirenERD the perturbation
    branch runs in XLA (3-wide matmuls) and its gradients flow through the
    kernel's dx.

    ``compute_dtype=jnp.bfloat16`` runs the matmuls single-pass on the MXU
    with f32 accumulation and f32 master weights (fast-math mode).
    """
    from mri_super_resolution_tpu.models.siren import SirenERD, SirenToy

    omega = float(model.hidden_omega_0)
    first_omega = float(getattr(model, "first_omega_0", omega))
    acts = acts_for_model(model)

    # distinct first/hidden omega: fold the per-layer omega into the weights
    # (sin(o*(xW+b)) == sin(x*(oW) + ob)) and run the kernel at omega=1 —
    # the same folding make_fused_value_and_grad uses; silently applying the
    # hidden omega to the first layer would be numerically wrong.
    if first_omega != omega:
        scales = tuple(
            (first_omega if l == 0 else omega) if acts[l] == "sine" else 1.0
            for l in range(len(acts))
        )

        def prep(ws):
            return tuple(
                w * scales[i // 2] if scales[i // 2] != 1.0 else w
                for i, w in enumerate(ws)
            )

        kernel_omega = 1.0
    else:
        prep = tuple
        kernel_omega = omega

    if isinstance(model, (SirenERD, SirenToy)) and model.perturb:

        def apply(params, coords, sample=0.0, eps=0.0):
            coords = coords + _perturb_delta(params, coords, sample, eps)
            ws = prep(weights_from_flax(params))
            return siren_fused(coords, ws, kernel_omega, compute_dtype, acts,
                               fast_sincos)

        return apply

    def apply(params, x, **_):
        ws = prep(weights_from_flax(params))
        return siren_fused(x, ws, kernel_omega, compute_dtype, acts, fast_sincos)

    return apply


def pad_rows_to(x: Array, tile: int = 512) -> Array:
    """Pad rows to a multiple of ``tile`` ONCE, outside a scanned fit loop
    (pair with ``make_fused_value_and_grad(..., n_rows=<real count>)``)."""
    return _pad_rows(x, tile)[0]


@functools.lru_cache(maxsize=None)
def make_fused_value_and_grad(model, compute_dtype=None, tile: int = 512,
                              fold_omega: bool = False, fast_sincos: bool = True,
                              n_rows: int | None = None, row_split: int = 1):
    """A drop-in for ``jax.value_and_grad(lambda p: mse(apply(p, x), t))``
    running the whole train-step gradient in one kernel pass.

    ``fold_omega`` pre-scales each sine layer's (W, b) by its omega outside
    the kernel — ``sin(omega(xW+b)) == sin(x(omega W)+omega b)`` — so the
    kernel runs with omega=1 and the per-layer ``omega*z`` (forward) and
    ``omega*cos`` (backward) elementwise passes over (tile, width) tensors
    const-fold away; the rescale touches only the parameter-sized gradients
    once per step. Also makes distinct first/hidden omegas exact (the
    unfolded kernel assumes one omega).

    ``n_rows``: pass the REAL row count when the caller pre-pads x/target to
    a multiple of ``tile`` with :func:`pad_rows_to` — hoists the per-step pad
    of the loop-invariant coordinate array out of scanned fit loops
    (~155 us/step on the flagship volume; XLA does not do this itself).

    Returns ``vag(params, x, target) -> (loss, grads)`` with ``grads``
    matching the params pytree (non-trunk leaves zero).
    """
    omega = float(model.hidden_omega_0)
    first_omega = float(getattr(model, "first_omega_0", omega))
    acts = acts_for_model(model)

    if fold_omega:
        scales = tuple(
            (first_omega if l == 0 else omega) if acts[l] == "sine" else 1.0
            for l in range(len(acts))
        )

        def vag(params, x, target):
            ws = weights_from_flax(params)
            ws_f = tuple(
                w * scales[i // 2] if scales[i // 2] != 1.0 else w
                for i, w in enumerate(ws)
            )
            loss, dws = siren_loss_grads(
                x, ws_f, target, 1.0, compute_dtype, acts, tile=tile,
                fast_sincos=fast_sincos, n_rows=n_rows, row_split=row_split,
            )
            dws = tuple(
                d * scales[i // 2] if scales[i // 2] != 1.0 else d
                for i, d in enumerate(dws)
            )
            return loss, weights_to_flax(dws, params, fill_zeros=True)

        return vag

    if first_omega != omega:
        raise ValueError("distinct first/hidden omega requires fold_omega=True")

    def vag(params, x, target):
        ws = tuple(weights_from_flax(params))
        loss, dws = siren_loss_grads(
            x, ws, target, omega, compute_dtype, acts, tile=tile,
            fast_sincos=fast_sincos, n_rows=n_rows, row_split=row_split,
        )
        return loss, weights_to_flax(dws, params, fill_zeros=True)

    return vag


@functools.lru_cache(maxsize=None)
def make_fused_value_grad_absmax(model, compute_dtype=None, tile: int = 512,
                                 fast_sincos: bool = True,
                                 n_rows: int | None = None):
    """Like :func:`make_fused_value_and_grad` but the returned
    ``vag(params, x, target) -> (loss, out_absmax, grads)`` also reports
    max(|model output|) over the real rows — the collapse-restart signal the
    ERD two-phase loop needs (INR_ERD.py:211-217), still in ONE kernel pass.
    Pass to ``fit/engine.fit_until(value_grad_absmax_fn=...)``."""
    omega = float(model.hidden_omega_0)
    first_omega = float(getattr(model, "first_omega_0", omega))
    if first_omega != omega:
        raise ValueError("distinct first/hidden omega is not supported here")
    acts = acts_for_model(model)

    def vag(params, x, target):
        ws = tuple(weights_from_flax(params))
        loss, out_absmax, dws = siren_loss_grads(
            x, ws, target, omega, compute_dtype, acts, tile=tile,
            fast_sincos=fast_sincos, n_rows=n_rows, with_out_absmax=True,
        )
        return loss, out_absmax, weights_to_flax(dws, params, fill_zeros=True)

    return vag


def tpu_value_grad_absmax(model, **kw):
    """:func:`make_fused_value_grad_absmax` when running on TPU (and the
    model's hidden width fits the 128-lane constraint), else None — the gate
    every fit_until pipeline uses (pass straight to
    ``fit_until(value_grad_absmax_fn=...)``)."""
    if not _is_tpu() or int(model.hidden_features) % 128:
        return None
    omega = float(model.hidden_omega_0)
    if float(getattr(model, "first_omega_0", omega)) != omega:
        return None  # absmax kernel has no fold_omega path; fall back to XLA
    return make_fused_value_grad_absmax(model, **kw)


def _round128(n: int) -> int:
    return -(-n // 128) * 128


def _pad_hidden_widths(ws: list) -> list:
    """Zero-pad every hidden width to a multiple of the 128-lane dimension.

    Safe for sine/relu/none activations: padded pre-activations are exactly 0
    (zero weights + zero bias), sin(0) = relu(0) = 0, and zero rows in the
    next layer's weights kill any contribution — so outputs, loss and the
    REAL weights' gradients are bit-identical, and the padded slots' grads
    are exactly 0 (cropping loses nothing). Lets narrow reference configs
    (master.py's Siren 2->64x6) ride the fused kernel.
    """
    n_layers = len(ws) // 2
    out = []
    for l in range(n_layers):
        W, b = ws[2 * l], ws[2 * l + 1]
        in_p = W.shape[0] if l == 0 else _round128(W.shape[0])
        out_p = W.shape[1] if l == n_layers - 1 else _round128(W.shape[1])
        out.append(jnp.pad(W, ((0, in_p - W.shape[0]), (0, out_p - W.shape[1]))))
        out.append(jnp.pad(b, (0, out_p - b.shape[0])))
    return out


def _needs_width_pad(ws: list) -> bool:
    n_layers = len(ws) // 2
    return any(
        ws[2 * l].shape[1] % 128 for l in range(n_layers - 1)
    ) or (n_layers > 1 and ws[2].shape[0] % 128 != 0)


@functools.lru_cache(maxsize=None)
def make_fused_weighted_value_and_grad(model, compute_dtype=None,
                                       tile: int = 512,
                                       fast_sincos: bool = True,
                                       n_rows: int | None = None):
    """One-pass fused gradient of the acceptance-weighted MSE
    (losses.weighted_mse — the master.py:143-145 loss):
    ``vag(params, x, target, sample_weights) -> (loss, grads)``.

    Narrow hidden widths (e.g. the reference 2-D config's 64) are zero-padded
    to the 128-lane dimension around the kernel call; gradients are cropped
    back (exact — see _pad_hidden_widths). Composes with jax.vmap (the
    master2d pipeline vmaps 3 directions into one program).
    """
    omega = float(model.hidden_omega_0)
    first_omega = float(getattr(model, "first_omega_0", omega))
    if first_omega != omega:
        raise ValueError("distinct first/hidden omega is not supported here")
    acts = acts_for_model(model)

    def vag(params, x, target, sample_weights):
        ws = weights_from_flax(params)
        shapes = [w.shape for w in ws]
        pad = _needs_width_pad(ws)
        ws_k = tuple(_pad_hidden_widths(ws)) if pad else tuple(ws)
        loss, dws = siren_loss_grads(
            x, ws_k, target, omega, compute_dtype, acts, tile=tile,
            fast_sincos=fast_sincos, n_rows=n_rows,
            sample_weights=sample_weights,
        )
        if pad:
            dws = tuple(
                d[tuple(slice(0, s) for s in shp)]
                for d, shp in zip(dws, shapes)
            )
        return loss, weights_to_flax(dws, params, fill_zeros=True)

    return vag
