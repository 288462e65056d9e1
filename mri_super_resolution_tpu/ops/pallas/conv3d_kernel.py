"""Experimental Pallas TPU kernel for the RAMS RFAB 3-D convolutions.

Target: the step-dominating fusions of the RAMS trainer — 3x3x3 convs,
C_in = C_out = filters = 32, on (B, H, W, T, C) activations
(multi-image-super-resolution/utils/network.py:42-63; profiled at
~190 us per conv inside XLA's EmitAllBatchInSublanes conv emitter, ~49% of
the filters=32 lane-constrained MXU ceiling — docs/ROUND3.md). Both the
SAME RFAB convs and the VALID temporal-reduction convs are covered.

Formulation (the "shifted flat plane" trick): flatten each temporal slice
of the (spatially padded, for SAME) input to a contiguous (P, C) plane
with row index r = y * Win + x. For an output pixel (y, x) the conv reads
rows (y+dy) * Win + (x+dx) = r + dy*Win + dx — every one of the 27 taps is
ONE contiguous row-shifted slice of the flat plane. Rows whose x+dx
crosses a row boundary only land in output columns x >= Wout (discarded by
the final crop), so full-plane shifts are exact on the valid region. The
kernel concatenates all 27 taps along K into a single
(M, 27*C) @ (27*C, C_out) matmul per (batch, t_out): M = Hout*Win >> 8
sublanes, K = 27*C streams deep through the MXU, and the N = C_out = 32
lane limit (the architecture's 25%-occupancy wall) is paid once per output
plane instead of 27 times. All offsets are static — the grid is (B,) and
the t_out/tap loops unroll.

Status: forward + one-pass custom VJP with interpret-mode parity tests
(tests/test_conv3d_kernel.py); the round-3 exploration of the "custom
Pallas conv" headroom question docs/ROUND3.md left open. A/B against the
XLA emitter with scripts/conv_kernel_bench.py on real TPU before enabling
RAMSConfig.conv_kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mri_super_resolution_tpu.ops.pallas.siren_kernel import _is_tpu

Array = jax.Array

TAPS = 27


def _geom(x_shape, padding: str):
    """Derived shapes: (Hin, Win, Tin) of the flat planes and
    (Hout, Wout, Tout) of the conv output."""
    B, H, W, T, C = x_shape
    if padding == "SAME":
        return (H + 2, W + 2, T + 2), (H, W, T)
    if padding == "VALID":
        return (H, W, T), (H - 2, W - 2, T - 2)
    raise ValueError(padding)


def _flat_planes(x, padding: str, P_in: int):
    """(B, H, W, T, C) -> (B, Tin, P_in, C) padded flat temporal planes."""
    B, H, W, T, C = x.shape
    if padding == "SAME":
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    B, Hp, Wp, Tp, C = x.shape
    xp = x.transpose(0, 3, 1, 2, 4).reshape(B, Tp, Hp * Wp, C)
    return jnp.pad(xp, ((0, 0), (0, 0), (0, P_in - Hp * Wp), (0, 0)))


def _flat_kernel(kernel):
    """(3,3,3,C,Cout) spatial order (dy, dx, dz) -> tap-major (dz, dy, dx)
    rows of a (27*C, Cout) matrix."""
    C, Cout = kernel.shape[3:]
    return kernel.transpose(2, 0, 1, 3, 4).reshape(TAPS * C, Cout)


def _conv_kernel(Tout: int, M: int, C: int, Cout: int, Win: int,
                 compute_dtype):
    """Grid cell = one batch element; t_out and taps unroll statically."""

    def kernel(x_ref, w_ref, b_ref, out_ref, a_ref):
        # x_ref: (1, Tin, P_in, C) flat planes for this batch element
        # w_ref: (TAPS*C, Cout); b_ref: (1, Cout); out_ref: (1, Tout, M, Cout)
        # a_ref: (M, TAPS*C) VMEM scratch for the K-concatenated operand
        w = w_ref[:]
        bias = b_ref[:].astype(jnp.float32)
        if compute_dtype is not None:
            w = w.astype(compute_dtype)
        for t in range(Tout):
            i = 0
            for dz in range(3):
                plane = x_ref[0, t + dz]
                for dy in range(3):
                    for dx in range(3):
                        off = dy * Win + dx
                        a_ref[:, i * C:(i + 1) * C] = plane[off:off + M, :]
                        i += 1
            a = a_ref[:]
            if compute_dtype is not None:
                a = a.astype(compute_dtype)
            acc = jax.lax.dot_general(
                a, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[0, t] = (acc + bias).astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("padding", "interpret", "compute_dtype"))
def conv3d_rfab(x: Array, kernel: Array, bias: Array, padding: str = "SAME",
                interpret: bool | None = None, compute_dtype=None) -> Array:
    """3x3x3 conv + bias for (B, H, W, T, C) activations.

    Drop-in for the WNConv(filters, (3,3,3)) forward at the RFAB shapes
    (kernel (3, 3, 3, C, Cout), spatial order (H, W, T) matching WNConv's
    ("NHWTC", "HWTIO") dimension numbers). SAME or VALID; returns
    (B, Hout, Wout, Tout, Cout) in x.dtype.
    """
    interpret = (not _is_tpu()) if interpret is None else interpret
    B, H, W, T, C = x.shape
    kh, kw, kt, Cin, Cout = kernel.shape
    assert (kh, kw, kt) == (3, 3, 3) and Cin == C, (kernel.shape, x.shape)
    (Hin, Win, Tin), (Hout, Wout, Tout) = _geom(x.shape, padding)
    M = Hout * Win  # output rows: y in [0, Hout), x over the full input width
    # the deepest tap reads up to (Hout+1)*Win + Win+1; pad the flat plane
    # slightly past Hin*Win and up to a sublane multiple
    P_in = ((Hin * Win + 2 + 7) // 8) * 8

    xp = _flat_planes(x, padding, P_in)
    wf = _flat_kernel(kernel)
    bf = bias.reshape(1, Cout)

    ms = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        _conv_kernel(Tout, M, C, Cout, Win, compute_dtype),
        out_shape=jax.ShapeDtypeStruct((B, Tout, M, Cout), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Tin, P_in, C), lambda b: (b, 0, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((TAPS * C, Cout), lambda b: (0, 0), memory_space=ms),
            pl.BlockSpec((1, Cout), lambda b: (0, 0), memory_space=ms),
        ],
        out_specs=pl.BlockSpec((1, Tout, M, Cout), lambda b: (b, 0, 0, 0),
                               memory_space=ms),
        scratch_shapes=[pltpu.VMEM((M, TAPS * C), x.dtype)],
        interpret=interpret,
    )(xp, wf, bf)

    # rows are (y, x over the input width) -> crop to x < Wout
    out = out.reshape(B, Tout, Hout, Win, Cout)[:, :, :, :Wout, :]
    return out.transpose(0, 2, 3, 1, 4)


# backward-compat alias (pre-VALID name)
def conv3d_same_rfab(x, kernel, bias, interpret=None, compute_dtype=None):
    return conv3d_rfab(x, kernel, bias, "SAME", interpret, compute_dtype)


# ---------------------------------------------------------------------------
# backward (one-pass dx + dkernel + dbias, same flat-plane structure)
# ---------------------------------------------------------------------------


BWD_M_CHUNK = 512  # rows per backward sub-block; bounds scoped VMEM (the
# full-plane variant allocated ~18M of stack at the RAMS shapes — over the
# 16M scoped-vmem limit on v5e; see results/round3_rams/conv_kernel_ab.json)


def _conv_bwd_kernel(Tout: int, M: int, C: int, Cout: int, Win: int,
                     compute_dtype):
    chunks = [(m0, min(BWD_M_CHUNK, M - m0))
              for m0 in range(0, M, BWD_M_CHUNK)]

    def kernel(x_ref, w_ref, g_ref, dx_ref, dw_ref, db_ref, a_ref):
        # x_ref: (1, Tin, P_in, C); w_ref: (TAPS*C, Cout)
        # g_ref: (1, Tout, M, Cout) cotangent planes (cropped cols zeroed)
        # dx_ref: (1, Tin, P_in, C) f32; dw_ref: (TAPS*C, Cout) f32 (accum
        # across the batch grid); db_ref: (1, Cout) f32
        # a_ref: (BWD_M_CHUNK, TAPS*C) operand rebuild scratch
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            dw_ref[:] = jnp.zeros_like(dw_ref)
            db_ref[:] = jnp.zeros_like(db_ref)

        dx_ref[:] = jnp.zeros_like(dx_ref)
        w = w_ref[:]
        if compute_dtype is not None:
            w = w.astype(compute_dtype)
        for t in range(Tout):
            db_ref[:] += jnp.sum(g_ref[0, t].astype(jnp.float32), axis=0,
                                 keepdims=True)
            # row sub-blocks keep the operand rebuild + f32 dA inside the
            # scoped-VMEM budget; every offset stays static
            for m0, mc in chunks:
                gc = g_ref[0, t, m0:m0 + mc, :].astype(w.dtype)
                # rebuild the forward operand A for this sub-block
                # (recompute > stash: A is 27x the activation size)
                i = 0
                for dz in range(3):
                    plane = x_ref[0, t + dz]
                    for dy in range(3):
                        for dx in range(3):
                            off = dy * Win + dx + m0
                            a_ref[:mc, i * C:(i + 1) * C] = \
                                plane[off:off + mc, :]
                            i += 1
                a = a_ref[:mc]
                if compute_dtype is not None:
                    a = a.astype(compute_dtype)
                # dW += A^T G
                dw_ref[:] += jax.lax.dot_general(
                    a, gc, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                # dA = G W^T, scatter-add the 27 shifted column blocks
                da = jax.lax.dot_general(
                    gc, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                i = 0
                for dz in range(3):
                    for dy in range(3):
                        for dx in range(3):
                            off = dy * Win + dx + m0
                            dx_ref[0, t + dz, off:off + mc, :] += \
                                da[:, i * C:(i + 1) * C]
                            i += 1

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("padding", "interpret", "compute_dtype"))
def conv3d_rfab_bwd(x: Array, kernel: Array, g: Array, padding: str = "SAME",
                    interpret: bool | None = None, compute_dtype=None):
    """Gradients (dx, dkernel, dbias) of :func:`conv3d_rfab`.

    ``g``: cotangent of the (B, Hout, Wout, Tout, Cout) output. One pass
    per batch element: rebuilds the K-concatenated operand (recompute, not
    stash), then dW += A^T G, dA = G W^T with 27 shifted scatter-adds into
    the flat dx planes.
    """
    interpret = (not _is_tpu()) if interpret is None else interpret
    B, H, W, T, C = x.shape
    Cout = kernel.shape[-1]
    (Hin, Win, Tin), (Hout, Wout, Tout) = _geom(x.shape, padding)
    M = Hout * Win
    P_in = ((Hin * Win + 2 + 7) // 8) * 8

    xp = _flat_planes(x, padding, P_in)
    wf = _flat_kernel(kernel)

    # cotangent planes over the full input width: cropped columns carry zero
    gp = jnp.pad(g.transpose(0, 3, 1, 2, 4),
                 ((0, 0), (0, 0), (0, 0), (0, Win - Wout), (0, 0)))
    gp = gp.reshape(B, Tout, M, Cout)

    ms = pl.ANY if interpret else pltpu.VMEM
    dxp, dwf, db = pl.pallas_call(
        _conv_bwd_kernel(Tout, M, C, Cout, Win, compute_dtype),
        out_shape=(
            jax.ShapeDtypeStruct((B, Tin, P_in, C), jnp.float32),
            jax.ShapeDtypeStruct((TAPS * C, Cout), jnp.float32),
            jax.ShapeDtypeStruct((1, Cout), jnp.float32),
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Tin, P_in, C), lambda b: (b, 0, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((TAPS * C, Cout), lambda b: (0, 0), memory_space=ms),
            pl.BlockSpec((1, Tout, M, Cout), lambda b: (b, 0, 0, 0),
                         memory_space=ms),
        ],
        out_specs=(
            pl.BlockSpec((1, Tin, P_in, C), lambda b: (b, 0, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((TAPS * C, Cout), lambda b: (0, 0), memory_space=ms),
            pl.BlockSpec((1, Cout), lambda b: (0, 0), memory_space=ms),
        ),
        scratch_shapes=[
            pltpu.VMEM((min(M, BWD_M_CHUNK), TAPS * C), x.dtype),
        ],
        interpret=interpret,
    )(xp, wf, gp)

    # un-flatten dx; SAME drops the pad-region gradients
    dx = dxp[:, :, : Hin * Win, :].reshape(B, Tin, Hin, Win, C)
    dx = dx.transpose(0, 2, 3, 1, 4)
    if padding == "SAME":
        dx = dx[:, 1:1 + H, 1:1 + W, 1:1 + T, :]
    # dW back to (3, 3, 3, C, Cout) in (dy, dx, dz) spatial order
    dk = dwf.reshape(3, 3, 3, C, Cout).transpose(1, 2, 0, 3, 4)
    return dx.astype(x.dtype), dk, db.reshape(Cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3d_rfab_trainable(x: Array, kernel: Array, bias: Array,
                          padding: str = "SAME",
                          compute_dtype=None) -> Array:
    """conv3d_rfab with a one-pass Pallas VJP (training path)."""
    return conv3d_rfab(x, kernel, bias, padding, compute_dtype=compute_dtype)


def _trainable_fwd(x, kernel, bias, padding, compute_dtype):
    return (conv3d_rfab(x, kernel, bias, padding, compute_dtype=compute_dtype),
            (x, kernel))


def _trainable_bwd(padding, compute_dtype, res, g):
    x, kernel = res
    dx, dk, db = conv3d_rfab_bwd(x, kernel, g, padding,
                                 compute_dtype=compute_dtype)
    return dx, dk.astype(kernel.dtype), db.astype(kernel.dtype)


conv3d_rfab_trainable.defvjp(_trainable_fwd, _trainable_bwd)


def conv3d_same_rfab_trainable(x, kernel, bias, compute_dtype=None):
    """Backward-compat alias (pre-VALID name)."""
    return conv3d_rfab_trainable(x, kernel, bias, "SAME", compute_dtype)
