"""Experimental Pallas TPU kernel for the RAMS RFAB 3-D convolution.

Target: the step-dominating fusion of the RAMS trainer — 3x3x3 SAME conv,
C_in = C_out = filters = 32, on (B, H, W, T, C) activations
(multi-image-super-resolution/utils/network.py:42-63; profiled at
~190 us per conv inside XLA's EmitAllBatchInSublanes conv emitter, ~49% of
the filters=32 lane-constrained MXU ceiling — docs/ROUND3.md).

Formulation (the "shifted flat plane" trick): pad H, W, T by 1 and flatten
each padded temporal slice to a contiguous (P, C) plane with row index
r = y * Wp + x. For an output pixel (y, x) (0-based in the unpadded image)
the conv reads padded rows (y+dy) * Wp + (x+dx) = r + dy*Wp + dx — so each
of the 27 taps is ONE contiguous row-shifted slice of the flat plane.
Rows whose x+dx crosses a row boundary only land in output columns
x >= W (discarded by the final crop), so full-plane shifts are exact on
the valid region. The kernel concatenates all 27 taps along K into a
single (M, 27*C) @ (27*C, C_out) matmul per (batch, t_out):
M = H*Wp = 1088 >> 8 sublanes, K = 864 streams deep through the MXU, and
the N = 32 lane limit (the architecture's 25%-occupancy wall) is paid
once per output plane instead of 27 times. All offsets are static — the
grid is (B,) and the t_out/tap loops unroll.

Status: forward kernel with interpret-mode parity tests
(tests/test_conv3d_kernel.py); the round-3 exploration of the "custom
Pallas conv" headroom question docs/ROUND3.md left open. A/B against the
XLA emitter with scripts/conv_kernel_bench.py on real TPU before wiring
into the model.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mri_super_resolution_tpu.ops.pallas.siren_kernel import _is_tpu

Array = jax.Array


def _conv_kernel(T: int, P_in: int, M: int, C: int, Cout: int, Wp: int,
                 compute_dtype):
    """Grid cell = one batch element; t_out and taps unroll statically."""
    taps = 27

    def kernel(x_ref, w_ref, b_ref, out_ref, a_ref):
        # x_ref: (1, T+2, P_in, C) padded flat planes for this batch element
        # w_ref: (taps*C, Cout) flattened kernel, tap-major (dz, dy, dx)
        # b_ref: (1, Cout); out_ref: (1, T, M, Cout)
        # a_ref: (M, taps*C) VMEM scratch for the K-concatenated operand
        w = w_ref[:]
        bias = b_ref[:].astype(jnp.float32)
        if compute_dtype is not None:
            w = w.astype(compute_dtype)
        for t in range(T):
            i = 0
            for dz in range(3):
                plane = x_ref[0, t + dz]
                for dy in range(3):
                    for dx in range(3):
                        off = dy * Wp + dx
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


@functools.partial(jax.jit, static_argnames=("interpret", "compute_dtype"))
def conv3d_same_rfab(x: Array, kernel: Array, bias: Array,
                     interpret: bool | None = None,
                     compute_dtype=None) -> Array:
    """3x3x3 SAME conv + bias for (B, H, W, T, C) activations.

    Drop-in for the WNConv(filters, (3,3,3), SAME) forward at the RFAB
    shapes (kernel (3, 3, 3, C, Cout), spatial order (H, W, T) matching
    WNConv's ("NHWTC", "HWTIO") dimension numbers). Returns
    (B, H, W, T, Cout) in x.dtype.
    """
    interpret = (not _is_tpu()) if interpret is None else interpret
    B, H, W, T, C = x.shape
    kh, kw, kt, Cin, Cout = kernel.shape
    assert (kh, kw, kt) == (3, 3, 3) and Cin == C, (kernel.shape, x.shape)
    Hp, Wp = H + 2, W + 2
    M = H * Wp  # output rows: y in [0, H), x over the full padded width
    # input plane rows: the deepest tap reads up to (H+1)*Wp + Wp+1; pad the
    # flat plane a little past Hp*Wp and up to a sublane multiple
    P_in = ((Hp * Wp + 2 + 7) // 8) * 8
    taps = 27

    # pad spatially+temporally, transpose to (B, T+2, Hp*Wp, C), pad rows
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    xp = xp.transpose(0, 3, 1, 2, 4).reshape(B, T + 2, Hp * Wp, C)
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, P_in - Hp * Wp), (0, 0)))

    # kernel spatial order (dy, dx, dz) -> tap-major (dz, dy, dx) rows
    wf = kernel.transpose(2, 0, 1, 3, 4).reshape(taps * C, Cout)
    bf = bias.reshape(1, Cout)

    ms = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        _conv_kernel(T, P_in, M, C, Cout, Wp, compute_dtype),
        out_shape=jax.ShapeDtypeStruct((B, T, M, Cout), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T + 2, P_in, C), lambda b: (b, 0, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((taps * C, Cout), lambda b: (0, 0), memory_space=ms),
            pl.BlockSpec((1, Cout), lambda b: (0, 0), memory_space=ms),
        ],
        out_specs=pl.BlockSpec((1, T, M, Cout), lambda b: (b, 0, 0, 0),
                               memory_space=ms),
        scratch_shapes=[pltpu.VMEM((M, taps * C), x.dtype)],
        interpret=interpret,
    )(xp, wf, bf)

    # (B, T, M, Cout): rows are (y, x over padded width) -> crop to x < W
    out = out.reshape(B, T, H, Wp, Cout)[:, :, :, :W, :]
    return out.transpose(0, 2, 3, 1, 4)


# ---------------------------------------------------------------------------
# backward (one-pass dx + dkernel + dbias, same flat-plane structure)
# ---------------------------------------------------------------------------


def _conv_bwd_kernel(T: int, P_in: int, M: int, C: int, Cout: int, Wp: int,
                     compute_dtype):
    taps = 27

    def kernel(x_ref, w_ref, g_ref, dx_ref, dw_ref, db_ref, a_ref, da_ref):
        # x_ref: (1, T+2, P_in, C); w_ref: (taps*C, Cout)
        # g_ref: (1, T, M, Cout) cotangent planes (cropped cols zeroed)
        # dx_ref: (1, T+2, P_in, C) f32; dw_ref: (taps*C, Cout) f32 (accum
        # across the batch grid); db_ref: (1, Cout) f32
        # a_ref: (M, taps*C) operand rebuild; da_ref: (M, taps*C) f32
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            dw_ref[:] = jnp.zeros_like(dw_ref)
            db_ref[:] = jnp.zeros_like(db_ref)

        dx_ref[:] = jnp.zeros_like(dx_ref)
        w = w_ref[:]
        if compute_dtype is not None:
            w = w.astype(compute_dtype)
        for t in range(T):
            g = g_ref[0, t]
            gc = g.astype(w.dtype)
            # rebuild the forward operand A for this plane (recompute >
            # stash: A is 27x the activation size)
            i = 0
            for dz in range(3):
                plane = x_ref[0, t + dz]
                for dy in range(3):
                    for dx in range(3):
                        off = dy * Wp + dx
                        a_ref[:, i * C:(i + 1) * C] = plane[off:off + M, :]
                        i += 1
            a = a_ref[:]
            if compute_dtype is not None:
                a = a.astype(compute_dtype)
            # dW += A^T G ; db += sum G
            dw_ref[:] += jax.lax.dot_general(
                a, gc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            db_ref[:] += jnp.sum(g.astype(jnp.float32), axis=0,
                                 keepdims=True)
            # dA = G W^T, scatter-add the 27 shifted column blocks into dx
            da_ref[:] = jax.lax.dot_general(
                gc, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            i = 0
            for dz in range(3):
                for dy in range(3):
                    for dx in range(3):
                        off = dy * Wp + dx
                        dx_ref[0, t + dz, off:off + M, :] += \
                            da_ref[:, i * C:(i + 1) * C]
                        i += 1

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "compute_dtype"))
def conv3d_same_rfab_bwd(x: Array, kernel: Array, g: Array,
                         interpret: bool | None = None,
                         compute_dtype=None):
    """Gradients (dx, dkernel, dbias) of :func:`conv3d_same_rfab`.

    ``g``: cotangent of the (B, H, W, T, Cout) output. One pass per batch
    element: rebuilds the K-concatenated operand (recompute, not stash),
    then dW += A^T G, dA = G W^T with 27 shifted scatter-adds into the
    padded dx planes.
    """
    interpret = (not _is_tpu()) if interpret is None else interpret
    B, H, W, T, C = x.shape
    _, _, _, _, Cout = kernel.shape
    Hp, Wp = H + 2, W + 2
    M = H * Wp
    P_in = ((Hp * Wp + 2 + 7) // 8) * 8
    taps = 27

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    xp = xp.transpose(0, 3, 1, 2, 4).reshape(B, T + 2, Hp * Wp, C)
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, P_in - Hp * Wp), (0, 0)))
    wf = kernel.transpose(2, 0, 1, 3, 4).reshape(taps * C, Cout)

    # cotangent planes over the padded width: cropped columns carry zero
    gp = jnp.pad(g.transpose(0, 3, 1, 2, 4),
                 ((0, 0), (0, 0), (0, 0), (0, Wp - W), (0, 0)))
    gp = gp.reshape(B, T, M, Cout)

    ms = pl.ANY if interpret else pltpu.VMEM
    dxp, dwf, db = pl.pallas_call(
        _conv_bwd_kernel(T, P_in, M, C, Cout, Wp, compute_dtype),
        out_shape=(
            jax.ShapeDtypeStruct((B, T + 2, P_in, C), jnp.float32),
            jax.ShapeDtypeStruct((taps * C, Cout), jnp.float32),
            jax.ShapeDtypeStruct((1, Cout), jnp.float32),
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T + 2, P_in, C), lambda b: (b, 0, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((taps * C, Cout), lambda b: (0, 0), memory_space=ms),
            pl.BlockSpec((1, T, M, Cout), lambda b: (b, 0, 0, 0),
                         memory_space=ms),
        ],
        out_specs=(
            pl.BlockSpec((1, T + 2, P_in, C), lambda b: (b, 0, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((taps * C, Cout), lambda b: (0, 0), memory_space=ms),
            pl.BlockSpec((1, Cout), lambda b: (0, 0), memory_space=ms),
        ),
        scratch_shapes=[
            pltpu.VMEM((M, taps * C), x.dtype),
            pltpu.VMEM((M, taps * C), jnp.float32),
        ],
        interpret=interpret,
    )(xp, wf, gp)

    # un-pad dx: flat padded planes -> (B, H, W, T, C)
    dx = dxp[:, :, : Hp * Wp, :].reshape(B, T + 2, Hp, Wp, C)
    dx = dx.transpose(0, 2, 3, 1, 4)[:, 1:1 + H, 1:1 + W, 1:1 + T, :]
    # dW back to (3, 3, 3, C, Cout) in (dy, dx, dz) spatial order
    dk = dwf.reshape(3, 3, 3, C, Cout).transpose(1, 2, 0, 3, 4)
    return dx.astype(x.dtype), dk, db.reshape(Cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3d_same_rfab_trainable(x: Array, kernel: Array, bias: Array,
                               compute_dtype=None) -> Array:
    """conv3d_same_rfab with a one-pass Pallas VJP (training path)."""
    return conv3d_same_rfab(x, kernel, bias, compute_dtype=compute_dtype)


def _trainable_fwd(x, kernel, bias, compute_dtype):
    return (conv3d_same_rfab(x, kernel, bias, compute_dtype=compute_dtype),
            (x, kernel))


def _trainable_bwd(compute_dtype, res, g):
    x, kernel = res
    dx, dk, db = conv3d_same_rfab_bwd(x, kernel, g,
                                      compute_dtype=compute_dtype)
    return dx, dk.astype(kernel.dtype), db.astype(kernel.dtype)


conv3d_same_rfab_trainable.defvjp(_trainable_fwd, _trainable_bwd)
