"""RAMS: residual attention multi-image super-resolution network.

Reference: multi-image-super-resolution/utils/network.py:18-155 (TF2/Keras +
tfa WeightNormalization). Architecture for scale=3, T=9 input acquisitions:

    normalize (PROBA-V mean/std) -> expand to (B, H, W, T, 1) -> reflect-pad
    H,W -> WN-Conv3D feature extraction -> N x RFAB -> WN-Conv3D + long skip
    -> floor(T/3) x [reflect-pad H,W -> RFAB -> valid WN-Conv3D(3,3,3) ReLU]
    (temporal reduction 9 -> 7 -> 5 -> 3) -> valid WN-Conv3D to scale^2
    channels -> drop T -> depth_to_space(3)
    + global 2-D path: reflect-pad -> RTAB -> valid WN-Conv2D(scale^2) ->
    depth_to_space(3); sum; denormalize.

TPU-native implementation notes:
- 3-D convs lower to ``lax.conv_general_dilated`` with NHWTC layouts — XLA
  maps them onto the MXU; channels-last keeps the lane dimension dense.
- Weight normalisation is a functional reparametrisation ``g * v / ||v||``
  (tfa data_init=False semantics: g initialised to ones).
- ``depth_to_space`` is a reshape/transpose pair (jnp, fused by XLA).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

MEAN = 7433.6436  # PROBA-V dataset statistics (network.py:18-19)
STD = 2353.0723


def normalize(x: Array, mean: float = MEAN, std: float = STD) -> Array:
    return (x - mean) / std


def denormalize(x: Array, mean: float = MEAN, std: float = STD) -> Array:
    return x * std + mean


def depth_to_space(x: Array, block: int) -> Array:
    """tf.nn.depth_to_space for NHWC arrays."""
    B, H, W, C = x.shape
    c = C // (block * block)
    x = x.reshape(B, H, W, block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H * block, W * block, c)


def reflect_pad_hw(x: Array, pad: int = 1, axes: tuple = (1, 2)) -> Array:
    """Reflective padding on the H, W dims (network.py:37-39)."""
    cfg = [(0, 0)] * x.ndim
    for a in axes:
        cfg[a] = (pad, pad)
    return jnp.pad(x, cfg, mode="reflect")


@jax.custom_vjp
def weight_norm_kernel(v: Array, g: Array) -> Array:
    """Effective kernel ``g * v / ||v||`` (norm over all non-output axes).

    custom_vjp with the math done on a flattened (K, F) view: XLA's autodiff
    of the naive 5-D form emitted one pathological ~150 us reduce-fusion per
    conv on TPU (measured 5.1 ms/step across RAMS's 34 WN convs — the single
    largest line in the round-2 profile); the closed-form backward on a 2-D
    view is a few fast column reductions."""
    v2 = v.reshape(-1, v.shape[-1])
    n = jnp.sqrt(jnp.sum(v2 * v2, axis=0) + 1e-12)
    return (v2 * (g / n)).reshape(v.shape)


def _wn_fwd(v, g):
    v2 = v.reshape(-1, v.shape[-1])
    n = jnp.sqrt(jnp.sum(v2 * v2, axis=0) + 1e-12)
    return (v2 * (g / n)).reshape(v.shape), (v2, g, n, v.shape)


def _wn_bwd(res, dw):
    v2, g, n, vshape = res
    dw2 = dw.reshape(v2.shape)
    vhat = v2 / n
    dg = jnp.sum(dw2 * vhat, axis=0)
    dv2 = (g / n) * (dw2 - vhat * dg)
    return dv2.reshape(vshape), dg


weight_norm_kernel.defvjp(_wn_fwd, _wn_bwd)


class WNConv(nn.Module):
    """Weight-normalised N-D convolution (tfa WeightNormalization analog).

    kernel v: Keras glorot_uniform; scale g: ones (data_init=False).
    Effective kernel = g * v / ||v|| with the norm over all non-output axes.

    ``dtype`` (compute dtype): kernel/activations cast to it for the conv —
    bfloat16 halves the HBM traffic that dominates the RAMS step on TPU —
    while the accumulator stays float32 (``preferred_element_type``) and the
    v/g/bias params stay float32 masters.
    """

    features: int
    kernel_size: Sequence[int]
    padding: str = "SAME"
    dtype: jnp.dtype | None = None
    # route 3x3x3 SAME convs through the experimental Pallas kernel
    # (ops/pallas/conv3d_kernel) — opt-in via RAMSConfig.conv_kernel;
    # interpret-mode (slow) on CPU, so leave off except on TPU
    conv_kernel: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        kshape = tuple(self.kernel_size) + (in_ch, self.features)
        v = self.param("v", nn.initializers.glorot_uniform(), kshape)
        g = self.param("g", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        kernel = weight_norm_kernel(v, g)
        dtype = self.dtype or x.dtype
        ndim = len(self.kernel_size)
        if (self.conv_kernel and ndim == 3
                and self.padding in ("SAME", "VALID")
                and tuple(self.kernel_size) == (3, 3, 3)
                # lane-aligned channels only: the feature-extraction conv
                # (in_ch=1) and the scale^2 head (features=9) stay on XLA
                and in_ch % 8 == 0 and self.features % 8 == 0):
            from mri_super_resolution_tpu.ops.pallas.conv3d_kernel import (
                conv3d_rfab_trainable)

            cd = jnp.bfloat16 if dtype == jnp.bfloat16 else None
            return conv3d_rfab_trainable(
                x.astype(dtype), kernel, b, self.padding, cd)
        # channels-last conv: spatial dims between batch and feature
        lhs_spec = "N" + "".join("DHW"[-ndim:]) + "C"
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, (lhs_spec, "".join("DHW"[-ndim:]) + "IO", lhs_spec)
        )
        # conv fully in the compute dtype: the TPU MXU accumulates bf16
        # convs in f32 internally, and a mixed bf16-in/f32-out conv
        # (preferred_element_type) breaks the conv transpose rule's dtype
        # check under autodiff
        out = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype),
            window_strides=(1,) * ndim, padding=self.padding,
            dimension_numbers=dn,
        )
        return out + b.astype(dtype)


class RFAB(nn.Module):
    """Residual Feature Attention Block (network.py:42-63)."""

    filters: int
    kernel_size: int = 3
    r: int = 8
    conv_kernel: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        res = x
        k = (self.kernel_size,) * 3
        x = WNConv(self.filters, k, conv_kernel=self.conv_kernel)(x)
        x = nn.relu(x)
        x = WNConv(self.filters, k, conv_kernel=self.conv_kernel)(x)
        to_scale = x
        # channel attention: GAP -> 1x1x1 bottleneck -> sigmoid gate
        # (GAP accumulates in f32 — a bf16 mean over ~10k elements drifts)
        att = x.astype(jnp.float32).mean(axis=(1, 2, 3), keepdims=True)
        att = WNConv(self.filters // self.r, (1, 1, 1))(att)
        att = nn.relu(att)
        att = WNConv(self.filters, (1, 1, 1))(att)
        att = nn.sigmoid(att).astype(x.dtype)
        return to_scale * att + res


class RTAB(nn.Module):
    """Residual Temporal Attention Block, 2-D (network.py:65-87)."""

    filters: int
    kernel_size: int = 3
    r: int = 8

    @nn.compact
    def __call__(self, x: Array) -> Array:
        res = x
        k = (self.kernel_size,) * 2
        x = WNConv(self.filters, k)(x)
        x = nn.relu(x)
        x = WNConv(self.filters, k)(x)
        to_scale = x
        att = x.astype(jnp.float32).mean(axis=(1, 2), keepdims=True)
        att = WNConv(self.filters // self.r, (1, 1))(att)
        att = nn.relu(att)
        att = WNConv(self.filters, (1, 1))(att)
        att = nn.sigmoid(att).astype(x.dtype)
        return to_scale * att + res


class RAMS(nn.Module):
    """Full RAMS network (network.py:91-155).

    Input: (B, H, W, T) uint16-range acquisitions; output (B, 3H, 3W, 1).
    """

    scale: int = 3
    filters: int = 32
    kernel_size: int = 3
    channels: int = 9  # T
    r: int = 8
    N: int = 12
    mean: float = MEAN
    std: float = STD
    # activation compute dtype; bfloat16 halves the HBM traffic that
    # dominates the TPU step (params/accumulators/GAP/loss stay f32)
    compute_dtype: str = "float32"
    # 5-D activation layout for the main path. "nhwtc" = (B, H, W, T, C),
    # the straight transcription; "nthwc" = (B, T, H, W, C) keeps (W, C) as
    # the minor dims, cutting XLA's (8, 128) tile padding from
    # (16/9)x(128/32) = 7.1x to (40/34)x(128/32) = 4.7x on every elementwise
    # pass. Math identical; param SHAPES identical (kernel spatial axes
    # reinterpreted (H,W,T)->(T,H,W), so checkpoints are layout-specific).
    layout: str = "nhwtc"
    # opt-in experimental Pallas path for the 3x3x3 SAME convs (nhwtc only:
    # the kernel flattens dims 1-2 and loops dim 3, tuned for (H, W, T))
    conv_kernel: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = normalize(x, self.mean, self.std).astype(self.compute_dtype)
        global_res = x  # (B, H, W, T)

        if self.layout == "nthwc":
            x = jnp.transpose(x, (0, 3, 1, 2))[..., None]  # (B, T, H, W, 1)
            hw_axes = (2, 3)
            t_axis = 1
        else:
            x = x[..., None]  # (B, H, W, T, 1)
            hw_axes = (1, 2)
            t_axis = 3
        use_ck = self.conv_kernel and self.layout == "nhwtc"
        x = reflect_pad_hw(x, axes=hw_axes)
        k3 = (self.kernel_size,) * 3
        x = WNConv(self.filters, k3, conv_kernel=use_ck)(x)
        res = x
        for _ in range(self.N):
            x = RFAB(self.filters, self.kernel_size, self.r,
                     conv_kernel=use_ck)(x)
        x = WNConv(self.filters, k3, conv_kernel=use_ck)(x)
        x = x + res

        # temporal reduction: T -> T - 2*floor(T/3); spatial dims restored by
        # the reflect pad before each valid conv
        for _ in range(self.channels // 3):
            x = reflect_pad_hw(x, axes=hw_axes)
            x = RFAB(self.filters, self.kernel_size, self.r,
                     conv_kernel=use_ck)(x)
            x = WNConv(self.filters, (3, 3, 3), padding="VALID",
                       conv_kernel=use_ck)(x)
            x = nn.relu(x)

        x = WNConv(self.scale**2, (3, 3, 3), padding="VALID")(x)
        x = jnp.squeeze(x, axis=t_axis)  # drop the exhausted temporal dim
        x = depth_to_space(x, self.scale)

        # global residual 2-D path on the raw T-channel image
        g = reflect_pad_hw(global_res)  # 2-D path stays (B, H, W, T)
        g = RTAB(self.channels, self.kernel_size, self.r)(g)
        g = WNConv(self.scale**2, (3, 3), padding="VALID")(g)
        g = depth_to_space(g, self.scale)

        out = x.astype(jnp.float32) + g.astype(jnp.float32)
        return denormalize(out, self.mean, self.std)


def fold_weight_norm(params):
    """Fold the weight-norm reparam into the kernels for inference.

    Rewrites every WNConv's ``(v, g)`` so the *effective* kernel is already
    ``w = g * v / ||v||``: setting ``v <- w`` and ``g <- ||w||`` (per output
    channel) makes ``g * v / ||v||`` reproduce ``w`` exactly, so the param
    TREE STRUCTURE is unchanged — the folded tree drops into the same
    ``model.apply`` and the per-call norm reduction degenerates to a no-op
    scale of 1. Use on restored checkpoints in serving paths (the reference
    serves the raw reparam every call, training.py:98-102); do NOT train on a
    folded tree (gradients w.r.t. v/g change meaning).
    """

    def fold(d):
        if isinstance(d, dict):
            if "v" in d and "g" in d:
                w = weight_norm_kernel(jnp.asarray(d["v"], jnp.float32),
                                       jnp.asarray(d["g"], jnp.float32))
                w2 = w.reshape(-1, w.shape[-1])
                out = dict(d)
                out["v"] = w
                out["g"] = jnp.sqrt(jnp.sum(w2 * w2, axis=0))
                return out
            return {k: fold(v) for k, v in d.items()}
        return d

    return fold(params.unfreeze() if hasattr(params, "unfreeze") else params)
