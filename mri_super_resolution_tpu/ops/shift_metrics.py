"""Shift-tolerant L1 / cPSNR / cSSIM for multi-image super-resolution.

Reference: multi-image-super-resolution/utils/loss.py:26-177. The prediction
is cropped by a 3-px border; the ground truth (and its quality mask) slides
over all (2*3+1)^2 = 49 integer offsets; each offset gets a per-image
brightness-bias correction ``b = mean(GT - pred)`` over masked pixels; the
loss takes the minimum over offsets (metrics take the maximum). PSNR peak is
65535 (uint16 data).

TPU-native: the 49 crops are static slices stacked into one (49, B, ...) array
and the per-offset metric is a single vmapped computation — one fused XLA
program instead of a 49-iteration Python loop per step.

``ssim_tf`` matches ``tf.image.ssim`` (11x11 Gaussian window, sigma=1.5,
k1=0.01, k2=0.03) used at loss.py:160.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

BORDER = 3
PEAK = 65535.0


def _stack_shifts(y: Array, crop_h: int, crop_w: int) -> Array:
    """(B, H, W, C) -> (49, B, crop_h, crop_w, C) over all border offsets."""
    crops = [
        y[:, i : i + crop_h, j : j + crop_w]
        for i in range(2 * BORDER + 1)
        for j in range(2 * BORDER + 1)
    ]
    return jnp.stack(crops)


def _corrected(pred_crop, label, mask):
    """Masked brightness-corrected prediction + masked label
    (loss.py:49-66)."""
    mask = mask.astype(jnp.float32)
    pred_m = pred_crop.astype(jnp.float32) * mask
    label_m = label.astype(jnp.float32) * mask
    total = jnp.sum(mask, axis=(1, 2), keepdims=True)
    b = jnp.sum(label_m - pred_m, axis=(1, 2), keepdims=True) / total
    corrected = (pred_m + b) * mask
    return corrected, label_m, mask, total


@functools.partial(jax.jit, static_argnames=("hr_size",))
def shift_l1_loss(y_true: Array, y_pred: Array, y_mask: Array, hr_size: int = 96) -> Array:
    """Min-over-shifts masked brightness-corrected L1 (loss.py:26-75).

    Inputs (B, hr_size, hr_size, C); returns per-image loss (B,).

    The 49-shift SEARCH runs under stop_gradient (min's subgradient flows
    only through the argmin shift anyway); the differentiable loss is then
    recomputed at that single per-image shift via dynamic_slice — the
    backward pass touches (B, crop, crop) tensors instead of 49x that.
    Values and gradients are identical to the naive form (same argmin)."""
    crop = hr_size - 2 * BORDER
    pred_crop = y_pred[:, BORDER : hr_size - BORDER, BORDER : hr_size - BORDER]
    true_ng = jax.lax.stop_gradient(y_true)
    pred_ng = jax.lax.stop_gradient(pred_crop)
    labels = _stack_shifts(true_ng, crop, crop)
    masks = _stack_shifts(y_mask, crop, crop)

    def per_shift(label, mask):
        corrected, label_m, m, total = _corrected(pred_ng, label, mask)
        l1 = jnp.sum(jnp.abs(label_m - corrected), axis=(1, 2)) / total[..., 0, 0]
        return l1.mean(-1)  # over channels

    losses = jax.vmap(per_shift)(labels, masks)  # (49, B)
    best = jnp.argmin(losses, axis=0)  # (B,)

    def one_image(pred_i, true_i, mask_i, idx):
        di, dj = idx // (2 * BORDER + 1), idx % (2 * BORDER + 1)
        label = jax.lax.dynamic_slice(
            true_i, (di, dj, 0), (crop, crop, true_i.shape[-1]))
        mask = jax.lax.dynamic_slice(
            mask_i, (di, dj, 0), (crop, crop, mask_i.shape[-1]))
        corrected, label_m, m, total = _corrected(
            pred_i[None], label[None], mask[None])
        l1 = jnp.sum(jnp.abs(label_m - corrected), axis=(1, 2)) / total[..., 0, 0]
        return l1.mean()

    return jax.vmap(one_image)(pred_crop, y_true, y_mask, best)


@functools.partial(jax.jit, static_argnames=("hr_size", "reduce"))
def shift_psnr(
    y_true: Array, y_pred: Array, y_mask: Array, hr_size: int = 96,
    reduce: bool = True,
) -> Array:
    """Max-over-shifts cPSNR, meaned over the batch (loss.py:77-127).

    ``reduce=False`` returns the per-image ``(B,)`` values instead of the
    batch mean — used by the data-parallel Trainer to weight out padded
    samples before reducing."""
    crop = hr_size - 2 * BORDER
    pred_crop = y_pred[:, BORDER : hr_size - BORDER, BORDER : hr_size - BORDER]
    labels = _stack_shifts(y_true, crop, crop)
    masks = _stack_shifts(y_mask, crop, crop)

    def per_shift(label, mask):
        corrected, label_m, m, total = _corrected(pred_crop, label, mask)
        mse = jnp.sum((label_m - corrected) ** 2, axis=(1, 2)) / total[..., 0, 0]
        return (10.0 * jnp.log10(PEAK**2 / mse)).mean(-1)

    psnrs = jax.vmap(per_shift)(labels, masks)  # (49, B)
    best = jnp.max(psnrs, axis=0)
    return best.mean() if reduce else best


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim_tf(a: Array, b: Array, max_val: float, size: int = 11, sigma: float = 1.5) -> Array:
    """tf.image.ssim equivalent: Gaussian-windowed SSIM, valid padding,
    averaged over space and channels. Inputs (B, H, W, C); returns (B,)."""
    win = _gaussian_window(size, sigma)[:, :, None, None]  # (s, s, 1, 1)
    C = a.shape[-1]
    kernel = jnp.tile(win, (1, 1, 1, 1))

    def filt(x):
        # depthwise valid convolution per channel
        dn = jax.lax.conv_dimension_numbers(
            (x.shape[0], x.shape[1], x.shape[2], 1), kernel.shape, ("NHWC", "HWIO", "NHWC")
        )
        outs = [
            jax.lax.conv_general_dilated(
                x[..., c : c + 1], kernel, (1, 1), "VALID", dimension_numbers=dn
            )
            for c in range(C)
        ]
        return jnp.concatenate(outs, axis=-1)

    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_a, mu_b = filt(a), filt(b)
    aa, bb, ab = filt(a * a), filt(b * b), filt(a * b)
    va = aa - mu_a**2
    vb = bb - mu_b**2
    cov = ab - mu_a * mu_b
    lum = (2 * mu_a * mu_b + c1) / (mu_a**2 + mu_b**2 + c1)
    cs = (2 * cov + c2) / (va + vb + c2)
    return (lum * cs).mean(axis=(1, 2, 3))


@functools.partial(jax.jit, static_argnames=("hr_size", "clear_only"))
def shift_ssim(
    y_true: Array, y_pred: Array, y_mask: Array, hr_size: int = 96, clear_only: bool = False
) -> Array:
    """Max-over-shifts cSSIM, meaned over the batch (loss.py:131-177)."""
    crop = hr_size - 2 * BORDER
    clear_pixels = crop * crop
    pred_crop = y_pred[:, BORDER : hr_size - BORDER, BORDER : hr_size - BORDER]
    labels = _stack_shifts(y_true, crop, crop)
    masks = _stack_shifts(y_mask, crop, crop)

    def per_shift(label, mask):
        corrected, label_m, m, total = _corrected(pred_crop, label, mask)
        s = ssim_tf(corrected, label_m, PEAK)
        if clear_only:
            s = (s - 1.0) * total[..., 0, 0].mean(-1) / clear_pixels + 1.0
        return s

    ssims = jax.vmap(per_shift)(labels, masks)  # (49, B)
    return jnp.max(ssims, axis=0).mean()
