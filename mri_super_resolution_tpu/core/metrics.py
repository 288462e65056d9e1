"""Image-quality and clinical contrast metrics, pure JAX.

Reference equivalents:
- ``contrast_cnr``   — ``calculate_contrast`` (implicit-neural-representations/
  nn_mri.py:59-85): C, CNR, CNR2 over 2*scale square ROIs around cancer /
  contralateral / noise pixel locations.
- ``cnr_snr_log10``  — ``calculate_CNR_SNR`` (INR_ERD.py:102-124): 3x3 ROIs,
  5x5 noise ROI, log10 SNR variants.
- ``ssim``           — skimage ``structural_similarity`` with its defaults
  (win_size=7 uniform filter, K1=0.01, K2=0.03), the protocol used at
  superresDWI.py:179-187 with ``data_range=1`` on masked images.
- ``psnr``           — skimage ``peak_signal_noise_ratio``.
- ``minmax_normalize`` — master.py:46-48.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

EPS = 1e-7


def minmax_normalize(img: Array, ref: Array) -> Array:
    """Affinely map ``img`` onto the min/max range of ``ref`` (master.py:46-48)."""
    unit = (img - img.min()) / (img.max() - img.min())
    return unit * (ref.max() - ref.min()) + ref.min()


class ContrastMetrics(NamedTuple):
    C: Array
    CNR: Array
    CNR2: Array


# locations are TRACED (dynamic_slice handles them): per-case locations as
# static args would compile a fresh tiny executable per case, which costs
# seconds each through this environment's tunnelled compile server
@functools.partial(jax.jit, static_argnames=("scale", "focus"))
def contrast_cnr(
    image: Array,
    cancer_loc: tuple[int, int],
    contralateral_loc: tuple[int, int],
    noise_loc: tuple[int, int],
    scale: int = 1,
    focus: int = 0,
) -> ContrastMetrics:
    """Cancer-vs-contralateral contrast metrics (nn_mri.py:59-85).

    ROIs are ``[x-scale : x+scale, y-scale : y+scale]`` squares around each
    location after shifting by ``focus`` (the ROI crop origin) and scaling.
    Note CNR2 divides by the *std* of the noise area (the reference names the
    variable ``varn`` but assigns ``np.std``) — behaviour is replicated.
    """

    def roi(loc):
        x, y = ((c - focus) * scale for c in loc)
        return jax.lax.dynamic_slice(
            image, (x - scale, y - scale), (2 * scale, 2 * scale)
        )

    ca, co, no = roi(cancer_loc), roi(contralateral_loc), roi(noise_loc)
    cm, bm = ca.mean(), co.mean()
    varc, varb = jnp.std(ca) ** 2, jnp.std(co) ** 2
    noise_std = jnp.std(no)
    C = cm / (bm + EPS)
    CNR = jnp.abs(cm - bm) / jnp.sqrt(varc + varb)
    CNR2 = jnp.abs(cm - bm) / noise_std
    return ContrastMetrics(C, CNR, CNR2)


class CNRSNRMetrics(NamedTuple):
    log10_SNRc: Array
    log10_CNR: Array
    Sc: Array
    Sb: Array
    CR: Array


@jax.jit  # locations traced, not static — see contrast_cnr note
def cnr_snr_log10(
    image: Array,
    cancer_loc: tuple[int, int],
    contralateral_loc: tuple[int, int],
    noise_loc: tuple[int, int],
) -> CNRSNRMetrics:
    """log10 SNR/CNR metrics of the soft-ERD study (INR_ERD.py:102-124).

    3x3 ROIs centred on cancer/contralateral, 5x5 on noise.
    """
    cx, cy = cancer_loc
    bx, by = contralateral_loc
    nx, ny = noise_loc
    ca = jax.lax.dynamic_slice(image, (cx - 1, cy - 1), (3, 3))
    co = jax.lax.dynamic_slice(image, (bx - 1, by - 1), (3, 3))
    no = jax.lax.dynamic_slice(image, (nx - 2, ny - 2), (5, 5))
    Sc, Sb, N = ca.mean(), co.mean(), jnp.std(no)
    SNRc = Sc / (N + EPS)
    SNRb = Sb / (N + EPS)
    CNR = jnp.abs(SNRc - SNRb)
    return CNRSNRMetrics(
        jnp.log10(SNRc), jnp.log10(CNR), Sc, Sb, Sc / Sb
    )


def _uniform_filter(x: Array, win: int) -> Array:
    """Valid-mode mean filter via two separable 1-D convolutions."""
    kernel = jnp.ones((win,), dtype=x.dtype) / win
    x = jax.vmap(lambda row: jnp.convolve(row, kernel, mode="valid"), in_axes=1, out_axes=1)(x)
    x = jax.vmap(lambda col: jnp.convolve(col, kernel, mode="valid"), in_axes=0, out_axes=0)(x)
    return x


@functools.partial(jax.jit, static_argnames=("data_range", "win_size"))
def ssim(
    im1: Array, im2: Array, data_range: float = 1.0, win_size: int = 7
) -> Array:
    """Structural similarity, matching skimage defaults.

    skimage's ``structural_similarity`` with ``gaussian_weights=False`` uses a
    ``win_size``x``win_size`` uniform filter, sample (ddof=1-style) covariance
    normalisation ``cov_norm = NP/(NP-1)``, K1=0.01, K2=0.03, and crops a
    ``win_size//2`` border before averaging. 2-D single-channel inputs.
    """
    im1 = im1.astype(jnp.float32)
    im2 = im2.astype(jnp.float32)
    NP = win_size * win_size
    cov_norm = NP / (NP - 1.0)
    ux = _uniform_filter(im1, win_size)
    uy = _uniform_filter(im2, win_size)
    uxx = _uniform_filter(im1 * im1, win_size)
    uyy = _uniform_filter(im2 * im2, win_size)
    uxy = _uniform_filter(im1 * im2, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    A1, A2 = 2 * ux * uy + C1, 2 * vxy + C2
    B1, B2 = ux**2 + uy**2 + C1, vx + vy + C2
    S = (A1 * A2) / (B1 * B2)
    # skimage crops pad = (win_size-1)//2 from each side of the *valid* map's
    # original image frame; the valid filter already removed win_size-1, so the
    # full valid map is exactly what skimage averages.
    return S.mean()


@functools.partial(jax.jit, static_argnames=("data_range",))
def psnr(im1: Array, im2: Array, data_range: float = 1.0) -> Array:
    """Peak signal-to-noise ratio (skimage ``peak_signal_noise_ratio``)."""
    mse = jnp.mean((im1.astype(jnp.float32) - im2.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10((data_range**2) / mse)


@functools.partial(jax.jit, static_argnames=("mask_thresh", "data_range"))
def masked_ssim_protocol(
    hr: Array, other: Array, mask_thresh: float = 0.05, data_range: float = 1.0
) -> Array:
    """The Gourdeau-2022 SSIM protocol of superresDWI.py:179-187.

    Both images are max-normalised by the caller; the mask is ``hr > thresh``
    applied multiplicatively to both before SSIM.
    """
    mask = (hr > mask_thresh).astype(hr.dtype)
    return ssim(hr * mask, other * mask, data_range=data_range)
