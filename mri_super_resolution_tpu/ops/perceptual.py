"""Perceptual image-quality metrics for the radiologist-study analysis.

Reference: implicit-neural-representations/perceptual_similarity_tests/ —
MATLAB implementations scored per panel quadrant (perceptual_similarity.m):
- ``FSIM``  (FSIM.m, Zhang et al. 2011): gradient + phase-congruency
  similarity, with Kovesi's ``phasecong2`` (4 scales x 4 orientations
  log-Gabor bank, noise-threshold energy).
- ``SR_SIM`` (SR_SIM.m, Zhang & Li 2012): spectral-residual saliency +
  Scharr-gradient similarity.
- ``multissim`` -> :func:`ms_ssim` (MATLAB multi-scale SSIM, 5 dyadic scales,
  standard weights).
- ``HPF``  (HPF.m): unsharp high-pass filter (fspecial('unsharp'),
  alpha=0.2) used both as a metric input transform and for high-frequency
  power ratios.

Host-side numpy/scipy (these score finished PNG panels; not a training hot
path). Grayscale inputs in [0, 255] range like the MATLAB driver's uint8
crops.
"""
from __future__ import annotations

import numpy as np
from numpy.fft import fft2, ifft2, ifftshift


# ---------------------------------------------------------------------------
# filters
# ---------------------------------------------------------------------------

def _conv2_same(img: np.ndarray, kernel: np.ndarray, pad_mode="constant") -> np.ndarray:
    """MATLAB conv2(..., 'same') (convolution, zero padding by default)."""
    from scipy.signal import convolve2d

    boundary = {"constant": "fill", "replicate": "symm"}[pad_mode]
    return convolve2d(img, kernel, mode="same", boundary=boundary)


def _imfilter(img: np.ndarray, kernel: np.ndarray, pad_mode="constant") -> np.ndarray:
    """MATLAB imfilter (correlation) with zero / replicate padding.

    Two parity-critical details (golden-value cross-check, VERDICT r2 #6):
    MATLAB's 'replicate' is EDGE padding (scipy's 'symm' reflects, which
    differs in the first ring), and for even kernels the correlation center
    is floor((size+1)/2) 1-based — correlate2d's 'same' convention, NOT the
    flipped-conv2 one (off by one pixel)."""
    from scipy.signal import correlate2d

    if pad_mode == "replicate":
        kr, kc = kernel.shape
        top, left = (kr - 1) // 2, (kc - 1) // 2
        ap = np.pad(img, ((top, kr - 1 - top), (left, kc - 1 - left)),
                    mode="edge")
        return correlate2d(ap, kernel, mode="valid")
    return correlate2d(img, kernel, mode="same", boundary="fill")


def hpf_unsharp(img: np.ndarray, alpha: float = 0.2) -> np.ndarray:
    """HPF.m: imfilter with fspecial('unsharp') (a high-boost Laplacian)."""
    a = alpha
    H = (1.0 / (a + 1.0)) * np.asarray(
        [[-a, a - 1.0, -a], [a - 1.0, a + 5.0, a - 1.0], [-a, a - 1.0, -a]]
    )
    return _imfilter(img.astype(np.float64), H)


def _avg_kernel(F: int) -> np.ndarray:
    return np.ones((F, F)) / (F * F)


def _matlab_round(x: float) -> int:
    """MATLAB round(): half away from zero. Python's round() is banker's
    (half to even) — at min-dimension 640, 640/256 = 2.5 gives MATLAB F=3
    but Python F=2, changing the downsampled grid and the scores."""
    return int(np.floor(x + 0.5)) if x >= 0 else -int(np.floor(-x + 0.5))


def _downsample_pair(y1: np.ndarray, y2: np.ndarray):
    """Common FSIM/SR-SIM preprocessing: average-filter + stride-F subsample
    with F = max(1, round(min(rows, cols)/256))."""
    rows, cols = y1.shape
    F = max(1, _matlab_round(min(rows, cols) / 256))
    if F > 1:
        k = _avg_kernel(F)
        y1 = _conv2_same(y1, k)[::F, ::F]
        y2 = _conv2_same(y2, k)[::F, ::F]
    return y1, y2


_SCHARR_DX = np.asarray([[3, 0, -3], [10, 0, -10], [3, 0, -3]]) / 16.0
_SCHARR_DY = _SCHARR_DX.T


def _gradient_map(y: np.ndarray) -> np.ndarray:
    gx = _conv2_same(y, _SCHARR_DX)
    gy = _conv2_same(y, _SCHARR_DY)
    return np.sqrt(gx**2 + gy**2)


# ---------------------------------------------------------------------------
# phase congruency (Kovesi phasecong2, as embedded in FSIM.m:137-)
# ---------------------------------------------------------------------------

def phasecong2(
    im: np.ndarray,
    nscale: int = 4,
    norient: int = 4,
    min_wavelength: float = 6.0,
    mult: float = 2.0,
    sigma_onf: float = 0.55,
    d_theta_on_sigma: float = 1.2,
    k: float = 2.0,
    epsilon: float = 1e-4,
) -> np.ndarray:
    rows, cols = im.shape
    imfft = fft2(im)

    # frequency grids (Kovesi's convention)
    if cols % 2:
        xr = np.arange(-(cols - 1) / 2, (cols - 1) / 2 + 1) / (cols - 1)
    else:
        xr = np.arange(-cols / 2, cols / 2) / cols
    if rows % 2:
        yr = np.arange(-(rows - 1) / 2, (rows - 1) / 2 + 1) / (rows - 1)
    else:
        yr = np.arange(-rows / 2, rows / 2) / rows
    x, y = np.meshgrid(xr, yr)
    radius = ifftshift(np.sqrt(x**2 + y**2))
    theta = ifftshift(np.arctan2(-y, x))
    radius[0, 0] = 1.0
    sintheta = np.sin(theta)
    costheta = np.cos(theta)

    # low-pass (raised cosine) to suppress boundary effects
    lp = ifftshift(1.0 / (1.0 + (np.sqrt(x**2 + y**2) / 0.45) ** (2 * 15)))

    log_gabors = []
    for s in range(nscale):
        wavelength = min_wavelength * mult**s
        fo = 1.0 / wavelength
        lg = np.exp(-(np.log(radius / fo) ** 2) / (2 * np.log(sigma_onf) ** 2))
        lg *= lp
        lg[0, 0] = 0.0
        log_gabors.append(lg)

    theta_sigma = np.pi / norient / d_theta_on_sigma
    total_energy = np.zeros((rows, cols))
    total_sum_an = np.zeros((rows, cols))

    for o in range(norient):
        angl = o * np.pi / norient
        ds = sintheta * np.cos(angl) - costheta * np.sin(angl)
        dc = costheta * np.cos(angl) + sintheta * np.sin(angl)
        dtheta = np.abs(np.arctan2(ds, dc))
        spread = np.exp(-(dtheta**2) / (2 * theta_sigma**2))

        sum_e = np.zeros((rows, cols))
        sum_o = np.zeros((rows, cols))
        sum_an = np.zeros((rows, cols))
        max_an = np.zeros((rows, cols))
        em_n = 0.0
        eo_all = []
        ifft_filters = []
        for s in range(nscale):
            filt = log_gabors[s] * spread
            # MATLAB estimates noise from the SPATIAL filters
            # real(ifft2(filter))*sqrt(N): the orientation filters are
            # one-sided in frequency, so real() drops half the energy — a
            # frequency-domain Parseval shortcut here is ~1e-3 off in FSIM
            ifft_filters.append(np.real(ifft2(filt)) * np.sqrt(rows * cols))
            eo = ifft2(imfft * filt)
            an = np.abs(eo)
            eo_all.append(eo)
            sum_an += an
            sum_e += np.real(eo)
            sum_o += np.imag(eo)
            if s == 0:
                em_n = np.sum(filt**2)
                max_an = an
            else:
                max_an = np.maximum(max_an, an)

        x_energy = np.sqrt(sum_e**2 + sum_o**2) + epsilon
        mean_e = sum_e / x_energy
        mean_o = sum_o / x_energy
        energy = np.zeros((rows, cols))
        for eo in eo_all:
            e, o_ = np.real(eo), np.imag(eo)
            energy += e * mean_e + o_ * mean_o - np.abs(e * mean_o - o_ * mean_e)

        # noise threshold from the smallest-scale amplitude (Kovesi)
        median_e2n = np.median(np.abs(eo_all[0]) ** 2)
        mean_e2n = -median_e2n / np.log(0.5)
        noise_power = mean_e2n / em_n
        est_sum_an2 = np.zeros((rows, cols))
        for s in range(nscale):
            est_sum_an2 += ifft_filters[s] ** 2
        est_sum_aiaj = np.zeros((rows, cols))
        for si in range(nscale - 1):
            for sj in range(si + 1, nscale):
                est_sum_aiaj += ifft_filters[si] * ifft_filters[sj]
        sum_est_sum_an2 = np.sum(est_sum_an2)
        sum_est_sum_aiaj = np.sum(est_sum_aiaj)
        est_noise_energy2 = 2 * noise_power * sum_est_sum_an2 + 4 * noise_power * sum_est_sum_aiaj
        tau = np.sqrt(est_noise_energy2 / 2)
        est_noise_energy = tau * np.sqrt(np.pi / 2)
        est_noise_energy_sigma = np.sqrt((2 - np.pi / 2) * tau**2)
        T = est_noise_energy + k * est_noise_energy_sigma
        T = T / 1.7  # empirical correction (Kovesi/FSIM.m)

        energy = np.maximum(energy - T, 0.0)
        total_energy += energy
        total_sum_an += sum_an

    return total_energy / (total_sum_an + epsilon)


# ---------------------------------------------------------------------------
# FSIM / SR-SIM / MS-SSIM
# ---------------------------------------------------------------------------

def fsim(image_ref: np.ndarray, image_dis: np.ndarray) -> float:
    """FSIM.m main path for grayscale images (T1=0.85, T2=160)."""
    y1, y2 = _downsample_pair(image_ref.astype(np.float64), image_dis.astype(np.float64))
    pc1 = phasecong2(y1)
    pc2 = phasecong2(y2)
    g1 = _gradient_map(y1)
    g2 = _gradient_map(y2)
    T1, T2 = 0.85, 160.0
    pc_sim = (2 * pc1 * pc2 + T1) / (pc1**2 + pc2**2 + T1)
    g_sim = (2 * g1 * g2 + T2) / (g1**2 + g2**2 + T2)
    pcm = np.maximum(pc1, pc2)
    return float(np.sum(g_sim * pc_sim * pcm) / np.sum(pcm))


def _gaussian_kernel2d(size: int, sigma: float) -> np.ndarray:
    ax = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(ax**2) / (2 * sigma**2))
    k = np.outer(g, g)
    return k / k.sum()


def _cubic_kernel(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Keys bicubic (a=-0.5), support 4 — MATLAB imresize's default kernel."""
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    return np.where(
        ax <= 1, (a + 2) * ax3 - (a + 3) * ax2 + 1,
        np.where(ax < 2, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, 0.0))


def _resize_axis_matlab(arr: np.ndarray, out_n: int, axis: int) -> np.ndarray:
    in_n = arr.shape[axis]
    scale = out_n / in_n
    width = 4.0
    if scale < 1:  # antialiasing: stretch the kernel by 1/scale
        kern = lambda t: scale * _cubic_kernel(scale * t)
        width /= scale
    else:
        kern = _cubic_kernel
    u = (np.arange(1, out_n + 1)) / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - width / 2)
    P = int(np.ceil(width)) + 2
    indices = left[:, None] + np.arange(P)[None, :]
    weights = kern(u[:, None] - indices)
    weights /= weights.sum(axis=1, keepdims=True)
    idx = np.clip(indices, 1, in_n).astype(int) - 1  # replicate boundary
    moved = np.moveaxis(arr, axis, 0)
    gathered = moved[idx.reshape(-1)].reshape(out_n, P, *moved.shape[1:])
    out = np.einsum("op,op...->o...", weights, gathered)
    return np.moveaxis(out, 0, axis)


def _imresize_matlab(img: np.ndarray, scale: float | tuple) -> np.ndarray:
    """MATLAB imresize: bicubic WITH antialiasing on shrink (the default —
    SR_SIM.m:103 relies on it; a linear/no-antialias resize shifts the
    saliency map enough to move SR-SIM by ~0.1-0.25 after mat2gray)."""
    if isinstance(scale, tuple):
        out_shape = scale
    else:
        out_shape = (int(np.ceil(img.shape[0] * scale)),
                     int(np.ceil(img.shape[1] * scale)))
    out = _resize_axis_matlab(np.asarray(img, np.float64), out_shape[0], 0)
    return _resize_axis_matlab(out, out_shape[1], 1)


def spectral_residue_saliency(image: np.ndarray) -> np.ndarray:
    """SR_SIM.m:88-112: spectral residual saliency (Hou & Zhang)."""
    scale = 0.25
    in_img = _imresize_matlab(image, scale)
    f = fft2(in_img)
    # MATLAB's log(0) = -Inf poisons the whole map to NaN on images with
    # exact FFT zeros (e.g. constant/blank-masked slices). Clamping at the
    # smallest NORMAL double keeps log bit-identical for every nonzero bin
    # (golden parity intact) while degenerate inputs stay finite — unlike
    # the old +1e-12 additive guard, which shifted SR-SIM by up to ~9e-3.
    log_amp = np.log(np.maximum(np.abs(f), np.finfo(np.float64).tiny))
    phase = np.angle(f)
    residual = log_amp - _imfilter(log_amp, _avg_kernel(3), pad_mode="replicate")
    # cap the residual so exp()**2 can't overflow: a clamped-zero neighbor
    # (-708) next to a live DC bin would otherwise push exp to ~1e300 and
    # its square to inf/NaN. Real images have |residual| << 300, so this is
    # bit-exact off the degenerate case.
    sal = np.abs(ifft2(np.exp(np.minimum(residual, 300.0) + 1j * phase))) ** 2
    sal = _imfilter(sal, _gaussian_kernel2d(10, 3.8))
    # mat2gray
    rng_ = sal.max() - sal.min()
    sal = (sal - sal.min()) / rng_ if rng_ else np.zeros_like(sal)
    return _imresize_matlab(sal, image.shape)


def sr_sim(image1: np.ndarray, image2: np.ndarray) -> float:
    """SR_SIM.m main path (C1=0.40, C2=225, alpha=0.5)."""
    y1, y2 = _downsample_pair(image1.astype(np.float64), image2.astype(np.float64))
    s1 = spectral_residue_saliency(y1)
    s2 = spectral_residue_saliency(y2)
    g1 = _gradient_map(y1)
    g2 = _gradient_map(y2)
    C1, C2, alpha = 0.40, 225.0, 0.5
    s_sim = (2 * s1 * s2 + C1) / (s1**2 + s2**2 + C1)
    g_sim = (2 * g1 * g2 + C2) / (g1**2 + g2**2 + C2)
    weight = np.maximum(s1, s2)
    return float(np.sum(s_sim * (g_sim**alpha) * weight) / np.sum(weight))


def _ssim_parts(a: np.ndarray, b: np.ndarray, data_range: float):
    """Gaussian-window SSIM luminance*contrast and contrast-structure maps
    (11x11, sigma=1.5)."""
    k = _gaussian_kernel2d(11, 1.5)
    mu_a = _conv2_same(a, k)
    mu_b = _conv2_same(b, k)
    va = _conv2_same(a * a, k) - mu_a**2
    vb = _conv2_same(b * b, k) - mu_b**2
    cov = _conv2_same(a * b, k) - mu_a * mu_b
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    lum = (2 * mu_a * mu_b + C1) / (mu_a**2 + mu_b**2 + C1)
    cs = (2 * cov + C2) / (va + vb + C2)
    return lum, cs


MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def ms_ssim(a: np.ndarray, b: np.ndarray, data_range: float = 255.0, levels: int = 5) -> float:
    """Multi-scale SSIM (MATLAB ``multissim`` analog, standard weights)."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    weights = np.asarray(MS_WEIGHTS[:levels])
    weights = weights / weights.sum()
    vals = []
    for lv in range(levels):
        lum, cs = _ssim_parts(a, b, data_range)
        if lv == levels - 1:
            vals.append(np.mean(lum * cs))
        else:
            vals.append(np.mean(cs))
            a = _imresize_matlab(_conv2_same(a, _avg_kernel(2)), (max(1, a.shape[0] // 2), max(1, a.shape[1] // 2)))
            b = _imresize_matlab(_conv2_same(b, _avg_kernel(2)), (max(1, b.shape[0] // 2), max(1, b.shape[1] // 2)))
    vals = np.clip(np.asarray(vals), 1e-6, None)
    return float(np.prod(vals**weights))


def immse(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))


# ---------------------------------------------------------------------------
# panel scoring (perceptual_similarity.m driver)
# ---------------------------------------------------------------------------

def score_panel(HR: np.ndarray, interp: np.ndarray, SR: np.ndarray) -> dict:
    """Score one blinded panel's quadrants like perceptual_similarity.m:41-57:
    every metric on (interp vs HR, SR vs HR) raw and HPF-filtered, plus the
    high-frequency power gain of SR over interpolation."""
    from mri_super_resolution_tpu.core.metrics import ssim as _ssim_skimage  # jax

    import jax.numpy as jnp

    h_hr, h_in, h_sr = hpf_unsharp(HR), hpf_unsharp(interp), hpf_unsharp(SR)
    pow_inter = np.sum(h_in**2)
    power_diff = np.sum(np.maximum(h_sr - h_in, 0) ** 2)

    def _ssim(x, y, L):
        return float(_ssim_skimage(jnp.asarray(x, jnp.float32),
                                   jnp.asarray(y, jnp.float32), data_range=L))

    # MATLAB quirk replicated: ssim/multissim derive their dynamic range
    # from the array CLASS — uint8 panels get L=255, but HPF.m returns
    # single, whose class range is [0,1], so the HPF'd comparisons run at
    # L=1 even though the filtered values span ~hundreds (the stabilizing
    # constants become negligible). perceptual_similarity.m:50-54.
    return {
        "HF_power": power_diff / pow_inter,
        "SSIM_interp": _ssim(interp, HR, 255.0),
        "SSIM_SR": _ssim(SR, HR, 255.0),
        "SSIM_HPF_interp": _ssim(h_in, h_hr, 1.0),
        "SSIM_HPF_SR": _ssim(h_sr, h_hr, 1.0),
        "MSE_interp": immse(interp, HR),
        "MSE_SR": immse(SR, HR),
        "MSE_HPF_interp": immse(h_in, h_hr),
        "MSE_HPF_SR": immse(h_sr, h_hr),
        "MULTISSIM_interp": ms_ssim(interp, HR),
        "MULTISSIM_SR": ms_ssim(SR, HR),
        "MULTISSIM_HPF_interp": ms_ssim(h_in, h_hr, data_range=1.0),
        "MULTISSIM_HPF_SR": ms_ssim(h_sr, h_hr, data_range=1.0),
        "FSIM_interp": fsim(interp, HR),
        "FSIM_SR": fsim(SR, HR),
        "FSIM_HPF_interp": fsim(h_in, h_hr),
        "FSIM_HPF_SR": fsim(h_sr, h_hr),
        "SR_SIM_interp": sr_sim(interp, HR),
        "SR_SIM_SR": sr_sim(SR, HR),
        "SR_SIM_HPF_interp": sr_sim(h_in, h_hr),
        "SR_SIM_HPF_SR": sr_sim(h_sr, h_hr),
    }
