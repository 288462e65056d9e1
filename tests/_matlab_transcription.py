"""Literal, slow, line-by-line numpy transcriptions of the published MATLAB
perceptual metrics the reference study uses — FSIM (Zhang, Zhang, Mou, Zhang,
IEEE TIP 2011; perceptual_similarity_tests/FSIM.m:1-447, embedding Kovesi's
phasecong2 + lowpassfilter) and SR-SIM (Zhang & Li, ICIP 2012; SR_SIM.m:1-111,
embedding Hou & Zhang's spectral-residual saliency).

Purpose (VERDICT r2 #6): MATLAB/Octave is unavailable in this environment, so
golden values come from TWO independent implementations instead — this
transcription (which follows the .m control flow statement-by-statement,
preserving MATLAB function semantics: conv2 'same' true convolution, imfilter
correlation with replicate padding, fspecial kernels, imresize bicubic WITH
antialiasing, mat2gray) and the vectorized production code in
ops/perceptual.py. Agreement between two independently-derived paths to ~1e-6
is strong evidence both match the .m semantics; the frozen numbers in
tests/test_perceptual_golden.py then pin behaviour forever.

Deliberately unoptimized: clarity over speed.
"""
from __future__ import annotations

import numpy as np
from scipy.signal import convolve2d, correlate2d


# ---------------------------------------------------------------------------
# MATLAB builtins
# ---------------------------------------------------------------------------

def conv2_same(a, k):
    """conv2(A, K, 'same'): true convolution, zero padding."""
    return convolve2d(a, k, mode="same", boundary="fill")


def imfilter(a, h, boundary="fill"):
    """imfilter(A, H): CORRELATION (MATLAB default), zero or replicate pad.
    scipy's correlate2d 'same' uses the same center convention as MATLAB
    (1-based floor((size(h)+1)/2)) for both parities."""
    b = "symm" if boundary == "replicate" else "fill"
    if boundary == "replicate":
        # replicate = edge padding, not symmetric reflection: pad manually
        kr, kc = h.shape
        pr, pc = kr - 1, kc - 1
        top, left = (kr - 1) // 2, (kc - 1) // 2
        ap = np.pad(a, ((top, pr - top), (left, pc - left)), mode="edge")
        return correlate2d(ap, h, mode="valid")
    return correlate2d(a, h, mode="same", boundary=b)


def fspecial_average(F):
    return np.ones((F, F)) / (F * F)


def fspecial_gaussian(shape, sigma):
    """fspecial('gaussian', [m n], sigma) — centered on the (possibly
    half-integer) grid, normalized to sum 1."""
    m, n = shape if isinstance(shape, (tuple, list)) else (shape, shape)
    y = np.arange(m) - (m - 1) / 2.0
    x = np.arange(n) - (n - 1) / 2.0
    X, Y = np.meshgrid(x, y)
    h = np.exp(-(X * X + Y * Y) / (2.0 * sigma * sigma))
    return h / h.sum()


def mat2gray(a):
    lo, hi = a.min(), a.max()
    if hi == lo:
        return np.zeros_like(a)
    return (a - lo) / (hi - lo)


def _cubic(x, a=-0.5):
    """MATLAB imresize 'bicubic' kernel (Keys, a = -0.5), support 4."""
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    w = np.where(ax <= 1, (a + 2) * ax3 - (a + 3) * ax2 + 1,
                 np.where(ax < 2, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a,
                          0.0))
    return w


def _resize_1d(a, out_n, axis):
    """One axis of MATLAB imresize (bicubic, antialiasing when shrinking)."""
    in_n = a.shape[axis]
    scale = out_n / in_n
    kernel_width = 4.0
    if scale < 1:  # antialiasing: widen kernel, lower cutoff
        kernel = lambda x: scale * _cubic(scale * np.asarray(x, float))
        kernel_width /= scale
    else:
        kernel = lambda x: _cubic(np.asarray(x, float))
    # output sample u (1-based MATLAB convention)
    x = np.arange(1, out_n + 1)
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    P = int(np.ceil(kernel_width)) + 2
    indices = left[:, None] + np.arange(P)[None, :]  # 1-based
    weights = kernel(u[:, None] - indices)
    weights /= weights.sum(axis=1, keepdims=True)
    # clamp indices to valid range (replicate boundary)
    idx = np.clip(indices, 1, in_n).astype(int) - 1
    a_moved = np.moveaxis(a, axis, 0)
    out = np.einsum("op,po...->o...", weights,
                    a_moved[idx.T.reshape(-1)].reshape(P, out_n, *a_moved.shape[1:]))
    return np.moveaxis(out, 0, axis)


def imresize(a, arg):
    """imresize(A, scale) or imresize(A, [rows cols]) — bicubic with
    antialiasing (the MATLAB default)."""
    if np.isscalar(arg):
        out_shape = (int(np.ceil(a.shape[0] * arg)),
                     int(np.ceil(a.shape[1] * arg)))
    else:
        out_shape = tuple(int(v) for v in arg)
    out = _resize_1d(a, out_shape[0], 0)
    out = _resize_1d(out, out_shape[1], 1)
    return out


# ---------------------------------------------------------------------------
# FSIM.m
# ---------------------------------------------------------------------------

def lowpassfilter(sze, cutoff, n):
    rows, cols = sze
    if cols % 2:
        xrange = np.arange(-(cols - 1) / 2, (cols - 1) / 2 + 1) / (cols - 1)
    else:
        xrange = np.arange(-cols / 2, cols / 2) / cols
    if rows % 2:
        yrange = np.arange(-(rows - 1) / 2, (rows - 1) / 2 + 1) / (rows - 1)
    else:
        yrange = np.arange(-rows / 2, rows / 2) / rows
    x, y = np.meshgrid(xrange, yrange)
    radius = np.sqrt(x * x + y * y)
    return np.fft.ifftshift(1.0 / (1.0 + (radius / cutoff) ** (2 * n)))


def phasecong2(im):
    nscale, norient = 4, 4
    minWaveLength, mult, sigmaOnf = 6, 2, 0.55
    dThetaOnSigma, k, epsilon = 1.2, 2.0, 1e-4
    thetaSigma = np.pi / norient / dThetaOnSigma

    rows, cols = im.shape
    imagefft = np.fft.fft2(im)
    zero = np.zeros((rows, cols))

    if cols % 2:
        xrange = np.arange(-(cols - 1) / 2, (cols - 1) / 2 + 1) / (cols - 1)
    else:
        xrange = np.arange(-cols / 2, cols / 2) / cols
    if rows % 2:
        yrange = np.arange(-(rows - 1) / 2, (rows - 1) / 2 + 1) / (rows - 1)
    else:
        yrange = np.arange(-rows / 2, rows / 2) / rows
    x, y = np.meshgrid(xrange, yrange)
    radius = np.sqrt(x * x + y * y)
    theta = np.arctan2(-y, x)
    radius = np.fft.ifftshift(radius)
    theta = np.fft.ifftshift(theta)
    radius[0, 0] = 1.0
    sintheta, costheta = np.sin(theta), np.cos(theta)

    lp = lowpassfilter((rows, cols), 0.45, 15)
    logGabor = []
    for s in range(nscale):
        wavelength = minWaveLength * mult**s
        fo = 1.0 / wavelength
        lg = np.exp(-(np.log(radius / fo)) ** 2 / (2 * np.log(sigmaOnf) ** 2))
        lg = lg * lp
        lg[0, 0] = 0.0
        logGabor.append(lg)

    spread = []
    for o in range(norient):
        angl = o * np.pi / norient
        ds = sintheta * np.cos(angl) - costheta * np.sin(angl)
        dc = costheta * np.cos(angl) + sintheta * np.sin(angl)
        dtheta = np.abs(np.arctan2(ds, dc))
        spread.append(np.exp(-dtheta**2 / (2 * thetaSigma**2)))

    EnergyAll = zero.copy()
    AnAll = zero.copy()
    for o in range(norient):
        sumE = zero.copy()
        sumO = zero.copy()
        sumAn = zero.copy()
        Energy = zero.copy()
        EO = []
        ifftFilterArray = []
        for s in range(nscale):
            filt = logGabor[s] * spread[o]
            ifftFilt = np.real(np.fft.ifft2(filt)) * np.sqrt(rows * cols)
            ifftFilterArray.append(ifftFilt)
            eo = np.fft.ifft2(imagefft * filt)
            EO.append(eo)
            An = np.abs(eo)
            sumAn += An
            sumE += np.real(eo)
            sumO += np.imag(eo)
            if s == 0:
                EM_n = np.sum(filt**2)
        XEnergy = np.sqrt(sumE**2 + sumO**2) + epsilon
        MeanE = sumE / XEnergy
        MeanO = sumO / XEnergy
        for s in range(nscale):
            E, O = np.real(EO[s]), np.imag(EO[s])
            Energy += E * MeanE + O * MeanO - np.abs(E * MeanO - O * MeanE)

        medianE2n = np.median(np.abs(EO[0]) ** 2)
        meanE2n = -medianE2n / np.log(0.5)
        noisePower = meanE2n / EM_n

        EstSumAn2 = zero.copy()
        for s in range(nscale):
            EstSumAn2 += ifftFilterArray[s] ** 2
        EstSumAiAj = zero.copy()
        for si in range(nscale - 1):
            for sj in range(si + 1, nscale):
                EstSumAiAj += ifftFilterArray[si] * ifftFilterArray[sj]
        EstNoiseEnergy2 = (2 * noisePower * np.sum(EstSumAn2)
                           + 4 * noisePower * np.sum(EstSumAiAj))
        tau = np.sqrt(EstNoiseEnergy2 / 2)
        EstNoiseEnergy = tau * np.sqrt(np.pi / 2)
        EstNoiseEnergySigma = np.sqrt((2 - np.pi / 2) * tau**2)
        T = (EstNoiseEnergy + k * EstNoiseEnergySigma) / 1.7
        Energy = np.maximum(Energy - T, zero)

        EnergyAll += Energy
        AnAll += sumAn
    return EnergyAll / AnAll


def fsim(imageRef, imageDis):
    Y1 = np.asarray(imageRef, dtype=np.float64)
    Y2 = np.asarray(imageDis, dtype=np.float64)
    rows, cols = Y1.shape
    minDimension = min(rows, cols)
    # MATLAB round(): half away from zero (np.floor(x+0.5)), NOT Python's
    # banker's rounding — diverges at e.g. minDimension 640 (2.5 -> 3 vs 2)
    F = max(1, int(np.floor(minDimension / 256 + 0.5)))
    aveKernel = fspecial_average(F)
    Y1 = conv2_same(Y1, aveKernel)[::F, ::F]
    Y2 = conv2_same(Y2, aveKernel)[::F, ::F]

    PC1 = phasecong2(Y1)
    PC2 = phasecong2(Y2)

    dx = np.array([[3, 0, -3], [10, 0, -10], [3, 0, -3]]) / 16.0
    dy = np.array([[3, 10, 3], [0, 0, 0], [-3, -10, -3]]) / 16.0
    g1 = np.sqrt(conv2_same(Y1, dx) ** 2 + conv2_same(Y1, dy) ** 2)
    g2 = np.sqrt(conv2_same(Y2, dx) ** 2 + conv2_same(Y2, dy) ** 2)

    T1, T2 = 0.85, 160.0
    PCSim = (2 * PC1 * PC2 + T1) / (PC1**2 + PC2**2 + T1)
    gradSim = (2 * g1 * g2 + T2) / (g1**2 + g2**2 + T2)
    PCm = np.maximum(PC1, PC2)
    return float(np.sum(gradSim * PCSim * PCm) / np.sum(PCm))


# ---------------------------------------------------------------------------
# SR_SIM.m
# ---------------------------------------------------------------------------

def spectral_residue_saliency(image):
    scale, aveKernelSize, gauSigma, gauSize = 0.25, 3, 3.8, 10
    inImg = imresize(image, scale)
    myFFT = np.fft.fft2(inImg)
    myLogAmplitude = np.log(np.abs(myFFT))
    myPhase = np.angle(myFFT)
    residual = myLogAmplitude - imfilter(
        myLogAmplitude, fspecial_average(aveKernelSize), "replicate")
    saliencyMap = np.abs(np.fft.ifft2(np.exp(residual + 1j * myPhase))) ** 2
    saliencyMap = mat2gray(
        imfilter(saliencyMap, fspecial_gaussian((gauSize, gauSize), gauSigma)))
    return imresize(saliencyMap, (image.shape[0], image.shape[1]))


def sr_sim(image1, image2):
    Y1 = np.asarray(image1, dtype=np.float64)
    Y2 = np.asarray(image2, dtype=np.float64)
    rows, cols = Y1.shape
    F = max(1, int(np.floor(min(rows, cols) / 256 + 0.5)))  # MATLAB round()
    aveKernel = fspecial_average(F)
    Y1 = conv2_same(Y1, aveKernel)[::F, ::F]
    Y2 = conv2_same(Y2, aveKernel)[::F, ::F]

    s1 = spectral_residue_saliency(Y1)
    s2 = spectral_residue_saliency(Y2)
    dx = np.array([[3, 0, -3], [10, 0, -10], [3, 0, -3]]) / 16.0
    dy = np.array([[3, 10, 3], [0, 0, 0], [-3, -10, -3]]) / 16.0
    g1 = np.sqrt(conv2_same(Y1, dx) ** 2 + conv2_same(Y1, dy) ** 2)
    g2 = np.sqrt(conv2_same(Y2, dx) ** 2 + conv2_same(Y2, dy) ** 2)

    C1, C2, alpha = 0.40, 225.0, 0.50
    sSim = (2 * s1 * s2 + C1) / (s1**2 + s2**2 + C1)
    gSim = (2 * g1 * g2 + C2) / (g1**2 + g2**2 + C2)
    weight = np.maximum(s1, s2)
    return float(np.sum(sSim * gSim**alpha * weight) / np.sum(weight))
