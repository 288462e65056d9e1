"""Golden-value parity for the perceptual metrics (VERDICT r2 #6).

MATLAB/Octave is not available in this environment, so golden values are
established by TWO independently-written implementations of the published
algorithms (FSIM.m / SR_SIM.m):

1. ``ops/perceptual.py`` — the vectorized production code;
2. ``tests/_matlab_transcription.py`` — a literal statement-by-statement
   numpy transcription of the .m control flow preserving every MATLAB
   builtin's semantics (conv2 'same' true convolution, imfilter correlation
   with edge-replicate padding and the even-kernel center convention,
   fspecial kernels, imresize = bicubic WITH antialiasing, mat2gray,
   log(0) = -Inf).

During round 3 this cross-check caught and fixed three real production
divergences: a linear no-antialias imresize in the saliency path (SR-SIM off
by up to 0.25), a +1e-12 guard inside log|FFT| (off by ~9e-3), and a
frequency-domain Parseval shortcut for phasecong2's noise threshold where
MATLAB uses the one-sided spatial filters (FSIM off by ~1e-3). After the
fixes the two implementations agree to ~1e-8; the frozen numbers below pin
that behaviour.
"""
import sys

import numpy as np
import pytest

from mri_super_resolution_tpu.ops import perceptual as prod

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import _matlab_transcription as mt  # noqa: E402


def _images():
    rng = np.random.default_rng(42)
    x = np.linspace(0, 1, 96)
    X, Y = np.meshgrid(x, x)
    base = (128 + 60 * np.sin(8 * np.pi * X) * np.cos(6 * np.pi * Y)
            + 30 * np.exp(-((X - 0.5) ** 2 + (Y - 0.3) ** 2) / 0.02))
    return {
        "base": base,
        "noisy": base + rng.normal(0, 8, base.shape),
        "blur": mt.conv2_same(base, mt.fspecial_gaussian((7, 7), 1.5)),
        "quant": np.round(np.clip(base, 0, 255) / 8) * 8,
    }


# frozen from tests/_matlab_transcription.py (and matched by production to
# ~1e-8); regenerate only if the reference algorithms themselves change
GOLDEN = [
    # (distortion, FSIM, SR-SIM)
    ("noisy", 0.937537943546, 0.709368557234),
    ("blur", 0.968487106897, 0.850739138672),
    ("quant", 0.991443907263, 0.737138084672),
]

PC_GOLDEN_MEAN = 0.790188201604  # phasecong2(base) spatial mean
PC_GOLDEN_MAX = 0.878674716432


@pytest.mark.parametrize("name,fsim_gold,srsim_gold", GOLDEN)
def test_production_matches_golden(name, fsim_gold, srsim_gold):
    imgs = _images()
    assert prod.fsim(imgs["base"], imgs[name]) == pytest.approx(
        fsim_gold, abs=1e-6)
    assert prod.sr_sim(imgs["base"], imgs[name]) == pytest.approx(
        srsim_gold, abs=1e-6)


@pytest.mark.parametrize("name,fsim_gold,srsim_gold", GOLDEN)
def test_transcription_matches_golden(name, fsim_gold, srsim_gold):
    """Guards the goldens' provenance: the literal transcription must keep
    reproducing them too (a change in either implementation that breaks
    agreement fails one of these two tests, never both silently)."""
    imgs = _images()
    assert mt.fsim(imgs["base"], imgs[name]) == pytest.approx(
        fsim_gold, abs=1e-9)
    assert mt.sr_sim(imgs["base"], imgs[name]) == pytest.approx(
        srsim_gold, abs=1e-9)


def test_phasecong2_cross_implementation():
    imgs = _images()
    pc_p = prod.phasecong2(imgs["base"])
    pc_t = mt.phasecong2(imgs["base"])
    # ~1e-6 uniform offset from float accumulation order in the noise
    # threshold (a global scalar); far below any ranking-relevant scale
    assert np.abs(pc_p - pc_t).max() < 1e-5
    assert pc_t.mean() == pytest.approx(PC_GOLDEN_MEAN, abs=1e-9)
    assert pc_t.max() == pytest.approx(PC_GOLDEN_MAX, abs=1e-9)


def test_imresize_matches_matlab_semantics():
    """Bicubic + antialiasing, replicate boundary, MATLAB grid convention —
    checked as exact agreement between the two independent implementations
    plus the analytic constant-image invariant."""
    rng = np.random.default_rng(7)
    img = rng.random((40, 52)) * 255
    np.testing.assert_allclose(
        prod._imresize_matlab(img, 0.25), mt.imresize(img, 0.25), atol=1e-12)
    np.testing.assert_allclose(
        prod._imresize_matlab(img, (83, 31)), mt.imresize(img, (83, 31)),
        atol=1e-12)
    const = np.full((32, 32), 7.5)
    np.testing.assert_allclose(prod._imresize_matlab(const, 0.25), 7.5,
                               atol=1e-12)
