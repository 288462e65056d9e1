"""Perceptual metrics: identity, ordering, and known-kernel checks."""
import numpy as np
import pytest

from mri_super_resolution_tpu.ops.perceptual import (
    hpf_unsharp,
    phasecong2,
    fsim,
    sr_sim,
    ms_ssim,
    immse,
    score_panel,
    spectral_residue_saliency,
)


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:96, 0:96] / 96.0
    clean = 128 + 90 * np.sin(8 * x) * np.cos(5 * y) + 20 * x
    noisy = clean + 15 * rng.normal(size=clean.shape)
    blurry = clean.copy()
    for _ in range(2):
        blurry = (
            np.roll(blurry, 1, 0) + np.roll(blurry, -1, 0)
            + np.roll(blurry, 1, 1) + np.roll(blurry, -1, 1) + 4 * blurry
        ) / 8.0
    return clean, noisy, blurry


class TestHPF:
    def test_unsharp_kernel_values(self):
        # fspecial('unsharp', 0.2) center = (0.2+5)/1.2 = 4.3333
        delta = np.zeros((5, 5))
        delta[2, 2] = 1.0
        out = hpf_unsharp(delta)
        np.testing.assert_allclose(out[2, 2], 5.2 / 1.2, rtol=1e-6)
        np.testing.assert_allclose(out[2, 1], -0.8 / 1.2, rtol=1e-6)
        np.testing.assert_allclose(out[1, 1], -0.2 / 1.2, rtol=1e-6)

    def test_removes_dc(self):
        flat = np.full((16, 16), 77.0)
        out = hpf_unsharp(flat)
        # interior of a constant image filtered by a unity-DC-gain unsharp
        # kernel stays constant; high-pass energy is ~0 after subtracting it
        assert np.allclose(out[4:-4, 4:-4], 77.0, atol=1e-6)


class TestMatlabRound:
    def test_half_away_from_zero(self):
        """FSIM.m/SR_SIM.m F = round(minDim/256) uses MATLAB round (half away
        from zero); Python's banker's rounding diverges at minDim=640
        (2.5 -> 2 instead of 3), changing the downsampled grid."""
        from mri_super_resolution_tpu.ops.perceptual import _matlab_round

        assert _matlab_round(640 / 256) == 3   # Python round() gives 2
        assert _matlab_round(384 / 256) == 2   # 1.5 -> 2 (both agree)
        assert _matlab_round(0.49) == 0
        assert _matlab_round(96 / 256) == 0


class TestFSIM:
    def test_identity_is_one(self, images):
        clean, _, _ = images
        assert fsim(clean, clean) == pytest.approx(1.0, abs=1e-6)

    def test_orders_degradations(self, images):
        clean, noisy, blurry = images
        assert fsim(clean, noisy) < 1.0
        assert fsim(clean, blurry) < 1.0
        pure_noise = 128 + 60 * np.random.default_rng(7).normal(size=clean.shape)
        assert fsim(clean, noisy) > fsim(clean, pure_noise)

    def test_phasecong_range(self, images):
        clean, _, _ = images
        pc = phasecong2(clean)
        assert pc.shape == clean.shape
        assert pc.min() >= 0.0 and pc.max() <= 1.0 + 1e-6


class TestSRSIM:
    def test_identity_is_one(self, images):
        clean, _, _ = images
        assert sr_sim(clean, clean) == pytest.approx(1.0, abs=1e-6)

    def test_degradation_lowers(self, images):
        clean, noisy, _ = images
        assert sr_sim(clean, noisy) < 1.0

    def test_saliency_in_unit_range(self, images):
        clean, _, _ = images
        sal = spectral_residue_saliency(clean)
        assert sal.shape == clean.shape
        # bicubic upsampling back to full size overshoots slightly outside
        # [0, 1] — MATLAB's imresize does the same and SR_SIM.m doesn't clamp
        assert -0.1 <= sal.min() and sal.max() <= 1.0 + 0.1


class TestSRSIMDegenerate:
    def test_constant_image_stays_finite(self):
        """A constant (blank-masked) slice has exact FFT zeros off-DC; the
        log|F| clamp at the smallest normal double must keep the saliency
        map and the score finite (MATLAB itself NaNs here — a documented
        divergence on degenerate inputs only; nonzero bins are bit-exact)."""
        flat = np.full((64, 64), 0.5)
        sal = spectral_residue_saliency(flat)
        assert np.isfinite(sal).all()
        other = np.full((64, 64), 0.7) + 0.01 * np.eye(64)
        assert np.isfinite(sr_sim(flat, other))


class TestMSSSIM:
    def test_identity(self, images):
        clean, _, _ = images
        assert ms_ssim(clean, clean) == pytest.approx(1.0, abs=1e-4)

    def test_ordering(self, images):
        clean, noisy, blurry = images
        worse = clean + 60 * np.random.default_rng(1).normal(size=clean.shape)
        assert ms_ssim(clean, noisy) > ms_ssim(clean, worse)


class TestPanel:
    # all 5 metrics x (interp, SR) x (raw, HPF) + HF_power, matching the
    # perceptual_similarity.m:50-54 column set
    EXPECTED_KEYS = {"HF_power"} | {
        f"{m}_{h}{arm}"
        for m in ("SSIM", "MSE", "MULTISSIM", "FSIM", "SR_SIM")
        for h in ("", "HPF_")
        for arm in ("interp", "SR")
    }

    def test_score_panel_keys_and_sanity(self, images):
        clean, noisy, blurry = images
        scores = score_panel(HR=clean, interp=blurry, SR=noisy)
        assert set(scores) == self.EXPECTED_KEYS
        assert scores["MSE_interp"] == pytest.approx(immse(blurry, clean))
        # SR (noisy) has MORE high-frequency power than blurry interpolation
        assert scores["HF_power"] > 0.0

    def test_hpf_ssim_uses_class_range(self, images):
        """MATLAB ssim on HPF.m's single output runs at DynamicRange=1 (the
        class range), NOT 255 — the stabilizing constants are 65000x smaller,
        so the two settings measurably differ on filtered images."""
        import jax.numpy as jnp

        from mri_super_resolution_tpu.core.metrics import ssim as _ssim
        from mri_super_resolution_tpu.ops.perceptual import hpf_unsharp

        clean, noisy, _ = images
        scores = score_panel(HR=clean, interp=noisy, SR=noisy)
        h_hr, h_sr = hpf_unsharp(clean), hpf_unsharp(noisy)
        at_1 = float(_ssim(jnp.asarray(h_sr, jnp.float32),
                           jnp.asarray(h_hr, jnp.float32), data_range=1.0))
        at_255 = float(_ssim(jnp.asarray(h_sr, jnp.float32),
                             jnp.asarray(h_hr, jnp.float32), data_range=255.0))
        assert scores["SSIM_HPF_SR"] == pytest.approx(at_1, abs=1e-6)
        assert abs(at_1 - at_255) > 1e-3  # the ranges genuinely differ here
