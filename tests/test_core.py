"""Unit tests for core numerics against closed forms and reference libraries."""
import numpy as np
import jax.numpy as jnp
import pytest

from mri_super_resolution_tpu.core import (
    mgrid,
    mgrid_square,
    fourier_encode,
    adc_log_ratio,
    adc_polyfit,
    minmax_normalize,
    contrast_cnr,
    cnr_snr_log10,
    ssim,
    psnr,
    rescale,
    resize_along_axis,
    per_bte_max_normalize,
    rayleigh_noise_std,
)


class TestMgrid:
    def test_matches_torch_reference_semantics(self):
        # get_mgrid((3, 4)): meshgrid ij of linspace(-1,1) per axis
        g = np.asarray(mgrid((3, 4)))
        assert g.shape == (12, 2)
        xs = np.linspace(-1, 1, 3)
        ys = np.linspace(-1, 1, 4)
        expected = np.stack(np.meshgrid(xs, ys, indexing="ij"), -1).reshape(-1, 2)
        np.testing.assert_allclose(g, expected, atol=1e-7)

    def test_square_grid(self):
        g = np.asarray(mgrid_square(5, 2))
        assert g.shape == (25, 2)
        assert g.min() == -1.0 and g.max() == 1.0

    def test_corners(self):
        g = np.asarray(mgrid((2, 2, 2)))
        np.testing.assert_array_equal(np.abs(g), np.ones((8, 3)))


class TestFourier:
    def test_identity_when_B_none(self):
        x = jnp.ones((4, 2))
        np.testing.assert_array_equal(np.asarray(fourier_encode(x, None)), np.ones((4, 2)))

    def test_matches_formula(self, rng):
        x = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
        B = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
        out = np.asarray(fourier_encode(x, B))
        proj = 2 * np.pi * np.asarray(x) @ np.asarray(B).T
        np.testing.assert_allclose(out[:, :8], np.sin(proj), atol=1e-4)
        np.testing.assert_allclose(out[:, 8:], np.cos(proj), atol=1e-4)


class TestADC:
    def test_log_ratio_inverts_exponential(self):
        # signal = b0 * exp(-b * adc_true / 1e6)  => adc_log_ratio recovers it
        b0 = jnp.full((4, 4), 2.0)
        adc_true = 1.5  # in 1e-3 mm^2/s units after mag
        b = 900.0
        dwi = b0 * jnp.exp(-b * adc_true / 1e6)
        adc = adc_log_ratio(dwi, b0, b, mag=1000.0 * 1000.0)
        np.testing.assert_allclose(np.asarray(adc), adc_true, rtol=1e-3)

    def test_polyfit_matches_numpy_polyfit(self, rng):
        bvals = np.array([0.0, 150.0, 1000.0, 1500.0])
        vol = rng.uniform(0.1, 1.0, size=(6, 5, 4)).astype(np.float32)
        ours = np.asarray(adc_polyfit(jnp.asarray(bvals), jnp.asarray(vol)))
        eps = 1e-7
        for i in range(6):
            for j in range(5):
                coef = np.polyfit(bvals / 1000.0, np.log(vol[i, j] + eps), 1)
                expected = np.clip(-coef[0], -10.0, 3.0)
                np.testing.assert_allclose(ours[i, j], expected, rtol=1e-4, atol=1e-4)

    def test_polyfit_clamps(self):
        bvals = jnp.array([0.0, 1000.0])
        flat = jnp.ones((2, 2, 2))  # zero slope
        decay = jnp.stack([jnp.ones((2, 2)), jnp.full((2, 2), 1e-6)], axis=-1)
        assert float(adc_polyfit(bvals, flat).max()) == 0.0
        assert float(adc_polyfit(bvals, decay, min_adc=0.0).min()) >= 0.0
        assert float(adc_polyfit(bvals, decay).max()) == 3.0


class TestMetrics:
    def test_minmax_normalize(self, rng):
        img = jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))
        ref = jnp.asarray(rng.uniform(2.0, 5.0, size=(8, 8)).astype(np.float32))
        out = np.asarray(minmax_normalize(img, ref))
        np.testing.assert_allclose(out.min(), float(ref.min()), atol=1e-5)
        np.testing.assert_allclose(out.max(), float(ref.max()), atol=1e-5)

    def test_contrast_reference_formula(self, rng):
        img = rng.uniform(0.1, 1.0, size=(40, 40)).astype(np.float32)
        m = contrast_cnr(jnp.asarray(img), (20, 20), (10, 10), (30, 30), scale=1, focus=0)
        ca = img[19:21, 19:21]
        co = img[9:11, 9:11]
        no = img[29:31, 29:31]
        C = ca.mean() / (co.mean() + 1e-7)
        CNR = abs(ca.mean() - co.mean()) / np.sqrt(ca.std() ** 2 + co.std() ** 2)
        CNR2 = abs(ca.mean() - co.mean()) / no.std()
        np.testing.assert_allclose(float(m.C), C, rtol=1e-5)
        np.testing.assert_allclose(float(m.CNR), CNR, rtol=1e-4)
        np.testing.assert_allclose(float(m.CNR2), CNR2, rtol=1e-4)

    def test_cnr_snr_log10(self, rng):
        img = rng.uniform(0.1, 1.0, size=(40, 40)).astype(np.float32)
        m = cnr_snr_log10(jnp.asarray(img), (20, 20), (10, 10), (30, 30))
        ca = img[19:22, 19:22].mean()
        co = img[9:12, 9:12].mean()
        N = img[28:33, 28:33].std()
        np.testing.assert_allclose(float(m.log10_SNRc), np.log10(ca / (N + 1e-7)), rtol=1e-4)
        np.testing.assert_allclose(float(m.CR), ca / co, rtol=1e-4)

    def test_ssim_identical_is_one(self, rng):
        img = jnp.asarray(rng.uniform(size=(32, 32)).astype(np.float32))
        assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)

    def test_ssim_matches_skimage(self, rng):
        skimage = pytest.importorskip("skimage.metrics")
        a = rng.uniform(size=(48, 48)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.1, size=(48, 48)).astype(np.float32), 0, 1)
        ours = float(ssim(jnp.asarray(a), jnp.asarray(b), data_range=1.0))
        theirs = skimage.structural_similarity(a, b, data_range=1.0)
        np.testing.assert_allclose(ours, theirs, atol=2e-3)

    def test_psnr_matches_formula(self, rng):
        a = rng.uniform(size=(16, 16)).astype(np.float32)
        b = np.clip(a + 0.1, 0, 1).astype(np.float32)
        expected = 10 * np.log10(1.0 / np.mean((a - b) ** 2))
        np.testing.assert_allclose(float(psnr(jnp.asarray(a), jnp.asarray(b))), expected, rtol=1e-5)


class TestInterp:
    def test_rescale_shape(self, rng):
        img = jnp.asarray(rng.uniform(size=(25, 25)).astype(np.float32))
        assert rescale(img, 3).shape == (75, 75)

    def test_rescale_constant_preserved(self):
        img = jnp.full((10, 10), 0.7)
        out = np.asarray(rescale(img, 2))
        np.testing.assert_allclose(out, 0.7, atol=1e-6)

    def test_resize_along_axis_matches_scipy_cubic(self, rng):
        from scipy.interpolate import interp1d

        arr = rng.uniform(size=(6, 5, 12)).astype(np.float64)
        new_size = 30
        ours = np.asarray(resize_along_axis(jnp.asarray(arr), new_size))
        x_old = np.linspace(0, 1, 12)
        x_new = np.linspace(0, 1, new_size)
        f = interp1d(x_old, arr, kind="cubic", axis=2)
        expected = f(x_new)
        np.testing.assert_allclose(ours, expected, atol=2e-4)

    def test_resize_along_axis_interpolates_knots(self, rng):
        arr = rng.uniform(size=(3, 3, 10)).astype(np.float32)
        out = np.asarray(resize_along_axis(jnp.asarray(arr), 10))
        np.testing.assert_allclose(out, arr, atol=1e-4)


class TestNormalize:
    def test_per_bte_max(self, rng):
        x = jnp.asarray(rng.uniform(1.0, 9.0, size=(4, 4, 5, 5)).astype(np.float32))
        normed, maxes = per_bte_max_normalize(x)
        assert maxes.shape == (4, 4)
        np.testing.assert_allclose(np.asarray(normed).max(axis=(2, 3)), 1.0, rtol=1e-6)

    def test_rayleigh(self, rng):
        roi = jnp.asarray(rng.normal(size=(5, 5)).astype(np.float32))
        expected = np.asarray(roi).std() / np.sqrt(2 - np.pi / 2)
        np.testing.assert_allclose(float(rayleigh_noise_std(roi)), expected, rtol=1e-5)
