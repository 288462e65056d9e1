"""MISR preprocessing tests: registration, selection, patches, bicubic."""
import numpy as np
import pytest

from mri_super_resolution_tpu.data.preprocessing import (
    register_imgset,
    select_T_images,
    augment_imgset,
    gen_sub,
    bicubic,
    _masked_translation,
)


class TestRegistration:
    def test_recovers_known_shift(self, rng):
        from mri_super_resolution_tpu.data.preprocessing import _shift

        base = rng.uniform(size=(64, 64))
        shifted = np.roll(base, (3, -2), axis=(0, 1))
        s = _masked_translation(base, shifted, np.ones_like(base))
        # contract: applying the returned shift to `shifted` restores `base`
        out = _shift(shifted, s)
        np.testing.assert_allclose(out[8:56, 8:56], base[8:56, 8:56], atol=1e-12)

    def test_masked_region_does_not_bias(self, rng):
        """Unnormalized correlation is biased toward shifts overlapping
        bright areas; Padfield normalization must recover the true offset
        even when a large region of the moving frame is masked out."""
        from mri_super_resolution_tpu.data.preprocessing import _shift

        base = rng.uniform(0.0, 0.2, size=(64, 64))
        base[10:26, 10:26] += 5.0  # bright block (e.g. cloud-free terrain)
        shifted = np.roll(base, (2, 3), axis=(0, 1))
        mask = np.ones_like(base)
        mask[32:, :] = 0.0  # bottom half cloud-masked in the moving frame
        s = _masked_translation(base, shifted, mask)
        out = _shift(shifted, s)
        np.testing.assert_allclose(out[8:24, 8:24], base[8:24, 8:24], atol=1e-12)

    def test_register_imgset_aligns(self, rng):
        base = rng.uniform(size=(32, 32))
        T = 4
        imgs = np.stack(
            [np.roll(base, (s, -s), axis=(0, 1)) for s in range(T)], axis=-1
        )
        masks = np.ones_like(imgs)
        masks[..., 0] = 1.0  # frame 0 clearest (all equal -> argmax = 0)
        reg, mreg = register_imgset(imgs, masks)
        # central crop of every registered frame should match frame 0
        c = slice(8, 24)
        for t in range(T):
            np.testing.assert_allclose(reg[c, c, t], base[c, c], atol=1e-10)


class TestSelection:
    def test_selects_clearest_T(self, rng):
        img = rng.uniform(size=(16, 16, 5))
        masks = np.ones((16, 16, 5))
        masks[..., 2] *= 0.5  # below threshold
        X, removed = select_T_images([img], [masks], T=3, thr=0.85)
        assert X.shape == (1, 16, 16, 3)
        assert removed == []

    def test_removes_all_bad(self, rng):
        img = rng.uniform(size=(8, 8, 3))
        masks = np.full((8, 8, 3), 0.1)
        X, removed = select_T_images([img], [masks], T=2, thr=0.85, remove_bad=True)
        assert removed == [0]
        assert X.shape[0] == 0

    def test_pads_with_repeats_when_too_few(self, rng):
        img = rng.uniform(size=(8, 8, 2))
        masks = np.ones((8, 8, 2))
        X, _ = select_T_images([img], [masks], T=5)
        assert X.shape == (1, 8, 8, 5)


class TestAugment:
    def test_temporal_permutation(self, rng):
        img = rng.uniform(size=(8, 8, 6))
        y = rng.uniform(size=(24, 24, 1))
        m = np.ones_like(y)
        Xa, ya, ma = augment_imgset(img, y, m, n_augment=4, seed=0)
        assert Xa.shape == (4, 8, 8, 6)
        np.testing.assert_array_equal(Xa[0], img)  # first copy unpermuted
        # each augmented copy holds the same frames in some order
        for k in range(1, 4):
            np.testing.assert_allclose(np.sort(Xa[k], axis=-1), np.sort(img, axis=-1))
        assert ya.shape == (4, 24, 24, 1)


class TestPatches:
    def test_gen_sub_counts_and_content(self, rng):
        X = rng.uniform(size=(2, 8, 8, 3))
        out = gen_sub(X, d=4, s=4)
        assert out.shape == (2 * 4, 4, 4, 3)
        np.testing.assert_array_equal(out[0], X[0, :4, :4])
        np.testing.assert_array_equal(out[3], X[0, 4:, 4:])

    def test_gen_sub_rejects_bad_stride(self, rng):
        X = rng.uniform(size=(1, 8, 8, 1))
        with pytest.raises(ValueError):
            gen_sub(X, d=5, s=2)


class TestBicubic:
    def test_upscales(self, rng):
        X = rng.uniform(size=(2, 8, 8, 1))
        out = bicubic(X, scale=3)
        assert out.shape == (2, 24, 24, 1)

    def test_constant_preserved(self):
        X = np.full((1, 6, 6, 1), 0.4)
        out = bicubic(X, scale=2)
        np.testing.assert_allclose(out, 0.4, atol=1e-6)
