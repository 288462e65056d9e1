"""Tests for the data layer: combinations, datasets, DICOM, cases."""
import itertools

import numpy as np
import jax.numpy as jnp
import pytest

from mri_super_resolution_tpu.data import (
    Case,
    ImageFittingSet,
    expand_combinations,
    flatten_weights,
    save_dicom,
    read_dicom_pixels,
    MetricsCSV,
    available_patients,
)
from mri_super_resolution_tpu.data import synthetic


class TestCombinations:
    def test_matches_itertools_product(self, rng):
        H, W, S = 3, 2, 2
        A1, A2, A3 = 2, 3, 2
        b0 = rng.uniform(size=(H, W, S)).astype(np.float32)
        b1 = rng.uniform(size=(H, W, S, A1)).astype(np.float32)
        b2 = rng.uniform(size=(H, W, S, A2)).astype(np.float32)
        b3 = rng.uniform(size=(H, W, S, A3)).astype(np.float32)
        out = np.asarray(expand_combinations(
            jnp.asarray(b0), jnp.asarray(b1), jnp.asarray(b2), jnp.asarray(b3)
        ))
        assert out.shape == (H, W, S, 4, A1 * A2 * A3)
        # reference semantics: per voxel, itertools.product([b0],[b1...],[b2...],[b3...]).T
        for i, j, k in itertools.product(range(H), range(W), range(S)):
            combs = np.asarray(
                list(
                    itertools.product(
                        [b0[i, j, k]], b1[i, j, k], b2[i, j, k], b3[i, j, k]
                    )
                )
            ).T
            np.testing.assert_allclose(out[i, j, k], combs, rtol=1e-6)

    def test_combination_mean_matches_full_expansion(self, rng):
        """combination_mean factorizes the product mean: each acquisition at
        a given b appears prod(A_other) times, so the mean over all N
        combinations equals the per-b acquisition mean."""
        from mri_super_resolution_tpu.data import (
            combination_mean,
            expand_from_hybrid,
        )

        H, W, S = 4, 3, 2
        amts = [1, 2, 3, 2]
        hybrid = [
            [rng.uniform(size=(H, W, S, a)).astype(np.float32) if a > 1
             else rng.uniform(size=(H, W, S)).astype(np.float32)
             for _ in range(4)]
            for a in amts
        ]
        full = np.asarray(expand_from_hybrid(hybrid, te=1)).mean(-1)
        fact = combination_mean(hybrid, te=1)
        assert fact.shape == (H, W, S, 4)
        np.testing.assert_allclose(fact, full, rtol=2e-6, atol=1e-7)


class TestImageFittingSet:
    def test_shapes_and_grid(self, rng):
        imgs = [rng.uniform(size=(4, 5, 3)).astype(np.float32) for _ in range(2)]
        ds = ImageFittingSet.from_images(imgs)
        assert ds.pixels.shape == (2, 60, 1)
        assert ds.coords.shape == (60, 3)
        assert len(ds) == 2
        np.testing.assert_allclose(
            np.asarray(ds.pixels[1]).ravel(), imgs[1].ravel(), rtol=1e-6
        )

    def test_normalized_mode(self, rng):
        imgs = [rng.uniform(size=(6, 6)).astype(np.float32) for _ in range(3)]
        ds = ImageFittingSet.from_images(imgs, normalize=True)
        # pixels are (x - 0.5)/0.5 of raw
        np.testing.assert_allclose(
            np.asarray(ds.pixels[0]).ravel(), (imgs[0].ravel() - 0.5) / 0.5, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ds.mean), np.mean(np.stack(imgs), 0), rtol=1e-6
        )

    def test_flatten_weights(self, rng):
        ws = [rng.integers(0, 2, size=(4, 4)).astype(np.float32) for _ in range(2)]
        w = flatten_weights(ws)
        assert w.shape == (2, 16, 1)


class TestDicom:
    def test_roundtrip(self, tmp_path, rng):
        img = (rng.uniform(-1000, 3000, size=(32, 24))).astype(np.int16)
        path = str(tmp_path / "sub" / "test.dcm")
        save_dicom(img, path)
        back = read_dicom_pixels(path)
        np.testing.assert_array_equal(back, img)

    def test_dicom_preamble(self, tmp_path):
        path = str(tmp_path / "x.dcm")
        save_dicom(np.zeros((4, 4)), path)
        with open(path, "rb") as f:
            buf = f.read(132)
        assert buf[128:132] == b"DICM"


class TestMetricsCSV:
    def test_header_and_rows(self, tmp_path):
        csv = MetricsCSV(str(tmp_path / "m.csv"), ("a", "b"))
        csv.append(1, 2)
        csv.append("x", 0.5)
        lines = open(csv.path).read().splitlines()
        assert lines == ["a,b", "1,2", "x,0.5"]


class TestSynthetic:
    def test_acquisitions_shape_and_positivity(self):
        b0 = np.abs(np.random.default_rng(1).normal(1.0, 0.2, size=(16, 16, 4))).astype(
            np.float32
        )
        acq = synthetic.acquisitions_from_b0(b0, num_acq=5, seed=3)
        assert acq.shape == (16, 16, 4, 5)
        assert (acq >= 0).all()  # magnitude images

    def test_deterministic(self):
        b0 = np.ones((8, 8, 2), dtype=np.float32)
        a = synthetic.acquisitions_from_b0(b0, 3, seed=7)
        b = synthetic.acquisitions_from_b0(b0, 3, seed=7)
        np.testing.assert_array_equal(a, b)

    def test_toy_fixtures(self):
        img = synthetic.toy_image(64)
        assert img.shape == (64, 64)
        acqs = synthetic.toy_perturbed_acquisitions(32, 4)
        assert acqs.shape == (32, 32, 4)

    def test_hybrid_from_tissue_gt_is_in_model(self):
        """After the pipeline's (b0, TE0) normalization the noiseless
        tissue signal must be EXACTLY the fitters' 3-compartment model
        (relative TE, PIA.py:257) evaluated at the GT parameters."""
        b0 = np.full((6, 6, 2), 800.0, dtype=np.float32)
        b_values = (0.0, 150.0, 1000.0, 1500.0)
        te_values = (57.0, 70.0, 150.0, 200.0)
        raw, gt = synthetic.hybrid_from_tissue(
            b0, b_values, te_values, seed=5, noise_sigma_frac=0.0,
            shift_sigma=0.0,
        )
        assert gt["D"].shape == (6, 6, 2, 3)
        v = gt["v"]
        np.testing.assert_allclose(v.sum(-1), 1.0, atol=1e-6)
        assert (v >= 0).all()
        # priors respected
        assert (gt["D"][..., 0] >= 0.3).all() and (gt["D"][..., 0] <= 0.7).all()
        assert (gt["T2"][..., 2] >= 500).all() and (gt["T2"][..., 2] <= 1000).all()

        # mean over acquisitions, normalize by (b0, TE0), compare to model
        vx, vy, vs = 2, 3, 1
        sig = np.empty((4, 4))
        for bi in range(4):
            for ti in range(4):
                a = np.asarray(raw[bi][ti], dtype=np.float64)
                val = a[vx, vy, vs] if bi == 0 else a[vx, vy, vs].mean()
                sig[bi, ti] = val
        normalized = 1000.0 * sig / sig[0, 0]

        D, T2, v_ = (gt[k][vx, vy, vs] for k in ("D", "T2", "v"))
        b = np.asarray(b_values)[:, None]
        te_rel = np.asarray(te_values)[None, :] - te_values[0]
        model = 1000.0 * sum(
            v_[c] * np.exp(-b / 1000.0 * D[c]) * np.exp(-te_rel / T2[c])
            for c in range(3)
        )
        np.testing.assert_allclose(normalized, model, rtol=1e-5)


@pytest.mark.skipif(
    not available_patients(), reason="anon_data not present"
)
class TestCases:
    def test_load_case_with_synthetic_dwi(self):
        row = available_patients()[0]
        case = Case.load(**row)
        H, W, S = case.b0.shape
        assert case.dwi.shape[:3] == (H, W, S)
        assert case.dwi.shape[3] == sum(case.acquisitions)
        assert case.erd.shape == (H, W, S)
        assert case.synthetic_dwi  # alldata mats are not distributed
        assert case.accept.shape == case.dwi.shape
        assert case.pt_no == row["pt_id"].split("-")[-1]
