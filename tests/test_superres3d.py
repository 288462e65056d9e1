"""Integration test of the 3-D FF-INR + PerturbNet pipeline (tiny config)."""
import os

import numpy as np
import pytest

from mri_super_resolution_tpu.config import SupperresDWIConfig
from mri_super_resolution_tpu.data import synthetic
from mri_super_resolution_tpu.models import Siren
from mri_super_resolution_tpu.pipelines import superres3d


@pytest.fixture(scope="module")
def tiny_setup():
    rng = np.random.default_rng(0)
    b0 = np.abs(rng.normal(1.0, 0.3, size=(24, 24, 3))).astype(np.float32)
    hybrid = synthetic.hybrid_from_b0(b0, acq_counts=(1, 2, 2, 2), seed=1)
    bvalues = np.asarray([0.0, 150.0, 1000.0, 1500.0])
    cfg = SupperresDWIConfig(
        number_of_epochs=30,
        perturbation_epochs=4,
        hidden_dim=32,
        num_layers=1,
        pn_dim=16,
        roi_start=4,
        roi_end=20,
        mapping_size=16,
    )
    return hybrid, bvalues, cfg


class TestSuperres3D:
    def test_run_patient_shapes(self, tiny_setup):
        hybrid, bvalues, cfg = tiny_setup
        result = superres3d.run_patient(hybrid, bvalues, cfg, seed=0, pt_id=7)
        sx = cfg.roi_end - cfg.roi_start
        assert result.recon_2x.shape == (2 * sx, 2 * sx, 3, 4)
        assert result.sr_hr_grid.shape == (sx, sx, 3, 4)
        assert result.mean_img.shape == (24, 24, 3, 4)
        assert (result.recon_2x >= 0).all()  # clamped
        assert len(result.ssim_rows) == 3 * 4  # slices x b-values
        for row in result.ssim_rows:
            assert -1.0 <= row[3] <= 1.0 and -1.0 <= row[4] <= 1.0

    def test_adc_and_coronal(self, tiny_setup):
        hybrid, bvalues, cfg = tiny_setup
        result = superres3d.run_patient(hybrid, bvalues, cfg, seed=0)
        adc_sr, adc_sp, adc_hr = superres3d.adc_maps(result, cfg, _slice=1)
        sx2 = 2 * (cfg.roi_end - cfg.roi_start)
        assert adc_sr.shape == adc_sp.shape == adc_hr.shape == (sx2, sx2)
        assert np.isfinite(adc_sr).all()
        assert adc_sr.max() <= 3.0 and adc_sr.min() >= -10.0

        inr = Siren(hidden_features=cfg.hidden_dim, hidden_layers=cfg.num_layers)
        cor = superres3d.coronal_recon(result, inr.apply, cfg, transverse_length=10)
        assert cor.shape == (sx2, sx2, 10, 1)

    def test_driver_writes_csv(self, tiny_setup, tmp_path):
        hybrid, bvalues, cfg = tiny_setup
        out = superres3d.run([(99, hybrid, bvalues)], cfg, str(tmp_path), seed=0)
        csv = os.path.join(out, "pat99", "ssim_scores.csv")
        lines = open(csv).read().splitlines()
        assert lines[0].startswith("Pt_id")
        assert len(lines) == 1 + 3 * 4

    def test_driver_exports_serving_artifact(self, tiny_setup, tmp_path):
        """--export_artifact path: the artifact reproduces infer_grid."""
        import jax

        from mri_super_resolution_tpu import serve
        from mri_super_resolution_tpu.core.coords import fourier_encode

        hybrid, bvalues, cfg = tiny_setup
        out = superres3d.run(
            [(42, hybrid, bvalues)], cfg, str(tmp_path), seed=0,
            export_artifact=True,
        )
        art_dir = os.path.join(out, "pat42", "artifact")
        served = serve.load(art_dir)
        assert served.manifest["kind"] == "inr"
        assert served.manifest["coord_dim"] == 4
        # de-normalization scales travel with the artifact (self-contained)
        maxes = np.asarray(served.manifest["maxes"])
        assert maxes.shape == (4, 4) and (maxes > 0).all()
        assert served.manifest["bvalues"] == [0.0, 150.0, 1000.0, 1500.0]

        coords = jax.random.uniform(jax.random.key(3), (33, 4), minval=-1.0)
        got = np.asarray(served(coords))
        assert got.shape == (33, 1)
        # artifact must match a fresh fit's params applied directly
        result = superres3d.run_patient(hybrid, bvalues, cfg, seed=0, pt_id=42)
        inr = Siren(hidden_features=cfg.hidden_dim, hidden_layers=cfg.num_layers)
        want = np.asarray(
            inr.apply(result.inr_params, fourier_encode(coords, result.B))
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_expansion_count(self, tiny_setup):
        hybrid, bvalues, cfg = tiny_setup
        normed, maxes = superres3d.normalize_hybrid(hybrid)
        from mri_super_resolution_tpu.data import expand_from_hybrid

        acq = np.asarray(expand_from_hybrid(normed, te=0))
        assert acq.shape[-1] == 2 * 2 * 2
        assert maxes.shape == (4, 4)
        assert np.all(maxes > 0)


class TestOddROI:
    def test_odd_roi_side(self):
        """roi_end - roi_start odd: the spline arms rescale a ceil(n/2) grid
        to 2*ceil(n/2) > n rows — both ssim_table and adc_maps must crop
        back instead of raising a shape mismatch (VERDICT r3 review)."""
        rng = np.random.default_rng(1)
        b0 = np.abs(rng.normal(1.0, 0.3, size=(24, 24, 2))).astype(np.float32)
        hybrid = synthetic.hybrid_from_b0(b0, acq_counts=(1, 2, 2, 2), seed=1)
        bvalues = np.asarray([0.0, 150.0, 1000.0, 1500.0])
        cfg = SupperresDWIConfig(
            number_of_epochs=10, perturbation_epochs=2, hidden_dim=16,
            num_layers=1, pn_dim=8, roi_start=4, roi_end=19, mapping_size=8,
        )
        result = superres3d.run_patient(hybrid, bvalues, cfg, seed=0)
        sx = cfg.roi_end - cfg.roi_start
        assert sx % 2 == 1
        assert result.recon_2x.shape == (2 * sx, 2 * sx, 2, 4)
        adc_sr, adc_sp, adc_hr = superres3d.adc_maps(result, cfg, _slice=0)
        assert adc_sr.shape == adc_sp.shape == adc_hr.shape == (2 * sx, 2 * sx)


class TestGridModelOption:
    def test_run_patient_grid(self, tiny_setup):
        """inr_model='grid' routes the 3-D pipeline through GridINR: mean-fit
        epochs + dense inference on the separable tensor-product path, PN
        alternation on the gather path with identity pn_encode (no Fourier
        re-mapping — the grid consumes raw coords)."""
        import dataclasses

        hybrid, bvalues, cfg = tiny_setup
        cfg_g = dataclasses.replace(
            cfg, inr_model="grid", number_of_epochs=120, grid_levels=3,
            grid_base_resolution=4, grid_hidden=32)
        result = superres3d.run_patient(hybrid, bvalues, cfg_g, seed=0, pt_id=7)
        sx = cfg.roi_end - cfg.roi_start
        assert result.recon_2x.shape == (2 * sx, 2 * sx, 3, 4)
        assert result.sr_hr_grid.shape == (sx, sx, 3, 4)
        assert (result.recon_2x >= 0).all()  # clamped
        assert np.isfinite(result.recon_2x).all()
        for row in result.ssim_rows:
            assert -1.0 <= row[3] <= 1.0 and -1.0 <= row[4] <= 1.0
        # the fit must actually learn its target (the LR mean): evaluate the
        # fitted grid on the LR grid itself. (The HR grid interpolates between
        # LR knots, and this fixture's b0 is white noise, so HR correlation is
        # interpolation-limited by construction — not a fit-quality signal.)
        from mri_super_resolution_tpu.models.grid_inr import infer_tensor_grid

        model = superres3d._grid_model(cfg_g)
        r0, r1 = cfg.roi_start, cfg.roi_end
        lr_mean = result.mean_img[r0:r1:2, r0:r1:2]
        lr_fit = np.asarray(
            infer_tensor_grid(model, result.inr_params, lr_mean.shape)
        ).reshape(lr_mean.shape)
        corr = np.corrcoef(lr_fit.ravel(), lr_mean.ravel())[0, 1]
        assert corr > 0.8, corr
        # coronal pass rides the tensor path (no inr_apply needed)
        cor = superres3d.coronal_recon(result, None, cfg_g, transverse_length=8)
        assert cor.shape == (2 * sx, 2 * sx, 8, 1)
        assert np.isfinite(cor).all()

    def test_grid_export_serving_artifact(self, tiny_setup, tmp_path):
        """--export_artifact with inr_model='grid': the separable
        tensor-product artifact (serve.export_grid_inr, all axes symbolic)
        reproduces the pipeline's own 2x recon grid."""
        import dataclasses

        import jax.numpy as jnp

        from mri_super_resolution_tpu import serve

        hybrid, bvalues, cfg = tiny_setup
        cfg_g = dataclasses.replace(
            cfg, inr_model="grid", grid_levels=2, grid_base_resolution=4,
            grid_hidden=16)
        out = superres3d.run(
            [(43, hybrid, bvalues)], cfg_g, str(tmp_path), seed=0,
            export_artifact=True,
        )
        served = serve.load(os.path.join(out, "pat43", "artifact"))
        assert served.manifest["kind"] == "grid_inr"
        assert "maxes" in served.manifest
        result = superres3d.run_patient(hybrid, bvalues, cfg_g, seed=0, pt_id=43)
        # the artifact at the 2x recon density reproduces recon_2x
        # (clamp_min=0 matches the pipeline's clamped dense inference)
        sx, sy, S, nb = result.sr_hr_grid.shape
        axes = [jnp.linspace(-1.0, 1.0, n) for n in (2 * sx, 2 * sy, S)]
        got = np.asarray(served(*axes))[..., 0]
        assert got.shape == result.recon_2x.shape
        np.testing.assert_allclose(got, result.recon_2x, atol=1e-4)
        # and the HR grid too — same artifact, different density
        axes_hr = [jnp.linspace(-1.0, 1.0, n) for n in (sx, sy, S)]
        got_hr = np.asarray(served(*axes_hr))[..., 0]
        np.testing.assert_allclose(got_hr, result.sr_hr_grid, atol=1e-4)

    def test_tensor_vag_matches_gather_loss(self, tiny_setup):
        """make_tensor_value_and_grad's loss equals the gather-path MSE on the
        same mgrid — the hook must be a pure reformulation, not a new loss."""
        import jax
        import jax.numpy as jnp

        from mri_super_resolution_tpu.core.coords import mgrid
        from mri_super_resolution_tpu.models import GridINR
        from mri_super_resolution_tpu.models.grid_inr import (
            make_tensor_value_and_grad,
        )

        shape = (6, 6, 3, 4)
        model = GridINR(num_levels=2, base_resolution=4, hidden=16)
        coords = mgrid(shape)
        params = model.init(jax.random.key(0), coords[:8])
        target = jax.random.uniform(jax.random.key(1), (coords.shape[0], 1))
        vag = make_tensor_value_and_grad(model, shape)
        loss_t, grads = vag(params, coords, target)
        loss_g = jnp.mean((model.apply(params, coords) - target) ** 2)
        np.testing.assert_allclose(float(loss_t), float(loss_g), rtol=2e-5)
        assert all(np.isfinite(x).all() for x in jax.tree.leaves(grads))


class TestRestartOption:
    def test_run_patient_with_restarts(self, tiny_setup):
        """inr_restart_every routes the INR fit through restart_adam inside
        the scanned alternating-PN loop (see fit/optim.py rationale)."""
        import dataclasses

        hybrid, bvalues, cfg = tiny_setup
        cfg_r = dataclasses.replace(cfg, inr_restart_every=10)
        result = superres3d.run_patient(hybrid, bvalues, cfg_r, seed=0, pt_id=7)
        assert np.isfinite(result.recon_2x).all()
        # the restart path must actually diverge from flat Adam after the
        # first reset fires (a silently-ignored flag would match exactly)
        flat = superres3d.run_patient(hybrid, bvalues, cfg, seed=0, pt_id=7)
        assert not np.allclose(
            np.asarray(result.recon_2x), np.asarray(flat.recon_2x))


class TestWireModelOption:
    def test_run_patient_wire(self, tiny_setup):
        """inr_model='wire' routes the 3-D pipeline through the paired-real
        Gabor INR on raw 4-D coords (identity pn_encode, no Fourier
        mapping); inference + coronal use the no-encode dense-grid path."""
        import dataclasses

        hybrid, bvalues, cfg = tiny_setup
        cfg_w = dataclasses.replace(
            cfg, inr_model="wire", number_of_epochs=250, wire_hidden=32,
            wire_layers=1)
        result = superres3d.run_patient(hybrid, bvalues, cfg_w, seed=0, pt_id=7)
        sx = cfg.roi_end - cfg.roi_start
        assert result.recon_2x.shape == (2 * sx, 2 * sx, 3, 4)
        assert (result.recon_2x >= 0).all()
        assert np.isfinite(result.recon_2x).all()
        for row in result.ssim_rows:
            assert -1.0 <= row[3] <= 1.0 and -1.0 <= row[4] <= 1.0
        # the fit must learn its LR-mean target
        from mri_super_resolution_tpu.core.coords import mgrid

        model = superres3d._wire_model(cfg_w)
        r0, r1 = cfg.roi_start, cfg.roi_end
        lr_mean = result.mean_img[r0:r1:2, r0:r1:2]
        lr_fit = np.asarray(
            model.apply(result.inr_params, mgrid(lr_mean.shape))
        ).reshape(lr_mean.shape)
        corr = np.corrcoef(lr_fit.ravel(), lr_mean.ravel())[0, 1]
        assert corr > 0.8, corr
        cor = superres3d.coronal_recon(result, model.apply, cfg_w,
                                       transverse_length=8)
        assert cor.shape == (2 * sx, 2 * sx, 8, 1)
        assert np.isfinite(cor).all()
