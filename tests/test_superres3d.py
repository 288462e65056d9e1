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
