"""Integration test of the 2-D directional ensemble pipeline (tiny config)."""
import os

import numpy as np
import pytest

from mri_super_resolution_tpu.config import Master2DConfig
from mri_super_resolution_tpu.data import Case, CONTRAST_HEADER
from mri_super_resolution_tpu.pipelines import master2d


def _tiny_case(rng) -> Case:
    H = W = 32
    S, A = 4, 6  # 2 acquisitions per direction
    b0 = rng.uniform(0.5, 1.5, size=(H, W, S)).astype(np.float32)
    base = rng.uniform(0.2, 1.0, size=(H, W, S)).astype(np.float32)
    dwi = np.stack(
        [base + 0.02 * rng.normal(size=(H, W, S)).astype(np.float32) for _ in range(A)],
        axis=-1,
    ).astype(np.float32)
    return Case(
        pt_id="00-0000-99",
        b=900.0,
        cancer_loc=(18, 18),
        contralateral_loc=(14, 14),
        noise=(22, 22),
        cancer_slice=1,
        acquisitions=(2, 2, 2),
        dwi=dwi,
        b0=b0,
        erd=np.ones((H, W, S), dtype=np.float32),
        accept=np.ones(dwi.shape, dtype=np.int32),
        synthetic_dwi=True,
    )


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("m2d")
    return Master2DConfig(
        out_folder=str(tmp / "exp"),
        out_img_folder=str(tmp / "img"),
        total_steps=40,
        seg=8,
        hidden_layers=2,
        hidden_features=32,
        roi_begin=8,
        roi_end=24,
        scale=2,
        exp_name="test",
    )


class TestMaster2D:
    def test_run_case_outputs(self, rng, tiny_cfg):
        case = _tiny_case(rng)
        outputs = master2d.run_case(case, tiny_cfg, seed=0)
        assert set(outputs) == {"x", "y", "z"}
        H = tiny_cfg.roi_end - tiny_cfg.roi_begin
        for o in outputs.values():
            assert o.superres.shape == (H, H)
            assert o.large.shape == (H * 2, H * 2)
            assert np.isfinite(o.adc_super).all()
            assert o.superres.min() >= 0.0  # min-subtracted

    def test_full_run_writes_csv_and_dicoms(self, rng, tiny_cfg):
        case = _tiny_case(rng)
        csv_path = master2d.run(tiny_cfg, [case])
        lines = open(csv_path).read().splitlines()
        assert lines[0] == ",".join(CONTRAST_HEADER)
        # 3 directions x 8 images x 3 metrics + mean x 8 x 3
        assert len(lines) - 1 == 3 * 8 * 3 + 8 * 3
        dwi_dir = os.path.join(tiny_cfg.out_img_folder, "test", "99", "DWI")
        assert sorted(os.listdir(dwi_dir)) == ["erd.dcm", "mean.dcm", "super.dcm", "super_norm.dcm"]
        adc_dir = os.path.join(tiny_cfg.out_img_folder, "test", "99", "ADC")
        assert len(os.listdir(adc_dir)) == 6

    def test_erd_mode1_masks_outlier_acquisition(self, rng, tiny_cfg):
        case = _tiny_case(rng)
        # poison one acquisition of direction x within the ROI
        r0, r1 = tiny_cfg.roi_begin, tiny_cfg.roi_end
        case.dwi[r0:r1, r0:r1, case.cancer_slice, 0] = 0.01
        cfg = Master2DConfig(**{**tiny_cfg.__dict__, "erd": 1})
        master2d.run_case(case, cfg, seed=0)
        accept_roi = case.accept[r0:r1, r0:r1, case.cancer_slice, :]
        # outlier acquisition rejected for most pixels
        assert accept_roi[..., 0].mean() < 0.3
        assert accept_roi[..., 1:].mean() > 0.8


class TestPaddedDirectionParity:
    def test_unequal_counts_match_standalone_fit(self, rng):
        """A direction padded inside the vmapped fit must produce exactly the
        same ensemble predictions as fitting it alone (Adam-count parity)."""
        import jax
        import jax.numpy as jnp
        import optax

        from mri_super_resolution_tpu.config import Master2DConfig
        from mri_super_resolution_tpu.core.coords import mgrid
        from mri_super_resolution_tpu.core.normalize import to_tensor_normalize
        from mri_super_resolution_tpu.fit.engine import fit_ensemble
        from mri_super_resolution_tpu.models import Siren
        from mri_super_resolution_tpu.pipelines.master2d import fit_directions

        H = W = 12
        counts = (4, 2)  # unequal: direction 1 gets 2 padded slots
        A_total = sum(counts)
        roi = rng.uniform(0.2, 1.0, size=(H, W, A_total)).astype(np.float32)
        accept = np.ones_like(roi)
        cfg = Master2DConfig(
            hidden_features=16, hidden_layers=1, total_steps=6, seg=2, scale=2
        )
        seed = 0
        pred_1x, _ = fit_directions(roi, accept, counts, cfg, seed)

        # standalone fit of direction 1 (the padded one)
        coords = mgrid((H, W))
        coords_s = mgrid((H * cfg.scale, W * cfg.scale))
        model = Siren(hidden_features=16, hidden_layers=1, out_features=1)
        keys = jax.random.split(jax.random.key(seed), 2)
        params = model.init(keys[1], coords[:4])
        pix = jnp.asarray(
            np.stack(
                [to_tensor_normalize(roi[:, :, 4 + i]).reshape(-1, 1) for i in range(2)]
            )
        )
        w = jnp.ones_like(pix)
        res = fit_ensemble(
            model.apply, optax.adam(cfg.learning_rate), params, coords, pix, w,
            coords, coords_s, total_steps=cfg.total_steps, seg=cfg.seg,
        )
        ref = np.asarray(res.pred_1x).reshape(H, W)
        np.testing.assert_allclose(pred_1x[1], ref, atol=1e-6)
