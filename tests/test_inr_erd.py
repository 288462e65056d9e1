"""Integration test of the soft-ERD two-phase pipeline (tiny config)."""
import numpy as np

from mri_super_resolution_tpu.config import INRERDConfig
from mri_super_resolution_tpu.data import CNR_SNR_HEADER
from mri_super_resolution_tpu.pipelines import inr_erd


def _tiny_case(rng) -> inr_erd.ERDCase:
    H = W = 24
    S, A = 3, 5
    b0 = rng.uniform(0.8, 1.6, size=(H, W, S)).astype(np.float32)
    base = b0 * 0.5
    b3 = np.stack(
        [base + 0.02 * rng.normal(size=(H, W, S)).astype(np.float32) for _ in range(A)],
        axis=-1,
    ).astype(np.float32)
    return inr_erd.ERDCase(
        pt_id="18-1681-77",
        b=(0.0, 150.0, 1000.0, 1500.0),
        cancer_loc=(12, 12),
        contralateral_loc=(8, 8),
        noise=(18, 18),
        cancer_slice=1,
        b0=b0,
        b3=b3,
    )


class TestINRERD:
    def test_run_case(self, rng, tmp_path):
        case = _tiny_case(rng)
        cfg = INRERDConfig(
            hidden_features=32, hidden_layers=1, loss_threshold=2e-3, seeds=1
        )
        from mri_super_resolution_tpu.data import MetricsCSV

        csv = MetricsCSV(str(tmp_path / "erd.csv"), CNR_SNR_HEADER)
        res = inr_erd.run_case(case, cfg, seed=0, csv=csv)
        assert res.mean_recon.shape == (24, 24)
        assert np.isfinite(res.mean_recon).all()
        assert res.pretrain_steps > 0
        lines = open(csv.path).read().splitlines()
        assert len(lines) == 1 + 4  # header + DWI/ADC x orig/recon
        assert lines[1].split(",")[-2:] == ["DWI", "orig"]

    def test_label_params_split(self, rng):
        import jax
        from mri_super_resolution_tpu.core.coords import mgrid
        from mri_super_resolution_tpu.models import SirenERD

        model = SirenERD(hidden_features=16, hidden_layers=1, perturb=True)
        coords = mgrid((4, 4))
        params = model.init(jax.random.key(0), coords, 0.0, 0.0)
        labels = inr_erd._label_params(params)
        flat = jax.tree_util.tree_leaves(labels)
        assert "perturb" in flat and "net" in flat
