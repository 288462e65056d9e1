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


class TestCachedPhaseBuilders:
    """The phase-2 builders are memoised by (model, scalars): fresh @jax.jit
    closures per case would recompile the scanned fine-tune per case (minutes
    apiece on tunnelled-compile environments)."""

    def test_identity_stable(self):
        from mri_super_resolution_tpu.models import SirenERD

        m = SirenERD(hidden_features=32, hidden_layers=1, perturb=True)
        m2 = SirenERD(hidden_features=32, hidden_layers=1, perturb=True)
        assert inr_erd._phase2_fn(m, 0.1, 1e-5, 1e-7) is inr_erd._phase2_fn(m2, 0.1, 1e-5, 1e-7)
        assert inr_erd._finetune_scan_fn(m, 5, 0.1, 1e-5, 1e-7) is \
            inr_erd._finetune_scan_fn(m2, 5, 0.1, 1e-5, 1e-7)
        assert inr_erd._recon_mean_fn(m, 0.1) is inr_erd._recon_mean_fn(m2, 0.1)
        assert inr_erd._phase2_fn(m, 0.2, 1e-5, 1e-7) is not \
            inr_erd._phase2_fn(m, 0.1, 1e-5, 1e-7)

    def test_scan_matches_stepwise(self, rng):
        """N steps of the cached per-step fn == the cached N-step scan fn."""
        import jax
        import jax.numpy as jnp
        from mri_super_resolution_tpu.core.coords import mgrid
        from mri_super_resolution_tpu.models import SirenERD

        m = SirenERD(hidden_features=16, hidden_layers=1, perturb=True)
        coords = mgrid((6, 6))
        params = m.init(jax.random.key(0), coords, 0.0, 0.0)
        A, steps = 3, 4
        acq_ids = jnp.arange(A, dtype=jnp.float32)
        tgt = jnp.asarray(rng.uniform(size=(A, 36, 1)).astype(np.float32))
        w = jnp.ones_like(tgt)

        tx, step_fn = inr_erd._phase2_fn(m, 0.1, 1e-3, 1e-4)
        p1, opt_state = params, tx.init(params)
        for _ in range(steps):
            p1, opt_state, _ = step_fn(p1, opt_state, coords, acq_ids, tgt, w)

        scan_fn = inr_erd._finetune_scan_fn(m, steps, 0.1, 1e-3, 1e-4)
        p2, losses = scan_fn(params, coords, acq_ids, tgt, w)
        assert losses.shape == (steps,)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6),
            p1, p2)
