"""Tests for NLLS hybrid fit, PIDS detection, PIA training, hybrid pipeline."""
import numpy as np
import jax
import jax.numpy as jnp

from mri_super_resolution_tpu.models.pia import PIA, synthetic_batch
from mri_super_resolution_tpu.ops.nlls import hybrid_fit, model_signal, P0, LO, HI, BVALS, TES
from mri_super_resolution_tpu.ops.pids import detect_pids_slice, pids_weight_map
from mri_super_resolution_tpu.pipelines.pia_train import train_synthetic, predict_maps
from mri_super_resolution_tpu.pipelines.hybrid import (
    HybridConfig,
    fit_all_te,
    tissue_maps,
    remove_small_objects,
    mean_over_acquisitions,
)


class TestNLLS:
    def test_recovers_known_parameters(self, rng):
        # generate clean signals from known in-bounds params, fit, compare
        N = 16
        theta_true = np.stack(
            [rng.uniform(LO[i] + 0.05 * (HI[i] - LO[i]), HI[i] - 0.05 * (HI[i] - LO[i]), N)
             for i in range(8)], -1
        ).astype(np.float32)
        # keep volume fractions feasible (V_ep + V_st <= 0.9)
        s = theta_true[:, 6] + theta_true[:, 7]
        scale = np.minimum(1.0, 0.9 / s)
        theta_true[:, 6] *= scale
        theta_true[:, 7] *= scale

        te_grid, b_grid = np.meshgrid(TES, BVALS)
        b = jnp.asarray(b_grid.reshape(-1))
        te = jnp.asarray(te_grid.reshape(-1))
        signals = jnp.asarray(
            np.stack([np.asarray(model_signal(jnp.asarray(t), b, te)) for t in theta_true])
        )
        D, T2, v = hybrid_fit(signals, iters=60)
        # D is the best-identified parameter family; residual must be tiny
        fitted_theta = np.concatenate(
            [np.asarray(D), np.asarray(T2), np.asarray(v)[:, :2]], axis=-1
        )
        resid = []
        for t in fitted_theta:
            pred = np.asarray(model_signal(jnp.asarray(t.astype(np.float32)), b, te))
            resid.append(pred)
        resid = np.stack(resid) - np.asarray(signals)
        rel = np.abs(resid) / (np.abs(np.asarray(signals)) + 1.0)
        assert rel.mean() < 0.05

    def test_stays_in_bounds_and_v_sums(self, rng):
        signals = jnp.asarray(rng.uniform(0, 1000, (8, 16)).astype(np.float32))
        D, T2, v = hybrid_fit(signals, iters=20)
        assert (np.asarray(D) >= LO[:3] - 1e-5).all() and (np.asarray(D) <= HI[:3] + 1e-5).all()
        assert (np.asarray(T2) >= LO[3:6] - 1e-4).all()
        np.testing.assert_allclose(np.asarray(v).sum(-1), 1.0, atol=1e-5)

    def test_garbage_falls_back_or_converges_finite(self):
        signals = jnp.asarray(np.full((2, 16), np.nan, np.float32))
        D, T2, v = hybrid_fit(signals, iters=10)
        np.testing.assert_allclose(
            np.asarray(D), np.broadcast_to(P0[:3], (2, 3)), atol=1e-5
        )


class TestPIDS:
    def test_flags_high_and_negative_adc(self):
        b = jnp.asarray([0.0, 150.0, 1000.0, 1500.0])
        H = W = 4
        S = np.ones((H, W, 4, 4), dtype=np.float32) * 100
        # voxel (0,0): extreme decay -> ADC > 3
        S[0, 0, :, 0] = [1000.0, 1.0, 1e-3, 1e-5]
        # voxel (1,1): increasing signal -> ADC < 0
        S[1, 1, :, 0] = [10.0, 50.0, 200.0, 500.0]
        a1, a2, pb, pte = detect_pids_slice(b, jnp.asarray(S))
        assert a1[0, 0] == 1.0 and a2[0, 0] == 0.0
        assert a2[1, 1] == 1.0 and a1[1, 1] == 0.0
        assert a1.shape == (H, W)
        assert pb.shape == (H, W, 4, 3) and pte.shape == (H, W, 4, 3)

    def test_decay_rule(self):
        b = jnp.asarray([0.0, 150.0, 1000.0, 1500.0])
        S = np.zeros((1, 1, 4, 4), dtype=np.float32)
        S[0, 0] = np.linspace(400, 100, 16).reshape(4, 4)  # strictly decaying both axes
        a1, a2, pb, pte = detect_pids_slice(b, jnp.asarray(S))
        assert pte.sum() == 0.0  # no TE violations
        assert pb.sum() == 0.0

    def test_weight_map(self):
        b = jnp.asarray([0.0, 150.0, 1000.0, 1500.0])
        # physically plausible decay everywhere (flat signals flag as ADC<0
        # through regression-slope float noise, same as np.polyfit would)
        S = np.broadcast_to(
            np.asarray([400.0, 320.0, 150.0, 90.0], np.float32)[None, None, :, None],
            (2, 2, 4, 4),
        ).copy()
        S[0, 0, :, 0] = [10.0, 100.0, 300.0, 900.0]  # negative ADC
        w = np.asarray(pids_weight_map(b, jnp.asarray(S)))
        assert w[0, 0] == 0.0 and w[1, 1] == 1.0


class TestPIATraining:
    def test_supervised_training_reduces_loss(self):
        model = PIA(hidden_dims=(16, 32), predictor_depth=1)
        res = train_synthetic(model, jax.random.key(0), steps=80, batch_size=64)
        assert float(res.losses[-10:].mean()) < float(res.losses[:10].mean())

    def test_noise_range_training_reduces_loss(self):
        """Per-voxel log-uniform sigma draw (noise_range) trains too."""
        model = PIA(hidden_dims=(16, 32), predictor_depth=1)
        res = train_synthetic(model, jax.random.key(0), steps=80,
                              batch_size=64, noise_range=(0.01, 0.1))
        assert float(res.losses[-10:].mean()) < float(res.losses[:10].mean())

    def test_synthetic_batch_per_sample_sigma(self):
        """noise_std broadcasts per-voxel: zero-sigma rows equal clean."""
        import jax.numpy as jnp

        sigma = jnp.concatenate([jnp.zeros((8, 1)), jnp.full((8, 1), 0.1)])
        sig, _, _, _, clean = synthetic_batch(jax.random.key(1), 16, sigma)
        np.testing.assert_allclose(np.asarray(sig[:8]), np.asarray(clean[:8]))
        assert float(jnp.abs(sig[8:] - clean[8:]).mean()) > 1.0

    def test_predict_maps_shapes(self):
        model = PIA(hidden_dims=(16, 32))
        res = train_synthetic(model, jax.random.key(0), steps=5, batch_size=16)
        sig = jnp.asarray(np.random.default_rng(0).uniform(0, 1000, (40, 16)).astype(np.float32))
        D, T2, v = predict_maps(model, res.params, sig, batch=16)
        assert D.shape == (40, 3) and v.shape == (40, 3)


class TestHybridPipeline:
    def test_end_to_end_small(self, rng):
        from mri_super_resolution_tpu.data import synthetic

        b0 = np.abs(rng.normal(1.0, 0.2, (20, 20, 2))).astype(np.float32)
        hybrid_all = synthetic.hybrid_from_b0(b0, acq_counts=(1, 2, 2, 2), seed=0)
        hybrid = mean_over_acquisitions(hybrid_all)
        cfg = HybridConfig(
            number_of_epochs=25, hidden_dim=32, num_layers=1, mapping_size=8,
            roi_start_x=2, roi_end_x=18, roi_start_y=2, roi_end_y=18,
        )
        result = fit_all_te(hybrid, cfg, seed=0)
        assert result.recon_hybrid.shape == (32, 32, 2, 4, 4)
        assert (result.recon_hybrid >= 0).all()

        maps = tissue_maps(result, np.asarray([0.0, 150.0, 1000.0, 1500.0]), _slice=1, nlls_iters=10)
        assert maps.D.shape == (32, 32, 3)
        assert maps.cancer.dtype == bool
        np.testing.assert_allclose(maps.v.sum(-1), 1.0, atol=1e-4)

    def test_end_to_end_grid_model(self, rng):
        """--inr_model grid + restart_adam rides the separable tensor path
        for all four TE fits (hybrid.py fit_all_te grid branch)."""
        from mri_super_resolution_tpu.data import synthetic

        b0 = np.abs(rng.normal(1.0, 0.2, (20, 20, 2))).astype(np.float32)
        hybrid_all = synthetic.hybrid_from_b0(b0, acq_counts=(1, 2, 2, 2), seed=0)
        hybrid = mean_over_acquisitions(hybrid_all)
        cfg = HybridConfig(
            number_of_epochs=30, roi_start_x=2, roi_end_x=18,
            roi_start_y=2, roi_end_y=18, inr_model="grid",
            inr_restart_every=10, grid_levels=2, grid_base_resolution=4,
            grid_hidden=16,
        )
        result = fit_all_te(hybrid, cfg, seed=0)
        assert result.recon_hybrid.shape == (32, 32, 2, 4, 4)
        assert (result.recon_hybrid >= 0).all()
        assert np.isfinite(result.recon_hybrid).all()
        assert result.timings["inr_model"] == "grid"
        assert result.timings["fit_s"] > 0

    def test_end_to_end_grid_shared(self, rng):
        """inr_model='grid_shared': one 16-slot (b, TE) grid INR fits the
        whole patient; recon unpacks b-major to (..., 4, 4) and must
        de-normalize with the right (b, te) maxes."""
        from mri_super_resolution_tpu.data import synthetic

        b0 = np.abs(rng.normal(1.0, 0.2, (20, 20, 2))).astype(np.float32)
        hybrid_all = synthetic.hybrid_from_b0(b0, acq_counts=(1, 2, 2, 2), seed=0)
        hybrid = mean_over_acquisitions(hybrid_all)
        cfg = HybridConfig(
            number_of_epochs=60, roi_start_x=2, roi_end_x=18,
            roi_start_y=2, roi_end_y=18, inr_model="grid_shared",
            inr_restart_every=20, grid_levels=2, grid_base_resolution=4,
            grid_hidden=16,
        )
        result = fit_all_te(hybrid, cfg, seed=0)
        assert result.recon_hybrid.shape == (32, 32, 2, 4, 4)
        assert (result.recon_hybrid >= 0).all()
        assert np.isfinite(result.recon_hybrid).all()
        assert result.timings["inr_model"] == "grid_shared"
        # de-normalization sanity: each (b, te) channel's scale tracks its
        # max (recon of channel (b, te) should be O(maxes[b, te]))
        from mri_super_resolution_tpu.pipelines.superres3d import (
            normalize_hybrid,
        )

        _, maxes = normalize_hybrid(hybrid)
        ch_max = result.recon_hybrid.reshape(-1, 4, 4).max(0)
        assert (ch_max <= maxes * 1.5 + 1e-6).all()

        maps = tissue_maps(result, np.asarray([0.0, 150.0, 1000.0, 1500.0]),
                           _slice=1, nlls_iters=5)
        assert maps.D.shape == (32, 32, 3)

    def test_tissue_maps_pia_fitter(self, rng):
        """make_pia_fitter drops into tissue_maps in place of the NLLS."""
        from mri_super_resolution_tpu.pipelines.hybrid import (
            HybridResult, make_pia_fitter, tissue_maps)

        rh = rng.uniform(10, 1000, (8, 8, 2, 4, 4)).astype(np.float32)
        result = HybridResult(recon_hybrid=rh, maxes=np.ones((2, 4, 4)))
        fitter = make_pia_fitter(train_steps=30)
        maps = tissue_maps(result, np.asarray([0.0, 150.0, 1000.0, 1500.0]),
                           _slice=1, fitter=fitter)
        assert maps.D.shape == (8, 8, 3) and maps.v.shape == (8, 8, 3)
        np.testing.assert_allclose(maps.v.sum(-1), 1.0, atol=1e-4)
        assert maps.cancer.dtype == bool

    def test_remove_small_objects(self):
        mask = np.zeros((10, 10), bool)
        mask[0:4, 0:4] = True  # 16 px, kept
        mask[8, 8] = True  # 1 px, removed
        out = remove_small_objects(mask, min_size=12)
        assert out[1, 1] and not out[8, 8]
