"""Round-5 quality-reconciliation mechanism tests (VERDICT r4 Next #1).

Ports the round-3 noise-correlation confound probe
(tests/test_lowres_qual.py::TestNoiseCorrelationConfound) to the 3-D cohort
protocol's LR formation (raw ::2 decimation of the input mean,
superresDWI.py:92-100 / superres3d.run_patient), and pins the contracts of
the synthetic generator extensions the round-5 ladder relies on
(scripts/round5_quality_ladder.py).
"""
import numpy as np

from mri_super_resolution_tpu.data import synthetic


def _smooth_b0(rng, H=48, W=48, S=4):
    y, x = np.mgrid[0:H, 0:W] / H
    base = 0.6 + 0.3 * np.sin(3 * np.pi * x) * np.cos(2 * np.pi * y) + 0.1 * y
    b0 = np.repeat(base[:, :, None], S, axis=2).astype(np.float32)
    return b0 * (1.0 + 0.05 * rng.normal(size=b0.shape).astype(np.float32))


class TestNoiseCorrelationConfound3D:
    """The 3-D cohort protocol (GT = held-out-acquisition mean, LR = ::2
    decimation of the input mean) must not let the spline arm's error
    correlate with the GT's own noise. If it did, round 4's spline-wins
    cohort result could be the round-2 confound in a new protocol; the
    ladder analysis (results/round5_quality/) depends on it being absent."""

    def test_split_protocol_decorrelates_spline_error_from_gt_noise(self, rng):
        import jax
        import jax.numpy as jnp

        from mri_super_resolution_tpu.core.interp import rescale

        b0 = _smooth_b0(rng)
        A = 12
        full, clean = synthetic.hybrid_from_b0(
            b0, acq_counts=(1, A, 2, 2), seed=3, return_clean=True,
            dedup_te=True)
        acqs = full[1][0]  # (H, W, S, A)
        cl = clean[1][0]  # (H, W, S)
        n_in = A // 2

        up2 = jax.jit(lambda im: rescale(im, 2, anti_aliasing=True))
        down_up = jax.jit(lambda im: rescale(
            rescale(im, 0.5, anti_aliasing=True), 2, anti_aliasing=True))

        def spline_dec(vol):
            """3-D cohort LR formation: raw ::2 decimation, then the
            anti-aliased cubic 2x upsample the cohort scorer uses."""
            lr = vol[::2, ::2]
            ups = [np.asarray(up2(jnp.asarray(lr[:, :, s])))
                   for s in range(lr.shape[2])]
            return np.stack(ups, axis=-1)[: vol.shape[0], : vol.shape[1]]

        def spline_aa(vol):
            """2-D half-res harness LR formation (round-2's geometry):
            anti-aliased 0.5x of the full-res mean, then 2x back up."""
            ups = [np.asarray(down_up(jnp.asarray(vol[:, :, s])))
                   for s in range(vol.shape[2])]
            return np.stack(ups, axis=-1)[: vol.shape[0], : vol.shape[1]]

        def corr(arm, protocol):
            if protocol == "shared":
                gt = acqs.mean(-1)  # reference protocol: GT includes input
                inp = gt
            else:
                gt = acqs[..., n_in:].mean(-1)
                inp = acqs[..., :n_in].mean(-1)
            gt_noise = (gt - cl).ravel()
            sp_noise = (arm(inp) - arm(cl)).ravel()
            return float(np.corrcoef(gt_noise, sp_noise)[0, 1])

        # (a) the round-2 confound mechanism reproduces on 3-D data under
        # the anti-aliased-downscale geometry: shared-GT spline error
        # carries the GT's own noise (measured 0.25 at this seed)
        assert corr(spline_aa, "shared") > 0.2
        # (b) the cohort protocol's ::2-decimation geometry transmits far
        # less GT noise even in the SHARED protocol (0.085 here): the 2x
        # cubic upsample's output grid is not sample-aligned, so the spline
        # does not reproduce GT noise pointwise. Round 4's spline-wins
        # cohort result therefore cannot be the round-2 confound.
        assert corr(spline_dec, "shared") < 0.15
        # (c) under the committed split protocol the correlation is gone
        # entirely (0.007 here). NOTE: correlations are seed-pinned — the
        # sigma=0.4 sub-pixel motion makes split-mode correlations
        # realization-dependent (both halves' blur residuals are
        # directional-derivative fields whose alignment is random), which
        # is why the thresholds above are not tighter.
        assert abs(corr(spline_dec, "split")) < 0.05


class TestHybridFromB0Extensions:
    def test_return_clean_is_the_noise_free_signal(self, rng):
        b0 = _smooth_b0(rng, H=32, W=32, S=3)
        full, clean = synthetic.hybrid_from_b0(
            b0, acq_counts=(1, 64, 2, 2), seed=5, return_clean=True,
            dedup_te=True, noise_sigma_frac=0.005)
        # clean[0][0] at TE0 is exactly b0 (no diffusion decay at b=0)
        np.testing.assert_allclose(clean[0][0], b0, rtol=1e-6)
        # the many-acquisition mean approaches clean as noise -> 0 (shift
        # blur and the Rician floor bound the residual)
        m = full[1][0].mean(-1)
        rel = np.abs(m - clean[1][0]).mean() / clean[1][0].mean()
        assert rel < 0.05, rel
        # clean decays monotonically with b at every voxel
        assert np.all(clean[2][0] <= clean[1][0] + 1e-6)
        assert np.all(clean[3][0] <= clean[2][0] + 1e-6)

    def test_dedup_te_aliases_te_entries(self, rng):
        b0 = _smooth_b0(rng, H=16, W=16, S=2)
        full, clean = synthetic.hybrid_from_b0(
            b0, acq_counts=(1, 2, 2, 2), seed=1, return_clean=True,
            dedup_te=True)
        for b in range(4):
            for te in range(1, 4):
                assert full[b][te] is full[b][0]
                assert clean[b][te] is clean[b][0]

    def test_default_path_signature_unchanged(self, rng):
        b0 = _smooth_b0(rng, H=16, W=16, S=2)
        out = synthetic.hybrid_from_b0(b0, acq_counts=(1, 2, 2, 2), seed=1)
        assert isinstance(out, list) and len(out) == 4
        assert out[1][0].shape == (16, 16, 2, 2)
        # distinct TE entries by default
        assert out[1][1] is not out[1][0]


class TestRicianBiasMechanism:
    """The held-out-acquisition-mean GT converges to E|S+n| (the Rician
    expectation), NOT to the clean signal — the systematic that makes the
    split-acquisition protocol reward bias-faithful interpolation
    (results/round5_quality/rician_bias.json pins this on real-b0 volumes;
    this test pins it cheaply on synthetic data so the mechanism can never
    silently regress)."""

    def test_heldout_mean_converges_to_rician_expectation(self, rng):
        from scipy import special

        from scripts.round5_rician_bias import analytic_rician_mean

        b0 = _smooth_b0(rng, H=40, W=40, S=3) * 100.0
        # real volumes have near-zero background, where the Rician bias is
        # largest (E|n| = sigma*sqrt(pi/2) at S=0) — give the toy some
        b0[:, :10] *= 0.02
        A = 64
        full, clean = synthetic.hybrid_from_b0(
            b0, acq_counts=(1, A, 2, 2), seed=7, return_clean=True,
            dedup_te=True, shift_sigma=0.0, noise_sigma_frac=0.05)
        sigma = 0.05 * float(np.percentile(b0, 99.5))
        resid = full[1][0].mean(-1) - clean[1][0]
        bias = analytic_rician_mean(clean[1][0], sigma) - clean[1][0]
        # the residual IS the analytic bias field (not zero-mean noise)
        c = float(np.corrcoef(resid.ravel(), bias.ravel())[0, 1])
        assert c > 0.9, c
        assert abs(resid.mean() - bias.mean()) < 0.05 * bias.mean()
        # and it is positive and concentrated at low signal
        lo = clean[1][0] < np.percentile(clean[1][0], 20)
        hi = clean[1][0] > np.percentile(clean[1][0], 80)
        assert resid[lo].mean() > 3 * resid[hi].mean()

    def test_zero_motion_keeps_rng_stream(self, rng):
        """shift_sigma=0.0 must change ONLY the motion: the Rician noise
        draws stay identical (the causal arm's contract)."""
        b0 = _smooth_b0(rng, H=16, W=16, S=2)
        a = synthetic.hybrid_from_b0(b0, acq_counts=(1, 2, 2, 2), seed=3,
                                     dedup_te=True, shift_sigma=0.4)
        b = synthetic.hybrid_from_b0(b0, acq_counts=(1, 2, 2, 2), seed=3,
                                     dedup_te=True, shift_sigma=0.0)
        # b=0 entry has no shifts at all -> bit-identical
        np.testing.assert_array_equal(a[0][0], b[0][0])
        # shifted entries differ (motion on vs off) but only modestly:
        # same noise realization, different geometry
        d = np.abs(a[1][0] - b[1][0]).mean() / b[1][0].mean()
        assert 0 < d < 0.2, d
