"""RAMS network + shift-tolerant metric + TTA tests."""
import numpy as np
import jax
import jax.numpy as jnp

from mri_super_resolution_tpu.models.rams import RAMS, depth_to_space, WNConv, normalize, denormalize
from mri_super_resolution_tpu.ops.shift_metrics import (
    shift_l1_loss,
    shift_psnr,
    shift_ssim,
    ssim_tf,
)
from mri_super_resolution_tpu.ops.tta import predict_tensor, geometric_ensemble_predict


SMALL = dict(scale=3, filters=8, kernel_size=3, channels=9, r=4, N=2)


class TestDepthToSpace:
    def test_matches_block_layout(self):
        # depth_to_space must equal TF semantics: channel c = by*block + bx
        x = jnp.arange(1 * 2 * 2 * 9).reshape(1, 2, 2, 9).astype(jnp.float32)
        out = depth_to_space(x, 3)
        assert out.shape == (1, 6, 6, 1)
        # top-left 3x3 block comes from pixel (0,0)'s 9 channels, row-major
        np.testing.assert_array_equal(
            np.asarray(out)[0, :3, :3, 0], np.arange(9).reshape(3, 3)
        )


class TestWNConv:
    def test_effective_kernel_is_normalized(self):
        conv = WNConv(4, (3, 3))
        x = jnp.ones((1, 8, 8, 2))
        params = conv.init(jax.random.key(0), x)
        v = params["params"]["v"]
        g = params["params"]["g"]
        np.testing.assert_allclose(np.asarray(g), 1.0)
        out = conv.apply(params, x)
        assert out.shape == (1, 8, 8, 4)

    def test_valid_padding_shrinks(self):
        conv = WNConv(2, (3, 3, 3), padding="VALID")
        x = jnp.ones((1, 8, 8, 5, 1))
        params = conv.init(jax.random.key(0), x)
        assert conv.apply(params, x).shape == (1, 6, 6, 3, 2)


class TestRAMS:
    def test_output_shape_3x(self):
        model = RAMS(**SMALL)
        x = jnp.asarray(np.random.default_rng(0).uniform(7000, 8000, (1, 16, 16, 9)), dtype=jnp.float32)
        params = model.init(jax.random.key(0), x)
        out = model.apply(params, x)
        assert out.shape == (1, 48, 48, 1)
        assert np.isfinite(np.asarray(out)).all()

    def test_normalize_roundtrip(self):
        x = jnp.asarray(7433.6436)
        np.testing.assert_allclose(float(normalize(x)), 0.0, atol=1e-4)
        np.testing.assert_allclose(float(denormalize(normalize(x))), 7433.6436, rtol=1e-6)

    def test_fold_weight_norm_exact(self):
        """Folded params drop into the same apply and reproduce the output.

        fold_weight_norm sets v <- w_eff, g <- ||w_eff||, so the serving
        path's per-call norm degenerates to an exact no-op rescale."""
        from mri_super_resolution_tpu.models.rams import fold_weight_norm

        model = RAMS(**SMALL)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(7000, 8000, (1, 12, 12, 9)), dtype=jnp.float32)
        params = model.init(jax.random.key(0), x)
        folded = fold_weight_norm(params)
        # structure unchanged
        assert jax.tree_util.tree_structure(folded) == jax.tree_util.tree_structure(
            params if isinstance(params, dict) else params.unfreeze()
        )
        ref = np.asarray(model.apply(params, x))
        out = np.asarray(model.apply(folded, x))
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-2)

    def test_batch_independence(self):
        model = RAMS(**SMALL)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(7000, 8000, (2, 12, 12, 9)), dtype=jnp.float32)
        params = model.init(jax.random.key(0), x)
        both = model.apply(params, x)
        single = model.apply(params, x[:1])
        np.testing.assert_allclose(np.asarray(both[:1]), np.asarray(single), atol=2e-2)


class TestShiftMetrics:
    def _data(self, rng, B=2, size=32):
        hr = rng.uniform(0, 60000, (B, size, size, 1)).astype(np.float32)
        mask = np.ones_like(hr)
        return jnp.asarray(hr), jnp.asarray(mask)

    def test_perfect_prediction_zero_loss(self, rng):
        hr, mask = self._data(rng)
        loss = shift_l1_loss(hr, hr, mask, hr_size=32)
        np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-2)

    def test_shifted_prediction_recovered(self, rng):
        """A prediction shifted by <=3 px must incur ~zero loss (the point of
        the shift tolerance)."""
        hr, mask = self._data(rng, B=1)
        shifted = jnp.roll(hr, (2, 1), axis=(1, 2))
        loss_tolerant = float(shift_l1_loss(hr, shifted, mask, hr_size=32)[0])
        direct = float(jnp.abs(hr - shifted).mean())
        assert loss_tolerant < 0.05 * direct

    def test_brightness_bias_corrected(self, rng):
        hr, mask = self._data(rng, B=1)
        biased = hr + 500.0
        loss = float(shift_l1_loss(hr, biased, mask, hr_size=32)[0])
        assert loss < 1.0

    def test_weight_norm_custom_vjp_matches_autodiff(self, rng):
        """weight_norm_kernel's closed-form backward vs XLA autodiff of the
        plain reparametrisation: values and both gradients must agree."""
        from mri_super_resolution_tpu.models.rams import weight_norm_kernel

        v = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 8)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
        co = jnp.asarray(rng.normal(size=v.shape).astype(np.float32))

        def ref(v, g):
            axes = tuple(range(v.ndim - 1))
            n = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True) + 1e-12)
            return g * v / n

        np.testing.assert_allclose(
            np.asarray(weight_norm_kernel(v, g)), np.asarray(ref(v, g)),
            atol=1e-6)
        g1 = jax.grad(lambda v, g: jnp.sum(weight_norm_kernel(v, g) * co),
                      (0, 1))(v, g)
        g2 = jax.grad(lambda v, g: jnp.sum(ref(v, g) * co), (0, 1))(v, g)
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                                   atol=1e-5)

    def test_nthwc_layout_equivalent(self, rng):
        """The (B,T,H,W,C) layout computes the same function as the
        transcription layout once 3-D conv kernels' spatial axes are
        permuted (H,W,T)->(T,H,W)."""
        import jax.tree_util as jtu

        from mri_super_resolution_tpu.models.rams import RAMS

        x = jnp.asarray(
            np.random.default_rng(1).uniform(7000, 8000, (2, 12, 12, 9))
            .astype(np.float32))
        m1 = RAMS(N=2)
        m2 = RAMS(N=2, layout="nthwc")
        p = m1.init(jax.random.key(0), x)

        def conv_perm(path, leaf):
            name = path[-1].key if hasattr(path[-1], "key") else ""
            if name == "v" and leaf.ndim == 5:
                return jnp.transpose(leaf, (2, 0, 1, 3, 4))
            return leaf

        p2 = {"params": jtu.tree_map_with_path(conv_perm, p["params"])}
        y1, y2 = m1.apply(p, x), m2.apply(p2, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   atol=2e-3 * float(jnp.abs(y1).max()) / 1e3)

    def test_argmin_shift_grad_matches_full_min(self, rng):
        """The argmin-shift fast path (search under stop_gradient, gradient
        through one dynamic_slice) must match the naive min-over-49-branches
        loss and gradient exactly."""
        from mri_super_resolution_tpu.ops.shift_metrics import BORDER

        hr, mask = self._data(rng, B=2)
        mask = jnp.asarray(
            (np.random.default_rng(3).random(mask.shape) > 0.1).astype(np.float32))
        pred = jnp.asarray(
            np.random.default_rng(4).uniform(0, 60000, hr.shape).astype(np.float32))

        def naive(y_true, y_pred, y_mask, hr_size=32):
            crop = hr_size - 2 * BORDER
            p = y_pred[:, BORDER:hr_size - BORDER, BORDER:hr_size - BORDER]
            ls = []
            for i in range(2 * BORDER + 1):
                for j in range(2 * BORDER + 1):
                    lab = y_true[:, i:i + crop, j:j + crop]
                    mk = y_mask[:, i:i + crop, j:j + crop]
                    tot = jnp.sum(mk, axis=(1, 2), keepdims=True)
                    b = jnp.sum((lab - p) * mk, axis=(1, 2), keepdims=True) / tot
                    cor = (p * mk + b) * mk
                    l1 = jnp.sum(jnp.abs(lab * mk - cor), axis=(1, 2)) / tot[..., 0, 0]
                    ls.append(l1.mean(-1))
            return jnp.min(jnp.stack(ls), axis=0)

        v_fast = shift_l1_loss(hr, pred, mask, hr_size=32)
        v_ref = naive(hr, pred, mask)
        np.testing.assert_allclose(np.asarray(v_fast), np.asarray(v_ref),
                                   rtol=1e-6)
        g_fast = jax.grad(lambda p: shift_l1_loss(hr, p, mask, 32).mean())(pred)
        g_ref = jax.grad(lambda p: naive(hr, p, mask).mean())(pred)
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-12)

    def test_psnr_higher_for_better_pred(self, rng):
        hr, mask = self._data(rng, B=1)
        good = hr + 100.0 * jnp.asarray(np.random.default_rng(2).normal(size=hr.shape), dtype=jnp.float32)
        bad = hr + 5000.0 * jnp.asarray(np.random.default_rng(3).normal(size=hr.shape), dtype=jnp.float32)
        assert float(shift_psnr(hr, good, mask, 32)) > float(shift_psnr(hr, bad, mask, 32))

    def test_ssim_tf_identity(self, rng):
        a = jnp.asarray(rng.uniform(0, 65535, (1, 24, 24, 1)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(ssim_tf(a, a, 65535.0)), 1.0, atol=1e-4)

    def test_shift_ssim_range(self, rng):
        hr, mask = self._data(rng, B=1)
        noisy = hr + 2000.0 * jnp.asarray(np.random.default_rng(5).normal(size=hr.shape), dtype=jnp.float32)
        s = float(shift_ssim(hr, noisy, mask, 32))
        assert -1.0 <= s <= 1.0


class TestTTA:
    def test_predict_tensor_clips_and_rounds(self):
        out = predict_tensor(lambda x: x * 1e6, jnp.ones((1, 4, 4, 9)))
        assert float(out.max()) == 2.0**16
        out2 = predict_tensor(lambda x: x * 0.5 - 100, jnp.ones((1, 4, 4, 9)))
        assert float(out2.min()) == 0.0

    def test_geometric_ensemble_identity_model(self):
        """With a transform-EQUIVARIANT model (nearest-repeat 3x upscale of
        channel 0: rot90/flip commute with block-repeat), every variant's
        un-transformed prediction equals the direct prediction, so the
        ensemble mean must match it EXACTLY — this pins the inverse-transform
        convention (rotate by 4-k then flip, prediction.py:48-52); a wrong
        inverse order/sign averages misaligned images and fails."""

        def fake_apply(x):
            return jnp.repeat(jnp.repeat(x[..., :1], 3, 1), 3, 2)

        x = jnp.asarray(np.random.default_rng(0).uniform(0, 100, (1, 6, 6, 9)), dtype=jnp.float32)
        ens = geometric_ensemble_predict(fake_apply, x)
        direct = np.asarray(predict_tensor(fake_apply, x))
        np.testing.assert_allclose(ens, direct, atol=1e-5)

    def test_geometric_ensemble_batched_matches_loop(self):
        """Square inputs take the single-batched-call path; it must equal the
        per-variant loop (the non-square fallback) exactly for a
        batch-independent model."""
        from mri_super_resolution_tpu.ops.tta import _flip, _rot

        def fake_apply(x):
            up = jnp.repeat(jnp.repeat(jnp.mean(x, -1, keepdims=True), 3, 1), 3, 2)
            return up + 0.1 * jnp.flip(up, axis=1)

        x = jnp.asarray(
            np.random.default_rng(1).uniform(0, 100, (2, 6, 6, 9)),
            dtype=jnp.float32)
        batched = geometric_ensemble_predict(fake_apply, x)
        outs = []
        for f in (0, 1):
            for k in range(4):
                xa = _rot(_flip(x, bool(f)), k)
                sr = predict_tensor(fake_apply, xa)
                outs.append(_flip(_rot(sr, (4 - k) % 4), bool(f)))
        loop = np.mean([np.asarray(o) for o in outs], axis=0)
        np.testing.assert_allclose(batched, loop, atol=1e-5)
