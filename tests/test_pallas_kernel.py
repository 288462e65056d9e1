"""Pallas fused SIREN kernel: parity with the flax reference (interpret mode
on CPU; same kernels compile for TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mri_super_resolution_tpu.core.coords import mgrid
from mri_super_resolution_tpu.models import Siren, SirenERD
from mri_super_resolution_tpu.ops.pallas.siren_kernel import (
    acts_for_model,
    make_fused_apply,
    make_fused_value_and_grad,
    siren_forward,
    siren_fused,
    siren_loss_grads,
    weights_from_flax,
    weights_to_flax,
)


@pytest.fixture(scope="module")
def setup():
    model = Siren(hidden_features=128, hidden_layers=2)
    coords = mgrid((20, 20))  # 400 rows: exercises padding (not tile-aligned)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(400, 128)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    return model, params, x


class TestForwardParity:
    def test_matches_flax(self, setup):
        model, params, x = setup
        ref = model.apply(params, x)
        weights = weights_from_flax(params)
        out = siren_forward(x, weights)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_roundtrip_weights(self, setup):
        model, params, x = setup
        weights = weights_from_flax(params)
        back = weights_to_flax(weights, params)
        ref = model.apply(back, x)
        out = siren_forward(x, weights)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


class TestVJPParity:
    def test_gradients_match(self, setup):
        model, params, x = setup
        weights = tuple(weights_from_flax(params))
        target = jnp.asarray(
            np.random.default_rng(1).normal(size=(400, 1)).astype(np.float32)
        )

        def loss_kernel(ws):
            return jnp.mean((siren_fused(x, ws, 30.0) - target) ** 2)

        def loss_ref(ws):
            p = weights_to_flax(list(ws), params)
            return jnp.mean((model.apply(p, x) - target) ** 2)

        g_kernel = jax.grad(loss_kernel)(weights)
        g_ref = jax.grad(loss_ref)(weights)
        for gk, gr in zip(g_kernel, g_ref):
            np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=5e-4)

    def test_input_gradient(self, setup):
        model, params, x = setup
        weights = tuple(weights_from_flax(params))

        def f_kernel(xx):
            return jnp.sum(siren_fused(xx, weights, 30.0))

        def f_ref(xx):
            return jnp.sum(model.apply(params, xx))

        gx_k = jax.grad(f_kernel)(x)
        gx_r = jax.grad(f_ref)(x)
        np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r), atol=5e-3)


class TestLossGradsOnePass:
    def test_matches_value_and_grad(self, setup):
        model, params, x = setup
        target = jnp.asarray(
            np.random.default_rng(1).normal(size=(400, 1)).astype(np.float32)
        )
        vag = make_fused_value_and_grad(model)
        loss_k, grads_k = vag(params, x, target)

        def loss_ref(p):
            return jnp.mean((model.apply(p, x) - target) ** 2)

        loss_r, grads_r = jax.value_and_grad(loss_ref)(params)
        np.testing.assert_allclose(float(loss_k), float(loss_r), rtol=1e-4)
        for gk, gr in zip(jax.tree.leaves(grads_k), jax.tree.leaves(grads_r)):
            np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=5e-4)

    def test_padding_masked(self, setup):
        """Rows beyond P must not leak into the loss or grads: P=400 is not a
        multiple of any kernel tile, so comparing against the pure-XLA answer
        already exercises the mask; also check a tiny P explicitly."""
        model, params, _ = setup
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(13, 128)).astype(np.float32))
        target = jnp.asarray(rng.normal(size=(13, 1)).astype(np.float32))
        weights = tuple(weights_from_flax(params))
        loss_k, _ = siren_loss_grads(x, weights, target)
        loss_r = jnp.mean((model.apply(params, x) - target) ** 2)
        np.testing.assert_allclose(float(loss_k), float(loss_r), rtol=1e-4)

    def test_prepadded_n_rows_matches_unpadded(self, setup):
        """Pre-padding x/target outside the loop (pad_rows_to + n_rows) must
        reproduce the unpadded call exactly — loss normalisation and gradient
        masking both keyed on the REAL row count."""
        from mri_super_resolution_tpu.ops.pallas.siren_kernel import pad_rows_to

        model, params, x = setup
        rng = np.random.default_rng(3)
        target = jnp.asarray(rng.normal(size=(x.shape[0], 1)).astype(np.float32))
        weights = tuple(weights_from_flax(params))
        tile = 384
        loss_a, grads_a = siren_loss_grads(x, weights, target, tile=tile)
        xp, tp = pad_rows_to(x, tile), pad_rows_to(target, tile)
        assert xp.shape[0] % tile == 0 and xp.shape[0] > x.shape[0]
        loss_b, grads_b = siren_loss_grads(
            xp, weights, tp, tile=tile, n_rows=x.shape[0]
        )
        np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
        for ga, gb in zip(grads_a, grads_b):
            np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-6)


class TestSirenERDKernel:
    @pytest.fixture(scope="class")
    def erd_setup(self):
        model = SirenERD(hidden_features=128, hidden_layers=2, perturb=True)
        x = jnp.asarray(
            np.random.default_rng(3).uniform(-1, 1, size=(300, 2)).astype(np.float32)
        )
        params = model.init(jax.random.key(1), x, 0.0, 0.0)
        return model, params, x

    def test_acts_pattern(self, erd_setup):
        model, _, _ = erd_setup
        assert acts_for_model(model) == ("sine", "sine", "sine", "relu", "relu")

    def test_fused_apply_matches_flax(self, erd_setup):
        model, params, x = erd_setup
        apply = make_fused_apply(model)
        for sample, eps in ((0.0, 0.0), (3.0, 1.0 / 128.0)):
            ref = model.apply(params, x, sample=sample, eps=eps)
            out = apply(params, x, sample=sample, eps=eps)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=2e-4,
                err_msg=f"sample={sample} eps={eps}",
            )

    def test_fused_apply_distinct_omegas(self):
        """first_omega_0 != hidden_omega_0 rides the fold-omega path — the
        kernel forward must still match flax (previously it silently used
        the hidden omega for the first layer)."""
        from mri_super_resolution_tpu.models import Siren

        model = Siren(hidden_features=32, hidden_layers=2,
                      first_omega_0=30.0, hidden_omega_0=1.0)
        x = jnp.asarray(
            np.random.default_rng(5).uniform(-1, 1, size=(64, 2)).astype(np.float32))
        params = model.init(jax.random.key(2), x)
        out = make_fused_apply(model)(params, x)
        ref = model.apply(params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_fused_apply_gradients(self, erd_setup):
        """Weighted-MSE grads through the kernel apply (the phase-2 loss shape)
        must match flax — including the perturb branch via the kernel's dx."""
        model, params, x = erd_setup
        target = jnp.asarray(
            np.random.default_rng(4).uniform(0, 1, size=(300, 1)).astype(np.float32)
        )
        apply = make_fused_apply(model)

        def loss_k(p):
            return jnp.mean((apply(p, x, sample=2.0, eps=1.0 / 64.0) - target) ** 2)

        def loss_r(p):
            return jnp.mean((model.apply(p, x, sample=2.0, eps=1.0 / 64.0) - target) ** 2)

        gk = jax.grad(loss_k)(params)
        gr = jax.grad(loss_r)(params)
        flat_k = jax.tree_util.tree_leaves_with_path(gk)
        flat_r = {jax.tree_util.keystr(kp): v for kp, v in jax.tree_util.tree_leaves_with_path(gr)}
        for kp, vk in flat_k:
            vr = flat_r[jax.tree_util.keystr(kp)]
            np.testing.assert_allclose(
                np.asarray(vk), np.asarray(vr), atol=5e-4, err_msg=jax.tree_util.keystr(kp)
            )

    @pytest.mark.parametrize("hidden", [64, 128])
    def test_weighted_vag_matches_autodiff(self, hidden):
        """Acceptance-weighted one-pass gradient == autodiff of
        losses.weighted_mse, including the narrow-width (64) padding path
        used by the master.py 2-D config."""
        from mri_super_resolution_tpu.fit.losses import weighted_mse
        from mri_super_resolution_tpu.ops.pallas.siren_kernel import (
            make_fused_weighted_value_and_grad)

        rng = np.random.default_rng(11)
        coords = mgrid((20, 20))
        model = Siren(hidden_features=hidden, hidden_layers=3)
        params = model.init(jax.random.key(2), coords[:4])
        target = jnp.asarray(rng.normal(size=(400, 1)).astype(np.float32))
        w = jnp.asarray((rng.uniform(size=(400, 1)) > 0.3).astype(np.float32))

        vag = make_fused_weighted_value_and_grad(model)
        loss_k, grads_k = vag(params, coords, target, w)

        def loss_ref(p):
            return weighted_mse(model.apply(p, coords), target, w)

        loss_r, grads_r = jax.value_and_grad(loss_ref)(params)
        np.testing.assert_allclose(float(loss_k), float(loss_r), rtol=1e-4)
        for gk, gr in zip(jax.tree.leaves(grads_k), jax.tree.leaves(grads_r)):
            np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=5e-4)

    def test_fit_ensemble_kernel_route_matches(self):
        """fit_ensemble with the weighted one-pass kernel reproduces the
        autodiff path (ensemble predictions + losses) at the 64-wide
        master.py config, vmapped over directions like the pipeline."""
        import optax
        from mri_super_resolution_tpu.fit.engine import fit_ensemble
        from mri_super_resolution_tpu.ops.pallas.siren_kernel import (
            make_fused_weighted_value_and_grad)

        rng = np.random.default_rng(12)
        coords = mgrid((12, 12))
        coords_s = mgrid((24, 24))
        D, A, P = 2, 3, coords.shape[0]
        model = Siren(hidden_features=64, hidden_layers=2)
        keys = jax.random.split(jax.random.key(3), D)
        params_stack = jax.vmap(lambda k: model.init(k, coords[:4]))(keys)
        pixels = jnp.asarray(rng.normal(size=(D, A, P, 1)).astype(np.float32))
        weights = jnp.asarray(
            (rng.uniform(size=(D, A, P, 1)) > 0.2).astype(np.float32)
        )
        valid = jnp.asarray([[True, True, False], [True, True, True]])
        tx = optax.adam(1e-4)
        wvag = make_fused_weighted_value_and_grad(model)

        def run(wv):
            def one(p, pix, w, ok):
                return fit_ensemble(
                    model.apply, tx, p, coords, pix, w, coords, coords_s,
                    total_steps=8, seg=3, valid=ok,
                    weighted_value_and_grad_fn=wv,
                )
            return jax.vmap(one)(
                jax.tree.map(jnp.copy, params_stack), pixels, weights, valid
            )

        res_a = run(None)
        res_b = run(wvag)
        # tolerance = the kernel's bf16 activation-stash gradient error class
        # accumulated over the 8 steps (documented in _recompute_forward)
        np.testing.assert_allclose(
            np.asarray(res_a.losses), np.asarray(res_b.losses), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(res_a.pred_1x), np.asarray(res_b.pred_1x), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(res_a.pred_scale), np.asarray(res_b.pred_scale), atol=2e-3
        )

    def test_absmax_variant_matches(self, erd_setup):
        """with_out_absmax must add the collapse signal (max|out| over real
        rows) without changing loss or grads."""
        from mri_super_resolution_tpu.ops.pallas.siren_kernel import (
            make_fused_value_grad_absmax)

        model, params, x = erd_setup
        target = jnp.asarray(
            np.random.default_rng(7).uniform(0, 1, size=(x.shape[0], 1)).astype(np.float32)
        )
        loss_a, grads_a = make_fused_value_and_grad(model)(params, x, target)
        loss_b, absmax, grads_b = make_fused_value_grad_absmax(model)(params, x, target)
        np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
        out = model.apply(params, x, sample=0.0, eps=0.0)
        np.testing.assert_allclose(
            float(absmax), float(jnp.max(jnp.abs(out))), rtol=1e-5
        )
        for ga, gb in zip(jax.tree.leaves(grads_a), jax.tree.leaves(grads_b)):
            np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-6)

    def test_fit_until_kernel_route_converges(self, erd_setup):
        """fit_until with the one-pass absmax vag reaches the loss threshold
        (the ERD phase-1 path on TPU)."""
        import optax
        from mri_super_resolution_tpu.core.coords import mgrid
        from mri_super_resolution_tpu.fit.engine import fit_until
        from mri_super_resolution_tpu.ops.pallas.siren_kernel import (
            make_fused_value_grad_absmax)

        model, params, _ = erd_setup
        coords = mgrid((16, 16))
        target = jnp.full((coords.shape[0], 1), 0.25, jnp.float32)
        vag = make_fused_value_grad_absmax(model)
        apply_plain = lambda p, c: model.apply(p, c, sample=0.0, eps=0.0)
        init_fn = lambda k: model.init(k, coords, 0.0, 0.0)
        p, steps, loss = fit_until(
            apply_plain, optax.adam(1e-4), init_fn, jax.random.key(0),
            coords, target, loss_threshold=1e-3, max_steps=3000,
            value_grad_absmax_fn=vag,
        )
        assert float(loss) < 1e-3
        assert int(steps) < 3000

    def test_one_pass_grads_zero_perturb(self, erd_setup):
        model, params, x = erd_setup
        target = jnp.asarray(
            np.random.default_rng(5).uniform(0, 1, size=(300, 1)).astype(np.float32)
        )
        vag = make_fused_value_and_grad(model)
        loss_k, grads_k = vag(params, x, target)

        def loss_ref(p):
            return jnp.mean((model.apply(p, x, sample=0.0, eps=0.0) - target) ** 2)

        loss_r, grads_r = jax.value_and_grad(loss_ref)(params)
        np.testing.assert_allclose(float(loss_k), float(loss_r), rtol=1e-4)
        # trunk grads match; perturb grads are zero in BOTH (eps=0 kills them)
        for (kp, gk), gr in zip(
            jax.tree_util.tree_leaves_with_path(grads_k), jax.tree.leaves(grads_r)
        ):
            np.testing.assert_allclose(
                np.asarray(gk), np.asarray(gr), atol=5e-4,
                err_msg=jax.tree_util.keystr(kp),
            )


class TestFastSincos:
    def test_error_bounds(self):
        """Degree rationale at _SIN_C/_COS_C: sin stays at forward-value
        accuracy (~6e-7); cos only needs to beat the bf16 factor quantum
        (~3.9e-3), budgeted at 4.1e-5."""
        from mri_super_resolution_tpu.ops.pallas.siren_kernel import _fast_sincos

        z = jnp.asarray(np.linspace(-100, 100, 200001).astype(np.float32))
        s, c = _fast_sincos(z)
        assert float(jnp.max(jnp.abs(s - jnp.sin(z)))) < 1e-6
        assert float(jnp.max(jnp.abs(c - jnp.cos(z)))) < 6e-5


class TestRowSplit:
    def test_split_matches_unsplit(self):
        """row_split sub-blocks must reproduce the single-chain kernel
        (measured slower on the real chip — results/round3_flagship/
        split_ab.json — so the default stays 1, but the option must stay
        correct)."""
        rng = np.random.default_rng(5)
        model = Siren(hidden_features=128, hidden_layers=2)
        x = jnp.asarray(rng.normal(size=(70, 128)).astype(np.float32))
        target = jnp.asarray(rng.normal(size=(70, 1)).astype(np.float32))
        params = model.init(jax.random.key(0), x[:4])
        weights = tuple(weights_from_flax(params))
        l1, d1 = siren_loss_grads(x, weights, target, tile=32, n_rows=64,
                                  row_split=1)
        l2, d2 = siren_loss_grads(x, weights, target, tile=32, n_rows=64,
                                  row_split=2)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        for a, b in zip(d1, d2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-6)
