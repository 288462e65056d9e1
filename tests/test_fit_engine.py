"""Fit-engine tests: convergence, ensemble tail, restart loop, PN alternation."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from mri_super_resolution_tpu.core.coords import mgrid, fourier_matrix, fourier_encode
from mri_super_resolution_tpu.fit.engine import (
    fit_simple,
    fit_ensemble,
    fit_until,
    fit_alternating_pn,
    infer_grid,
)
from mri_super_resolution_tpu.models import Siren, SirenERD, PerturbNet


def _target_image(side):
    y, x = np.mgrid[0:side, 0:side] / side
    return np.asarray(0.5 + 0.4 * np.sin(6 * x) * np.cos(4 * y), dtype=np.float32)


class TestFitSimple:
    def test_converges(self):
        side = 16
        img = _target_image(side)
        coords = mgrid((side, side))
        target = jnp.asarray(img.reshape(-1, 1))
        model = Siren(hidden_features=64, hidden_layers=2)
        params = model.init(jax.random.key(0), coords)
        tx = optax.adam(1e-4)
        res = fit_simple(model.apply, tx, params, coords, target, 400)
        assert float(res.losses[-1]) < float(res.losses[0])
        assert float(res.losses[-1]) < 5e-3

    def test_loss_trace_length(self):
        coords = mgrid((8, 8))
        target = jnp.zeros((64, 1))
        model = Siren(hidden_features=16, hidden_layers=1)
        params = model.init(jax.random.key(0), coords)
        res = fit_simple(model.apply, optax.adam(1e-4), params, coords, target, 17)
        assert res.losses.shape == (17,)


class TestFitEnsemble:
    def test_runs_and_averages(self):
        side, scale, A = 12, 2, 3
        rng = np.random.default_rng(0)
        img = _target_image(side)
        pixels = jnp.asarray(
            np.stack([img + 0.01 * rng.normal(size=img.shape) for _ in range(A)])
            .reshape(A, -1, 1)
            .astype(np.float32)
        )
        weights = jnp.ones_like(pixels)
        coords = mgrid((side, side))
        coords_s = mgrid((side * scale, side * scale))
        model = Siren(hidden_features=32, hidden_layers=1)
        params = model.init(jax.random.key(0), coords)
        res = fit_ensemble(
            model.apply, optax.adam(3e-4), params, coords, pixels, weights,
            coords, coords_s, total_steps=60, seg=10,
        )
        assert res.losses.shape == (60,)
        assert res.pred_1x.shape == (side * side, 1)
        assert res.pred_scale.shape == (side * scale * side * scale, 1)
        # ensemble mean should approximate the (noisy) target
        err = np.abs(np.asarray(res.pred_1x).reshape(side, side) - img).mean()
        assert err < 0.2

    def test_weights_mask_out_outlier(self):
        """An acquisition weighted 0 must not influence the fit."""
        side, A = 10, 2
        img = _target_image(side)
        good = img.reshape(-1, 1)
        bad = np.full_like(good, 10.0)  # wild outlier
        pixels = jnp.asarray(np.stack([good, bad]).astype(np.float32))
        weights = jnp.asarray(
            np.stack([np.ones_like(good), np.zeros_like(good)]).astype(np.float32)
        )
        coords = mgrid((side, side))
        model = Siren(hidden_features=32, hidden_layers=1)
        params = model.init(jax.random.key(1), coords)
        res = fit_ensemble(
            model.apply, optax.adam(3e-4), params, coords, pixels, weights,
            coords, coords, total_steps=200, seg=20,
        )
        pred = np.asarray(res.pred_1x)
        assert np.abs(pred - good).mean() < 0.15
        assert np.abs(pred - bad).mean() > 5.0


class TestFitUntil:
    def test_reaches_threshold(self):
        side = 12
        img = _target_image(side)
        coords = mgrid((side, side))
        target = jnp.asarray(img.reshape(-1, 1))
        model = SirenERD(hidden_features=48, hidden_layers=2)

        def init_fn(key):
            return model.init(key, coords)

        params, steps, loss = fit_until(
            model.apply, optax.adam(3e-4), init_fn, jax.random.key(0),
            coords, target, loss_threshold=5e-3, max_steps=3000,
        )
        assert float(loss) <= 5e-3
        assert int(steps) < 3000


class TestAlternatingPN:
    def test_runs(self):
        side, A, m = 10, 3, 16
        rng = np.random.default_rng(2)
        img = _target_image(side)
        B = fourier_matrix(jax.random.key(5), m, 2, scale=0.5)
        coords = mgrid((side, side))
        ff = fourier_encode(coords, B)
        mean_target = jnp.asarray(img.reshape(-1, 1))
        acq = jnp.asarray(
            np.stack([img + 0.02 * rng.normal(size=img.shape) for _ in range(A)])
            .reshape(A, -1, 1)
            .astype(np.float32)
        )
        inr = Siren(hidden_features=32, hidden_layers=1)
        pn = PerturbNet(hidden_features=16, dimension=2)
        inr_params = inr.init(jax.random.key(0), ff)
        pn_params = pn.init(jax.random.key(1), ff, 0, 0.0)
        res = fit_alternating_pn(
            inr.apply, pn.apply, optax.adam(1e-4), optax.adam(1e-6),
            inr_params, pn_params, ff, mean_target, acq, B,
            num_epochs=30, pn_epochs=6,
        )
        assert res.losses.shape == (30,)
        assert float(res.losses[20]) < float(res.losses[0])

    def test_opt_state_carry_matches_continuous(self):
        # two chunked calls with carried opt states == one continuous call
        # (pn_epochs=0 chunks: pure phase-1, the automate_INR mean schedule)
        side, A, m = 8, 2, 8
        rng = np.random.default_rng(3)
        img = _target_image(side)
        B = fourier_matrix(jax.random.key(5), m, 2, scale=0.5)
        ff = fourier_encode(mgrid((side, side)), B)
        mean_target = jnp.asarray(img.reshape(-1, 1))
        acq = jnp.asarray(
            np.stack([img + 0.02 * rng.normal(size=img.shape) for _ in range(A)])
            .reshape(A, -1, 1).astype(np.float32)
        )
        inr = Siren(hidden_features=16, hidden_layers=1)
        pn = PerturbNet(hidden_features=8, dimension=2)
        inr_p = inr.init(jax.random.key(0), ff)
        pn_p = pn.init(jax.random.key(1), ff, 0, 0.0)
        itx, ptx = optax.adam(1e-4), optax.adam(1e-6)

        cp = lambda t: jax.tree.map(jnp.copy, t)  # params are donated
        cont = fit_alternating_pn(
            inr.apply, pn.apply, itx, ptx,
            cp(inr_p), cp(pn_p), ff, mean_target, acq, B,
            num_epochs=20, pn_epochs=0,
        )
        first = fit_alternating_pn(
            inr.apply, pn.apply, itx, ptx,
            cp(inr_p), cp(pn_p), ff, mean_target, acq, B,
            num_epochs=10, pn_epochs=0,
        )
        second = fit_alternating_pn(
            inr.apply, pn.apply, itx, ptx,
            first.inr_params, first.pn_params, ff, mean_target, acq, B,
            num_epochs=10, pn_epochs=0,
            inr_opt_state=first.inr_opt_state, pn_opt_state=first.pn_opt_state,
        )
        for x, y in zip(jax.tree.leaves(cont.inr_params),
                        jax.tree.leaves(second.inr_params)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-6, atol=1e-7)


class TestInferGrid:
    def test_chunked_equals_unchunked(self):
        model = Siren(hidden_features=16, hidden_layers=1)
        coords = mgrid((20, 20))
        params = model.init(jax.random.key(0), coords)
        full = infer_grid(model.apply, params, coords, chunk=10_000)
        chunked = infer_grid(model.apply, params, coords, chunk=64)
        np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), atol=1e-6)

    def test_clamp(self):
        model = Siren(hidden_features=16, hidden_layers=1)
        coords = mgrid((8, 8))
        params = model.init(jax.random.key(3), coords)
        out = infer_grid(model.apply, params, coords, clamp_min=0.0)
        assert float(out.min()) >= 0.0


class TestInferDenseGrid:
    """infer_dense_grid generates its coordinate chunk on device; must match
    mgrid + infer_grid to f32 rounding and stay one executable per rank."""

    @pytest.mark.parametrize("shape", [(20, 20), (6, 5, 4, 3), (8, 8, 3, 1)])
    def test_matches_mgrid_path(self, shape):
        from mri_super_resolution_tpu.fit.engine import infer_dense_grid

        model = Siren(hidden_features=16, hidden_layers=1)
        coords = mgrid(shape)
        params = model.init(jax.random.key(0), coords)
        want = np.asarray(infer_grid(model.apply, params, coords))
        got = infer_dense_grid(model.apply, params, shape)
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_matches_with_fourier_chunked_and_clamp(self):
        from mri_super_resolution_tpu.fit.engine import infer_dense_grid

        shape = (11, 7, 5)
        model = Siren(hidden_features=16, hidden_layers=1)
        B = fourier_matrix(jax.random.key(1), 4, 3, scale=1.0)
        coords = mgrid(shape)
        params = model.init(jax.random.key(0), fourier_encode(coords, B))
        want = np.asarray(
            infer_grid(model.apply, params, coords, clamp_min=0.0, fourier_B=B)
        )
        # chunk smaller than P: multiple generated chunks, ragged tail
        got = infer_dense_grid(model.apply, params, shape, chunk=128,
                               clamp_min=0.0, fourier_B=B)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_rejects_int32_overflow_grids(self):
        """Index math on device is int32; >= 2^31-voxel grids must be
        rejected up front instead of silently wrapping (ADVICE r3)."""
        from mri_super_resolution_tpu.fit.engine import infer_dense_grid

        model = Siren(hidden_features=16, hidden_layers=1)
        params = model.init(jax.random.key(0), mgrid((4, 4)))
        with pytest.raises(ValueError, match="overflows the int32"):
            infer_dense_grid(model.apply, params, (2048, 2048, 512, 4))

    def test_one_executable_per_rank(self):
        from mri_super_resolution_tpu.fit.engine import _grid_gen_runner

        model = Siren(hidden_features=16, hidden_layers=1)
        a = _grid_gen_runner(model.apply, False, None, 3, 1024)
        b = _grid_gen_runner(model.apply, False, None, 3, 1024)
        assert a is b
        assert a is not _grid_gen_runner(model.apply, False, None, 4, 1024)


class TestCachedAdam:
    def test_identity_stable(self):
        """cached_adam must return the SAME object for equal lr — the fit
        engines take tx as a jit static arg, and a fresh optax.adam per case
        forces a retrace + executable reload per case."""
        from mri_super_resolution_tpu.fit.optim import cached_adam

        assert cached_adam(1e-4) is cached_adam(1e-4)
        assert cached_adam(1e-4) is not cached_adam(3e-4)

    def test_builders_memoised(self):
        """The Pallas vag builders are memoised by model (flax modules hash
        by field values), for the same reason."""
        from mri_super_resolution_tpu.models import Siren
        from mri_super_resolution_tpu.ops.pallas.siren_kernel import (
            make_fused_value_and_grad)

        a = make_fused_value_and_grad(Siren(hidden_features=128, hidden_layers=2))
        b = make_fused_value_and_grad(Siren(hidden_features=128, hidden_layers=2))
        assert a is b


class TestPlainApplyInit:
    def test_identity_stable_across_equal_models(self):
        """plain_apply_init must return the SAME (apply, init) pair for equal
        models: fit_until hashes its static apply_fn/init_fn by identity, so
        fresh closures per case would recompile the heaviest while_loop
        program per case."""
        from mri_super_resolution_tpu.fit.engine import plain_apply_init

        a = plain_apply_init(SirenERD(hidden_features=32, hidden_layers=1, perturb=True))
        b = plain_apply_init(SirenERD(hidden_features=32, hidden_layers=1, perturb=True))
        assert a[0] is b[0] and a[1] is b[1]
        c = plain_apply_init(SirenERD(hidden_features=64, hidden_layers=1, perturb=True))
        assert a[0] is not c[0]

    def test_matches_direct_apply(self):
        from mri_super_resolution_tpu.fit.engine import plain_apply_init

        model = SirenERD(hidden_features=16, hidden_layers=1, perturb=True)
        apply_fn, init_fn = plain_apply_init(model)
        coords = mgrid((6, 6))
        params = init_fn(jax.random.key(0))
        direct = model.apply(params, coords, sample=0.0, eps=0.0)
        np.testing.assert_allclose(
            np.asarray(apply_fn(params, coords)), np.asarray(direct), atol=0)

    def test_init_matches_model_init(self):
        from mri_super_resolution_tpu.fit.engine import plain_apply_init

        model = SirenERD(hidden_features=16, hidden_layers=1, perturb=True)
        _, init_fn = plain_apply_init(model)
        a = init_fn(jax.random.key(7))
        b = model.init(jax.random.key(7), jnp.zeros((1, 2)), 0.0, 0.0)
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
            a, b)


class TestInferGridFourierB:
    def test_fourier_b_matches_encode_closure(self):
        """The traced fourier_B path must agree numerically with the legacy
        per-call encode closure while reusing ONE executable across calls."""
        model = Siren(hidden_features=16, hidden_layers=1)
        B = fourier_matrix(jax.random.key(1), 4, 2, scale=1.0)
        coords = mgrid((10, 10))
        params = model.init(jax.random.key(0), fourier_encode(coords, B))
        legacy = infer_grid(model.apply, params, coords,
                            encode=lambda c: fourier_encode(c, B))
        cached = infer_grid(model.apply, params, coords, fourier_B=B)
        np.testing.assert_allclose(
            np.asarray(legacy), np.asarray(cached), atol=1e-6)

    def test_grid_runner_identity_stable(self):
        from mri_super_resolution_tpu.fit.engine import _grid_runner

        model = Siren(hidden_features=16, hidden_layers=1)
        a = _grid_runner(model.apply, False, None)
        b = _grid_runner(model.apply, False, None)
        assert a is b
        c = _grid_runner(model.apply, False, 0.0)
        assert a is not c


class TestRestartAdam:
    def test_identity_stable(self):
        from mri_super_resolution_tpu.fit.optim import restart_adam

        assert restart_adam(1e-4, 100) is restart_adam(1e-4, 100)
        assert restart_adam(1e-4, 100) is not restart_adam(1e-4, 50)

    def test_every_zero_means_disabled(self):
        """every <= 0 is the config 'disabled' convention: plain Adam, not
        a traced `step % 0`."""
        from mri_super_resolution_tpu.fit.optim import cached_adam, restart_adam

        assert restart_adam(1e-4, 0) is cached_adam(1e-4)
        assert restart_adam(1e-4, -1) is cached_adam(1e-4)

    def test_resets_moments(self):
        """After `every` updates the inner Adam count must restart: the
        post-reset state equals a fresh optimizer fed the same gradient."""
        from mri_super_resolution_tpu.fit.optim import restart_adam

        tx = restart_adam(1e-2, 3)
        params = {"w": jnp.ones((4,))}
        g = {"w": jnp.full((4,), 0.5)}
        state = tx.init(params)
        for _ in range(3):
            _, state = tx.update(g, state, params)
        # step 3 triggers the reset, so this update acts on zeroed moments
        upd_restart, state = tx.update(g, state, params)
        fresh = tx.init(params)
        upd_fresh, _ = tx.update(g, fresh, params)
        np.testing.assert_allclose(
            np.asarray(upd_restart["w"]), np.asarray(upd_fresh["w"]), atol=0)
        assert int(state[1]) == 4  # outer counter keeps running

    def test_matches_chunked_reinit_fit(self):
        """In-scan restarts == the host-loop protocol of re-initing tx every
        chunk (how the effect was discovered; see restart_adam docstring)."""
        from mri_super_resolution_tpu.fit.optim import restart_adam

        img = _target_image(16)
        coords = mgrid((16, 16))
        target = jnp.asarray(img.reshape(-1, 1))
        model = Siren(hidden_features=32, hidden_layers=1)
        p0 = model.init(jax.random.key(0), coords)

        res = fit_simple(model.apply, restart_adam(1e-4, 25),
                         jax.tree.map(jnp.copy, p0), coords, target, 100)
        tx = optax.adam(1e-4)
        p, chunks = jax.tree.map(jnp.copy, p0), []
        for _ in range(4):
            r = fit_simple(model.apply, tx, p, coords, target, 25)
            p = r.params
            chunks.append(np.asarray(r.losses))
        np.testing.assert_allclose(
            np.asarray(res.losses), np.concatenate(chunks), rtol=1e-3)

    def test_opt_state_carry(self):
        """fit_simple(opt_state=...) must continue, not restart, the
        optimizer: a scheduled lr keeps decaying across chunks."""
        import optax as _optax

        img = _target_image(12)
        coords = mgrid((12, 12))
        target = jnp.asarray(img.reshape(-1, 1))
        model = Siren(hidden_features=16, hidden_layers=1)
        p0 = model.init(jax.random.key(0), coords)
        tx = _optax.adam(_optax.cosine_decay_schedule(1e-3, 60, alpha=0.0))

        cont = fit_simple(model.apply, tx, jax.tree.map(jnp.copy, p0),
                          coords, target, 60)
        r1 = fit_simple(model.apply, tx, jax.tree.map(jnp.copy, p0),
                        coords, target, 30)
        r2 = fit_simple(model.apply, tx, r1.params, coords, target, 30,
                        opt_state=r1.opt_state)
        np.testing.assert_allclose(
            np.asarray(cont.losses),
            np.concatenate([np.asarray(r1.losses), np.asarray(r2.losses)]),
            rtol=1e-4)


class TestSplitScheduleParity:
    def test_bucketed_split_matches_single_program(self):
        """The round-4 grid path (z-bucketed fit_simple mean phase + a
        separate PN tail at phase2_start) must produce EXACTLY the same
        params as the original single fit_alternating_pn program with the
        unbucketed tensor vag — same update sequence, same epoch parity."""
        import optax

        from mri_super_resolution_tpu.fit.engine import fit_simple
        from mri_super_resolution_tpu.models import GridINR, PerturbNet
        from mri_super_resolution_tpu.models.grid_inr import (
            build_z_aux, make_tensor_value_and_grad,
            make_zbucket_value_and_grad, pad_target_z, z_bucket_for)

        shape = (6, 6, 3, 4)
        rng = np.random.default_rng(0)
        coords = mgrid(shape)
        target = jnp.asarray(rng.uniform(0.2, 0.8,
                                         (int(np.prod(shape)), 1)).astype(np.float32))
        acq = jnp.asarray(
            rng.uniform(0.2, 0.8, (2, int(np.prod(shape)), 1)).astype(np.float32))
        inr = GridINR(num_levels=2, base_resolution=4, hidden=16, z_divisor=1)
        pn = PerturbNet(hidden_features=8, dimension=4)
        inr_p = inr.init(jax.random.key(0), coords[:8])
        pn_p = pn.init(jax.random.key(1), coords[:8], 0, 0.0)
        itx, ptx = optax.adam(5e-3), optax.adam(1e-6)
        B = jnp.zeros((0,))
        ident = lambda x: x
        num_epochs, pn_epochs = 24, 6
        cp = lambda t: jax.tree.map(jnp.copy, t)

        # single program, unbucketed tensor vag (the pre-round-4 path)
        vag_ref = make_tensor_value_and_grad(inr, shape)
        ref = fit_alternating_pn(
            inr.apply, pn.apply, itx, ptx, cp(inr_p), cp(pn_p),
            coords, target, acq, B,
            num_epochs=num_epochs, pn_epochs=pn_epochs,
            inr_value_and_grad=vag_ref, pn_encode=ident,
        )

        # split: z-bucketed mean phase + tail at the true epoch offset
        zb = z_bucket_for(shape[2])
        vag_z = make_zbucket_value_and_grad(inr, shape[0], shape[1], zb,
                                            shape[3])
        z_aux = build_z_aux(inr, shape[2], zb)
        t_pad = pad_target_z(target, shape, zb)
        mean_steps = num_epochs - pn_epochs
        res1 = fit_simple(inr.apply, itx, cp(inr_p), z_aux, t_pad,
                          mean_steps, value_and_grad_fn=vag_z)
        res2 = fit_alternating_pn(
            inr.apply, pn.apply, itx, ptx, res1.params, cp(pn_p),
            coords, target, acq, B,
            num_epochs=pn_epochs, pn_epochs=pn_epochs,
            inr_value_and_grad=vag_z, padded_ff=z_aux, padded_target=t_pad,
            inr_opt_state=res1.opt_state, pn_encode=ident,
            phase2_start=mean_steps,
        )
        for a, b in zip(jax.tree.leaves(ref.inr_params),
                        jax.tree.leaves(res2.inr_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)
        for a, b in zip(jax.tree.leaves(ref.pn_params),
                        jax.tree.leaves(res2.pn_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)
