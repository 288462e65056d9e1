"""GridINR: interpolation correctness and fast convergence vs SIREN."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from mri_super_resolution_tpu.core.coords import mgrid
from mri_super_resolution_tpu.fit.engine import fit_simple
from mri_super_resolution_tpu.models.grid_inr import GridINR, GridINR2D, _trilinear_gather
from mri_super_resolution_tpu.models import Siren


class TestTrilinear:
    def test_exact_at_corners(self, rng):
        grid = jnp.asarray(rng.normal(size=(4, 4, 4, 2)).astype(np.float32))
        coords = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
        out = _trilinear_gather(grid, coords)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(grid[0, 0, 0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(grid[3, 3, 3]), atol=1e-5)

    def test_linear_in_between(self, rng):
        grid = jnp.asarray(rng.normal(size=(2, 2, 2, 1)).astype(np.float32))
        mid = _trilinear_gather(grid, jnp.asarray([[0.5, 0.5, 0.5]]))
        np.testing.assert_allclose(float(mid[0, 0]), float(grid.mean()), atol=1e-6)


class TestGridINR:
    def test_forward_shapes(self, rng):
        model = GridINR(num_levels=2, base_resolution=4)
        coords = jnp.asarray(rng.uniform(-1, 1, size=(50, 4)).astype(np.float32))
        params = model.init(jax.random.key(0), coords)
        out = model.apply(params, coords)
        assert out.shape == (50, 1)

    def test_converges_much_faster_than_siren(self):
        """The point of the grid encoding: far fewer steps to fit."""
        side = 24
        y, x = np.mgrid[0:side, 0:side] / side
        img = np.asarray(0.5 + 0.4 * np.sin(9 * x) * np.cos(7 * y), dtype=np.float32)
        coords = mgrid((side, side))
        target = jnp.asarray(img.reshape(-1, 1))

        grid_model = GridINR2D(num_levels=3, base_resolution=4, hidden=32)
        gp = grid_model.init(jax.random.key(0), coords)
        g_res = fit_simple(grid_model.apply, optax.adam(5e-3), gp, coords, target, 150)

        siren = Siren(hidden_features=32, hidden_layers=2)
        sp = siren.init(jax.random.key(0), coords)
        s_res = fit_simple(siren.apply, optax.adam(3e-4), sp, coords, target, 150)

        assert float(g_res.losses[-1]) < float(s_res.losses[-1])
        assert float(g_res.losses[-1]) < 1e-3

    def test_z_divisor_controls_z_resolution(self, rng):
        """z grid resolution = max(R // z_divisor, 2); z_divisor=1 gives full
        per-level z resolution (required on ROI grids where z is the largest
        axis — see SupperresDWIConfig.grid_z_divisor) and the tensor path
        agrees with the gather path at any divisor."""
        from mri_super_resolution_tpu.core.coords import mgrid
        from mri_super_resolution_tpu.models.grid_inr import grid_inr_tensor_apply

        coords = jnp.asarray(rng.uniform(-1, 1, size=(8, 4)).astype(np.float32))
        for div, want_z in ((4, [2, 2]), (1, [4, 8])):
            model = GridINR(num_levels=2, base_resolution=4, z_divisor=div)
            params = model.init(jax.random.key(0), coords)
            zs = [params["params"][f"grid_{l}"].shape[2] for l in range(2)]
            assert zs == want_z, (div, zs)
            shape = (5, 5, 6, 4)
            dense = grid_inr_tensor_apply(model, params, shape)
            gather = model.apply(params, mgrid(shape))
            np.testing.assert_allclose(
                np.asarray(dense), np.asarray(gather), atol=2e-5)

    def test_b_embedding_distinguishes_b(self, rng):
        model = GridINR(num_levels=1, base_resolution=4, num_b=4)
        c0 = jnp.asarray([[0.1, 0.2, 0.0, -1.0]], jnp.float32)  # b slot 0
        c3 = jnp.asarray([[0.1, 0.2, 0.0, 1.0]], jnp.float32)  # b slot 3
        params = model.init(jax.random.key(1), c0)
        o0 = float(model.apply(params, c0)[0, 0])
        o3 = float(model.apply(params, c3)[0, 0])
        assert o0 != o3


class TestTensorApply:
    def test_matches_pointwise(self, rng):
        import jax
        from mri_super_resolution_tpu.core.coords import mgrid
        from mri_super_resolution_tpu.models.grid_inr import (
            GridINR,
            grid_inr_tensor_apply,
            make_tensor_apply,
        )

        shape = (11, 9, 7, 4)
        model = GridINR(num_levels=3, base_resolution=6, hidden=32)
        coords = mgrid(shape)
        params = model.init(jax.random.key(0), coords[:8])
        ref = np.asarray(model.apply(params, coords))
        out = np.asarray(grid_inr_tensor_apply(model, params, shape))
        np.testing.assert_allclose(out, ref, atol=1e-6)
        out2 = np.asarray(make_tensor_apply(model, shape)(params, coords))
        np.testing.assert_allclose(out2, ref, atol=1e-6)

    def test_gradients_flow_to_grids(self, rng):
        import jax
        import jax.numpy as jnp
        from mri_super_resolution_tpu.core.coords import mgrid
        from mri_super_resolution_tpu.models.grid_inr import GridINR, grid_inr_tensor_apply

        shape = (8, 8, 4, 4)
        model = GridINR(num_levels=2, base_resolution=4, hidden=16)
        params = model.init(jax.random.key(0), mgrid(shape)[:8])

        def loss(p):
            return jnp.mean(grid_inr_tensor_apply(model, p, shape) ** 2)

        g = jax.grad(loss)(params)
        for l in range(2):
            assert float(jnp.max(jnp.abs(g["params"][f"grid_{l}"]))) > 0.0


class TestZBucketedFit:
    """z-bucketed fit path (grid_inr.py): one executable per slice BUCKET,
    with exact loss/grad parity vs the shape-specialized tensor program."""

    def _model_params(self, seed=0):
        model = GridINR(num_levels=2, base_resolution=4, hidden=16,
                        z_divisor=1)
        coords = mgrid((5, 5, 3, 4))
        params = model.init(jax.random.key(seed), coords[:8])
        return model, params

    def test_bucket_for(self):
        from mri_super_resolution_tpu.models.grid_inr import z_bucket_for

        assert z_bucket_for(3) == 4
        assert z_bucket_for(4) == 4
        assert z_bucket_for(5) == 8
        assert z_bucket_for(28) == 32
        assert z_bucket_for(1) == 4

    def test_loss_and_grad_parity(self, rng):
        """Masked z-padded loss == unbucketed MSE; grads match exactly."""
        from mri_super_resolution_tpu.models.grid_inr import (
            build_z_aux, make_tensor_value_and_grad,
            make_zbucket_value_and_grad, pad_target_z, z_bucket_for)

        model, params = self._model_params()
        shape = (5, 5, 3, 4)
        target = jnp.asarray(
            rng.uniform(0, 1, (np.prod(shape), 1)).astype(np.float32))

        vag_ref = make_tensor_value_and_grad(model, shape)
        loss_ref, g_ref = vag_ref(params, None, target)

        zb = z_bucket_for(shape[2])
        vag_z = make_zbucket_value_and_grad(model, shape[0], shape[1], zb,
                                            shape[3])
        z_aux = build_z_aux(model, shape[2], zb)
        t_pad = pad_target_z(target, shape, zb)
        loss_z, g_z = vag_z(params, z_aux, t_pad)

        np.testing.assert_allclose(float(loss_z), float(loss_ref), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_z)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)

    def test_shared_executable_across_slice_counts(self):
        """Two different S in one bucket hit the SAME vag identity and the
        same traced shapes — i.e. the fit program cannot re-specialize."""
        from mri_super_resolution_tpu.models.grid_inr import (
            build_z_aux, make_zbucket_value_and_grad, pad_target_z,
            z_bucket_for)

        model, params = self._model_params()
        assert z_bucket_for(5) == z_bucket_for(7) == 8
        vag5 = make_zbucket_value_and_grad(model, 5, 5, 8, 4)
        vag7 = make_zbucket_value_and_grad(model, 5, 5, 8, 4)
        assert vag5 is vag7
        aux5 = build_z_aux(model, 5, 8)
        aux7 = build_z_aux(model, 7, 8)
        assert aux5.shape == aux7.shape
        t5 = pad_target_z(jnp.ones((5 * 5 * 5 * 4, 1)), (5, 5, 5, 4), 8)
        t7 = pad_target_z(jnp.ones((5 * 5 * 7 * 4, 1)), (5, 5, 7, 4), 8)
        assert t5.shape == t7.shape

    def test_fit_simple_converges_through_bucket(self, rng):
        """End-to-end: the z-bucketed vag drives fit_simple to a lower loss
        and the fitted params evaluate sensibly on the TRUE grid."""
        from mri_super_resolution_tpu.models.grid_inr import (
            build_z_aux, infer_tensor_grid, make_zbucket_value_and_grad,
            pad_target_z, z_bucket_for)

        model, params = self._model_params()
        shape = (6, 6, 3, 4)
        coords = mgrid(shape)
        params = model.init(jax.random.key(0), coords[:8])
        img = rng.uniform(0.2, 0.8, shape).astype(np.float32)
        target = jnp.asarray(img.reshape(-1, 1))

        zb = z_bucket_for(shape[2])
        vag = make_zbucket_value_and_grad(model, *shape[:2], zb, shape[3])
        z_aux = build_z_aux(model, shape[2], zb)
        t_pad = pad_target_z(target, shape, zb)
        tx = optax.adam(5e-3)
        res = fit_simple(model.apply, tx, params, z_aux, t_pad, 200,
                         value_and_grad_fn=vag)
        assert float(res.losses[-1]) < float(res.losses[0]) * 0.5
        pred = infer_tensor_grid(model, res.params, shape)
        mse = float(jnp.mean((pred - target) ** 2))
        assert mse <= float(res.losses[-1]) * 1.2

    def test_zbucket_inference_matches_shape_keyed(self, rng):
        from mri_super_resolution_tpu.models.grid_inr import (
            infer_tensor_grid, infer_tensor_grid_zbucket)

        model, params = self._model_params()
        for shape in [(5, 5, 3, 4), (6, 6, 5, 4)]:
            a = np.asarray(infer_tensor_grid(model, params, shape,
                                             clamp_min=0.0))
            b = infer_tensor_grid_zbucket(model, params, shape,
                                          clamp_min=0.0)
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
