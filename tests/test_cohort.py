"""Cohort-parallel runner on the virtual 8-device CPU mesh."""
import numpy as np

from mri_super_resolution_tpu.data import Case
from mri_super_resolution_tpu.pipelines import cohort


def _mk_case(rng, pt) -> Case:
    H = W = 24
    S, A = 2, 3
    b0 = rng.uniform(0.5, 1.5, size=(H, W, S)).astype(np.float32)
    dwi = np.stack(
        [0.5 * b0 + 0.02 * rng.normal(size=(H, W, S)).astype(np.float32) for _ in range(A)],
        axis=-1,
    ).astype(np.float32)
    return Case(
        pt_id=f"00-0000-{pt}", b=900.0, cancer_loc=(12, 12),
        contralateral_loc=(8, 8), noise=(18, 18), cancer_slice=1,
        acquisitions=(1, 1, 1), dwi=dwi, b0=b0,
        erd=np.ones((H, W, S), np.float32), accept=np.ones(dwi.shape, np.int32),
        synthetic_dwi=True,
    )


class TestCohort:
    def test_runs_on_virtual_mesh(self, rng):
        cases = [_mk_case(rng, p) for p in ("01", "02", "03", "04")]
        res = cohort.run_cohort(
            cases, num_steps=20, hidden_features=16, hidden_layers=1,
            roi=(4, 20),
        )
        assert res.recons.shape == (4, 16, 16)
        assert res.losses.shape == (4, 20)
        # all cases trained (losses decreased)
        assert (res.losses[:, -1] < res.losses[:, 0]).all()
        assert res.voxels_per_sec > 0
        # on the 8-device CPU mesh with 4 cases, the case axis should be 4
        assert res.mesh_shape["case"] == 4

    def test_single_case_mesh(self, rng):
        cases = [_mk_case(rng, "09")]
        res = cohort.run_cohort(
            cases, num_steps=5, hidden_features=16, hidden_layers=1, roi=(4, 20)
        )
        assert res.recons.shape == (1, 16, 16)
        assert res.mesh_shape["case"] == 1


class TestShardedFitKernelRoute:
    def test_kernel_vag_matches_autodiff(self):
        """make_sharded_fit's shard_map + one-pass-kernel route must match
        the XLA autodiff route on the 8-device mesh (pmean of per-shard
        kernel losses/grads == global gradient)."""
        import jax
        import jax.numpy as jnp
        import optax

        from mri_super_resolution_tpu.core.coords import mgrid
        from mri_super_resolution_tpu.models import Siren
        from mri_super_resolution_tpu.ops.pallas.siren_kernel import (
            make_fused_value_and_grad)
        from mri_super_resolution_tpu.parallel import (
            make_mesh, make_sharded_fit, shard_batch)

        mesh = make_mesh(case=1)
        model = Siren(hidden_features=128, hidden_layers=2)
        coords = mgrid((16, 16))  # 256 rows -> 32/shard on 8 devices
        target = jnp.sin(2.0 * coords[:, :1]) * jnp.cos(coords[:, 1:2])
        params = model.init(jax.random.key(0), coords[:4])
        tx = optax.adam(1e-4)
        steps = 5

        fit_a = make_sharded_fit(model.apply, tx, mesh, num_steps=steps)
        res_a = fit_a(
            jax.tree_util.tree_map(jnp.copy, params),
            shard_batch(coords, mesh), shard_batch(target, mesh),
        )
        vag = make_fused_value_and_grad(model)
        fit_b = make_sharded_fit(
            model.apply, tx, mesh, num_steps=steps, value_and_grad_fn=vag
        )
        res_b = fit_b(params, shard_batch(coords, mesh), shard_batch(target, mesh))
        np.testing.assert_allclose(
            np.asarray(res_a.losses), np.asarray(res_b.losses), atol=2e-5
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(res_a.params),
            jax.tree_util.tree_leaves(res_b.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


class TestShardedFitPaddedRows:
    def test_n_rows_masks_padding(self):
        """A batch padded to divide the mesh must train identically to the
        unpadded batch on a 1-device mesh: n_rows masks the zero-coordinate
        pad rows out of loss AND gradient (VERDICT r3 review)."""
        import jax
        import jax.numpy as jnp
        import optax

        from mri_super_resolution_tpu.core.coords import mgrid
        from mri_super_resolution_tpu.models import Siren
        from mri_super_resolution_tpu.parallel import (
            make_mesh, make_sharded_fit, pad_to_multiple, shard_batch)

        model = Siren(hidden_features=32, hidden_layers=1)
        coords = mgrid((13, 13))  # 169 rows: does NOT divide 8
        target = jnp.sin(2.0 * coords[:, :1]) * jnp.cos(coords[:, 1:2])
        params = model.init(jax.random.key(0), coords[:4])
        tx = optax.adam(1e-3)
        steps = 5

        mesh1 = make_mesh(case=1, devices=jax.devices()[:1])
        fit_ref = make_sharded_fit(model.apply, tx, mesh1, num_steps=steps)
        res_ref = fit_ref(
            jax.tree_util.tree_map(jnp.copy, params),
            shard_batch(coords, mesh1), shard_batch(target, mesh1),
        )

        mesh8 = make_mesh(case=1)
        cpad, n = pad_to_multiple(coords, 8)
        tpad, _ = pad_to_multiple(target, 8)
        fit_pad = make_sharded_fit(
            model.apply, tx, mesh8, num_steps=steps, n_rows=n)
        res_pad = fit_pad(
            params, shard_batch(cpad, mesh8), shard_batch(tpad, mesh8))

        np.testing.assert_allclose(
            np.asarray(res_ref.losses), np.asarray(res_pad.losses),
            rtol=1e-5, atol=1e-7,
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(res_ref.params),
            jax.tree_util.tree_leaves(res_pad.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


class TestCohortRestart:
    def test_restart_optimizer_runs_on_mesh(self, rng):
        """--preset quality's cohort_run mapping: restart_adam on the
        sharded per-case fits (cohort.py inr_restart_every)."""
        cases = [_mk_case(rng, p) for p in ("01", "02")]
        res = cohort.run_cohort(
            cases, num_steps=25, hidden_features=16, hidden_layers=1,
            roi=(4, 20), inr_restart_every=10,
        )
        assert res.losses.shape == (2, 25)
        assert (res.losses[:, -1] < res.losses[:, 0]).all()
        assert np.isfinite(res.losses).all()
